package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media contract: schema, stub decode shape, determinism") {
    val docs = Seq((1L, "hello media"), (2L, "another payload")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(media.schema("media").dataType.typeName == "binary")

    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.getLong(0))
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.getLong(0))
    assert(f1.length == 2)
    f1.zip(f2).foreach { case (a, b) => assert(a == b) } // deterministic stub
    f1.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Float]]("features").length == 8)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64)
    }
  }

  test("features differ across different payloads") {
    val docs = Seq((1L, "payload one"), (2L, "payload two")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .select("features").as[Seq[Float]].collect()
    assert(f(0) != f(1))
  }

  test("json convert-from infers schema from samples (reference CONVERT_FROM)") {
    val t = graft.engine.Tables(spark, TestSpark.sf)
    val parsed = graft.functions.JsonOps.convertFromJson(t.events, "props", "p")
    val k = parsed.select(col("p.k")).na.drop().count()
    assert(k > 0)
  }
}
