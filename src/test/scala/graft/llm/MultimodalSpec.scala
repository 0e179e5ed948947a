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

  test("resize bounds dimensions by maxDim and preserves aspect") {
    val docs = Seq((1L, "a" * 500), (2L, "tiny")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val resized = Multimodal.resize(media, maxDim = 100).collect()
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w <= 100 && h <= 100, s"resize exceeded maxDim: ${w}x$h")
      assert(w >= 1 && h >= 1)
    }
    // fake dims are always ≥ 64, so a 100-cap must actually rescale
    assert(resized.forall(_.getAs[Boolean]("resized")))
  }

  test("frame sampling emits 1:N bounded rows per video payload") {
    val docs = Seq((1L, "x" * 1000), (2L, "y" * 150), (3L, "z")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, everyNth = 5, maxFrames = 3)
    val perId = frames.groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // 1000 bytes → 11 frames → ceil(11/5)=3 (capped); 150 → 2 frames → 1; 1 → 1
    assert(perId == Map(1L -> 3L, 2L -> 1L, 3L -> 1L), s"got $perId")
    // frame features are per-frame distinct and deterministic
    val f1 = frames.orderBy("id", "frame_idx").collect()
    val f2 = Multimodal.sampleFrames(media, everyNth = 5, maxFrames = 3)
      .orderBy("id", "frame_idx").collect()
    assert(f1.sameElements(f2))
    val id1feats = f1.filter(_.getLong(0) == 1L)
      .map(_.getAs[scala.collection.Seq[Float]]("features"))
    assert(id1feats.distinct.length == id1feats.length, "frames must differ")
  }

  test("json convert-from infers schema from samples (reference CONVERT_FROM)") {
    val t = graft.engine.Tables(spark, TestSpark.sf)
    val parsed = graft.functions.JsonOps.convertFromJson(t.events, "props", "p")
    val k = parsed.select(col("p.k")).na.drop().count()
    assert(k > 0)
  }
}
