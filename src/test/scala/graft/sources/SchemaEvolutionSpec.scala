package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Schema evolution across files of one table (reference
  * `exec/store/metadatarefresh/` re-profiles sources on drift; JSON
  * schema-learning in `easy/json/JSONRecordReader.java:71`). Pins the
  * coercion matrix for parquet multi-file tables: added and removed columns
  * under mergeSchema, widenable retypes under an explicit schema, and
  * REFRESH METADATA picking up new files after a cached listing. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("added column: old files read NULL, new files read the value") {
    val dir = Files.createTempDirectory("graft_evo_add").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/f1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/f2")
    val t = spark.read.option("mergeSchema", "true").parquet(s"$dir/f1", s"$dir/f2")
    assert(t.schema.fieldNames.toSet == Set("id", "v", "score"))
    val rows = t.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")), "old file must yield NULL")
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("removed column: later files without the column read NULL") {
    val dir = Files.createTempDirectory("graft_evo_rm").toString
    Seq((1L, "a", 1.0)).toDF("id", "v", "x").write.parquet(s"$dir/f1")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dir/f2")
    val t = spark.read.option("mergeSchema", "true").parquet(s"$dir/f1", s"$dir/f2")
    val byId = t.orderBy("id").collect()
    assert(byId(0).getDouble(byId(0).fieldIndex("x")) == 1.0)
    assert(byId(1).isNullAt(byId(1).fieldIndex("x")))
  }

  test("retyped column: int files widen to long under an explicit schema") {
    val dir = Files.createTempDirectory("graft_evo_widen").toString
    Seq(1, 2).toDF("n").write.parquet(s"$dir/f1") // int32
    Seq(3L, 4L).toDF("n").write.parquet(s"$dir/f2") // int64
    // parquet vectorized reader upcasts int32→int64 when the requested
    // schema says long (the widening half of the reference's coercion
    // matrix; narrowing is an error by design)
    val t = spark.read.schema(StructType(Seq(StructField("n", LongType))))
      .parquet(s"$dir/f1", s"$dir/f2")
    assert(t.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("incompatible retype (string vs long) fails loudly, not silently") {
    val dir = Files.createTempDirectory("graft_evo_bad").toString
    Seq("x").toDF("c").write.parquet(s"$dir/f1")
    Seq(1L).toDF("c").write.parquet(s"$dir/f2")
    intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(s"$dir/f1", s"$dir/f2").collect()
    }
  }

  test("REFRESH METADATA on a path surfaces appended files") {
    val dir = Files.createTempDirectory("graft_evo_refresh").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t")
    assert(spark.read.parquet(s"$dir/t").count() == 1)
    Seq((2L, "b")).toDF("id", "v").write.mode("append").parquet(s"$dir/t")
    // backtick-quoted path goes through refreshByPath (cache invalidation)
    spark.sql(s"ALTER TABLE `$dir/t` REFRESH METADATA")
    assert(spark.read.parquet(s"$dir/t").count() == 2,
      "refresh must surface the appended file")
  }
}
