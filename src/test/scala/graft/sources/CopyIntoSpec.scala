package graft.sources

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark

class CopyIntoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def writeCsv(dir: String, lines: Seq[String]): String = {
    val p = s"$dir/in.csv"
    Files.write(Paths.get(p), ("id,name,score" +: lines).mkString("\n").getBytes)
    p
  }

  test("ON_ERROR continue loads good rows and captures bad ones") {
    val root = Files.createTempDirectory("graft_copy").toString
    val src = writeCsv(root, Seq("1,alpha,1.5", "not_a_number,beta,2.0", "3,gamma,xx", "4,delta,4.0"))
    val res = CopyInto.copyInto(spark, src, "csv", schema, s"$root/tbl", onError = "continue")
    assert(res.loaded == 2)
    assert(res.errors == 2)
    assert(res.errorRows.count() == 2)
  }

  test("ON_ERROR abort throws on malformed records and writes nothing") {
    val root = Files.createTempDirectory("graft_copy_abort").toString
    val src = writeCsv(root, Seq("1,alpha,1.5", "bad,row,zz"))
    intercept[IllegalStateException] {
      CopyInto.copyInto(spark, src, "csv", schema, s"$root/tbl", onError = "abort")
    }
    assert(!Files.exists(Paths.get(s"$root/tbl")))
  }

  test("clean load reports zero errors") {
    val root = Files.createTempDirectory("graft_copy_clean").toString
    val src = writeCsv(root, Seq("1,alpha,1.5", "2,beta,2.5"))
    val res = CopyInto.copyInto(spark, src, "csv", schema, s"$root/tbl")
    assert(res.loaded == 2 && res.errors == 0)
  }

  test("copy_errors history accumulates bad rows across loads") {
    val root = Files.createTempDirectory("graft_copy_hist").toString
    val src1 = writeCsv(root, Seq("1,alpha,1.5", "bad,row,zz"))
    CopyInto.copyInto(spark, src1, "csv", schema, s"$root/tbl")
    val errs1 = CopyInto.copyErrors(spark, s"$root/tbl")
    assert(errs1.count() == 1)
    assert(errs1.columns.toSet == Set("raw_record", "job_ts_ms", "source_path"))
    // second load appends to the history
    val src2 = s"$root/in2.csv"
    Files.write(Paths.get(src2), "id,name,score\n2,beta,2.0\noops,x,y".getBytes)
    CopyInto.copyInto(spark, src2, "csv", schema, s"$root/tbl")
    assert(CopyInto.copyErrors(spark, s"$root/tbl").count() == 2)
    // clean target has an empty errors table, not a crash
    val cleanRoot = Files.createTempDirectory("graft_copy_clean2").toString
    assert(CopyInto.copyErrors(spark, s"$cleanRoot/none").count() == 0)
  }

  test("copyInto leaves no cached data behind (long-lived ingest hygiene)") {
    val root = Files.createTempDirectory("graft_copy_cache").toString
    // delta-based: other operators legitimately hand back persisted
    // results (a CC's final localCheckpoint) — COPY INTO must add NOTHING
    val before = spark.sparkContext.getPersistentRDDs.keySet
    def leaked = spark.sparkContext.getPersistentRDDs.filterNot {
      case (id, _) => before(id)
    }
    val src = writeCsv(root, Seq("1,alpha,1.5", "bad,row,zz"))
    CopyInto.copyInto(spark, src, "csv", schema, s"$root/tbl")
    assert(leaked.isEmpty,
      s"COPY INTO must unpersist its parsed source after the load: $leaked")
    // the abort path must release the cache too (throws mid-flight)
    val src2 = s"$root/in2.csv"
    Files.write(Paths.get(src2), "id,name,score\nbad,x,y".getBytes)
    intercept[IllegalStateException] {
      CopyInto.copyInto(spark, src2, "csv", schema, s"$root/tbl", onError = "abort")
    }
    assert(leaked.isEmpty, s"aborted COPY INTO must still unpersist: $leaked")
  }

  test("mergeByKey upserts: updates matched keys, inserts new, keeps rest") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_merge").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.parquet(s"$root/t")
    Writer.mergeByKey(Seq((2L, "B"), (4L, "d")).toDF("id", "v"), s"$root/t", "id")
    val got = spark.read.parquet(s"$root/t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("CTAS writes partitioned parquet readable back with pruning") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ctas").toString
    val df = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")).toDF("id", "v", "part")
    Writer.ctas(df, s"$root/t", partitionCols = Seq("part"), sortCols = Seq("id"))
    val back = spark.read.parquet(s"$root/t")
    assert(back.count() == 3)
    assert(back.filter(org.apache.spark.sql.functions.col("part") === "x").count() == 2)
    assert(Files.exists(Paths.get(s"$root/t/part=x")))
  }
}
