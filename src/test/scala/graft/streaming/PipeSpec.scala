package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark

class PipeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("pipe drains available files exactly once across triggers") {
    val root = Files.createTempDirectory("graft_pipe").toString
    val src = s"$root/incoming"; Files.createDirectories(Paths.get(src))
    val pipe = Pipe("p1", src, "json", schema, s"$root/table", s"$root/_checkpoint")

    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$src/$name"), rows.mkString("\n").getBytes)

    drop("a.json", Seq("""{"event_id":1,"event_type":"x","value":1.5}""",
      """{"event_id":2,"event_type":"y","value":2.5}"""))
    drop("b.json", Seq("""{"event_id":3,"event_type":"x","value":3.5}"""))

    assert(Pipes.trigger(spark, pipe) == 3) // per-trigger count from stream progress
    assert(Pipes.table(spark, pipe).count() == 3)

    // re-trigger with no new files: nothing re-ingested (file-identity dedup)
    assert(Pipes.trigger(spark, pipe) == 0)
    assert(Pipes.table(spark, pipe).count() == 3)

    // late arrival: only the new file is ingested
    drop("c.json", Seq("""{"event_id":4,"event_type":"z","value":4.5}"""))
    assert(Pipes.trigger(spark, pipe) == 1)
    val rows = Pipes.table(spark, pipe)
    assert(rows.count() == 4)
    assert(rows.select("event_id").distinct().count() == 4)
  }
}
