package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming parity beyond the reference (SURVEY §2.10: the reference is
  * batch-only; watermarks/session windows/stateful ops are the
  * Spark-native extension surface): windowed aggregation under a watermark,
  * session_window grouping, and custom state via flatMapGroupsWithState.
  */
class StatefulStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def streamFromJson(dir: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(s"$dir/data.json"), rows.mkString("\n").getBytes)

  private val schemaDdl = "user_id BIGINT, ts TIMESTAMP, value DOUBLE"

  test("watermarked tumbling-window aggregation over a file stream") {
    val root = Files.createTempDirectory("graft_stream1").toString
    val src = s"$root/in"; Files.createDirectories(Paths.get(src))
    streamFromJson(src, Seq(
      """{"user_id":1,"ts":"2024-01-01 00:01:00","value":1.0}""",
      """{"user_id":1,"ts":"2024-01-01 00:04:00","value":2.0}""",
      """{"user_id":2,"ts":"2024-01-01 00:11:00","value":3.0}"""))
    val q = spark.readStream.schema(schemaDdl).json(src)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
      .agg(sum(col("value")).as("total"))
      .writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT user_id, total FROM win_agg ORDER BY user_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 3.0), (2L, 3.0)))
  }

  test("session_window groups by inactivity gap") {
    val root = Files.createTempDirectory("graft_stream2").toString
    val src = s"$root/in"; Files.createDirectories(Paths.get(src))
    streamFromJson(src, Seq(
      """{"user_id":1,"ts":"2024-01-01 00:00:00","value":1.0}""",
      """{"user_id":1,"ts":"2024-01-01 00:03:00","value":1.0}""",
      """{"user_id":1,"ts":"2024-01-01 01:00:00","value":1.0}"""))
    val q = spark.readStream.schema(schemaDdl).json(src)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("sess_agg")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable(); q.stop()
    val ns = spark.sql("SELECT n FROM sess_agg ORDER BY n").collect().map(_.getLong(0)).toSeq
    assert(ns == Seq(1L, 2L)) // two sessions: (00:00,00:03) and (01:00)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark") {
    val root = Files.createTempDirectory("graft_stream4").toString
    val src = s"$root/in"; Files.createDirectories(Paths.get(src))
    streamFromJson(src, Seq(
      """{"user_id":1,"ts":"2024-01-01 00:00:00","value":1.0}""",
      """{"user_id":1,"ts":"2024-01-01 00:00:30","value":1.0}""", // dup key
      """{"user_id":2,"ts":"2024-01-01 00:01:00","value":2.0}"""))
    val q = spark.readStream.schema(schemaDdl).json(src)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.sql("SELECT count(*) FROM dedup_stream").head().getLong(0) == 2)
  }

  test("flatMapGroupsWithState maintains custom per-key state") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stream3").toString
    val src = s"$root/in"; Files.createDirectories(Paths.get(src))
    streamFromJson(src, Seq(
      """{"user_id":1,"ts":"2024-01-01 00:00:00","value":10.0}""",
      """{"user_id":1,"ts":"2024-01-01 00:01:00","value":5.0}""",
      """{"user_id":2,"ts":"2024-01-01 00:00:30","value":7.0}"""))

    def track(key: Long, events: Iterator[(Long, Timestamp, Double)],
              state: GroupState[Double]): Iterator[(Long, Double)] = {
      val sum = state.getOption.getOrElse(0.0) + events.map(_._3).sum
      state.update(sum)
      Iterator.single((key, sum))
    }

    val q = spark.readStream.schema(schemaDdl).json(src)
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(track)
      .toDF("user_id", "running_total")
      .writeStream.format("memory").queryName("state_agg")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT user_id, running_total FROM state_agg ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 15.0), (2L, 7.0)))
  }

  test("watermarked stream-stream interval join (impressions x clicks)") {
    val root = Files.createTempDirectory("graft_stream5").toString
    val impDir = s"$root/imp"; Files.createDirectories(Paths.get(impDir))
    val clkDir = s"$root/clk"; Files.createDirectories(Paths.get(clkDir))
    streamFromJson(impDir, Seq(
      """{"user_id":1,"ts":"2024-01-01 00:00:00","value":10.0}""",
      """{"user_id":2,"ts":"2024-01-01 00:00:00","value":20.0}""",
      """{"user_id":3,"ts":"2024-01-01 00:00:00","value":30.0}"""))
    streamFromJson(clkDir, Seq(
      """{"user_id":1,"ts":"2024-01-01 00:02:00","value":1.0}""",  // within 5m of imp
      """{"user_id":2,"ts":"2024-01-01 00:30:00","value":1.0}"""))  // outside the interval
    val imps = spark.readStream.schema(schemaDdl).json(impDir)
      .withColumnRenamed("ts", "imp_ts").withColumnRenamed("value", "imp_v")
      .withWatermark("imp_ts", "10 minutes")
    val clicks = spark.readStream.schema(schemaDdl).json(clkDir)
      .withColumnRenamed("ts", "clk_ts").withColumnRenamed("value", "clk_v")
      .withWatermark("clk_ts", "10 minutes")
    // click must land within (imp_ts, imp_ts + 5 min] — the standard
    // attribution join; watermarks bound both sides' state
    val joined = imps.join(clicks,
      imps("user_id") === clicks("user_id") &&
        col("clk_ts") > col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 5 MINUTES"))
    val q = joined.select(imps("user_id").as("uid"), col("imp_v"), col("clk_v"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("SELECT uid, imp_v FROM ss_join ORDER BY uid").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 10.0)))
  }
}
