package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Event-stream batch analytics over the `events` fixture — the batch
  * equivalents of the reference's ingest surface (SURVEY §2.10: pipes /
  * COPY INTO / incremental refresh; the reference is batch-only). The true
  * streaming path (Structured Streaming file source, AvailableNow) lives in
  * graft.streaming.Pipes and is exercised by its spec; these queries pin the
  * semantics the stream must converge to.
  */
object Events {

  /** Hourly rollup — the canonical incremental-refresh target shape. */
  val eventsHourly: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(sum(money(col("value")))).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }
  val eventsHourlySql: String = """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""

  /** Sessionization: 30-minute inactivity gap → new session (lag + running
    * conditional sum — all window ops, no shuffle beyond the user_id hash).
    */
  val eventsSessionize: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }
  val eventsSessionizeSql: String = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""

  /** CDC-style dedup: keep latest event per (user, event_type) — the
    * file-ingest dedup shape behind the reference's auto-ingest pipes
    * (dedup by file identity; here by business key). */
  val eventsDedupLatest: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .orderBy(col("user_id"), col("event_type"))
  }
  val eventsDedupLatestSql: String = """
    SELECT user_id, event_type, event_id, ts
    FROM (SELECT user_id, event_type, event_id, ts,
            ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x
    WHERE rn = 1 ORDER BY user_id, event_type"""

  /** Tumbling-window aggregation via Spark's window() — the Structured
    * Streaming windowed-agg shape run in batch mode. */
  val eventsTumbling: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.events
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("timestamp_ntz").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))
  }
  val eventsTumblingSql: String = """
    SELECT CAST(time_bucket(INTERVAL 6 HOUR, ts) AS TIMESTAMP) AS w_start, event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""

  val queries: Map[String, QueryFn] = Map(
    "events_hourly" -> eventsHourly,
    "events_sessionize" -> eventsSessionize,
    "events_dedup_latest" -> eventsDedupLatest,
    "events_tumbling" -> eventsTumbling)

  val oracle: Map[String, String] = Map(
    "events_hourly" -> eventsHourlySql,
    "events_sessionize" -> eventsSessionizeSql,
    "events_dedup_latest" -> eventsDedupLatestSql,
    "events_tumbling" -> eventsTumblingSql)
}
