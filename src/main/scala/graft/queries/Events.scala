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

  /** Backward as-of join: each purchase picks up the latest click at or
    * before it by the same user (graft.operators.AsOfJoin — union+window,
    * one shuffle, zero join nodes). The oracle reproduces the same
    * semantics with a portable union-window formulation (verified
    * equivalent to DuckDB's native ASOF JOIN on the fixture). */
  val eventsAsofJoin: QueryFn = (s, dir) => {
    val ev = Tables.ensure(s, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    graft.operators.AsOfJoin.backward(
      purchases, clicks, Seq("user_id"), leftTs = "ts", rightTs = "ts")
      // no-match marker: click_id stays NULL; the ts gets an epoch sentinel
      // (null-temporal hashing is engine-greyzone, null bigints are proven)
      .withColumn("click_ts", coalesce(col("click_ts"), tsLit("1970-01-01 00:00:00")))
      .orderBy(col("event_id"))
  }
  val eventsAsofJoinSql: String = """
    WITH u AS (
      SELECT user_id, ts, 1 AS side, event_id,
             CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS TIMESTAMP) AS c_ts
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 0, NULL, event_id, ts
      FROM events WHERE event_type = 'click'),
    w AS (
      SELECT user_id, ts, side, event_id,
        last_value(c_id IGNORE NULLS) OVER win AS click_id,
        last_value(c_ts IGNORE NULLS) OVER win AS click_ts
      FROM u
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, c_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, ts, click_id,
           COALESCE(click_ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts
    FROM w WHERE side = 1 ORDER BY event_id"""

  /** Point-in-interval range join: clicks inside each purchase's
    * one-hour attribution window (graft.operators.RangeJoin — interval
    * binning turns the range predicate into a shuffled equi-join; the
    * reference would nested-loop this, SURVEY §2.3 NLJE). */
  val eventsRangeJoin: QueryFn = (s, dir) => {
    val ev = Tables.ensure(s, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("w_start"))
      .withColumn("w_end", col("w_start") + expr("INTERVAL 1 HOUR"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_value"))
    val joined = graft.operators.RangeJoin.pointInInterval(
      clicks, purchases, Seq("user_id"),
      pointTs = "c_ts", startCol = "w_start", endCol = "w_end",
      binSeconds = 3600)
    val counts = joined.groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_clicks"),
        dbl(sum(money(col("c_value")))).as("click_value"))
    purchases.join(counts, Seq("p_id"), "left")
      .select(col("p_id"), col("user_id"), col("w_start"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy(col("p_id"))
  }
  val eventsRangeJoinSql: String = """
    WITH p AS (
      SELECT event_id AS p_id, user_id, ts AS w_start,
             ts + INTERVAL 1 HOUR AS w_end
      FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS c_ts, value AS c_value
          FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.p_id, COUNT(*) AS n_clicks,
             CAST(SUM(CAST(c.c_value AS DECIMAL(12,2))) AS DOUBLE) AS click_value
      FROM p JOIN c ON p.user_id = c.user_id
        AND c.c_ts >= p.w_start AND c.c_ts < p.w_end
      GROUP BY p.p_id)
    SELECT p.p_id, p.user_id, p.w_start,
           COALESCE(j.n_clicks, 0) AS n_clicks,
           COALESCE(j.click_value, 0.0) AS click_value
    FROM p LEFT JOIN j USING (p_id) ORDER BY p_id"""

  /** Gap-filled per-user hourly timeline (time-series densification):
    * build the complete hour spine per user (sequence + explode — a
    * map-side fan-out, no driver loop), left-join the observed hourly
    * rollup, zero-fill counts, and carry the last observed hourly value
    * forward across gaps (last_value IGNORE NULLS window). Cost shape at
    * scale: one hash shuffle on user_id for the rollup + one window sort
    * per user — the spine explode is bounded by span-hours per user.
    * Money math in decimal for cross-engine hash parity. */
  val eventsGapFill: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val ev = t.events.filter(col("user_id") < 50)
    val base = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), dbl(sum(money(col("value")))).as("hour_value"))
    val spine = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(base, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("hour_value"), lit(0.0)).as("hour_value"),
        coalesce(last(col("hour_value"), ignoreNulls = true).over(w), lit(0.0))
          .as("carry_value"))
      .orderBy(col("user_id"), col("hour"))
  }
  val eventsGapFillSql: String = """
    WITH ev AS (SELECT user_id, ts, value FROM events WHERE user_id < 50),
    base AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS hour_value
      FROM ev GROUP BY 1, 2),
    span AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
                    date_trunc('hour', MAX(ts)) AS h1 FROM ev GROUP BY 1),
    spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
              FROM span)
    SELECT s.user_id, s.hour,
           COALESCE(b.n, 0) AS n,
           COALESCE(b.hour_value, 0.0) AS hour_value,
           COALESCE(last_value(b.hour_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS carry_value
    FROM spine s LEFT JOIN base b ON s.user_id = b.user_id AND s.hour = b.hour
    ORDER BY s.user_id, s.hour"""

  val queries: Map[String, QueryFn] = Map(
    "events_gap_fill" -> eventsGapFill,
    "events_asof_join" -> eventsAsofJoin,
    "events_range_join" -> eventsRangeJoin,
    "events_hourly" -> eventsHourly,
    "events_sessionize" -> eventsSessionize,
    "events_dedup_latest" -> eventsDedupLatest,
    "events_tumbling" -> eventsTumbling)

  val oracle: Map[String, String] = Map(
    "events_gap_fill" -> eventsGapFillSql,
    "events_asof_join" -> eventsAsofJoinSql,
    "events_range_join" -> eventsRangeJoinSql,
    "events_hourly" -> eventsHourlySql,
    "events_sessionize" -> eventsSessionizeSql,
    "events_dedup_latest" -> eventsDedupLatestSql,
    "events_tumbling" -> eventsTumblingSql)
}
