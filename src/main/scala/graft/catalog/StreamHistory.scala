package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-batch streaming progress HISTORY — the streaming face of the jobs
  * ledger (`sys_queries` records statements; this records micro-batches).
  * `sys_streams` shows the live queries' latest progress; this ring keeps
  * the trail: every progress event plus start/termination markers, so an
  * operator can ask "what was this pipe's ingest rate an hour ago" or
  * "why did the stream die" AFTER the query object is gone — the
  * reference's jobs-service observability applied to continuous queries.
  * Bounded ring, driver-held, like QueryHistory. */
object StreamHistory {

  final case class BatchRecord(queryId: String, runId: String, name: String,
                               batchId: Long, tsMs: Long, event: String,
                               numInputRows: Long, inputRowsPerSec: Double,
                               processedRowsPerSec: Double,
                               triggerMs: Long, source: String, sink: String)

  private val Cap = 10000
  private val ring = new java.util.ArrayDeque[BatchRecord]()

  private def add(r: BatchRecord): Unit = ring.synchronized {
    ring.addLast(r)
    while (ring.size() > Cap) ring.removeFirst()
  }

  def records: Seq[BatchRecord] = ring.synchronized { ring.asScala.toVector }

  /** Test hygiene. */
  def reset(): Unit = ring.synchronized { ring.clear() }

  private final class Recorder extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      add(BatchRecord(e.id.toString, e.runId.toString,
        Option(e.name).getOrElse(""), -1L, System.currentTimeMillis(),
        "started", 0L, 0.0, 0.0, 0L, "", ""))

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      def d(x: Double) = if (x.isNaN) 0.0 else x
      add(BatchRecord(p.id.toString, p.runId.toString,
        Option(p.name).getOrElse(""), p.batchId, System.currentTimeMillis(),
        "progress", p.numInputRows, d(p.inputRowsPerSecond),
        d(p.processedRowsPerSecond),
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        p.sources.headOption.map(_.description).getOrElse(""),
        p.sink.description))
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      add(BatchRecord(e.id.toString, e.runId.toString, "", -1L,
        System.currentTimeMillis(),
        e.exception.map(x => "error: " + x.take(200)).getOrElse("terminated"),
        0L, 0.0, 0.0, 0L, "", ""))
  }

  // one recorder per SESSION (the StreamingQueryManager is session-scoped;
  // cloned wire sessions get their own on first sys-view registration)
  private val installedSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def install(spark: SparkSession): Unit =
    installedSessions.synchronized {
      if (!installedSessions.containsKey(spark)) {
        spark.streams.addListener(new Recorder)
        installedSessions.put(spark, java.lang.Boolean.TRUE)
      }
    }
}
