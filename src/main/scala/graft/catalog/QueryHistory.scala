package graft.catalog

import java.util.concurrent.ConcurrentLinkedDeque
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** One completed (or failed) query action, as `sys_queries` reports it. */
final case class QueryRecord(
    id: Long,
    action: String, // collect / save / count / ...
    status: String, // SUCCESS | FAILURE
    durationMs: Double,
    outputRows: Long, // -1 when the metric is absent
    shuffleBytes: Long,
    error: String,
    plan: String, // one-line physical summary
    tsMs: Long)

/** Session-wide query history (the Spark-native seat of the reference's
  * jobs service + query profiles — dremio-oss `services/jobs`, profile
  * collection in `sabot/kernel` Foreman observers): a
  * `QueryExecutionListener` records every DataFrame action's duration,
  * output-row count, and shuffled bytes into a bounded ring, surfaced as
  * the `sys_queries` view (InfoSchema). Driver-side metadata only —
  * nothing touches the data path, and the ring is O(MaxEntries) however
  * long the session lives. */
object QueryHistory {

  val MaxEntries = 1000

  private val ring = new ConcurrentLinkedDeque[QueryRecord]()
  private val ids = new AtomicLong()
  // weak keys: sessions come and go in tests; the registry must not pin them
  private val installed = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Register the listener once per session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (installed.add(spark))
      spark.listenerManager.register(new Listener)

  def records: Seq[QueryRecord] = ring.iterator().asScala.toVector

  private[catalog] def clear(): Unit = ring.clear()

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      push(funcName, qe, durationNs, None)
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
      push(funcName, qe, 0L, Some(ex))
  }

  /** Final physical plan nodes, descending through AQE wrappers so metrics
    * reflect what actually ran. Each node appears exactly once: an AQE /
    * query-stage wrapper is REPLACED by its executed subtree (not emitted
    * and then re-expanded), so summing a metric over the result never
    * double-counts a stage. */
  private[catalog] def finalPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => finalPlans(a.executedPlan)
    case s: QueryStageExec => finalPlans(s.plan)
    case other => other +: other.children.flatMap(finalPlans)
  }

  private def push(action: String, qe: QueryExecution,
                   durationNs: Long, err: Option[Exception]): Unit = {
    val rec = try {
      val plans = finalPlans(qe.executedPlan)
      val rows = plans.headOption
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).getOrElse(-1L)
      val shuffled = plans.flatMap(_.metrics.get("shuffleBytesWritten").map(_.value)).sum
      QueryRecord(ids.incrementAndGet(), action,
        if (err.isEmpty) "SUCCESS" else "FAILURE",
        durationNs / 1e6, rows, shuffled,
        err.map(e => String.valueOf(e.getMessage).take(500)).getOrElse(""),
        qe.executedPlan.nodeName, System.currentTimeMillis())
    } catch {
      case _: Throwable => // a half-built plan (early analysis failure)
        QueryRecord(ids.incrementAndGet(), action,
          if (err.isEmpty) "SUCCESS" else "FAILURE", durationNs / 1e6, -1L, 0L,
          err.map(e => String.valueOf(e.getMessage).take(500)).getOrElse(""),
          "", System.currentTimeMillis())
    }
    ring.addFirst(rec)
    while (ring.size() > MaxEntries) ring.pollLast()
  }
}
