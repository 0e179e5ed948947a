package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Live ledger of in-flight statements with cooperative cancellation —
  * the jobs-service half the query history ring doesn't cover.
  *
  * Reference: every submitted job is tracked and cancellable through the
  * jobs service (`services/jobs/src/main/java/com/dremio/service/jobs/
  * LocalJobsService.java:3060` `cancel(CancelJobRequest)`, which routes a
  * `requestCancelQuery` to the foreman running the job).
  *
  * Spark-first re-expression: each tracked statement is assigned its own
  * Spark job group on the submitting thread (with interrupt-on-cancel), so
  * cancellation is `SparkContext.cancelJobGroup` — Spark kills every
  * active task of that statement's jobs (codegen'd scans poll the kill
  * flag) while unrelated statements keep running. Driver-side metadata
  * only; nothing is added to the data path.
  *
  * Lifecycle mirrors [[Queues.admitLazy]]: an eager command retires from
  * the ledger when `Graft.sql` returns (it already ran); a lazy SELECT
  * stays RUNNING until its first completed action, detected by a one-shot
  * QueryExecutionListener keyed on the frame's analyzed plan. A frame
  * that is abandoned unexecuted holds only a WeakReference here, so later
  * `tracked` calls reap it once the JVM collects the plan.
  */
object RunningQueries {

  final case class Running(id: Long, statement: String, startedMs: Long)

  private val ids = new AtomicLong()
  private val running = TrieMap.empty[Long, Running]

  private final case class Tracked(id: Long,
                                   ref: java.lang.ref.WeakReference[AnyRef],
                                   listener: QueryExecutionListener)
  private val pending = new ConcurrentLinkedQueue[Tracked]

  /** The statement's Spark job group (visible in sys_running_queries so a
    * cluster operator can correlate with the Spark UI). */
  def group(id: Long): String = s"graft-query-$id"

  def list: Seq[Running] = running.values.toSeq.sortBy(_.id)

  /** Cancel a RUNNING statement: kills the job group's active and
    * subsequent jobs. False when the id is not running (finished, never
    * existed, or already cancelled) — the reference's NOT_FOUND ack. */
  def cancel(spark: SparkSession, id: Long): Boolean =
    running.remove(id) match {
      case Some(_) => spark.sparkContext.cancelJobGroup(group(id)); true
      case None => false
    }

  /** Run `body` (a statement builder) under a fresh tracked id: the job
    * group is set before the body so an eager command's own jobs are
    * already cancellable, and the ledger entry retires at the statement's
    * completion (immediately for commands, first completed action for lazy
    * frames). The group stays set on the calling thread for the frame's
    * lifetime — the next tracked statement on the thread replaces it. */
  def tracked(spark: SparkSession, statement: String)(body: => DataFrame): DataFrame = {
    reapAbandoned(spark)
    val id = ids.incrementAndGet()
    spark.sparkContext.setJobGroup(group(id), statement.take(200), interruptOnCancel = true)
    running.put(id, Running(id, statement.take(500), System.currentTimeMillis()))
    val df =
      try body
      catch { case t: Throwable => running.remove(id); throw t }
    import org.apache.spark.sql.catalyst.plans.logical.{Command, CommandResult}
    val analyzed = df.queryExecution.analyzed
    val alreadyRan = analyzed.isInstanceOf[Command] ||
      analyzed.isInstanceOf[CommandResult] ||
      df.queryExecution.logical.isInstanceOf[Command]
    if (alreadyRan) running.remove(id)
    else {
      val planRef = new java.lang.ref.WeakReference[AnyRef](analyzed)
      val listener: QueryExecutionListener = new QueryExecutionListener {
        private def hit(qe: QueryExecution): Boolean = {
          val p = planRef.get
          p != null && qe.analyzed.exists(_ eq p)
        }
        private def retire(): Unit = {
          running.remove(id)
          spark.listenerManager.unregister(this)
        }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          if (hit(qe)) retire()
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          if (hit(qe)) retire()
      }
      spark.listenerManager.register(listener)
      pending.add(Tracked(id, planRef, listener))
    }
    df
  }

  /** Drop ledger entries whose frame was abandoned without ever running
    * (the WeakReference cleared), unregistering their listeners. */
  private def reapAbandoned(spark: SparkSession): Unit = {
    val it = pending.iterator()
    while (it.hasNext) {
      val t = it.next()
      if (t.ref.get == null || !running.contains(t.id)) {
        running.remove(t.id)
        spark.listenerManager.unregister(t.listener)
        it.remove()
      }
    }
  }

  private[engine] def clear(): Unit = { running.clear(); pending.clear() }
}
