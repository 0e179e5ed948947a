package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SQLExecution}
import org.apache.spark.sql.util.QueryExecutionListener

/** Live ledger of in-flight statements with cooperative cancellation —
  * the jobs-service half the query history ring doesn't cover.
  *
  * Reference: every submitted job is tracked and cancellable through the
  * jobs service (`services/jobs/src/main/java/com/dremio/service/jobs/
  * LocalJobsService.java:3060` `cancel(CancelJobRequest)`, which routes a
  * `requestCancelQuery` to the foreman running the job).
  *
  * Spark-first re-expression: cancellation is bound to EXECUTION, not to
  * the thread that built the statement. Each tracked statement's analyzed
  * plan is weakly held; a process-wide [[SparkListener]] matches every
  * starting Spark job to its SQL execution's analyzed plan and thus to the
  * owning statement id. `CANCEL QUERY id` (a) marks the id cancelled so any
  * job that starts later for that statement is killed at start (covers the
  * submit/cancel race and between-AQE-job windows), (b) kills the already
  * recorded jobs, and (c) cancels the statement's job group INCLUDING
  * future jobs (`cancelJobGroupAndFutureJobs`, Spark 4.x) for work built
  * eagerly on the calling thread. The job group is cleared from the
  * calling thread once the statement is built, so a lazy frame executed
  * after another `Graft.sql` on the same thread is never mis-tagged with
  * the later statement's group (the execution-bound listener, not the
  * thread-local group, is what cancellation relies on).
  *
  * Lifecycle mirrors [[Queues.admitLazy]]: an eager command retires from
  * the ledger when `Graft.sql` returns (it already ran); a lazy SELECT
  * stays RUNNING until its first completed action, detected by a one-shot
  * QueryExecutionListener keyed on the frame's analyzed plan. A frame
  * that is abandoned unexecuted holds only a WeakReference here, so later
  * `tracked` calls reap it once the JVM collects the plan.
  */
object RunningQueries {

  final case class Running(id: Long, statement: String, startedMs: Long,
                           owner: Option[String] = None)

  private val ids = new AtomicLong()
  private val running = TrieMap.empty[Long, Running]

  // abandonment keys on the caller-owned Dataset (dfRef) — the plan cache
  // may strongly hold the analyzed plan long after the caller dropped it
  private final case class Tracked(id: Long,
                                   ref: java.lang.ref.WeakReference[AnyRef],
                                   dfRef: java.lang.ref.WeakReference[AnyRef],
                                   listener: QueryExecutionListener)
  private val pending = new ConcurrentLinkedQueue[Tracked]
  /** Statement ids cancelled while jobs may still be submitted: any job
    * matched to these at start is killed immediately. */
  private val cancelledIds = TrieMap.empty[Long, Boolean]
  /** Spark job ids observed (via the job-start listener) per statement. */
  private val jobsOf = TrieMap.empty[Long, List[Int]]
  private val installedOn = TrieMap.empty[SparkContext, Boolean]

  /** The statement's Spark job group (visible in sys_running_queries so a
    * cluster operator can correlate with the Spark UI). */
  def group(id: Long): String = s"graft-query-$id"

  def list: Seq[Running] = running.values.toSeq.sortBy(_.id)

  /** Cancel a RUNNING statement: kills its recorded jobs, its job group's
    * active AND future jobs, and marks the id so jobs submitted later for
    * this statement die at start. False when the id is not running
    * (finished, never existed, or already cancelled) — the reference's
    * NOT_FOUND ack. */
  def cancel(spark: SparkSession, id: Long): Boolean =
    running.remove(id) match {
      case Some(_) =>
        // Order matters vs the job-start listener (which appends to jobsOf
        // BEFORE checking cancelledIds): mark first, then sweep — any
        // concurrent job start is killed by whichever side sees it last.
        cancelledIds.put(id, true)
        val sc = spark.sparkContext
        sc.cancelJobGroupAndFutureJobs(group(id))
        jobsOf.getOrElse(id, Nil)
          .foreach(j => sc.cancelJob(j, s"cancelled by CANCEL QUERY $id"))
        true
      case None => false
    }

  /** Run `body` (a statement builder) under a fresh tracked id: the job
    * group is set for the body (an eager command's own jobs are already
    * cancellable) and cleared afterwards; a lazy frame's later actions are
    * matched to the statement by the process-wide job-start listener. */
  def tracked(spark: SparkSession, statement: String)(body: => DataFrame): DataFrame = {
    reapAbandoned(spark)
    ensureJobListener(spark.sparkContext)
    val id = ids.incrementAndGet()
    spark.sparkContext.setJobGroup(group(id), statement.take(200), interruptOnCancel = true)
    running.put(id, Running(id, statement.take(500), System.currentTimeMillis(),
      graft.auth.Privileges.principalOf(spark).map(_.name)))
    val df =
      try body
      catch { case t: Throwable => running.remove(id); throw t }
      finally spark.sparkContext.clearJobGroup()
    import org.apache.spark.sql.catalyst.plans.logical.{Command, CommandResult}
    val analyzed = df.queryExecution.analyzed
    val alreadyRan = analyzed.isInstanceOf[Command] ||
      analyzed.isInstanceOf[CommandResult] ||
      df.queryExecution.logical.isInstanceOf[Command]
    if (alreadyRan) retireState(id)
    else {
      val planRef = new java.lang.ref.WeakReference[AnyRef](analyzed)
      val listener: QueryExecutionListener = new QueryExecutionListener {
        private def hit(qe: QueryExecution): Boolean = {
          val p = planRef.get
          p != null && qe.analyzed.exists(_ eq p)
        }
        private def retire(): Unit = {
          retireState(id)
          spark.listenerManager.unregister(this)
        }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          if (hit(qe)) retire()
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          if (hit(qe)) retire()
      }
      spark.listenerManager.register(listener)
      pending.add(Tracked(id, planRef,
        new java.lang.ref.WeakReference[AnyRef](df), listener))
    }
    df
  }

  private def retireState(id: Long): Unit = {
    running.remove(id)
    cancelledIds.remove(id)
    jobsOf.remove(id)
  }

  /** Process-wide job-start hook: matches each starting job's SQL execution
    * to a tracked statement's analyzed plan. Records live job ids (so
    * CANCEL can kill mid-flight work submitted from ANY thread) and kills
    * at start any job belonging to an already-cancelled statement. */
  private def ensureJobListener(sc: SparkContext): Unit =
    if (installedOn.putIfAbsent(sc, true).isEmpty) {
      sc.addSparkListener(new SparkListener {
        override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
          val execIdStr = jobStart.properties.getProperty(SQLExecution.EXECUTION_ID_KEY)
          if (execIdStr != null) {
            val qe = SQLExecution.getQueryExecution(execIdStr.toLong)
            if (qe != null) {
              val it = pending.iterator()
              while (it.hasNext) {
                val t = it.next()
                val p = t.ref.get
                if (p != null && qe.analyzed.exists(_ eq p)) {
                  // append BEFORE the cancelled check (see cancel())
                  jobsOf.updateWith(t.id) {
                    case Some(js) => Some(jobStart.jobId :: js)
                    case None => Some(jobStart.jobId :: Nil)
                  }
                  if (cancelledIds.contains(t.id))
                    sc.cancelJob(jobStart.jobId, s"cancelled by CANCEL QUERY ${t.id}")
                }
              }
            }
          }
        }
      })
    }

  /** Drop ledger entries whose frame was abandoned without ever running
    * (the WeakReference cleared), unregistering their listeners. Entries
    * for cancelled-but-still-draining statements are kept until their
    * frame completes or is collected, so late job submissions still die. */
  private def reapAbandoned(spark: SparkSession): Unit = {
    val it = pending.iterator()
    while (it.hasNext) {
      val t = it.next()
      val gone = t.dfRef.get == null
      if (gone || (!running.contains(t.id) && !cancelledIds.contains(t.id))) {
        retireState(t.id)
        spark.listenerManager.unregister(t.listener)
        it.remove()
      }
    }
  }

  private[engine] def clear(): Unit =
    { running.clear(); pending.clear(); cancelledIds.clear(); jobsOf.clear() }
}
