package graft.accel

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Reflections: materialized-view acceleration — the reference's flagship
  * custom planner feature (dremio-oss `exec/planner/acceleration/`:
  * `DremioMaterialization.java`, substitution under
  * `acceleration/substitution/`, plan hashing `PlanHasher.java`; lifecycle in
  * `services/accelerator/ReflectionManager.java`).
  *
  * Spark-native shape: a reflection is a parquet materialization keyed by
  * the canonicalized optimized logical plan of its defining query. A
  * `Rule[LogicalPlan]` appended to `spark.experimental.extraOptimizations`
  * (run after the main optimizer batches) walks each query's plan and
  * replaces any subtree whose canonical fingerprint matches a registered
  * reflection with a scan of the materialization, aliasing the scan's
  * output back to the subtree's attribute ids so the surrounding plan
  * resolves untouched.
  *
  * Matching is exact-plan (the reference additionally normalizes/expands —
  * `acceleration/normalization/`); refresh is full or partition-incremental
  * (reference `IncrementalUpdateUtils.java`).
  */
object Reflections {

  final case class Reflection(name: String, fingerprint: String, path: String)

  private val byFingerprint = TrieMap.empty[String, Reflection]
  private val byName = TrieMap.empty[String, Reflection]

  /** Canonical fingerprint of a query's optimized plan (exprIds normalized —
    * the Spark analog of the reference's PlanHasher). */
  def fingerprint(df: DataFrame): String =
    fingerprintPlan(df.queryExecution.optimizedPlan)

  private def fingerprintPlan(plan: LogicalPlan): String = {
    val canon = plan.canonicalized
    val sb = new StringBuilder(canon.toString)
    // LocalRelation prints only its schema — two inline rowsets with the
    // same shape would collide (and a VALUES plan could silently match a
    // reflection built from different literal data), so fold the rows in.
    canon.foreach {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        sb.append('#').append(lr.data.hashCode())
      case _ =>
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** CREATE REFLECTION: materialize the query and register it for
    * substitution. */
  def create(name: String, df: DataFrame, path: String): Reflection = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    df.sparkSession.catalog.refreshByPath(path)
    val r = Reflection(name, fingerprint(df), path)
    byName.put(name, r)
    byFingerprint.put(r.fingerprint, r)
    r
  }

  /** Full refresh: recompute the materialization (fingerprint unchanged). */
  def refresh(name: String, df: DataFrame): Unit =
    byName.get(name).foreach { r =>
      df.write.mode(SaveMode.Overwrite).parquet(r.path)
      df.sparkSession.catalog.refreshByPath(r.path)
    }

  /** Incremental refresh: dynamic-partition overwrite of only the
    * partitions present in `delta` (reference IncrementalUpdateUtils). */
  def refreshIncremental(name: String, delta: DataFrame, partitionCol: String): Unit =
    byName.get(name).foreach { r =>
      delta.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      delta.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(r.path)
      delta.sparkSession.catalog.refreshByPath(r.path)
    }

  def drop(name: String): Unit =
    byName.remove(name).foreach(r => byFingerprint.remove(r.fingerprint))

  def clear(): Unit = { byName.clear(); byFingerprint.clear() }

  def list: Seq[Reflection] = byName.values.toSeq.sortBy(_.name)

  /** The substitution rule. Idempotent (a substituted scan has a different
    * fingerprint), so it is safe under the optimizer's fixed-point batch. */
  private def normPath(p: String): String =
    p.replaceFirst("^file:/+", "/").stripSuffix("/")

  final class Substitute(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (byFingerprint.isEmpty) return plan
      // A write whose source matches a reflection defined over the SAME
      // target path must not be rewritten to read its own output mid-
      // overwrite (refresh would otherwise consume the files it deletes).
      val excluded: Set[String] = plan match {
        case cmd: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand =>
          Set(normPath(cmd.outputPath.toString))
        case _ => Set.empty
      }
      plan.transformUp {
        case sub if byFingerprint.get(fingerprintPlan(sub))
          .exists(r => !excluded.contains(normPath(r.path))) =>
          val r = byFingerprint(fingerprintPlan(sub))
          val scan = spark.read.parquet(r.path).queryExecution.analyzed
          // Re-alias the scan's output to the substituted subtree's exprIds
          // so parent operators keep resolving.
          val aliased: Seq[NamedExpression] = sub.output.zip(scan.output).map {
            case (orig, repl) => Alias(repl, orig.name)(exprId = orig.exprId)
          }
          Project(aliased, scan)
      }
    }
  }

  /** Install the substitution rule into a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations.exists(_.isInstanceOf[Substitute])
    if (!already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new Substitute(spark)
  }
}
