package graft.accel

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  // Optimized defining plan per reflection — kept for subsumption matching
  // (the reference's `acceleration/substitution/` normalizes plans instead of
  // requiring canonical identity; we match aggregate roll-ups the same way).
  private val planByName = TrieMap.empty[String, LogicalPlan]
  // Analyzed scan plan of each materialization, cached so the substitution
  // rule never does file listing + schema inference inside the optimizer
  // (ADVICE r2: spark.read.parquet per candidate per query). Invalidated on
  // refresh/drop; each use re-instances exprIds so one reflection can serve
  // two subtrees of the same query plan without attribute collisions.
  private val scanByNameCache = TrieMap.empty[String, LogicalPlan]

  private def reflectionScan(spark: SparkSession, r: Reflection): LogicalPlan = {
    val base = scanByNameCache.getOrElseUpdate(r.name,
      spark.read.parquet(r.path).queryExecution.analyzed)
    base match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
  }

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
    planByName.put(name, df.queryExecution.optimizedPlan)
    scanByNameCache.remove(name) // re-created under the same name → re-read
    r
  }

  /** Full refresh: recompute the materialization (fingerprint unchanged). */
  def refresh(name: String, df: DataFrame): Unit =
    byName.get(name).foreach { r =>
      df.write.mode(SaveMode.Overwrite).parquet(r.path)
      df.sparkSession.catalog.refreshByPath(r.path)
      scanByNameCache.remove(name)
    }

  /** Incremental refresh: dynamic-partition overwrite of only the
    * partitions present in `delta` (reference IncrementalUpdateUtils). */
  def refreshIncremental(name: String, delta: DataFrame, partitionCol: String): Unit =
    byName.get(name).foreach { r =>
      delta.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      delta.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(r.path)
      delta.sparkSession.catalog.refreshByPath(r.path)
      scanByNameCache.remove(name)
    }

  def drop(name: String): Unit = {
    byName.remove(name).foreach(r => byFingerprint.remove(r.fingerprint))
    planByName.remove(name)
    scanByNameCache.remove(name)
  }

  def clear(): Unit = {
    byName.clear(); byFingerprint.clear(); planByName.clear(); scanByNameCache.clear()
  }

  def list: Seq[Reflection] = byName.values.toSeq.sortBy(_.name)

  /** The substitution rule. Idempotent (a substituted scan has a different
    * fingerprint), so it is safe under the optimizer's fixed-point batch. */
  private def normPath(p: String): String =
    p.replaceFirst("^file:/+", "/").stripSuffix("/")

  // ---------- subsumption matching helpers ----------

  private object Conjuncts extends org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    def split(e: Expression): Seq[Expression] = splitConjunctivePredicates(e)
  }

  /** Attribute-insensitive canonical string of an expression: attributes are
    * reduced to lowercase name only, so the same expression over a pruned vs
    * unpruned child compares equal (the reference's normalization step,
    * `acceleration/normalization/`). */
  private def nameCanon(e: Expression): String =
    e.transform {
      case a: AttributeReference =>
        AttributeReference(a.name.toLowerCase, a.dataType, a.nullable)(exprId = ExprId(0L), qualifier = Nil)
    }.toString

  /** Structural key of an aggregate's input subtree, ignoring column-pruning
    * projections and attribute ids: Filter conditions by nameCanon (conjuncts
    * sorted), relations by their file-source root paths. None → only exact
    * matching applies (unknown node in the subtree). */
  private def structKey(plan: LogicalPlan): Option[String] = plan match {
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      structKey(child)
    case Filter(cond, child) =>
      val conjuncts = Conjuncts.split(cond).map(nameCanon).sorted.mkString("&")
      structKey(child).map(k => s"F($conjuncts)/$k")
    case lr: LogicalRelation =>
      lr.relation match {
        case h: HadoopFsRelation =>
          Some("R(" + h.location.rootPaths.map(p => normPath(p.toString)).sorted.mkString(",") + ")")
        case _ => None
      }
    case _ => None
  }

  /** How a reflection output column can serve a query aggregate:
    * grouping passthrough, or re-aggregable function kind + arg canon. */
  private def aggKey(ae: AggregateExpression): Option[(String, String)] =
    if (ae.isDistinct || ae.filter.nonEmpty || ae.mode != Complete) None
    else ae.aggregateFunction match {
      case s: Sum => Some(("sum", nameCanon(s.child)))
      case c: Count => Some(("count", c.children.map(nameCanon).mkString(",")))
      case m: Min => Some(("min", nameCanon(m.child)))
      case m: Max => Some(("max", nameCanon(m.child)))
      case _ => None // avg/stddev/... are not directly roll-up-able
    }

  /** Try to serve Aggregate `q` from reflection `r` (plan `rp`) by roll-up:
    * query grouping ⊆ reflection grouping over the same input, and every
    * query aggregate re-aggregates a reflection output column
    * (sum→sum, count→sum, min→min, max→max). The reference's most-used
    * substitution case (`acceleration/substitution/`). */
  private def rollup(spark: SparkSession, q: Aggregate, r: Reflection,
                     rp: LogicalPlan): Option[LogicalPlan] = rp match {
    case ra: Aggregate =>
      val qKey = structKey(q.child)
      if (qKey.isEmpty || qKey != structKey(ra.child)) return None
      val rGroupCanon = ra.groupingExpressions.map(nameCanon).toSet
      // reflection output columns usable as grouping passthroughs / aggs
      val groupCols: Map[String, String] = ra.aggregateExpressions.collect {
        case a: AttributeReference if rGroupCanon(nameCanon(a)) => nameCanon(a) -> a.name
        case al @ Alias(child, _) if rGroupCanon(nameCanon(child)) => nameCanon(child) -> al.name
      }.toMap
      val aggCols: Map[(String, String), String] = ra.aggregateExpressions.collect {
        case al @ Alias(ae: AggregateExpression, _) if aggKey(ae).isDefined =>
          aggKey(ae).get -> al.name
      }.toMap
      // every query grouping expression must be a reflection grouping output
      val qGroups = q.groupingExpressions.map(nameCanon)
      if (!qGroups.forall(groupCols.contains)) return None

      val scanPlan = reflectionScan(spark, r)
      val scanByName: Map[String, Attribute] = scanPlan.output.map(a => a.name -> a).toMap
      if (!(groupCols.values ++ aggCols.values).forall(scanByName.contains)) return None

      def reAgg(fn: String, col: Attribute): Expression = {
        val f = fn match {
          case "sum" | "count" => Sum(col) // counts roll up by summing
          case "min" => Min(col)
          case "max" => Max(col)
        }
        val ae = AggregateExpression(f, Complete, isDistinct = false)
        // COUNT over zero rows is 0, but Sum-of-counts over an empty
        // reflection is NULL — coalesce preserves the original semantics
        if (fn == "count")
          org.apache.spark.sql.catalyst.expressions.Coalesce(
            Seq(ae, org.apache.spark.sql.catalyst.expressions.Literal(0L)))
        else ae
      }
      // map each query output expr onto the reflection scan
      val mapped: Option[Seq[NamedExpression]] =
        traverseOpt(q.aggregateExpressions) {
          case a: AttributeReference if groupCols.contains(nameCanon(a)) =>
            Some(Alias(castTo(scanByName(groupCols(nameCanon(a))), a.dataType), a.name)(exprId = a.exprId))
          case al @ Alias(child, _) if groupCols.contains(nameCanon(child)) =>
            Some(Alias(castTo(scanByName(groupCols(nameCanon(child))), al.dataType), al.name)(exprId = al.exprId))
          case al @ Alias(ae: AggregateExpression, _) =>
            for {
              key <- aggKey(ae)
              colName <- aggCols.get(key)
            } yield Alias(castTo(reAgg(key._1, scanByName(colName)), al.dataType), al.name)(exprId = al.exprId)
          case _ => None
        }
      mapped.map { out =>
        val grouping = qGroups.map(g => scanByName(groupCols(g)))
        Aggregate(grouping, out, scanPlan)
      }
    case _ => None
  }

  private def castTo(e: Expression, dt: org.apache.spark.sql.types.DataType): Expression =
    if (e.dataType == dt) e else Cast(e, dt)

  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }

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
      def usable(r: Reflection): Boolean = !excluded.contains(normPath(r.path))
      // each node's fingerprint is computed exactly once (the old
      // guard+body pattern paid canonicalize+MD5 twice per node)
      def exact(sub: LogicalPlan): Option[LogicalPlan] =
        byFingerprint.get(fingerprintPlan(sub)).filter(usable).map { r =>
          val scan = reflectionScan(spark, r)
          // Re-alias the scan's output to the substituted subtree's exprIds
          // so parent operators keep resolving.
          val aliased: Seq[NamedExpression] = sub.output.zip(scan.output).map {
            case (orig, repl) => Alias(repl, orig.name)(exprId = orig.exprId)
          }
          Project(aliased, scan)
        }
      def subsumed(sub: LogicalPlan): Option[LogicalPlan] = sub match {
        case q: Aggregate =>
          // deterministic candidate order (by name): which of several
          // eligible reflections serves a query is stable across runs
          // (TrieMap iteration order is not)
          byName.toSeq.sortBy(_._1).iterator.map(_._2).filter(usable).flatMap { r =>
            planByName.get(r.name).flatMap(rp => rollup(spark, q, r, rp))
          }.nextOption()
        case _ => None
      }
      plan.transformUp {
        case sub =>
          exact(sub).orElse(subsumed(sub)).getOrElse(sub)
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
