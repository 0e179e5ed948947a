package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.CatalogColumnStat
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Categorical (string) equality selectivity from persisted frequent
  * items. Spark CBO's string contract is NDV-only: `status = 'HOT'`
  * estimates 1/NDV of the rows even when HOT is 60% of them — on a
  * skewed categorical column that is orders of magnitude off, and every
  * downstream decision (join order, broadcast choice) inherits the error;
  * the classic failure is BROADCASTING a side the estimate said was tiny.
  * The reference feeds ItemsSketch frequent items into its planner
  * (`services/statistics/StatisticsServiceImpl.java:502`); ANALYZE LAKE
  * persists the same information per categorical column
  * ([[graft.catalog.CboStats]], `"freq"` node, exposed by `lake_stats`).
  *
  * Spark exposes no per-literal estimator extension point, so the seat
  * for this information is to SPECIALIZE the filtered scan's column NDV
  * for THIS subtree: under `Filter(status = 'HOT', scan)`, replacing the
  * column's distinctCount with round(rows / count('HOT')) makes
  * FilterEstimation's own 1/NDV formula yield count/rows — the true
  * selectivity — and the correction flows through the standard stats
  * channel to join sizing and broadcast thresholds. IN-lists adjust by
  * the set's total frequency. Literals outside the stored top-k (or
  * columns with multiple equality conjuncts) are left alone — 1/NDV
  * stays the conservative default. Estimates only: the relation's data
  * is untouched, results can never change. The scan's GLOBAL column ndv
  * is shadowed inside this one filtered subtree (a join keyed on the
  * same column would see the specialized ndv in ITS cardinality math —
  * acceptable: the filter selectivity error this fixes is orders of
  * magnitude; the join-ndv perturbation is bounded by the literal's own
  * frequency). Disable with `spark.graft.cbo.categorical=false`. */
class CategoricalSelectivity(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.cboEnabled) return plan
    if (session.conf.get("spark.graft.cbo.categorical", "true") == "false")
      return plan
    plan.transformUp {
      case f @ Filter(cond, lr: LogicalRelation) =>
        specialize(cond, lr).map(nlr => Filter(cond, nlr)).getOrElse(f)
    }
  }

  /** Conjuncts of a predicate. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (column, equality literal set) for the string eq/IN conjuncts. */
  private def stringEqSets(cond: Expression): Seq[(String, Seq[String])] =
    conjuncts(cond).collect {
      case EqualTo(a: AttributeReference, Literal(s: UTF8String, StringType)) =>
        a.name -> Seq(s.toString)
      case EqualTo(Literal(s: UTF8String, StringType), a: AttributeReference) =>
        a.name -> Seq(s.toString)
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall {
            case Literal(_: UTF8String, StringType) => true; case _ => false
          } =>
        a.name -> vs.map(_.asInstanceOf[Literal].value.toString)
    }

  private def specialize(cond: Expression,
                         lr: LogicalRelation): Option[LogicalRelation] = {
    val ct = lr.catalogTable
      .filter(_.identifier.table.startsWith("graft_lake_"))
      .getOrElse(return None)
    val stats = ct.stats.getOrElse(return None)
    val nRows = stats.rowCount.getOrElse(return None)
    if (nRows <= 0) return None
    lr.relation match {
      case h: HadoopFsRelation if h.location.isInstanceOf[graft.sources.LakeFileIndex] => ()
      case _ => return None
    }
    val eqSets = stringEqSets(cond)
    if (eqSets.isEmpty) return None
    // a column with MORE than one equality conjunct is contradictory or
    // redundant — leave it to the default estimator
    val perCol = eqSets.groupBy(_._1).collect {
      case (c, Seq((_, lits))) => c -> lits
    }
    if (perCol.isEmpty) return None
    // frequent items ride IN the synthetic CatalogTable's properties
    // (CboStats.catalogTableFor) — a pure in-memory lookup; re-reading
    // the commit log here would tax every fixpoint iteration of every
    // filtered query with metadata I/O
    val props = ct.properties
    val adjusted: Map[String, BigInt] = perCol.flatMap { case (colName, lits) =>
      ct.schema.fields.find(_.name.equalsIgnoreCase(colName)).flatMap { field =>
        val freq = graft.catalog.CboStats.frequentItemsFor(props, field).toMap
        // every literal must be a KNOWN frequent item; an unknown one
        // keeps the conservative 1/NDV default
        val counts = lits.map(freq.get)
        if (freq.isEmpty || counts.exists(_.isEmpty)) None
        else {
          val total = counts.flatten.sum
          if (total <= 0) None
          else Some(field.name ->
            BigInt(math.max(1L, math.round(lits.size.toDouble *
              nRows.toDouble / total.toDouble))))
        }
      }
    }.toMap
    if (adjusted.isEmpty) return None
    val newColStats = stats.colStats ++ adjusted.map { case (name, ndv) =>
      name -> stats.colStats.get(name)
        .map(_.copy(distinctCount = Some(ndv)))
        .getOrElse(CatalogColumnStat(distinctCount = Some(ndv)))
    }
    if (newColStats == stats.colStats) None // already specialized: fixpoint
    else Some(lr.copy(catalogTable =
      Some(ct.copy(stats = Some(stats.copy(colStats = newColStats))))))
  }
}
