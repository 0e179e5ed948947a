package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** COUNT(DISTINCT col) → NDV sketch for tables that opted into
  * approximate statistics — the reference's `CountDistinctConvertlet.java`
  * fed by `ALTER TABLE ... ENABLE APPROXIMATE STATS`
  * (`SetApproxHandler.java` → `PhysicalDataset.allowApproxStats`,
  * consumed through `NamespaceTable.isApproximateStatsAllowed`).
  *
  * Why it matters at 100 TB: exact COUNT(DISTINCT) is the one aggregate
  * that is NOT algebraic — Spark plans it as an Expand (row multiplication
  * per distinct-column set) plus a second shuffle keyed on the distinct
  * values themselves, so a high-cardinality distinct count moves the whole
  * column across the network. The HLL++ sketch is a fixed few-KB buffer
  * per group, merged map-side — one ordinary two-phase aggregate, zero
  * extra shuffles. The trade is exactness, which is why the rewrite is
  * per-table OPT-IN (the reference's contract): dashboards over event
  * tables take it, financial reconciliation doesn't.
  *
  * Eligibility mirrors the reference convertlet: the distinct argument
  * must be a column (casts allowed) whose origin — traced through
  * projections/aliases, filters, joins and other pass-through operators —
  * is EXCLUSIVELY lake scans whose table property
  * `graft.approx.stats = true` ([[graft.sources.SnapshotTable.ApproxStatsKey]],
  * riding the scan's synthetic CatalogTable). Any undecidable origin
  * (computed expression, non-lake leaf, mixed sources) keeps the exact
  * plan — approximation never leaks onto data that didn't opt in.
  * COUNT(DISTINCT a, b) (multi-arg) stays exact, like the reference
  * (its convertlet only inspects single-column calls). FILTER clauses are
  * preserved. Session kill-switch: `spark.graft.approx.stats=false`.
  *
  * The sketch is deterministic (fixed-seed xxhash64 of the value set), so
  * a rewritten query is reproducible run to run — and for small distinct
  * sets the HLL++ linear-counting range returns the exact count, which is
  * what `lake_approx_ndv`'s oracle pins. */
class ApproxCountDistinct(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get("spark.graft.approx.stats", "true") == "false")
      return plan
    plan.transformUp {
      case agg: Aggregate =>
        val rewritten = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case ae @ AggregateExpression(Count(Seq(arg)), _, true, _, _)
                if underlying(arg).exists(a => origins(a, agg.child)
                  .exists(os => os.nonEmpty && os.forall(approxEnabled))) =>
              ae.copy(
                aggregateFunction = HyperLogLogPlusPlus(arg),
                isDistinct = false)
          }.asInstanceOf[NamedExpression]
        }
        if (rewritten == agg.aggregateExpressions) agg
        else agg.copy(aggregateExpressions = rewritten)
    }
  }

  /** The column under the distinct argument: bare attribute or a cast
    * chain over one. Anything else is undecidable → ineligible. */
  private def underlying(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case c: Cast => underlying(c.child)
    case _ => None
  }

  /** Leaf relations an attribute originates from, traced through alias
    * indirection; None = undecidable (conservative no-rewrite, the
    * reference's "unable to decide, no way to transform"). */
  private def origins(a: Attribute,
                      p: LogicalPlan): Option[Seq[LogicalRelation]] = p match {
    case lr: LogicalRelation =>
      if (lr.outputSet.contains(a)) Some(Seq(lr)) else None
    case pj: Project if !pj.child.outputSet.contains(a) =>
      pj.projectList.collectFirst {
        case al: Alias if al.exprId == a.exprId => al.child
      }.flatMap(underlying).flatMap(origins(_, pj.child))
    case ag: Aggregate if !ag.child.outputSet.contains(a) =>
      ag.aggregateExpressions.collectFirst {
        case al: Alias if al.exprId == a.exprId => al.child
      }.flatMap(underlying).flatMap(origins(_, ag.child))
    case j: Join =>
      j.children.find(_.outputSet.contains(a)).flatMap(origins(a, _))
    case u: Union =>
      val idx = u.output.indexWhere(_.exprId == a.exprId)
      if (idx < 0) None
      else {
        val subs = u.children.map(c => origins(c.output(idx), c))
        if (subs.forall(_.isDefined)) Some(subs.flatten.flatten) else None
      }
    case un: UnaryNode if un.child.outputSet.contains(a) =>
      origins(a, un.child)
    case _ => None
  }

  private def approxEnabled(lr: LogicalRelation): Boolean =
    lr.catalogTable.exists { ct =>
      ct.identifier.table.startsWith("graft_lake_") &&
        ct.properties.get(graft.sources.SnapshotTable.ApproxStatsKey)
          .contains("true")
    }
}
