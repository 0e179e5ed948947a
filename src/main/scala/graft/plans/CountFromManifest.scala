package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.sources.LakeFileIndex

/** Answer a bare `COUNT(*)` over an unfiltered lake-table scan from the
  * commit manifest's per-file row counts — no file is opened at all.
  *
  * This is the reference's metadata-count optimization
  * (`CountOnScanToValuesRule`, dremio-oss `exec/planner/PlannerPhase.java:337`)
  * re-expressed as a Catalyst optimizer rule. At 100 TB the difference is
  * a full-table scan (minutes, thousands of tasks) vs a driver-side sum
  * over numbers the commits already recorded.
  *
  * Fires only when provably exact:
  *  - global aggregate (no GROUP BY), every output a non-distinct,
  *    unfiltered COUNT over a non-null literal (`count(*)` / `count(1)`);
  *  - the child is the lake scan itself, or Projects over it (1:1 — a
  *    Project never changes cardinality). A Filter, Union (mixed-schema
  *    history), or any other node blocks the rewrite;
  *  - EVERY file in the snapshot carries a `__rows` manifest entry (one
  *    legacy file → unknowable without a scan → keep the scan).
  */
class CountFromManifest(spark: SparkSession) extends Rule[LogicalPlan] {

  private def manifestCount(p: LogicalPlan): Option[Long] = p match {
    case Project(_, child) => manifestCount(child)
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation =>
          fs.location match {
            case idx: LakeFileIndex => idx.manifestRowCount
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _) =>
      v != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _)
        if exprs.nonEmpty && exprs.forall(isCountStar) =>
      manifestCount(child) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(exprs.map(_ => n))))
        case None => agg
      }
  }
}
