package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.CommandExecutionMode
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column lineage: which base-table columns each output field of a query
  * derives from.
  *
  * Reference: every completed job records its field origins — output field
  * → list of (dataset, column) with a derived flag — extracted from the
  * expanded plan (`services/jobs/.../metadata/QueryMetadata.java:374-378`
  * `FieldOriginExtractor.getFieldOrigins`, stored as the `FieldOrigin` /
  * `Origin` protos that back the catalog's lineage graph API).
  *
  * Spark-first re-expression: one bottom-up pass over the ANALYZED plan
  * (views already expanded, attributes bound by ExprId — the same
  * resolution JoinRecommender rides), accumulating per-ExprId origin sets.
  * Pass-through attributes keep their entry; an Alias contributes the
  * union of its child's references, marked derived when the aliased
  * expression is anything but a bare column. Plain metadata walking —
  * nothing executes.
  */
object FieldOrigins {

  /** A base column (table identity as in sys_join_analysis: catalog name,
    * view name, or normalized root path). */
  final case class Origin(table: String, column: String)

  /** One output field and where it comes from. `derived` is true when any
    * step between the base column(s) and the field computed something
    * (expression, aggregate, window, generator) — the reference's
    * `Origin.derived`. Literal-only fields have no origins. */
  final case class FieldOrigin(field: String, origins: Seq[Origin], derived: Boolean)

  /** Field origins of a SQL statement (analyzed, never executed). */
  def of(spark: SparkSession, sql: String): Seq[FieldOrigin] = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    ofPlan(spark.sessionState.executePlan(parsed, CommandExecutionMode.SKIP).analyzed)
  }

  def ofPlan(plan: LogicalPlan): Seq[FieldOrigin] = {
    val m = build(plan)
    plan.output.map { a =>
      m.get(a.exprId) match {
        case Some((os, d)) =>
          FieldOrigin(a.name, os.toSeq.sortBy(o => (o.table, o.column)), d)
        case None => FieldOrigin(a.name, Nil, derived = true)
      }
    }
  }

  /** The user-facing name of a base relation: the innermost view/alias
    * wrapper when the subtree is just wrappers over a relation (the
    * namespace key the reference reports), else the relation's own
    * catalog identity or root path. */
  private def relationName(p: LogicalPlan): Option[String] = p match {
    case l: LogicalRelation =>
      l.catalogTable.map(_.identifier.unquotedString).orElse(l.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption
            .map(rp => graft.accel.Reflections.normPath(rp.toString))
        case _ => None
      })
    case h: HiveTableRelation => Some(h.tableMeta.identifier.unquotedString)
    case d: DataSourceV2Relation => Option(d.table).map(_.name())
    case _ => None
  }

  private def isRelation(p: LogicalPlan): Boolean = p match {
    case _: LogicalRelation | _: HiveTableRelation | _: DataSourceV2Relation => true
    case _ => false
  }

  /** Bottom-up ExprId → (origins, derived). */
  private def build(p: LogicalPlan): Map[ExprId, (Set[Origin], Boolean)] = p match {
    case s: SubqueryAlias =>
      val cm = build(s.child)
      // the INNERMOST alias directly over a relation is the dataset's
      // user-facing name ONLY when it is a view registration (a View node
      // beneath) or the relation has no catalog identity of its own; a
      // query-text alias over an identified relation (`FROM
      // parquet.`/path` p`) must NOT mask the relation's real identity —
      // the reference reports the dataset's namespace key, not the alias
      def skipViews(q: LogicalPlan): LogicalPlan = q match {
        case v: View => skipViews(v.child)
        case other => other
      }
      val inner = skipViews(s.child)
      val isRegistration = s.child.isInstanceOf[View]
      if (isRelation(inner) && (isRegistration || relationName(inner).isEmpty))
        cm.map { case (id, (os, d)) =>
          id -> (os.map(_.copy(table = s.identifier.name)), d)
        }
      else cm
    case v: View => build(v.child)
    case leaf if leaf.children.isEmpty =>
      relationName(leaf) match {
        case Some(t) =>
          leaf.output.map(a => a.exprId -> (Set(Origin(t, a.name)), false)).toMap
        case None => Map.empty // VALUES / range / local data: no base origins
      }
    case u: Union =>
      // positional merge: each output column descends from that position in
      // EVERY branch
      val childMaps = u.children.map(build)
      val base = childMaps.foldLeft(Map.empty[ExprId, (Set[Origin], Boolean)])(_ ++ _)
      val perPos = u.children.zip(childMaps).map { case (c, cm) =>
        c.output.map(a => cm.getOrElse(a.exprId, (Set.empty[Origin], true)))
      }
      base ++ u.output.zipWithIndex.map { case (a, i) =>
        val merged = perPos.map(_(i))
        a.exprId -> (merged.flatMap(_._1).toSet, merged.exists(_._2))
      }
    case _ =>
      val childMap = p.children.map(build)
        .foldLeft(Map.empty[ExprId, (Set[Origin], Boolean)])(_ ++ _)
      val named: Seq[NamedExpression] = p match {
        case pr: Project => pr.projectList
        case ag: Aggregate => ag.aggregateExpressions
        case w: Window => w.windowExpressions
        case _: Expand => Nil // grouping-set internals; outputs resolve via child
        case _ => Nil
      }
      val gen: Map[ExprId, (Set[Origin], Boolean)] = p match {
        case g: Generate =>
          val src = g.generator.references.toSeq
            .flatMap(r => childMap.get(r.exprId)).flatMap(_._1).toSet
          g.generatorOutput.map(a => a.exprId -> (src, true)).toMap
        case _ => Map.empty
      }
      childMap ++ gen ++ named.collect {
        case al: Alias =>
          val refs = al.child.references.toSeq.flatMap(r => childMap.get(r.exprId))
          val os = refs.flatMap(_._1).toSet
          // a rename or a schema-adaptation cast of a bare column is NOT a
          // derivation (View wraps its body in Project[cast(c) AS c])
          def passThrough(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
            e match {
              case _: AttributeReference => true
              case c: org.apache.spark.sql.catalyst.expressions.Cast => passThrough(c.child)
              case a: Alias => passThrough(a.child)
              case _ => false
            }
          val derived = !passThrough(al.child) || refs.exists(_._2)
          al.exprId -> (os, derived)
      }.toMap
  }
}
