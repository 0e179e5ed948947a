package graft.auth

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, View}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analysis-time authorization check (injected via
  * `SparkSessionExtensions.injectCheckRule`): while enforcement is on,
  * every identified relation in the analyzed plan requires SELECT for the
  * session's authenticated principal. Runs on the driver during analysis —
  * nothing is added to the physical plan.
  *
  * View-as-security-layer (reference dac enforcement model): a grant on a
  * VIEW covers its whole subtree, so users can be given curated views
  * without any grant on the base tables. Relations with no catalog
  * identity (VALUES, range, LocalRelation) pass — they carry no persisted
  * data. Statements that read nothing (SET, AUTHENTICATE, auth DDL) pass
  * here; auth DDL guards itself via [[Privileges.requireAdmin]].
  */
class AuthorizeRule(session: SparkSession) extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = {
    if (!Privileges.enforcing) return
    // engine-internal re-analysis (reflection-goal reattach at startup)
    // runs as SYSTEM — the reference's ReflectionManager identity
    if (Privileges.inSystemContext) return
    val principal = Privileges.principalOf(session)
    if (principal.exists(_.admin)) return
    // The analyzer ALSO check-rules a view's resolved body ALONE while
    // resolving `FROM <view>` (ViewResolution.resolve invokes checkAnalysis
    // on the child, with no View wrapper above it and no AnalysisContext
    // marker). That nested call is redundant for authorization — the outer
    // statement's own checkAnalysis walks the fully-resolved tree,
    // including every view body, and the View case below decides whether a
    // view grant covers its subtree. Skipping it here is what makes
    // view-as-security-layer possible: otherwise reading a GRANTED view
    // would demand base-table grants the reference model deliberately
    // doesn't require. Detected by caller (no public hook exists).
    val nestedViewBodyCheck = Thread.currentThread.getStackTrace
      .exists(_.getClassName.endsWith("analysis.ViewResolution$"))
    if (nestedViewBodyCheck) return

    def granted(names: Seq[String]): Boolean = names.exists { n =>
      val o = Privileges.normObj(n)
      // statement-scoped cover: a branch write the command layer already
      // authorized may plan copy-on-write reads of its own table's files
      Privileges.statementAuthorizedFor(o) ||
        principal.exists(u => Privileges.allowed(u, "select", o))
    }

    AuthorizeRule.firstDenied(plan, granted).foreach { obj =>
      throw new SecurityException(
        s"principal '${principal.map(_.name).getOrElse("<anonymous>")}' lacks " +
          s"SELECT on $obj (GRANT SELECT ON ... TO USER|ROLE ... to allow)")
    }
  }
}

object AuthorizeRule {

  private def candidates(p: LogicalPlan): Seq[String] = p match {
    case l: LogicalRelation =>
      val byTable = l.catalogTable.toSeq.flatMap(ct =>
        Seq(ct.identifier.unquotedString, ct.identifier.table))
      val byPath = l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      byTable ++ byPath
    case h: HiveTableRelation =>
      Seq(h.tableMeta.identifier.unquotedString, h.tableMeta.identifier.table)
    case d: DataSourceV2Relation =>
      Option(d.table).map(_.name()).toSeq
    case _ => Nil
  }

  /** Walk an ANALYZED plan with the given grant predicate: first object
    * the predicate denies, None when fully covered. Granted views cover
    * their subtrees (view-as-security-layer) — the same decision the
    * analysis-time check applies, reusable for DEFERRED re-validation
    * (reflection refresh re-checking its creating principal). */
  def firstDenied(plan: LogicalPlan,
                  granted: Seq[String] => Boolean): Option[String] = {
    def walk(p: LogicalPlan): Option[String] = p match {
      case v: View if granted(Seq(v.desc.identifier.unquotedString,
                                  v.desc.identifier.table)) =>
        // a granted view covers its subtree — base tables need no grant
        None
      case other =>
        val names = candidates(other)
        if (names.nonEmpty && !granted(names)) Some(names.head)
        else (other.children.iterator.map(walk) ++
          other.subqueries.iterator.map(walk)).collectFirst { case Some(o) => o }
    }
    walk(plan)
  }

  /** Does `user` hold SELECT over every relation in the plan? */
  def selectAuthorized(user: Privileges.User, plan: LogicalPlan): Boolean =
    firstDenied(plan, names => names.exists(n =>
      Privileges.allowed(user, "select", Privileges.normObj(n)))).isEmpty
}
