package graft.auth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col

import scala.collection.concurrent.TrieMap

/** Row-access and column-masking policies (reference
  * `SqlAlterTableAddRowAccessPolicy` / `SqlAlterTableSetColumnMasking`,
  * grammar `alter.ftl:92,162`; a policy = a boolean/scalar UDF applied to
  * named columns, `parser/SqlPolicy.java`).
  *
  * Enforcement model — the dataset IS the security layer, like the
  * reference's catalog: attaching a policy re-registers the dataset's
  * view as `base → filter(rowPolicy) → project(maskPolicies)`, so every
  * entry point (in-process SQL, Thrift, Connect, REST) sees the rewritten
  * plan with zero analyzer hooks and no per-query rewrite cost. The row
  * policy is evaluated on UNMASKED values (the Snowflake/reference
  * ordering), then masked columns are replaced in the output projection.
  *
  * Policy functions are ordinary SQL UDFs (`CREATE FUNCTION`, expanded at
  * plan time — nothing interpreted survives into execution) and may call
  * the context functions (`query_user()`, `is_member()`) to vary by
  * principal, which is exactly how the reference's policy UDFs
  * discriminate users. Policy DDL itself is admin-gated while
  * enforcement is on, like the rest of the auth DDL.
  */
object Policies {

  final case class Policy(fn: String, args: Seq[String]) {
    def sql: String = s"$fn(${args.mkString(", ")})"
  }

  /** Per-dataset state: the view's original (pre-policy) plan plus the
    * attached policies — kept so policies compose and detach cleanly. */
  private final case class Entry(base: LogicalPlan,
                                 row: Option[Policy],
                                 masks: Map[String, Policy])

  /** Registry scoped PER SESSION, like the temp views policies rewrite:
    * two wire sessions each defining a view `accounts` must not share
    * policy state (a name-keyed global would let one session's detach
    * restore the OTHER session's base plan). Weak keys let a closed
    * session's entries be collected with it. */
  private val bySession =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, TrieMap[String, Entry]]())

  private def entriesOf(spark: SparkSession): TrieMap[String, Entry] =
    bySession.synchronized {
      var m = bySession.get(spark)
      if (m == null) { m = TrieMap.empty[String, Entry]; bySession.put(spark, m) }
      m
    }

  private def requireAdminForPolicy(spark: SparkSession, what: String): Unit =
    if (Privileges.enforcing) Privileges.requireAdmin(spark, what)

  private def currentEntry(spark: SparkSession, view: String): Entry =
    entriesOf(spark).getOrElse(view.toLowerCase, {
      val cat = spark.sessionState.catalog
      val id = spark.sessionState.sqlParser.parseTableIdentifier(view)
      val plan = cat.getTempView(id.table)
        .orElse(cat.getGlobalTempView(id.table))
        .getOrElse(throw new IllegalArgumentException(
          s"unknown dataset: $view (policies attach to registered views)"))
      // strip the view's own wrapper nodes: the captured plan re-registers
      // under the hidden base name, and a retained View(<name>) marker
      // would trip Spark's cyclic-view check (<name> → base → <name>)
      def strip(p: LogicalPlan): LogicalPlan = p match {
        case v: org.apache.spark.sql.catalyst.plans.logical.View => strip(v.child)
        case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => strip(s.child)
        case other => other
      }
      Entry(strip(plan), None, Map.empty)
    })

  private def hiddenName(view: String): String =
    s"__graft_policy_base_${view.toLowerCase}"

  /** Re-register the view as base → row-filter → mask-projection.
    *
    * The policy view is created from SQL TEXT (not a Dataset): Spark
    * re-analyzes text-defined temp views on every use, so the
    * `graft_principal()` calls inside policy UDFs fold to the CURRENT
    * querying principal per statement — a Dataset-registered view would
    * freeze the registrar's identity into the stored analyzed plan. The
    * original dataset plan moves under a hidden `__graft_policy_base_*`
    * name the text references. The row filter runs in the WHERE (against
    * UNMASKED base columns — the reference/Snowflake ordering), masks in
    * the projection. */
  private def applyEntry(spark: SparkSession, view: String, e: Entry): Unit = {
    if (e.row.isEmpty && e.masks.isEmpty) {
      org.apache.spark.sql.graft.Bridge.ofRows(spark, e.base)
        .createOrReplaceTempView(view)
      spark.catalog.dropTempView(hiddenName(view))
      entriesOf(spark).remove(view.toLowerCase)
    } else {
      org.apache.spark.sql.graft.Bridge.ofRows(spark, e.base)
        .createOrReplaceTempView(hiddenName(view))
      val select = e.base.output.map(_.name).map { c =>
        e.masks.get(c.toLowerCase) match {
          case Some(p) => s"${p.sql} AS `$c`"
          case None => s"`$c`"
        }
      }.mkString(", ")
      val where = e.row.map(p => s" WHERE ${p.sql}").getOrElse("")
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW `$view` AS " +
        s"SELECT $select FROM `${hiddenName(view)}`$where")
      entriesOf(spark).put(view.toLowerCase, e)
    }
  }

  /** ALTER TABLE ... ADD ROW ACCESS POLICY fn(cols). */
  def addRowPolicy(spark: SparkSession, view: String, p: Policy): Unit = {
    requireAdminForPolicy(spark, s"ADD ROW ACCESS POLICY on $view")
    val e = currentEntry(spark, view)
    require(e.row.isEmpty,
      s"$view already has row access policy ${e.row.get.sql} — drop it first")
    validate(spark, e.base, p)
    applyEntry(spark, view, e.copy(row = Some(p)))
  }

  /** ALTER TABLE ... DROP ROW ACCESS POLICY fn. */
  def dropRowPolicy(spark: SparkSession, view: String, fn: String): Unit = {
    requireAdminForPolicy(spark, s"DROP ROW ACCESS POLICY on $view")
    val e = currentEntry(spark, view)
    require(e.row.exists(_.fn.equalsIgnoreCase(fn)),
      s"$view has no row access policy $fn")
    applyEntry(spark, view, e.copy(row = None))
  }

  /** ALTER TABLE ... MODIFY COLUMN c SET MASKING POLICY fn(cols). */
  def setMasking(spark: SparkSession, view: String, column: String, p: Policy): Unit = {
    requireAdminForPolicy(spark, s"SET MASKING POLICY on $view.$column")
    val e = currentEntry(spark, view)
    val colNames = e.base.output.map(_.name)
    require(colNames.exists(_.equalsIgnoreCase(column)),
      s"$view has no column $column (have: ${colNames.mkString(", ")})")
    validate(spark, e.base, p)
    applyEntry(spark, view, e.copy(masks = e.masks + (column.toLowerCase -> p)))
  }

  /** ALTER TABLE ... MODIFY COLUMN c UNSET MASKING POLICY fn. */
  def unsetMasking(spark: SparkSession, view: String, column: String, fn: String): Unit = {
    requireAdminForPolicy(spark, s"UNSET MASKING POLICY on $view.$column")
    val e = currentEntry(spark, view)
    require(e.masks.get(column.toLowerCase).exists(_.fn.equalsIgnoreCase(fn)),
      s"$view.$column has no masking policy $fn")
    applyEntry(spark, view, e.copy(masks = e.masks - column.toLowerCase))
  }

  /** Policy args must be base columns (or literals) and the function must
    * resolve — fail at DDL time, not first query. */
  private def validate(spark: SparkSession, base: LogicalPlan, p: Policy): Unit = {
    val colNames = base.output.map(_.name.toLowerCase).toSet
    val unknownCols = p.args.filter(a =>
      a.matches("[A-Za-z_][A-Za-z0-9_]*") && !colNames.contains(a.toLowerCase))
    require(unknownCols.isEmpty,
      s"policy ${p.sql} references unknown columns: ${unknownCols.mkString(", ")}")
    // resolution probe — throws AnalysisException on a missing function
    org.apache.spark.sql.graft.Bridge.ofRows(spark, base)
      .select(org.apache.spark.sql.functions.expr(p.sql)).queryExecution.analyzed
  }

  /** sys_policies / SHOW POLICIES: this session's attached policies. */
  def list(spark: SparkSession): Seq[(String, String, String)] =
    entriesOf(spark).toSeq.sortBy(_._1).flatMap { case (v, e) =>
      e.row.map(p => (v, "row_access", p.sql)).toSeq ++
        e.masks.toSeq.sortBy(_._1).map { case (c, p) => (v, s"masking:$c", p.sql) }
    }

  def clear(): Unit = bySession.synchronized(bySession.clear())
}
