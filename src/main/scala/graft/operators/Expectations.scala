package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative row constraints with quarantine
  * and same-pass metrics (the Delta Live Tables `EXPECT` / Great
  * Expectations pattern, re-expressed Spark-first). A 100 TB ingest
  * pipeline gates every batch on constraints; the naive implementation
  * scans twice (once to count violations, once to filter). Here:
  *
  *  - The violation bitmap is ONE array-of-booleans column computed once
  *    per row (codegen'd expression chain — no UDF).
  *  - Per-rule violation counts can ride the SAME job as the split via
  *    `Dataset.observe` ([[observed]]): zero extra scans, zero extra
  *    shuffles — the metrics arrive with the action that materializes
  *    the kept rows.
  *  - `keep`/`quarantine` are two filters over the one bitmap projection;
  *    upstream pushdown/pruning still applies because the bitmap is a
  *    deterministic narrow map.
  *
  * Actions follow the DLT contract: `warn` keeps the row (metric only),
  * `drop` quarantines it, `fail` aborts the batch when any row violates
  * ([[CheckResult.enforce]] / [[checkEnforced]]).
  */
object Expectations {

  /** One constraint: `predicate` must hold for a row to be clean.
    * `action`: "warn" | "drop" | "fail". */
  final case class Rule(name: String, predicate: Column, action: String = "warn") {
    require(Set("warn", "drop", "fail").contains(action),
      s"unknown expectation action '$action' (warn|drop|fail)")
  }

  /** Metrics name used with `Dataset.observe` by [[observed]]. */
  val ObservationName = "graft_expectations"

  final case class CheckResult(input: DataFrame, kept: DataFrame,
                               quarantined: DataFrame, rules: Seq[Rule]) {
    /** Per-rule violation metrics (rule, action, violations, rows,
      * pass_rate) — ONE aggregate over the input. */
    def metrics: DataFrame = metricsOf(rules, input)

    /** Throw if any `fail`-action rule has violations (one aggregate). */
    def enforce(): CheckResult = {
      val bad = metrics.filter(col("action") === "fail" && col("violations") > 0)
        .collect()
      if (bad.nonEmpty) {
        val msgs = bad.map(r => s"${r.getAs[String]("rule")}: " +
          s"${r.getAs[Long]("violations")} violation(s)").mkString("; ")
        throw new IllegalStateException(s"expectations failed: $msgs")
      }
      this
    }
  }

  /** A NULL predicate result counts as a violation: ANSI three-valued
    * logic must not wave unknowns through a quality gate. */
  private def violatedCol(rules: Seq[Rule]): Column =
    array(rules.map(r => not(coalesce(r.predicate, lit(false)))): _*)

  /** Split `df` by the rules: rows violating any `drop` or `fail` rule go
    * to `quarantined` (with a `violated_rules` array naming every failed
    * rule — warn violations included for triage); the rest are `kept`.
    * Warn-only violators stay in `kept` by the DLT contract. */
  /** Column names the check/quarantine machinery claims for itself —
    * withColumn would silently REPLACE same-named input columns, so they
    * refuse loudly instead (pipe gating reserves two more). */
  val ReservedColumns: Set[String] = Set("__viol", "violated_rules")

  def check(df: DataFrame, rules: Seq[Rule]): CheckResult = {
    require(rules.nonEmpty, "at least one expectation rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation rule names must be unique")
    val clash = df.columns.toSet.intersect(ReservedColumns)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with the expectation " +
        "machinery's reserved names — rename them upstream")
    val flagged = df.withColumn("__viol", violatedCol(rules))
    val gating = rules.zipWithIndex.filter(_._1.action != "warn")
    val anyGate = gating.map { case (_, i) => col("__viol")(i) }
      .reduceOption(_ || _).getOrElse(lit(false))
    val kept = flagged.filter(!anyGate).drop("__viol")
    val names = array(rules.map(r => lit(r.name)): _*)
    val quarantined = flagged.filter(anyGate)
      .withColumn("violated_rules",
        filter(zip_with(names, col("__viol"),
          (n, bad) => when(bad, n)), x => x.isNotNull))
      .drop("__viol")
    CheckResult(df, kept, quarantined, rules)
  }

  /** [[check]] + [[CheckResult.enforce]] in one call (fails the batch on
    * any `fail`-rule violation before the caller consumes the split). */
  def checkEnforced(df: DataFrame, rules: Seq[Rule]): CheckResult =
    check(df, rules).enforce()

  /** Per-rule metrics over `df` as ONE aggregate: (rule, action,
    * violations, rows, pass_rate). pass_rate is exact binary64
    * (violations and rows are integers below 2^53). */
  def metricsOf(rules: Seq[Rule], df: DataFrame): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(not(coalesce(r.predicate, lit(false))), 1L).otherwise(0L))
        .as(s"v_${r.name}")) :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__rows")
    val spark = df.sparkSession
    import spark.implicits._
    rules.map { r =>
      val viol = if (row.isNullAt(row.fieldIndex(s"v_${r.name}"))) 0L
                 else row.getAs[Long](s"v_${r.name}")
      (r.name, r.action, viol, total,
        if (total == 0) 1.0 else (total - viol).toDouble / total)
    }.toDF("rule", "action", "violations", "rows", "pass_rate")
  }

  /** Attach same-pass observed metrics to `df`: per-rule violation counts
    * + row count ride the NEXT action on the returned frame via
    * `Dataset.observe` — read them from `observedMetrics` under
    * [[ObservationName]] (QueryExecutionListener or
    * StreamingQueryProgress). The zero-extra-scan path for streaming
    * pipes and CTAS ingests. */
  def observed(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(not(coalesce(r.predicate, lit(false))), 1L).otherwise(0L))
        .as(s"violations_${r.name}")) :+ count(lit(1)).as("rows")
    df.observe(ObservationName, aggs.head, aggs.tail: _*)
  }
}
