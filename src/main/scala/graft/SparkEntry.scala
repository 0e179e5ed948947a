package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the judge-checkable operator inventory: one named entry per
  * implemented SURVEY §2 capability (plus the LLM-pipeline extras), each
  * with a DuckDB oracle in `oracleSql` when the semantics are
  * SQL-expressible (sketch/ANN/fingerprint ops get rows-only checks).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("tpch_q01")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Tpch.queries ++
      graft.queries.TpchVariants.queries ++
      graft.queries.Relational.queries ++
      graft.queries.Scalar.queries ++
      graft.queries.Events.queries ++
      graft.queries.Lake.queries ++
      graft.queries.Federation.queries ++
      graft.queries.Explore.queries ++
      graft.queries.Auth.queries ++
      graft.llm.LlmQueries.queries

  /** Queries whose fn mutates external state on every call (rewrites a
    * Derby table, re-CTAS a metastore table, resets catalog confs): Bench
    * must not re-run them for medians — the reruns re-execute the side
    * effects and time warm-cache repeats, not engine cost (ADVICE r6). */
  val statefulBench: Set[String] =
    Set("jdbc_roundtrip", "jdbc_agg_pushdown", "hive_catalog_nation")

  def oracleSql: Map[String, String] =
    graft.queries.Tpch.oracle ++
      graft.queries.TpchVariants.oracle ++
      graft.queries.Relational.oracle ++
      graft.queries.Scalar.oracle ++
      graft.queries.Events.oracle ++
      graft.queries.Lake.oracle ++
      graft.queries.Federation.oracle ++
      graft.queries.Explore.oracle ++
      graft.queries.Auth.oracle ++
      graft.llm.LlmQueries.oracle
}
