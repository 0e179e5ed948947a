package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixing: deterministic per-stratum sampling so a corpus
  * can be re-weighted (e.g. upsample code, downsample boilerplate) with
  * REPRODUCIBLE membership — every run, every engine, the same rows.
  * Systematic every-n-th selection inside each stratum replaces RNG
  * sampling: membership is a pure function of (stratum, rank), so the
  * mix is diffable and oracle-checkable, and there is no seed to drift.
  *
  * Scale: one window rank per stratum (hash-partitioned by the stratum
  * column — strata are few and large, so the sort is the per-partition
  * cost) followed by a codegen'd modulo filter. No collect, no RNG
  * state. A heavily skewed stratum (one giant language) sorts within
  * its own partitions only — the window key keeps parallelism at
  * #strata × shuffle partitions.
  */
object Mixing {

  /** Keep every n-th row per stratum, ranked by `idCol` (deterministic
    * tiebreak-free when ids are unique). `rates` maps stratum value →
    * n (1 = keep all); unlisted strata use `defaultEvery`. */
  def stratifiedEveryNth(df: DataFrame, stratumCol: String, idCol: String,
                         rates: Map[String, Int], defaultEvery: Int): DataFrame = {
    require(defaultEvery >= 1 && rates.values.forall(_ >= 1),
      "sampling rates must be >= 1")
    val rate: Column = rates.foldLeft(lit(defaultEvery)) { case (els, (v, n)) =>
      when(col(stratumCol) === v, lit(n)).otherwise(els)
    }
    val rn = row_number().over(
      Window.partitionBy(col(stratumCol)).orderBy(col(idCol)))
    df.withColumn("__g_rn", rn)
      .filter((col("__g_rn") - 1) % rate === 0)
      .drop("__g_rn")
  }
}
