package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {
  /** Driver contract: a named query over the fixture dir. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** Exact-arithmetic helpers for oracle (DuckDB) hash-parity.
    *
    * The fixtures store money/ratio columns as doubles; summing doubles is
    * order-dependent, so a Spark sum and a DuckDB sum can differ in the last
    * ulp. Casting to decimal first makes every aggregate exact (both engines
    * implement exact decimal arithmetic), and the final cast back to double
    * is deterministic because all our magnitudes stay under 15 significant
    * digits. The same casts appear verbatim in the oracle SQL.
    */
  def money(c: Column): Column = c.cast(DecimalType(12, 2)) // prices ≤ ~1e7
  def pct(c: Column): Column = c.cast(DecimalType(4, 2))    // discount/tax ∈ [0, 1.1]
  def dbl(c: Column): Column = c.cast("double")

  /** NTZ timestamp literal (fixture timestamps are timestamp_ntz). */
  def tsLit(s: String): Column = lit(s).cast("timestamp_ntz")
}
