package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join split (enabled in GraftSession) handles most runtime
  * skew; explicit salting remains the tool for pathological hot keys — the
  * classic power-law key problem at 100 TB (one customer with 10⁹ rows
  * lands on one task without it).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a deterministic salt in
    * [0, salts); the small side is replicated `salts` ways; the join key
    * becomes (key, salt), spreading each hot key over `salts` tasks.
    * Semantically identical to `large.join(small, key)` for 1:N joins
    * (small side unique on the key).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("_salt",
      pmod(hash(struct(large.columns.map(col): _*)), lit(salts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Top skewed key values by frequency — the diagnostic used to decide
    * whether a key needs salting (reference analog: per-column statistics
    * feeding the planner, `services/statistics`). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(topN)
}
