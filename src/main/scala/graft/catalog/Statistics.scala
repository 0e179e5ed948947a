package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column statistics / profiling (the reference's statistics service —
  * dremio-oss `services/statistics/StatisticsServiceImpl.java:76`: ANALYZE
  * TABLE computes row counts, NDV via HLL, t-digest histograms and
  * frequent items, feeding the cost model).
  *
  * Spark-first shape: ONE distributed aggregation pass computes every
  * column's metrics simultaneously (count / NDV / min / max are all
  * partial-aggregable, so the pass is map-side combined and shuffles one
  * row per partition); the driver receives exactly one row of aggregates
  * and pivots it into the long-format profile. Nothing is collected but
  * that row — profiling a 100 TB table costs one scan.
  *
  * `exactNdv = false` (default, the scale path) uses HLL
  * (`approx_count_distinct`, the reference's NDV sketch); `true` uses
  * COUNT(DISTINCT) — exact, oracle-comparable, but each distinct agg adds
  * an Expand duplication of the input, so reserve it for profiling
  * samples or narrow column sets.
  */
object Statistics {

  /** Per-column profile: (col_name, n_rows, n_nulls, ndv, min_value,
    * max_value) — min/max rendered as strings so one schema fits every
    * column type. Rows ordered by column name. */
  def profile(df: DataFrame, exactNdv: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"cnt_$i"),
        (if (exactNdv) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"ndv_$i"),
        min(col(c)).cast("string").as(s"mn_$i"),
        max(col(c)).cast("string").as(s"mx_$i"))
    } :+ count(lit(1)).as("n_rows")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = r.getAs[Long]("n_rows")
    val rows = cols.zipWithIndex.sortBy(_._1).map { case (c, i) =>
      Row(c, nRows, nRows - r.getAs[Long](s"cnt_$i"), r.getAs[Long](s"ndv_$i"),
        r.getAs[String](s"mn_$i"), r.getAs[String](s"mx_$i"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 1),
      StructType(Seq(
        StructField("col_name", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("ndv", LongType, nullable = false),
        StructField("min_value", StringType, nullable = true),
        StructField("max_value", StringType, nullable = true))))
  }

  /** Frequent items for one column (the reference's ItemsSketch surface):
    * exact top-k by count with a deterministic tiebreak. Two-phase
    * hash aggregate + a k-row ordered limit — no sketch needed until
    * cardinality makes the aggregate itself the bottleneck. */
  def frequentItems(df: DataFrame, column: String, k: Int): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(column))
      .limit(k)
}
