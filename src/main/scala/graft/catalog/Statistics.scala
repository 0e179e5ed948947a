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

  /** Equi-height histogram per numeric column (the reference's t-digest
    * histograms — `services/statistics/StatisticsServiceImpl.java:465` —
    * re-expressed as Spark CBO's native equi-height form, the shape
    * `FilterEstimation` consumes for range-predicate selectivity).
    *
    * Two distributed passes, same as Spark's own ANALYZE ... FOR COLUMNS
    * under `spark.sql.statistics.histogram.enabled`:
    *  1. ONE aggregate computes every column's bin endpoints
    *     (`percentile_approx` at 0, 1/b, …, 1) and non-null count;
    *  2. ONE aggregate computes every bin's NDV (`approx_count_distinct`
    *     restricted to the bin's interval).
    * Returns col → (height, bins[(lo, hi, ndv)]); height = nonNull / b
    * (equi-height by construction — each bin holds the same row mass, so
    * a range predicate's selectivity is bins-covered / b plus partial-bin
    * interpolation, robust to skew where min/max-linear is not). */
  /** The double-valued form CBO's estimator compares against: numerics
    * cast directly; DATE becomes epoch DAYS and TIMESTAMP epoch MICROS
    * (the units FilterEstimation converts date/timestamp literals to when
    * probing histogram bins). */
  private[catalog] def asCboDouble(f: StructField): Option[org.apache.spark.sql.Column] =
    f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      case DateType => Some(datediff(col(f.name),
        to_date(lit("1970-01-01"))).cast("double"))
      case TimestampType => Some(unix_micros(col(f.name)).cast("double"))
      case _ => None
    }

  def histograms(df: DataFrame, columns: Seq[String], bins: Int = 16,
                 percentileAccuracy: Int = 10000)
      : Map[String, (Double, Seq[(Double, Double, Long)])] = {
    require(bins >= 2, "a histogram needs at least 2 buckets")
    val exprsByCol: Map[String, org.apache.spark.sql.Column] =
      df.schema.fields
        .filter(f => columns.contains(f.name))
        .flatMap(f => asCboDouble(f).map(f.name -> _)).toMap
    val numeric = df.schema.fieldNames.filter(exprsByCol.contains).toSeq
    if (numeric.isEmpty) return Map.empty
    val probs = (0 to bins).map(_.toDouble / bins)
    val pass1 = numeric.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        percentile_approx(exprsByCol(c),
          array(probs.map(lit): _*), lit(percentileAccuracy)).as(s"ep_$i"),
        count(col(c)).as(s"nn_$i"))
    }
    val r1 = df.agg(pass1.head, pass1.tail: _*).head()
    val endpoints: Map[String, Seq[Double]] = numeric.zipWithIndex.map {
      case (c, i) => c -> Option(r1.getSeq[Double](r1.fieldIndex(s"ep_$i")))
        .getOrElse(Seq.empty)
    }.toMap
    val nonNull: Map[String, Long] = numeric.zipWithIndex.map {
      case (c, i) => c -> r1.getAs[Long](s"nn_$i")
    }.toMap
    val live = numeric.filter(c => endpoints(c).size == bins + 1 && nonNull(c) > 0)
    if (live.isEmpty) return Map.empty
    val pass2 = live.zipWithIndex.flatMap { case (c, i) =>
      val ep = endpoints(c)
      (0 until bins).map { j =>
        val v = exprsByCol(c)
        val in =
          if (j == 0) v >= lit(ep(0)) && v <= lit(ep(1))
          else v > lit(ep(j)) && v <= lit(ep(j + 1))
        approx_count_distinct(when(in, v)).as(s"bn_${i}_$j")
      }
    }
    val r2 = df.agg(pass2.head, pass2.tail: _*).head()
    live.zipWithIndex.map { case (c, i) =>
      val ep = endpoints(c)
      val bs = (0 until bins).map(j =>
        (ep(j), ep(j + 1), math.max(1L, r2.getAs[Long](s"bn_${i}_$j"))))
      c -> (nonNull(c).toDouble / bins, bs)
    }.toMap
  }

  /** Frequent items for one column (the reference's ItemsSketch surface):
    * exact top-k by count with a deterministic tiebreak. Two-phase
    * hash aggregate + a k-row ordered limit — no sketch needed until
    * cardinality makes the aggregate itself the bottleneck. */
  def frequentItems(df: DataFrame, column: String, k: Int): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(column))
      .limit(k)

  /** Frequent items for MANY string columns in ONE corpus pass: the
    * per-column form costs a full scan + shuffle each — at 100 TB an
    * ANALYZE over five categorical columns must not read the table five
    * times. One explode to (col, value) rows (map-side), one partial-
    * aggregated count shuffle keyed (col, value) — bounded by the
    * categorical-NDV gate upstream — then a per-column top-k window over
    * the tiny aggregate. Null values are excluded (they are the
    * profile's null count, not an item). Ties break by value, matching
    * [[frequentItems]]. */
  def frequentItemsMulti(df: DataFrame, columns: Seq[String],
                         k: Int): Map[String, Seq[(String, Long)]] = {
    if (columns.isEmpty) return Map.empty
    val pairs = df.select(explode(array(columns.map(c =>
      struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.c").as("c"), col("p.v").as("v"))
      .filter(col("v").isNotNull)
    val counts = pairs.groupBy(col("c"), col("v")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c")).orderBy(col("n").desc, col("v"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getAs[Int]("rk"))
          .map(r => (r.getString(1), r.getAs[Long]("n"))).toSeq
      }
  }
}
