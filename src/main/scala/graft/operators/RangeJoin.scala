package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — points matched to the intervals
  * `[start, end)` that contain them, with optional equality keys.
  *
  * The reference plans pure range predicates as a nested-loop join (SURVEY
  * §2.3, NLJEOperator) — O(|points|·|intervals|) per key group, which dies
  * at scale when key groups are large. This operator turns the range
  * predicate into a shuffled EQUI-join by time-bucketing both sides:
  * each interval is exploded to the epoch bins it covers (for spans
  * bounded by ~binSeconds that is 1-2 rows — constant amplification),
  * each point hashes to exactly one bin, and the join runs as a plain
  * shuffled hash/sort-merge join on (keys…, bin) with the exact range
  * predicate as a codegen'd post-filter. No bin of a given interval can
  * match the same point twice (bins partition time), so no dedup pass is
  * needed. Pick binSeconds ≈ the typical interval span: amplification is
  * ceil(span/bin)+1 copies of each interval row.
  *
  * At 100 TB: shuffle keys are (key, bin) — cardinality grows with time
  * range, so partitions stay balanced even when one equality key is hot,
  * and AQE's skew split handles residual hot bins.
  */
object RangeJoin {

  /** @param points     one row per point; must share `keys` with intervals,
    *                    other column names disjoint from intervals'
    * @param intervals  one row per interval with `[startCol, endCol)` bounds
    * @param pointTs    timestamp column of `points`
    * @param binSeconds equi-join bucket width in seconds
    * @return inner join: one row per (point, containing interval) pair with
    *         all columns from both sides
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointTs: String, startCol: String, endCol: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val overlap = points.columns.toSeq.filterNot(keys.contains)
      .intersect(intervals.columns.toSeq.filterNot(keys.contains))
    require(overlap.isEmpty, s"non-key columns collide across sides: $overlap")

    val BIN = "__graft_range_bin"
    def binOf(c: Column): Column = floor(unix_timestamp(c) / binSeconds)

    val iv = intervals.withColumn(
      BIN, explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    val pt = points.withColumn(BIN, binOf(col(pointTs)))
    pt.join(iv, keys :+ BIN)
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop(BIN)
  }
}
