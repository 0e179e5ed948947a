package graft.explore

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.catalog.QueryHistory

/** Join recommendations from job history — the reference's
  * `JobsBasedRecommender.java:74-160`: for a target dataset, find every
  * equi-join any completed job ran against it, merge identical joins
  * (same other side, same key pairs, same join type), and rank by how
  * many jobs used the join and how recently. Observations come from
  * [[graft.catalog.QueryHistory]]'s per-action join analysis, so the
  * whole path is driver-side metadata — nothing touches the data path.
  *
  * Recommendations are oriented to the target: `keys` maps the target's
  * column to the other table's column even when history recorded the
  * target on the right side of the join.
  */
object JoinRecommender {

  final case class JoinReco(
      otherTable: String,
      joinType: String,
      keys: Seq[(String, String)], // targetColumn -> otherColumn
      jobCount: Long,
      lastUsedMs: Long)

  /** True when `table` (a catalog name, a path, or a bare fixture name)
    * identifies the observation-side identity `id`. */
  private[explore] def matches(table: String, id: String): Boolean = {
    val t = graft.accel.Reflections.normPath(table)
    id == table || id == t ||
      id.endsWith("/" + table) || id.endsWith("/" + table + ".parquet")
  }

  /** Ranked join recommendations for a dataset (`recommendJoins` —
    * `DatasetVersionResource.java:1306`). */
  def recommend(table: String): Seq[JoinReco] = {
    val oriented = QueryHistory.joinObservations.flatMap { o =>
      val asLeft =
        if (matches(table, o.leftTable))
          Some((o.rightTable, o.joinType, o.leftKeys.zip(o.rightKeys), o.tsMs))
        else None
      val asRight =
        if (matches(table, o.rightTable))
          Some((o.leftTable, o.joinType, o.rightKeys.zip(o.leftKeys), o.tsMs))
        else None
      asLeft.toSeq ++ asRight
    }
    oriented
      .groupBy { case (other, jt, keys, _) => (other, jt, keys.sorted) }
      .map { case ((other, jt, keys), uses) =>
        JoinReco(other, jt, keys, uses.size.toLong, uses.map(_._4).max)
      }
      .toSeq
      .sortBy(r => (-r.jobCount, -r.lastUsedMs, r.otherTable))
  }

  private val schema = StructType(Seq(
    StructField("other_table", StringType, nullable = false),
    StructField("join_type", StringType, nullable = false),
    StructField("target_keys", ArrayType(StringType), nullable = false),
    StructField("other_keys", ArrayType(StringType), nullable = false),
    StructField("job_count", LongType, nullable = false),
    StructField("last_used_ms", LongType, nullable = false)))

  /** The same ranking as a DataFrame (feeds the `join_recommendations`
    * table function). */
  def recommendDf(spark: SparkSession, table: String): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(recommend(table).map(r =>
        Row(r.otherTable, r.joinType, r.keys.map(_._1), r.keys.map(_._2),
          r.jobCount, r.lastUsedMs)): _*),
      schema)
}
