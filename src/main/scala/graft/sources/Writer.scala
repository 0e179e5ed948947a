package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** CTAS / INSERT write paths (reference WriterOperator.java:52 +
  * WriterCommitterPOP: parquet writers with partitioning/distribution).
  *
  * Scale notes: `partitionBy` maps to the reference's partition-distribute
  * writer; `sortBy` within partitions gives clustered files (the analog of
  * the reference's writer distribution traits) so downstream scans prune
  * both by directory and by row-group stats.
  */
object Writer {

  def ctas(df: DataFrame, path: String,
           partitionCols: Seq[String] = Nil,
           sortCols: Seq[String] = Nil,
           mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sorted =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(df.col): _*) else df
    val w = sorted.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  def insertInto(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** MERGE-by-key (upsert): delta rows replace target rows with the same
    * key; everything else is kept. The reference gets MERGE/UPDATE/DELETE
    * atomicity from Iceberg/Delta table formats; here a graft-lake table
    * (SnapshotTable) supplies the same guarantee — a single atomic log
    * commit, in-flight readers keep the pre-merge snapshot. Plain parquet
    * directories fall back to the staged delete+rename swap (non-atomic —
    * a crash between delete and rename loses the target; upgrade the table
    * to a lake table to close the window).
    *
    * Scale note: with a partitioned target, pair with dynamic-partition
    * overwrite (see Reflections.refreshIncremental) so the rewrite cost is
    * O(touched partitions), not O(table).
    */
  def mergeByKey(delta: DataFrame, path: String, key: String): Unit = {
    val spark = delta.sparkSession
    if (SnapshotTable.isLakeTable(path)) {
      SnapshotTable.forPath(spark, path).mergeByKey(delta, key)
      return
    }
    val target = spark.read.parquet(path)
    val merged = target
      .join(delta.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(delta)
    // parquet has no atomic swap: stage, then replace (a table format
    // supplies the real atomicity — documented divergence)
    val staged = path + "__staged"
    merged.write.mode(SaveMode.Overwrite).parquet(staged)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(staged), p)
    spark.catalog.refreshByPath(path)
  }
}
