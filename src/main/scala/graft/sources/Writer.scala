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
}
