package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** COPY INTO with ON_ERROR semantics (reference:
  * `exec/planner/sql/handlers/query/CopyIntoTableContext.java:49` and the
  * `copy_errors` history table `exec/tablefunctions/copyerrors/`).
  *
  * Spark-native: PERMISSIVE parsing with a corrupt-record capture column;
  * good rows append to the target, bad rows are returned (and optionally
  * persisted) as the copy_errors analog. ON_ERROR modes:
  *  - "continue": load good rows, collect errors
  *  - "abort": any error fails the load (reference ON_ERROR 'ABORT')
  */
object CopyInto {

  final case class Result(loaded: Long, errors: Long, errorRows: DataFrame)

  private val corruptCol = "_corrupt_record"

  /** Read files with error capture. `format`: "csv" or "json". */
  def read(spark: SparkSession, path: String, format: String,
           schema: StructType, header: Boolean = true): DataFrame = {
    val withCorrupt = StructType(schema.fields :+ StructField(corruptCol, StringType))
    val r = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
    val df = format match {
      case "csv" => r.option("header", header.toString).csv(path)
      case "json" => r.json(path)
      case other => throw new IllegalArgumentException(s"unsupported COPY INTO format: $other")
    }
    // json keeps the corrupt line lazily; cache so good/bad split is stable
    df.cache()
  }

  def copyInto(spark: SparkSession, sourcePath: String, format: String,
               schema: StructType, targetDir: String,
               onError: String = "continue"): Result = {
    val df = read(spark, sourcePath, format, schema)
    // the cache only needs to live for this load: good/bad split + counts +
    // two writes. A long-lived ingest service doing many COPYs would
    // otherwise pin every parsed batch in executor memory until session end.
    try {
      val bad = df.filter(col(corruptCol).isNotNull).select(col(corruptCol).as("raw_record"))
      val good = df.filter(col(corruptCol).isNull).drop(corruptCol)
      val nBad = bad.count()
      if (onError == "abort" && nBad > 0)
        throw new IllegalStateException(s"COPY INTO aborted: $nBad malformed records")
      // Count the batch (cheap: df is cached), not the target — re-scanning the
      // target after every load is O(table) per ingest and would dominate at
      // 100 TB. `loaded` reports THIS batch's rows, matching the reference's
      // per-COPY job summary.
      val loaded = good.count()
      good.write.mode(SaveMode.Append).parquet(targetDir)
      // copy_errors history (reference exec/tablefunctions/copyerrors/): bad
      // rows persist next to the target with job metadata, queryable later
      val jobTs = System.currentTimeMillis()
      if (nBad > 0)
        bad.withColumn("job_ts_ms", lit(jobTs))
          .withColumn("source_path", lit(sourcePath))
          .write.mode(SaveMode.Append).parquet(errorsDir(targetDir))
      // errorRows reads back from the just-written history, NOT the cached
      // source: after unpersist, a corrupt-column-only query on raw files is
      // disallowed (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the parquet copy
      // is the durable record anyway
      val errorRows =
        if (nBad == 0) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("raw_record", StringType))))
        else copyErrors(spark, targetDir)
          .filter(col("job_ts_ms") === jobTs && col("source_path") === sourcePath)
          .select("raw_record")
      Result(loaded, nBad, errorRows)
    } finally df.unpersist()
  }

  private def errorsDir(targetDir: String): String =
    targetDir.stripSuffix("/") + "__copy_errors"

  /** The copy_errors history table for a target (reference
    * `SELECT * FROM TABLE(copy_errors('tbl'))`). Empty if no errors yet. */
  def copyErrors(spark: SparkSession, targetDir: String): DataFrame = {
    val dir = errorsDir(targetDir)
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
      spark.read.parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("raw_record", StringType),
          StructField("job_ts_ms", org.apache.spark.sql.types.LongType),
          StructField("source_path", StringType))))
  }
}
