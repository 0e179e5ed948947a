package graft.engine

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan spreading (optimization guide §2: derive the
  * partitioning from the input layout instead of trusting it).
  *
  * Problem: Spark fuses map-side work into the scan stage, and a scan's
  * parallelism is bounded by the source's ROW-GROUP layout — a parquet
  * file written as one row group can never be read by more than one task,
  * no matter what `maxPartitionBytes`/`minPartitionNum` say. The heavy
  * per-row operators (MinHash/SimHash signing, PQ encoding, tokenization,
  * feature hashing) then run their entire map phase on ONE core while the
  * rest of the machine idles.
  *
  * Fix: when (and only when) the scan's split count is below the session's
  * default parallelism, insert ONE round-robin exchange of the scanned
  * rows before the heavy projection. The gate makes it scale-adaptive:
  *  - at 100 TB the source has thousands of row groups, the gate never
  *    fires, and the plan is EXACTLY what it was (no added exchange);
  *  - on an under-split source the exchange moves only the scanned bytes
  *    (small by construction — that is why the layout under-split it) and
  *    buys cores× on all fused downstream map work;
  *  - the driver's low-core bench runs keep their proportions: the target
  *    is the session's own `defaultParallelism`, not a constant.
  *
  * Callers MUST be partition-order-independent (bounded-heap top-k with
  * total-order ties, integer-count aggregates, fixed-point quantized sums,
  * per-row projections) — every consumer in this repo that uses it argues
  * that in place. Kill switch: `spark.graft.spreadSmallScans=false`.
  */
object Parallelism {
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.spreadSmallScans", "true").toBoolean)
      return df
    val target = spark.sparkContext.defaultParallelism
    // split count of the as-planned input; explicit numPartitions keeps AQE
    // from coalescing the exchange back down to one partition
    val parts =
      try df.rdd.getNumPartitions
      catch { case _: Throwable => return df }
    if (parts >= target) df else df.repartition(target)
  }
}
