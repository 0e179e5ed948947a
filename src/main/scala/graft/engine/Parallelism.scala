package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import scala.util.control.NonFatal

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
  * Probe (r16 ADVICE / r16 verdict item 7): the split count comes from the
  * ANALYZED LOGICAL plan plus the source's file layout — replaying Spark's
  * own `FilePartition.maxSplitBytes` arithmetic over the `FileIndex`
  * metadata — NOT from `df.rdd`. The old `df.rdd` probe physical-planned
  * the subtree a second time and, under AQE, `getFinalPhysicalPlan`
  * eagerly EXECUTED every shuffle stage in the input at
  * DataFrame-construction time. The walk accepts only narrow operators
  * (project/filter/generate/union/alias) over leaf scans; any plan with
  * its own exchange upstream (join/aggregate/window/sort) returns None and
  * is left alone — those already run at shuffle-partition parallelism, so
  * the old probe's answer ("post-shuffle partitions ≥ target → no-op")
  * is preserved without planning or running anything.
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
    val probed =
      try plannedSplits(df.queryExecution.analyzed, spark)
      catch { case NonFatal(_) => None }
    probed match {
      case Some((parts, bytes)) =>
        // Fan-out is SIZED FROM THE INPUT, not blindly defaultParallelism:
        // r17 cap-sweep A/Bs (SCALING.md) show a sub-MB input over-fanned
        // to 32 partitions runs SLOWER than unspread (per-task scheduling
        // + per-task expression-state init dominate), while 4–16 tasks
        // beat both. One task per `spreadBytesPerTask` (default 64 KB —
        // these consumers do orders of magnitude more CPU per byte than a
        // plain scan), clamped to the session's parallelism; unknown-size
        // inputs (checkpointed RDDs, local relations) keep the full
        // parallelism target. The conf parameterizes the floor for other
        // deployments; at 100 TB the gate below still never fires.
        val maxT = math.min(spark.sparkContext.defaultParallelism,
          spark.conf.get("spark.graft.spreadCap", Int.MaxValue.toString).toInt)
        val perTask =
          spark.conf.get("spark.graft.spreadBytesPerTask", (64 * 1024).toString).toLong
        val target = bytes match {
          case Some(b) => math.max(1L, math.min(maxT.toLong,
            (b + perTask - 1) / perTask)).toInt
          case None => maxT
        }
        // explicit numPartitions keeps AQE from coalescing the exchange
        // back down to one partition
        if (parts >= target) df else df.repartition(target)
      case None => df
    }
  }

  /** Planned (split count, total source bytes when knowable) of a narrow
    * scan subtree, or None when the plan brings its own exchange (then
    * spreading is a no-op by design). */
  private def plannedSplits(plan: LogicalPlan,
                            spark: SparkSession): Option[(Long, Option[Long])] =
    plan match {
      case p: Project       => plannedSplits(p.child, spark)
      case f: Filter        => plannedSplits(f.child, spark)
      case g: Generate      => plannedSplits(g.child, spark)
      case a: SubqueryAlias => plannedSplits(a.child, spark)
      case v: View          => plannedSplits(v.child, spark)
      case u: Union =>
        val cs = u.children.map(plannedSplits(_, spark))
        if (cs.forall(_.isDefined)) {
          val got = cs.flatten
          val bytes = if (got.forall(_._2.isDefined)) Some(got.flatMap(_._2).sum)
                      else None
          Some((got.map(_._1).sum, bytes))
        } else None
      case r: LogicalRelation =>
        r.relation match {
          case fs: HadoopFsRelation =>
            Some((fileSplits(fs, spark), Some(fs.location.sizeInBytes)))
          case _ => None
        }
      case r: Range =>
        Some((r.numSlices.getOrElse(spark.sparkContext.defaultParallelism).toLong,
          None))
      case r: Repartition =>
        // round-robin repartition: exact; coalesce: min(child, n) -- or n
        // alone as an upper bound when the child is opaque (an upper bound
        // below target still proves under-split; above it we conservatively
        // leave the plan alone)
        val c = plannedSplits(r.child, spark)
        val parts =
          if (r.shuffle) r.numPartitions.toLong
          else c.map(v => math.min(v._1, r.numPartitions.toLong))
            .getOrElse(r.numPartitions.toLong)
        Some((parts, c.flatMap(_._2)))
      case l: LogicalRDD   => Some((l.rdd.getNumPartitions.toLong, None))
      case l: LocalRelation =>
        // LocalTableScanExec parallelizes rows over min(#rows, default
        // parallelism) slices -- replicate so tiny literal tables never
        // trigger a pointless exchange
        Some((math.min(math.max(l.data.length, 1),
          spark.sparkContext.defaultParallelism).toLong, None))
      case _ => None
    }

  /** Spark's scan-split arithmetic (`FilePartition.maxSplitBytes` + split
    * packing) replayed over the FileIndex metadata: no listing beyond what
    * the scan itself will do (the index caches it), no plan construction. */
  private def fileSplits(fs: HadoopFsRelation, spark: SparkSession): Long = {
    val conf = spark.sessionState.conf
    val openCost = math.max(1L, conf.filesOpenCostInBytes)
    val nFiles = fs.location.inputFiles.length.toLong
    val padded = fs.location.sizeInBytes + nFiles * openCost
    val minParts =
      conf.filesMinPartitionNum.getOrElse(spark.sparkContext.defaultParallelism)
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, padded / math.max(1, minParts)))
    math.max(if (nFiles == 0) 0L else 1L, (padded + maxSplit - 1) / maxSplit)
  }
}
