package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** One committed snapshot transition in a lake table's log. */
final case class LakeCommit(
    version: Long,
    action: String, // "append" | "overwrite"
    timestampMs: Long,
    schemaDdl: String,
    files: Seq[String], // data files, relative to the table root
    // per-file column stats for manifest-level pruning:
    // file -> column -> (min, max) as strings (numeric cols compare as
    // doubles at scan time)
    stats: Map[String, Map[String, (String, String)]] = Map.empty,
    // idempotency tag: a commit attempt with an already-present tag is a
    // no-op (exactly-once for replayed streaming micro-batches)
    tag: String = "",
    // stable field ids (column name -> id), the Iceberg column-identity
    // model: a RENAME maps a new name to the SAME id, so files written
    // before the rename still serve their values under the new name (a
    // name-based read would NULL them). Empty on legacy commits — replay
    // backfills ids by name inheritance (exact, because renames can only
    // be produced by code that always records ids).
    fieldIds: Map[String, Int] = Map.empty,
    // partition-transform spec in force for this commit's files (string
    // forms parsed by PartitionTransform.parse); files carry their
    // transform value ranges in `stats` keyed by the transform repr
    partitionSpec: Seq[String] = Nil,
    // plain min/max stats columns this commit recorded — persisted so
    // copy-on-write rewrites (DML/compaction) re-cluster and re-record
    // the same stats instead of silently degrading future pruning
    statsCols: Seq[String] = Nil,
    // declared per-file sort order for this commit's files (Iceberg
    // write sort order): sticky like partitionSpec — DML rewrites and
    // layout-inheriting appends re-sort by it, so a sorted bucketed
    // table stays merge-join-ready across its lifetime. Per-file truth
    // lives in the `__sort` stats marker; this is the declared intent.
    sortSpec: Seq[String] = Nil,
    // table properties (reference SqlAlterTableProperties / Iceberg table
    // properties): None = this commit inherits, Some(m) = this commit
    // DECLARES the full current property map (Some(empty) = cleared —
    // distinct from inherit, so UNSET of the last key sticks)
    tableProps: Option[Map[String, String]] = None)

/** Iceberg-lite snapshot table format ("graft-lake"): a parquet directory
  * plus an append-only commit log of JSON snapshot files under
  * `_graft_log/` — the minimal re-expression of the reference's
  * snapshot/manifest design (Iceberg three-stage scan
  * `sabot/kernel/.../exec/store/iceberg/IcebergScanPrel.java:96`, commit-log
  * reading `DeltaLogCommitJsonReader.java`).
  *
  * Semantics:
  *  - A commit is `v%08d.json` naming the data files it adds (append) or
  *    the complete new file set (overwrite). Data files are immutable and
  *    written under per-commit subdirectories BEFORE the commit file
  *    appears, so a crash mid-write leaves only unreferenced orphans — the
  *    log never points at partial data (the crash window the plain
  *    delete+rename swap in `Writer.mergeByKey` had).
  *  - Publishing is serialized by an OS advisory file lock on
  *    `_graft_log/commit.lock` (`withCommitLock`): versions become visible
  *    strictly in order, idempotency-tagged replays commit exactly once,
  *    and a crashed holder's lock is released by the kernel — no staleness
  *    window. Data files stage BEFORE the lock, so the critical section is
  *    one log read + one JSON publish.
  *  - Readers resolve a snapshot's file list ONCE (at DataFrame
  *    construction); later commits never mutate previously committed files,
  *    so in-flight readers keep a consistent view (snapshot isolation).
  *  - Time travel: `VERSION AS OF` / `TIMESTAMP AS OF` replay the log up to
  *    the requested version/timestamp.
  *
  * Scale notes: the log holds file NAMES, not data. Snapshot resolution is
  * cached per JVM (one directory listing when the log is unchanged) and
  * checkpointed every CheckpointInterval commits (cold start reads one
  * checkpoint + the suffix, not every commit since creation); the scan
  * itself is a multi-file parquet read through LakeFileIndex that keeps
  * pushdown/pruning/vectorization and adds manifest-stats file pruning.
  * Compaction (rewriting many small appended files into few) is an
  * `overwrite` commit of the same rows.
  */
final class SnapshotTable private (spark: SparkSession, val dir: String) {
  import SnapshotTable._

  private def logDir: LakeIO.LPath = LakeIO.path(dir, LogDirName)

  /** Full commit log, resolved with two scalability devices (the Delta/
    * Iceberg metadata model — current-pointer + checkpoints — re-expressed
    * for a file log):
    *  - a JVM-wide incremental cache keyed by the log's latest file name:
    *    an unchanged log costs one directory listing and ZERO file reads;
    *    new commits parse only the suffix the cache hasn't seen. Commit and
    *    read latency stays flat as the table ages (was O(commits) per op,
    *    O(commits²) over a table's life).
    *  - a periodic checkpoint (`ckpt-v%08d.json`, every CheckpointInterval
    *    commits, written inside the commit lock) holding the whole replayed
    *    log in one file, so a COLD resolution reads 1 checkpoint + the
    *    commits after it, not every commit file since table creation.
    * The log is append-only and data files are immutable, so cache entries
    * can never go stale: a longer log always extends a shorter prefix. */
  def commits: Seq[LakeCommit] =
    if (!LakeIO.isDirectory(logDir)) Nil
    else {
      val names = LakeIO.listNames(logDir)
        .filter(_.matches("v\\d{8}\\.json")).sorted
      if (names.isEmpty) Nil
      else {
        val key = logDir.toString
        def stat(n: String): (Long, Long) =
          try
            // nanosecond mtime where the FS provides it (ext4/xfs do;
            // Hadoop-backed stores report milliseconds) — coarse
            // granularity could validate a same-size commit file
            // recreated within the same tick
            LakeIO.sizeAndMtimeNanos(logDir.resolve(n))
          catch { case _: java.io.IOException => (-1L, -1L) }
        val prefix: Vector[LakeCommit] = Option(SnapshotTable.logCache.get(key)) match {
          case Some((last, lastSize, lastMtime, vec)) if vec.size <= names.size &&
            names.lift(vec.size - 1).contains(last) &&
            stat(last) == ((lastSize, lastMtime)) => vec
          case _ => checkpointPrefix(names.size)
        }
        val fresh = names.drop(prefix.size).map { n =>
          commitFilesParsed.incrementAndGet()
          parseCommit(LakeIO.readString(logDir.resolve(n)))
        }
        val all = prefix ++ fresh
        if (fresh.nonEmpty) {
          val (sz, mt) = stat(names.last)
          SnapshotTable.logCache.put(key, (names.last, sz, mt, all))
        }
        all
      }
    }

  /** Longest checkpointed prefix not exceeding the live log length
    * (a checkpoint beyond the listing would mean a listing race — fall back
    * to replaying commit files, which is always correct). */
  private def checkpointPrefix(liveCount: Int): Vector[LakeCommit] = {
    val ckpts = LakeIO.listNames(logDir)
      .filter(_.matches("ckpt-v\\d{8}\\.json")).sorted
    ckpts.reverseIterator
      .flatMap { n =>
        // a checkpoint deleted by a concurrent writer's cleanup between the
        // listing and this read is simply skipped — older ones / raw
        // commits still serve
        try Some(parseCheckpoint(LakeIO.readString(logDir.resolve(n))))
        catch { case _: java.io.IOException => None }
      }
      .find(cs => cs.size <= liveCount && cs.lastOption.forall(_.version == cs.size))
      .getOrElse(Vector.empty)
  }

  def latestVersion: Long = commits.lastOption.map(_.version).getOrElse(0L)

  /** Commits visible at a version / timestamp (None → latest). */
  private def visibleCommits(version: Option[Long],
                             asOfTsMs: Option[Long]): Seq[LakeCommit] = {
    val all = commits
    val visible = (version, asOfTsMs) match {
      case (Some(v), _)  => all.takeWhile(_.version <= v)
      case (_, Some(ts)) =>
        // state as of ts = everything up to the LAST commit with
        // timestamp <= ts. publish() clamps timestamps monotonic, but scan
        // (not takeWhile) so logs predating the clamp still travel right.
        val idx = all.lastIndexWhere(_.timestampMs <= ts)
        all.take(idx + 1) // idx = -1 → empty → require below reports it
      case _             => all
    }
    require(visible.nonEmpty,
      s"no snapshot at version=$version asOfTs=$asOfTsMs in $dir (latest=$latestVersion)")
    version.foreach(v => require(v <= all.last.version,
      s"VERSION AS OF $v is beyond latest ${all.last.version} in $dir"))
    visible
  }

  /** File set + schema visible at a version / timestamp (None → latest),
    * by replaying the log: append accumulates, overwrite resets. */
  def snapshot(version: Option[Long] = None,
               asOfTsMs: Option[Long] = None): (Seq[String], StructType) = {
    val (files, schema) = snapshotWithStats(version, asOfTsMs)
    (files.map(_._1), schema)
  }

  /** Like `snapshot`, but each file carries its manifest stats (column →
    * (min, max)) from the commit that added it — the input LakeFileIndex
    * needs for plan-time pruning. */
  def snapshotWithStats(version: Option[Long] = None, asOfTsMs: Option[Long] = None)
      : (Seq[(String, Map[String, (String, String)])], StructType) = {
    val (entries, schema, _) = replayEntries(visibleCommits(version, asOfTsMs))
    (entries.map(e => (e.path, e.stats)), schema)
  }

  /** Snapshot row count from manifest `__rows` stats alone (zero data
    * reads); None when any live file predates row-count recording —
    * callers that need a guaranteed count fall back to `read().count()`.
    * Sizing decisions (compaction targets, file counts) should prefer
    * this: at billion-row state a sizing count would cost more than the
    * operation it sizes. Same rule as the scan-side
    * [[LakeFileIndex.manifestRowCount]] — ONE definition
    * ([[SnapshotTable.rowsFromStats]]) so the metadata-count optimizer
    * and maintenance sizing can never disagree. */
  def manifestRowCount: Option[Long] =
    SnapshotTable.rowsFromStats(snapshotWithStats()._1.map(_._2))

  /** Rows added by one specific commit, from its manifest `__rows` entries
    * (zero Spark jobs; None when the commit is unknown or a file predates
    * row-count recording). Lets a writer that just committed reuse the
    * commit's own count instead of re-running a count() job. */
  def commitRowCount(version: Long): Option[Long] =
    commits.find(_.version == version).flatMap { c =>
      val per = c.files.map(f => c.stats.get(f)
        .flatMap(_.get(SnapshotTable.RowsStatKey))
        .flatMap(v => scala.util.Try(v._1.toLong).toOption))
      if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }

  /** Total data bytes of the current snapshot, from manifest-carried
    * sizes (zero FS calls; legacy files without a recorded size count 0 —
    * this feeds plan ESTIMATES, never results). */
  def snapshotSizeInBytes: Long =
    snapshotWithStats()._1
      .flatMap(_._2.get(SnapshotTable.BytesStatKey))
      .flatMap(v => scala.util.Try(v._1.toLong).toOption).sum

  /** One live data file after log replay: absolute path, its manifest
    * stats, and the field ids in force when it was WRITTEN (column names
    * inside the file → stable ids — the key to rename-safe reads). */
  private final case class FileEntry(path: String,
                                     stats: Map[String, (String, String)],
                                     writeIds: Map[String, Int])

  /** Replay `visible`: accumulate files (overwrite resets), tracking each
    * commit's effective field ids. Legacy commits (no recorded ids) are
    * backfilled by name inheritance — exact, because only id-recording code
    * can produce a rename. Returns (files, current schema, current ids). */
  private def replayEntries(visible: Seq[LakeCommit])
      : (Vector[FileEntry], StructType, Map[String, Int]) = {
    var eff = Map.empty[String, Int]
    var maxEver = 0
    var acc = Vector.empty[FileEntry]
    visible.foreach { c =>
      eff =
        if (c.fieldIds.nonEmpty) c.fieldIds
        else assignFieldIds(StructType.fromDDL(c.schemaDdl).fieldNames.toSeq, eff, maxEver)
      maxEver = math.max(maxEver, (eff.valuesIterator ++ Iterator(0)).max)
      val add = c.files.toVector.map(f =>
        FileEntry(s"$dir/$f", c.stats.getOrElse(f, Map.empty), eff))
      acc = if (c.action == "overwrite") add else acc ++ add
    }
    (acc, StructType.fromDDL(visible.last.schemaDdl), eff)
  }

  /** Scan over an explicit file list through LakeFileIndex, so any filter
    * the query puts on top prunes files from manifest stats at plan time
    * (the SQL-path analog of the reference's PruneScanRuleBase —
    * `exec/planner/logical/partition/PruneScanRuleBase.java:117`).
    * `transforms` additionally lets predicates on partition-source columns
    * prune through the recorded transform values (Iceberg-style). */
  private def buildScan(files: Seq[(String, Map[String, (String, String)])],
                        schema: StructType,
                        transforms: Seq[PartitionTransform] = Nil,
                        version: Long = -1L,
                        attachStats: Boolean = false): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      // nullable: pre-evolution files miss later columns and must read NULL
      // (DataFrameReader applies the same asNullable on user schemas)
      val schemaN = org.apache.spark.sql.graft.Bridge.asNullable(schema)
      val index = new LakeFileIndex(spark, dir, files, schemaN, transforms, version)
      // A layout with exactly one bucket transform whose files ALL carry a
      // valid bucket-id name (stamped by writeDataFiles, preserved by
      // copy-on-write DML and compaction, which re-route through it) reads
      // as a Spark bucketed table: the scan reports
      // HashPartitioning(srcCol, n), so joins between co-bucketed lake
      // tables and aggregations on the bucket column need NO exchange —
      // at 100 TB the shuffle they skip is the query's dominant cost. The
      // per-file name check is the invariant carrier: legacy files, a
      // changed bucket count, or a foreign writer fall back to a plain
      // scan (still correct, just shuffled). DisableUnnecessaryBucketedScan
      // keeps size-based splits for scans with no interesting-partition
      // consumer, so small-n buckets don't throttle plain reads.
      val bucketSpec = transforms.collect {
        case b: PartitionTransform.BucketT => b
      } match {
        case Seq(b) if schemaN.fieldNames.contains(b.srcCol) &&
            files.forall { case (p, _) =>
              org.apache.spark.sql.graft.Bridge
                .bucketId(p.substring(p.lastIndexOf('/') + 1))
                .exists(id => id >= 0 && id < b.n)
            } =>
          // every live file carrying the SAME sort marker upgrades the
          // spec to a sorted bucketed table: Spark claims outputOrdering
          // for single-file buckets and merge joins skip the sort too.
          // One unmarked file (unsorted DML rewrite, legacy commit) and
          // the claim drops — the marker is per-file ground truth.
          val sortedBy: Seq[String] = files.headOption
            .flatMap(_._2.get(SnapshotTable.SortStatKey)).map(_._1) match {
            case Some(csv) if csv.nonEmpty &&
                files.forall(_._2.get(SnapshotTable.SortStatKey).exists(_._1 == csv)) =>
              val cols = csv.split(",").toSeq
              if (cols.forall(schemaN.fieldNames.contains)) cols else Nil
            case _ => Nil
          }
          Some(org.apache.spark.sql.catalyst.catalog.BucketSpec(
            b.n, Seq(b.srcCol), sortedBy))
        case _ => None
      }
      val rel = HadoopFsRelation(index, new StructType(), schemaN, bucketSpec,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
        Map.empty[String, String])(spark)
      // HEAD-snapshot scans (attachStats: read()/readRef() resolving to
      // the main log's tip — not time travel, branch-staged state, diff or
      // rewrite subsets) attach persisted ANALYZE stats as a synthetic
      // CatalogTable, which is the channel LogicalRelation.computeStats
      // feeds CBO from: row counts, per-column NDV/nulls/min/max and
      // equi-height histograms drive filter selectivity and join sizing.
      // Estimates only — stale-under-DML by the same contract as the
      // reference's statistics service. Historical/branch snapshots get
      // NO stats rather than the head's systematically-wrong ones (the
      // stored stats describe the snapshot ANALYZE ran on).
      val plan =
        if (version >= 0 && attachStats)
          graft.catalog.CboStats.catalogTableFor(dir, schemaN, properties)
            .map(ct => LogicalRelation(rel, ct))
            .getOrElse(LogicalRelation(rel))
        else LogicalRelation(rel)
      org.apache.spark.sql.graft.Bridge.ofRows(spark, plan)
    }

  /** Transforms recorded by any visible commit (lenient: unknown spec
    * strings from a newer writer are skipped — files keep being read, only
    * their partition pruning is lost). */
  private def specTransforms(visible: Seq[LakeCommit]): Seq[PartitionTransform] =
    visible.flatMap(_.partitionSpec).distinct.flatMap(s =>
      scala.util.Try(PartitionTransform.parse(s)).toOption)

  /** Read a snapshot (latest by default). The file list is pinned here —
    * subsequent commits do not affect this DataFrame. A `WHERE` over this
    * DataFrame (or a lake view built on it) prunes data files from the
    * commit manifest stats automatically at plan time. Files written under
    * pre-rename column names are read by field id and aliased to the
    * current names (see buildMappedScan). */
  def read(version: Option[Long] = None, asOfTsMs: Option[Long] = None): DataFrame = {
    val visible = visibleCommits(version, asOfTsMs)
    val (entries, schema, curIds) = replayEntries(visible)
    // stats attach only when this scan IS the head snapshot (read() with
    // no pin, or an explicit pin that happens to equal the tip) — time
    // travel must not inherit the head's cardinalities
    buildMappedScan(entries, schema, curIds, specTransforms(visible),
      visible.lastOption.map(_.version).getOrElse(0L),
      attachStats = visible.lastOption.exists(_.version == latestVersion))
  }

  /** Scan that resolves columns by FIELD ID, not name: files are grouped by
    * the physical name each current column had when the file was written
    * (same ids → same group; a table never renamed is exactly one group =
    * today's plain scan). Each group scans under its write-time names —
    * keeping parquet pushdown and manifest pruning, whose stats are also
    * keyed by write-time names — then a zero-cost Project aliases to the
    * current names, and groups union. A column ADDED after a file was
    * written maps to no id in that file and reads NULL (under a collision-
    * proof placeholder name if a later rename reused its name). */
  private def buildMappedScan(entries: Seq[FileEntry], curSchema: StructType,
                              curIds: Map[String, Int],
                              transforms: Seq[PartitionTransform] = Nil,
                              version: Long = -1L,
                              attachStats: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (entries.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], curSchema)
    val curNames = curSchema.fieldNames.toSeq
    def physNames(writeIds: Map[String, Int]): Seq[String] = {
      val byId = writeIds.map(_.swap)
      val mapped = curNames.map(n => curIds.get(n).flatMap(byId.get))
      val taken = mapped.flatten.toSet
      curNames.zip(mapped).map {
        case (_, Some(pn)) => pn
        // column has no identity in this file → must read NULL. A plain
        // name read does that ONLY if the file has no column of that name;
        // if it does (the name belonged to a different, since-retired or
        // renamed-away id), a placeholder name forces the NULL — old data
        // must not resurface under a re-added or rename-freed name.
        case (n, None) if !writeIds.contains(n) && !taken(n) => n
        case (n, None) => s"__graft_absent_${curIds.getOrElse(n, 0)}__"
      }
    }
    val parts = entries.groupBy(e => physNames(e.writeIds)).toSeq
      .sortBy(_._1.mkString(",")) // deterministic group order
      .map { case (phys, fs) =>
        val physSchema = StructType(curSchema.fields.zip(phys).map {
          case (f, pn) => f.copy(name = pn)
        })
        // filters pushed into this group's scan reference the group's
        // physical (write-time) names — the same namespace the transform
        // srcCols and stats keys live in
        val scan = buildScan(fs.map(e => (e.path, e.stats)), physSchema, transforms, version,
          attachStats)
        if (phys == curNames) scan
        else scan.select(phys.zip(curNames).map { case (pn, cn) => col(pn).as(cn) }: _*)
      }
    parts.reduce(_ unionByName _)
  }

  /** `VERSION AS OF v` (Iceberg/Delta time travel). */
  def asOf(version: Long): DataFrame = read(version = Some(version))

  /** `TIMESTAMP AS OF ts` (epoch millis). */
  def asOfTimestamp(tsMs: Long): DataFrame = read(asOfTsMs = Some(tsMs))

  def append(df: DataFrame): Long = {
    val v = commit(df, "append")
    maybeAutoCompact()
    v
  }

  /** Auto-compaction on ingest (the Delta `autoCompact` / Iceberg
    * maintenance-on-write analog; the reference runs the same upkeep as a
    * service plus explicit OPTIMIZE): with session conf
    * `spark.graft.lake.autocompact.files` = N (> 0; default off), an
    * append that leaves the live snapshot with MORE than N data files
    * triggers a follow-on compaction commit through the sticky layout
    * (partitioning and sort order survive, like any OPTIMIZE). The
    * steady-state ingest cost stays amortized O(1) rewrites per
    * compaction window instead of file counts growing without bound —
    * the small-files problem is the top operational failure of streaming
    * ingest at 100 TB. Maintenance failures (e.g. losing the optimistic
    * race to a concurrent writer) never fail the ingest that triggered
    * them: the appended data is already durable, upkeep retries on the
    * next append. */
  private def maybeAutoCompact(): Unit = {
    // per-table property beats the session conf (the reference configures
    // maintenance per table via table properties — Delta's autoOptimize
    // analog); tables not opted in fall back to the session-wide setting
    val threshold = properties.get("autocompact.files")
      .orElse(spark.conf.getOption("spark.graft.lake.autocompact.files"))
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)
    if (threshold > 0) {
      val liveFiles = snapshotWithStats()._1.size
      if (liveFiles > threshold)
        try {
          val (spec, statsCols, sortBy) = effectiveLayout
          if (sortBy.nonEmpty) compactSorted(sortBy, math.max(1, threshold / 2))
          else if (spec.nonEmpty) compactPartitioned(spec, statsCols)
          else {
            // size-banded: pack ONLY the small-file tail (files under
            // 0.75× the target); a healthy file NEVER rewrites — at
            // 100 TB the upkeep cost tracks the ingest tail, not the
            // table ("autocompact.target.mb", default 128)
            val targetMb = properties.get("autocompact.target.mb")
              .orElse(spark.conf.getOption("spark.graft.lake.autocompact.target.mb"))
              .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(128L)
            val target = math.max(1L, targetMb) * 1024 * 1024
            compactBySize(minFileBytes = target * 3 / 4,
              maxFileBytes = Long.MaxValue,
              targetFileBytes = target, minInputFiles = 2)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"auto-compaction skipped for $dir: ${e.getMessage}")
        }
    }
  }

  /** Layout-preserving full compaction for auto-compact on a partitioned
    * table: rewrite the snapshot through the sticky partition spec (the
    * commit path re-clusters by partition tuple, one file per live
    * partition chunk). */
  private def compactPartitioned(spec: Seq[String], statsCols: Seq[String]): Long =
    overwritePartitioned(read(), spec, statsCols)
  def overwrite(df: DataFrame): Long = commit(df, "overwrite")

  /** Idempotent append: a no-op if a commit with `tag` already exists —
    * the exactly-once contract for replayed streaming micro-batches
    * (checkpoint recovery re-runs foreachBatch with the same batch id).
    * Returns the committed (or already-present) version.
    * `partitionSpec`/`statsCols` make the batch land partitioned/stated
    * (the streaming-ingest path into a partitioned table). */
  def appendTagged(df: DataFrame, tag: String,
                   partitionSpec: Seq[String] = Nil,
                   statsCols: Seq[String] = Nil): Long = {
    require(tag.nonEmpty, "tag must be non-empty")
    commits.find(_.tag == tag) match {
      case Some(c) => c.version
      case None =>
        val v = commit(df, "append", statsCols, tag,
          partitionBy = partitionSpec.map(PartitionTransform.parse))
        maybeAutoCompact()
        v
    }
  }

  /** Idempotent overwrite: no-op if a commit with `tag` exists (see
    * appendTagged — the overwrite flavor for maintained materializations).
    * `expectedBase` additionally makes the overwrite conditional: if another
    * writer has committed past that version, the publish fails with
    * ConcurrentModificationException instead of silently erasing the
    * concurrent commit (the Iceberg/Delta validate-at-commit model). */
  def overwriteTagged(df: DataFrame, tag: String,
                      expectedBase: Option[Long] = None): Long = {
    require(tag.nonEmpty, "tag must be non-empty")
    commits.find(_.tag == tag) match {
      case Some(c) => c.version
      case None => commit(df, "overwrite", Nil, tag, expectedBase)
    }
  }

  /** Conditional overwrite: publishes only if the table is still at
    * `expectedBase` when the commit lock is held (optimistic concurrency —
    * the reference model validates the base snapshot at commit time and
    * fails/retries on conflict rather than last-writer-wins). */
  def overwriteIf(df: DataFrame, expectedBase: Long): Long =
    commit(df, "overwrite", Nil, "", Some(expectedBase))

  /** Read-modify-write with conflict detection: pins the latest snapshot,
    * applies `transform`, and publishes the rewrite ONLY if no other commit
    * landed in between; on conflict the rewrite is recomputed against the
    * new base (so a concurrent append is merged, never erased — the lost-
    * update window the unconditional overwrite had). Data files staged by a
    * losing attempt become unreferenced orphans, reclaimed by vacuum().
    *
    * `touch` (row-level DML): a predicate selecting the rows the DML can
    * affect. When given, only data files that MAY hold matching rows
    * (decided from manifest stats with the same conservative evaluator the
    * scan pruner uses) are rewritten; every other file is carried into the
    * new snapshot BY REFERENCE, stats and all. A DELETE of one day from a
    * year-partitioned table rewrites one partition, not the table —
    * O(affected files), not O(table), the Iceberg copy-on-write granularity
    * (reference row-level DML inherits exactly this from Iceberg). Renamed
    * tables fall back to the full rewrite (carried files must share the
    * current column identity for their stats/ids to stay valid). */
  /** Table-level physical layout (partition spec, stats columns) in force:
    * inherited from the LATEST commit that declared each, not just the head
    * commit — a plain append records neither, and reading only `log.last`
    * would let one un-specced append permanently strip partitioning and
    * stats from every later INSERT INTO LAKE / DML rewrite (Iceberg keeps
    * the write spec as table metadata for the same reason). */
  private def effectiveLayoutOf(log: Seq[LakeCommit])
      : (Seq[String], Seq[String], Seq[String]) = {
    def sticky(pick: LakeCommit => Seq[String]): Seq[String] =
      log.reverseIterator.find(pick(_).nonEmpty).map(pick)
        .map(s => if (s == Seq(SnapshotTable.ClearedLayoutSentinel)) Nil else s)
        .getOrElse(Nil)
    (sticky(_.partitionSpec),
      log.reverseIterator.find(_.statsCols.nonEmpty).map(_.statsCols).getOrElse(Nil),
      sticky(_.sortSpec))
  }

  /** Public view of the effective layout, for SQL-surface writers. */
  def effectiveLayout: (Seq[String], Seq[String], Seq[String]) =
    effectiveLayoutOf(commits)

  /** Layout resolution over a log the caller ALREADY read (one log read
    * serves both the head row and the layout — no torn snapshot between
    * two reads under a concurrent commit). */
  def effectiveLayoutOfCommits(cs: Seq[LakeCommit])
      : (Seq[String], Seq[String], Seq[String]) = effectiveLayoutOf(cs)

  private def copyOnWrite(transform: DataFrame => DataFrame,
                          extraStatsCols: Seq[String] = Nil,
                          touch: Option[org.apache.spark.sql.Column] = None,
                          sortCols: Seq[String] = Nil,
                          tag: String = "",
                          // the transform already arranged rows itself
                          // (range-cluster+sort, Z-order): the write must
                          // not re-sort what it was handed
                          presorted: Boolean = false,
                          // FILE-level rewrite selection (size-based
                          // bin-pack); non-selected files carry by
                          // reference like untouched DML files
                          selectFiles: Option[FileEntry => Boolean] = None): Long = {
    // generous budget: each retry requires a conflicting commit to have
    // actually landed (system-wide progress), so this bounds pathological
    // append storms, not steady state — one conflict costs one recompute
    val maxRetries = 20
    var attempt = 0
    while (true) {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      // idempotency: a tagged rewrite that already landed (checkpoint
      // replay, or a concurrent replica winning a retry race — the check
      // re-runs on every attempt against the fresh log) is a no-op
      if (tag.nonEmpty)
        log.find(_.tag == tag).foreach(c => return c.version)
      val base = log.last.version
      val visible = log.takeWhile(_.version <= base)
      val (entries, schema, curIds) = replayEntries(visible)
      val tfs = specTransforms(visible)
      // partial-rewrite eligibility: every live file written under the
      // current column identity (no rename divergence to misattribute
      // carried stats/ids to)
      val uniformIds = entries.forall(_.writeIds == curIds)
      val (rewriteEntries, carried) = (selectFiles, touch) match {
        case (Some(sel), _) if uniformIds => entries.partition(sel)
        case (_, Some(cond)) if uniformIds =>
          val full = buildMappedScan(entries, schema, curIds, tfs)
          resolveCond(full, cond) match {
            case Some(resolved) =>
              val types = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
              // one probe cache across the per-entry walk: IN-heavy DML
              // predicates sort their key sets once (see LakeFileIndex)
              val pc = new java.util.IdentityHashMap[
                org.apache.spark.sql.catalyst.expressions.Expression, AnyRef]()
              entries.partition(e => LakeFileIndex.mayMatch(e.stats, types, resolved, tfs, pc))
            case None => (entries, Vector.empty[FileEntry])
          }
        case _ => (entries, Vector.empty[FileEntry])
      }
      val rewritten = transform(buildMappedScan(rewriteEntries, schema, curIds, tfs))
      // preserve the table's physical layout across DML/compaction: the
      // rewrite re-partitions by the base commit's spec and re-records its
      // stats columns, so pruning doesn't silently degrade after an UPDATE.
      // Columns no longer present (e.g. renamed since the spec was written)
      // are dropped from the carried-forward layout rather than failing.
      val have = rewritten.columns.map(_.toLowerCase).toSet
      val (effSpec, effStats, effSort) = effectiveLayoutOf(log)
      val spec = effSpec
        .flatMap(s => scala.util.Try(PartitionTransform.parse(s)).toOption)
        .filter(t => have(t.srcCol.toLowerCase))
      val stCols = (effStats ++ extraStatsCols).distinct
        .filter(c => have(c.toLowerCase))
      // explicit sort (OPTIMIZE ... ORDER BY) re-declares the layout;
      // otherwise the table's declared sort carries through the rewrite,
      // so DML keeps a sorted bucketed table merge-join-ready
      val sortBy = (if (sortCols.nonEmpty) sortCols else effSort)
        .filter(c => have(c.toLowerCase))
      val carryRel = carried.map(e =>
        (e.path.stripPrefix(s"$dir/"), e.stats))
      try return commit(rewritten, "overwrite", stCols, tag, Some(base), spec, carryRel,
        sortBy, presorted)
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Resolve a user condition against the table scan so the prune
    * evaluator sees typed AttributeReferences + literals. None → treat as
    * "may touch anything" (full rewrite). Foldable subexpressions are
    * evaluated to literals: the ANALYZED plan has no constant folding, so
    * type coercion leaves `id >= 10` (int literal, bigint column) as
    * `id >= cast(10 as bigint)` — a shape the prune evaluator would treat
    * as unknown, silently turning every partial rewrite into a full one. */
  private def resolveCond(df: DataFrame,
                          cond: org.apache.spark.sql.Column): Option[
      org.apache.spark.sql.catalyst.expressions.Expression] =
    scala.util.Try {
      import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
      val c = df.filter(cond).queryExecution.analyzed match {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
      c.transformUp {
        case e: Expression if e.foldable && !e.isInstanceOf[Literal] =>
          Literal.create(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty), e.dataType)
      }
    }.toOption

  /** Append with per-file min/max stats on `statsCols` recorded in the
    * commit manifest (the Iceberg manifest-stats model:
    * `IcebergScanPrel` prunes data files from manifest ranges before any
    * file is opened). One extra pass over the BATCH (not the table)
    * computes the ranges. Pair with a range-clustered `df`
    * (`repartitionByRange(sortCol)`) so file ranges are disjoint and
    * `scanRange` prunes to a single file per point lookup. */
  def appendWithStats(df: DataFrame, statsCols: Seq[String]): Long =
    commit(df, "append", statsCols)

  /** Partitioned append (Iceberg partition-spec model): the batch is
    * directory-partitioned by the transform values — each data file holds
    * exactly one partition tuple — and every file's transform range lands
    * in the commit manifest, so plain SQL predicates on the SOURCE columns
    * prune whole partitions at plan time (`WHERE o_orderdate >= '1994-03-01'`
    * over `month(o_orderdate)`, `WHERE id = 7` over `bucket(16, id)`).
    * `statsCols` optionally adds plain min/max stats on top.
    *
    * Scale: this is the layout that carries a 100 TB fact table — a
    * time-partitioned, bucket-subpartitioned scan touches only the
    * partitions the query names, independent of table size. */
  def appendPartitioned(df: DataFrame, spec: Seq[String],
                        statsCols: Seq[String] = Nil,
                        sortCols: Seq[String] = Nil): Long = {
    val v = commit(df, "append", statsCols,
      partitionBy = spec.map(PartitionTransform.parse), sortCols = sortCols)
    maybeAutoCompact()
    v
  }

  /** Partitioned overwrite — same layout on the full-replace path.
    * `sortCols` sorts each data file's rows (recorded per file in the
    * manifest): with a bucket layout the table becomes a SORTED bucketed
    * table and merge joins on the bucket key need neither shuffle nor
    * sort. */
  def overwritePartitioned(df: DataFrame, spec: Seq[String],
                           statsCols: Seq[String] = Nil,
                           sortCols: Seq[String] = Nil): Long =
    commit(df, "overwrite", statsCols,
      partitionBy = spec.map(PartitionTransform.parse), sortCols = sortCols)

  /** Manifest-pruned scan: only data files whose [min, max] range on
    * `colName` intersects [lo, hi] are read (checked against commit stats;
    * files with no recorded stats are always read — pruning must be a
    * superset). The residual filter is applied in Spark, so results are
    * exact regardless of stats quality. */
  def scanRange(colName: String, lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val visible = visibleCommits(None, None)
    val (entries, schema, curIds) = replayEntries(visible)
    // eager manifest prune (so even DataFrame.inputFiles reflects the cut);
    // the same stats also back plan-time pruning via LakeFileIndex for any
    // further filters the caller stacks on top. Stats are keyed by WRITE-
    // time names — resolve colName per file through its field id.
    val colId = curIds.get(colName)
    val kept = entries.filter { e =>
      val writeName = colId.flatMap(id => e.writeIds.map(_.swap).get(id)).getOrElse(colName)
      e.stats.get(writeName) match {
        case Some((mn, mx)) =>
          try { mx.toDouble >= lo && mn.toDouble <= hi }
          catch { case _: NumberFormatException => true }
        case None => true
      }
    }
    val base = buildMappedScan(kept, schema, curIds, specTransforms(visible),
      visible.lastOption.map(_.version).getOrElse(0L))
    // residual filter with literals of the column's native type: a double
    // comparison would wrap the column in a cast and block parquet
    // row-group pushdown (only manifest pruning would remain)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val cond = schema(colName).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(colName) >= math.ceil(lo).toLong && col(colName) <= math.floor(hi).toLong
      case _ => col(colName) >= lo && col(colName) <= hi
    }
    base.filter(cond)
  }

  /** Incremental scan: rows added by commits in (fromVersion, toVersion]
    * (the reference's incremental-reflection-refresh read path —
    * `IncrementalUpdateUtils.java`). Only valid across append-only history;
    * an overwrite in the range breaks add-only lineage. */
  def changes(fromVersion: Long, toVersion: Long): DataFrame = {
    val all = commits
    val cs = all.filter(c => c.version > fromVersion && c.version <= toVersion)
    require(cs.nonEmpty, s"no commits in ($fromVersion, $toVersion]")
    require(cs.forall(_.action == "append"),
      s"incremental scan across an overwrite is not add-only (range ($fromVersion, $toVersion])")
    // replay the FULL prefix so write-time field ids are chained correctly,
    // then keep only files the range added (a rename inside the range maps
    // pre-rename files to the range-end names by id)
    val prefix = all.takeWhile(_.version <= toVersion)
    val (entries, _, endIds) = replayEntries(prefix)
    val inRange = cs.flatMap(c => c.files.map(f => s"$dir/$f")).toSet
    buildMappedScan(entries.filter(e => inRange(e.path)),
      StructType.fromDDL(cs.last.schemaDdl), endIds, specTransforms(prefix))
  }

  /** Streaming micro-batch scan: rows ADDED by append commits in
    * (fromVersion, toVersion]. The fail-loud default mirrors [[changes]]
    * (a rewritten file would replay already-delivered rows); with
    * `skipChanges` (the Delta `skipChangeCommits` contract) non-append
    * commits in the range are passed over — the streaming source clamps
    * its offset ranges so skipped change commits only ever appear BEFORE
    * the range's appends, which keeps the range-end replay complete (an
    * overwrite after an in-range append could compact its file away).
    * An empty range (or one holding only skipped commits) yields an empty
    * batch under the range-end schema. */
  def appendsBetween(fromVersion: Long, toVersion: Long,
                     skipChanges: Boolean = false): DataFrame = {
    val all = commits
    val cs = all.filter(c => c.version > fromVersion && c.version <= toVersion)
    val apps =
      if (skipChanges) cs.filter(_.action == "append")
      else {
        require(cs.forall(_.action == "append"),
          s"streaming read hit a non-append commit in ($fromVersion, $toVersion]: " +
            "rewritten files would replay rows — restart from a fresh offset " +
            "or set skipChangeCommits=true to pass over change commits")
        cs
      }
    val prefix = all.takeWhile(_.version <= toVersion)
    require(prefix.nonEmpty, s"no commits at or before version $toVersion")
    val schema = StructType.fromDDL(prefix.last.schemaDdl)
    if (apps.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    else {
      val (entries, _, endIds) = replayEntries(prefix)
      val inRange = apps.flatMap(c => c.files.map(f => s"$dir/$f")).toSet
      buildMappedScan(entries.filter(e => inRange(e.path)), schema, endIds,
        specTransforms(prefix))
    }
  }

  // ---------- branches & tags (catalog versioning) ----------
  // The reference exposes Nessie-style refs over its sources: CREATE
  // BRANCH/TAG, AT BRANCH reads/writes, MERGE BRANCH INTO
  // (`sabot/grammar/src/main/codegen/includes/versionSupport.ftl:126,589`).
  // Re-expressed on the snapshot log: a TAG pins a version forever; a
  // BRANCH forks at a base version and accumulates its own commit chain in
  // `ref`-namespaced log files, invisible to main readers until a
  // fast-forward squash merge publishes the final file set as ONE atomic
  // main commit (the write-audit-publish staging workflow).

  private def refPath(name: String) = logDir.resolve(s"ref-$name.json")
  private def branchCommitFile(name: String, v: Long) =
    logDir.resolve(f"br-$name-v$v%08d.json")

  private def requireRefName(name: String): Unit =
    require(name.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
      s"ref name must be alphanumeric/_/./- : '$name'")

  def listRefs: Seq[SnapshotTable.LakeRef] =
    if (!LakeIO.isDirectory(logDir)) Nil
    else LakeIO.listNames(logDir)
      .filter(n => n.startsWith("ref-") && n.endsWith(".json")).sorted
      .flatMap { n =>
        // a ref dropped between the listing and this read is simply gone
        try Some(SnapshotTable.parseRef(LakeIO.readString(logDir.resolve(n))))
        catch { case _: java.io.IOException => None }
      }

  def getRef(name: String): SnapshotTable.LakeRef = {
    requireRefName(name)
    require(LakeIO.exists(refPath(name)), s"no branch or tag '$name' in $dir")
    SnapshotTable.parseRef(LakeIO.readString(refPath(name)))
  }

  private def createRef(name: String, refType: String, atVersion: Option[Long]): SnapshotTable.LakeRef =
    withCommitLock {
      requireRefName(name)
      require(!LakeIO.exists(refPath(name)), s"ref '$name' already exists in $dir")
      val current = latestVersion
      require(current > 0, s"cannot create a $refType on empty lake table $dir")
      val base = atVersion.getOrElse(current)
      require(base >= 1 && base <= current,
        s"$refType base v$base out of range [1, $current] in $dir")
      val ref = SnapshotTable.LakeRef(name, refType, base)
      LakeIO.writeString(refPath(name), SnapshotTable.renderRef(ref))
      ref
    }

  /** CREATE BRANCH (fork point = `atVersion`, default current). */
  def createBranch(name: String, atVersion: Option[Long] = None): SnapshotTable.LakeRef =
    createRef(name, "branch", atVersion)

  /** CREATE TAG: an immutable named pin of a version. */
  def createTag(name: String, atVersion: Option[Long] = None): SnapshotTable.LakeRef =
    createRef(name, "tag", atVersion)

  /** ASSIGN BRANCH|TAG (reference `SqlAssignBranch`/`SqlAssignTag` —
    * Nessie `assign`): repoint the ref at `toVersion` of main. A branch's
    * staged commit chain is DISCARDED (assign moves the head, exactly
    * Nessie's semantics — staged files become vacuum-reclaimable); a tag
    * simply re-pins. */
  def assignRef(name: String, toVersion: Long): SnapshotTable.LakeRef = withCommitLock {
    val old = getRef(name)
    val current = latestVersion
    require(toVersion >= 1 && toVersion <= current,
      s"ASSIGN ${old.refType.toUpperCase} $name: v$toVersion out of range [1, $current] in $dir")
    if (old.refType == "branch")
      LakeIO.listNames(logDir)
        .filter(_.matches(s"br-${java.util.regex.Pattern.quote(name)}-v\\d{8}\\.json"))
        .foreach(n => LakeIO.deleteIfExists(logDir.resolve(n)))
    val ref = old.copy(baseVersion = toVersion)
    LakeIO.writeString(refPath(name), SnapshotTable.renderRef(ref))
    ref
  }

  /** DROP BRANCH/TAG: removes the ref and any branch commit files; staged
    * data files become unreferenced and are reclaimed by vacuum(). */
  def dropRef(name: String): Unit = withCommitLock {
    requireRefName(name)
    require(LakeIO.exists(refPath(name)), s"no branch or tag '$name' in $dir")
    LakeIO.deleteIfExists(refPath(name))
    LakeIO.listNames(logDir)
      .filter(_.matches(s"br-${java.util.regex.Pattern.quote(name)}-v\\d{8}\\.json"))
      .foreach(n => LakeIO.deleteIfExists(logDir.resolve(n)))
  }

  /** The branch's own commit chain (versions continue from the fork base). */
  private def branchCommits(name: String): Vector[LakeCommit] =
    LakeIO.listNames(logDir)
      .filter(_.matches(s"br-${java.util.regex.Pattern.quote(name)}-v\\d{8}\\.json"))
      .sorted
      .map(n => parseCommit(LakeIO.readString(logDir.resolve(n))))

  /** Full commit view of a ref: main prefix up to the fork base, plus (for
    * branches) the branch chain. */
  private def refLog(ref: SnapshotTable.LakeRef): Seq[LakeCommit] = {
    val prefix = commits.takeWhile(_.version <= ref.baseVersion)
    if (ref.refType == "tag") prefix else prefix ++ branchCommits(ref.name)
  }

  /** SHOW LOGS (reference `SqlShowLogs`, versionSupport.ftl): the commit
    * log of main, or of a branch/tag when `ref` is given — a tag shows
    * the prefix up to its pin, a branch the shared prefix plus its staged
    * chain. */
  def log(ref: Option[String] = None): Seq[LakeCommit] =
    ref.map(n => refLog(getRef(n))).getOrElse(commits)

  /** `AT BRANCH <name>` / `AT TAG <name>` read. */
  def readRef(name: String): DataFrame = {
    val visible = refLog(getRef(name))
    require(visible.nonEmpty, s"ref '$name' resolves to no commits in $dir")
    val (entries, schema, ids) = replayEntries(visible)
    // stats attach only when the ref view IS the main head (a tag pinned
    // at the tip, or a branch with nothing staged) — a staged branch or an
    // old pin reads a different snapshot than ANALYZE profiled
    buildMappedScan(entries, schema, ids, specTransforms(visible),
      visible.lastOption.map(_.version).getOrElse(0L),
      attachStats = visible == commits)
  }

  /** `INSERT INTO ... AT BRANCH`: append a batch to the branch only. Main
    * readers never see it until mergeBranch. Inherits the branch's
    * effective layout, so staged batches keep the table partitioned. */
  def appendToBranch(name: String, df: DataFrame): Long = {
    val ref = getRef(name)
    require(ref.refType == "branch", s"'$name' is a tag; only branches accept commits")
    val prefix = refLog(ref)
    val (spec, stCols, sortBy) = effectiveLayoutOf(prefix)
    val partitionBy = spec.flatMap(s => scala.util.Try(PartitionTransform.parse(s)).toOption)
    val (files, stats) = writeDataFiles(df, partitionBy, stCols, sortBy)
    withCommitLock {
      require(LakeIO.exists(refPath(name)), s"branch '$name' was dropped mid-write")
      val log = refLog(ref)
      val v = log.lastOption.map(_.version).getOrElse(0L) + 1
      val minTs = log.lastOption.map(_.timestampMs).getOrElse(0L)
      val (prevIds, maxEver) = idState(log)
      val ids = assignFieldIds(df.schema.fieldNames.toSeq, prevIds, maxEver)
      val c = LakeCommit(v, "append", math.max(System.currentTimeMillis(), minTs),
        df.schema.toDDL, files, stats, "", ids, spec, stCols, sortBy)
      val tmp = logDir.resolve(branchCommitFile(name, v).fileName +
        "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      try {
        LakeIO.writeString(tmp, SnapshotTable.renderCommit(c))
        LakeIO.publish(tmp, branchCommitFile(name, v))
      } finally LakeIO.deleteIfExists(tmp)
      v
    }
  }

  /** Branch-scoped copy-on-write DML (the reference's Nessie branches
    * take full DML, not just staged appends): rewrite only the
    * branch-visible files whose manifest stats may hold matching rows,
    * carry the rest by reference, and publish ONE branch `overwrite`
    * commit. Main readers never see it until mergeBranch; the three-way
    * merge then treats the rewritten base files as the branch's removal
    * set for conflict detection. Data files stage BEFORE the commit lock
    * (same crash discipline as every writer); the publish refuses if the
    * branch advanced while the rewrite ran — one staging writer per
    * branch is the expected regime, so the caller simply retries. */
  private def copyOnWriteBranch(name: String, transform: DataFrame => DataFrame,
                                touch: Option[org.apache.spark.sql.Column]): Long = {
    val ref = getRef(name)
    require(ref.refType == "branch", s"'$name' is a tag; only branches accept commits")
    val log0 = refLog(ref)
    require(log0.nonEmpty, s"branch '$name' resolves to no commits in $dir")
    val plannedHead = log0.last.version
    val (entries, schema, curIds) = replayEntries(log0)
    val tfs = specTransforms(log0)
    val uniformIds = entries.forall(_.writeIds == curIds)
    val (rewriteEntries, carried) = touch match {
      case Some(cond) if uniformIds =>
        val full = buildMappedScan(entries, schema, curIds, tfs)
        resolveCond(full, cond) match {
          case Some(resolved) =>
            val types = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
            // one probe cache across the per-entry walk: IN-heavy DML
            // predicates sort their key sets once (see LakeFileIndex)
            val pc = new java.util.IdentityHashMap[
              org.apache.spark.sql.catalyst.expressions.Expression, AnyRef]()
            entries.partition(e => LakeFileIndex.mayMatch(e.stats, types, resolved, tfs, pc))
          case None => (entries, Vector.empty[FileEntry])
        }
      case _ => (entries, Vector.empty[FileEntry])
    }
    val rewritten = transform(buildMappedScan(rewriteEntries, schema, curIds, tfs))
    val have = rewritten.columns.map(_.toLowerCase).toSet
    val (effSpec, effStats, effSort) = effectiveLayoutOf(log0)
    val partitionBy = effSpec
      .flatMap(s => scala.util.Try(PartitionTransform.parse(s)).toOption)
      .filter(t => have(t.srcCol.toLowerCase))
    val stCols = effStats.filter(c => have(c.toLowerCase))
    val sortBy = effSort.filter(c => have(c.toLowerCase))
    val (files, stats) = writeDataFiles(rewritten, partitionBy, stCols, sortBy)
    withCommitLock {
      require(LakeIO.exists(refPath(name)), s"branch '$name' was dropped mid-write")
      val log = refLog(getRef(name))
      if (log.last.version != plannedHead)
        throw new java.util.ConcurrentModificationException(
          s"branch '$name' advanced from v$plannedHead to v${log.last.version} " +
            "while the rewrite ran; retry the statement")
      val v = plannedHead + 1
      val minTs = log.last.timestampMs
      val (prevIds, maxEver) = idState(log)
      val ids = assignFieldIds(rewritten.schema.fieldNames.toSeq, prevIds, maxEver)
      val carryRel = carried.map(e => (e.path.stripPrefix(s"$dir/"), e.stats))
      val c = LakeCommit(v, "overwrite", math.max(System.currentTimeMillis(), minTs),
        rewritten.schema.toDDL, carryRel.map(_._1) ++ files,
        carryRel.filter(_._2.nonEmpty).toMap ++ stats, "", ids,
        effSpec, stCols, sortBy)
      val tmp = logDir.resolve(branchCommitFile(name, v).fileName +
        "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      try {
        LakeIO.writeString(tmp, SnapshotTable.renderCommit(c))
        LakeIO.publish(tmp, branchCommitFile(name, v))
      } finally LakeIO.deleteIfExists(tmp)
      v
    }
  }

  /** `DELETE FROM LAKE ... ` routed to a branch (session `USE BRANCH` pin):
    * copy-on-write deletion staged on the branch only. */
  def deleteFromBranch(name: String, cond: org.apache.spark.sql.Column): Long =
    copyOnWriteBranch(name, base => base.filter(!cond || cond.isNull), Some(cond))

  /** `UPDATE LAKE ... SET` routed to a branch: copy-on-write update staged
    * on the branch only (same single-projection SET semantics as main). */
  def updateBranchWhere(name: String, cond: org.apache.spark.sql.Column,
                        sets: Map[String, org.apache.spark.sql.Column]): Long =
    copyOnWriteBranch(name, updateProjection(cond, sets), Some(cond))

  /** `MERGE BRANCH <name> INTO`: publish the branch's work as ONE atomic
    * overwrite commit on main (readers flip from pre-branch to
    * fully-merged; no intermediate states), then drop the branch.
    *
    * Two regimes, mirroring Nessie's merge (reference grammar
    * `sabot/grammar/src/main/codegen/includes/versionSupport.ftl:589`):
    *  - main still at the fork base → fast-forward squash of the branch's
    *    final file set.
    *  - main advanced past the fork base → THREE-WAY merge with
    *    content-level conflict detection at file granularity. Each side's
    *    change since the fork base is a (removed, added) file-set diff;
    *    the diffs commute iff no base file was rewritten/removed by BOTH
    *    sides (two appends, or DML touching different files, always
    *    merge — concurrent ingest on main no longer forces a re-stage).
    *    A shared removal means both sides rewrote the same rows: refuse
    *    with the conflicting files named, and the caller re-stages.
    *    Schema and layout merge by the same three-way rule: the side that
    *    changed them since the base wins; both changing differently is a
    *    conflict.
    *
    * Requires uniform column identity (no renames between fork and merge)
    * so carried-by-reference files keep correct id mapping. */
  def mergeBranch(name: String): Long = {
    val v = withCommitLock {
      val ref = getRef(name)
      require(ref.refType == "branch", s"'$name' is a tag and cannot be merged")
      val log = commits
      val current = log.lastOption.map(_.version).getOrElse(0L)
      val bcs = branchCommits(name)
      require(bcs.nonEmpty, s"branch '$name' has no commits to merge")
      val basePrefix = log.takeWhile(_.version <= ref.baseVersion)
      val branchLog = basePrefix ++ bcs
      if (current == ref.baseVersion) {
        // fast-forward: the branch view IS the merged view
        val (entries, _, endIds) = replayEntries(branchLog)
        require(entries.forall(e => SnapshotTable.idCompatible(e.writeIds, endIds)),
          s"branch '$name' spans a column rename; merge after OPTIMIZE or re-stage")
        val rel = entries.map(e => (e.path.stripPrefix(s"$dir/"), e.stats))
        val (effSpec, effStats, effSort) = effectiveLayoutOf(branchLog)
        publish(current + 1, "overwrite", rel.map(_._1),
          rel.filter(_._2.nonEmpty).toMap, "", bcs.last.schemaDdl,
          log.lastOption.map(_.timestampMs).getOrElse(0L), log, endIds,
          effSpec, effStats, effSort)
      } else {
        threeWayMerge(name, ref, log, basePrefix, branchLog, bcs, current)
      }
    }
    dropRef(name)
    spark.catalog.refreshByPath(dir)
    v
  }

  /** Outcome of the three-way analysis: either the conflict messages, or
    * everything `publish` needs for the merged commit. */
  private final case class MergePlan(entries: Vector[FileEntry],
                                     schemaDdl: String,
                                     ids: Map[String, Int],
                                     layout: (Seq[String], Seq[String], Seq[String]))

  /** Pure analysis of a diverged-base merge: each side's file-set diff
    * against the shared base snapshot. Data files are immutable and never
    * reused across commits, so file identity IS content identity: a file
    * removed by both sides means both rewrote (or deleted) the same rows
    * — a genuine content conflict. Schema/layout merge by the same
    * three-way rule. Shared by [[mergeBranch]] (publish or throw) and
    * [[mergeDryRun]] (report). */
  private def threeWayAnalysis(name: String, ref: SnapshotTable.LakeRef,
                               log: Seq[LakeCommit], basePrefix: Seq[LakeCommit],
                               branchLog: Seq[LakeCommit], bcs: Seq[LakeCommit])
      : Either[Seq[String], MergePlan] = {
    require(basePrefix.nonEmpty,
      s"branch '$name' fork base v${ref.baseVersion} predates the log in $dir")
    val (baseEntries, _, baseIds) = replayEntries(basePrefix)
    val (mainEntries, _, mainIds) = replayEntries(log)
    val (brEntries, _, brIds) = replayEntries(branchLog)
    val basePaths = baseEntries.map(_.path).toSet
    val mainRemoved = basePaths -- mainEntries.map(_.path).toSet
    val brRemoved = basePaths -- brEntries.map(_.path).toSet
    val conflicts = Seq.newBuilder[String]
    val clash = mainRemoved.intersect(brRemoved)
    if (clash.nonEmpty)
      conflicts += (s"content conflict — both the branch and main " +
        s"rewrote ${clash.size} file(s) since fork base v${ref.baseVersion}: " +
        clash.toSeq.sorted.take(3).map(_.stripPrefix(s"$dir/")).mkString(", ") +
        (if (clash.size > 3) ", …" else ""))
    val baseDdl = basePrefix.last.schemaDdl
    val mainDdl = log.last.schemaDdl
    val brDdl = bcs.last.schemaDdl
    val mergedDdl =
      if (mainDdl == baseDdl) Some(brDdl)
      else if (brDdl == baseDdl || brDdl == mainDdl) Some(mainDdl)
      else { conflicts += ("schema conflict — both sides evolved the " +
        "schema differently since the fork"); None }
    // column identity merges by the SAME three-way rule as the DDL: the
    // side that changed ids since the base wins (a one-sided ADD COLUMN is
    // a benign id-map change, not a rename conflict); both changing
    // differently is a genuine divergence. Checked AFTER the schema rule
    // so a double-evolution reports as the schema conflict it is.
    val mergedIds: Option[Map[String, Int]] =
      if (mainIds == baseIds) Some(brIds)
      else if (brIds == baseIds || brIds == mainIds) Some(mainIds)
      else {
        if (mergedDdl.isDefined)
          conflicts += ("main and branch diverge on column identity " +
            "(both sides renamed/added/dropped columns since the fork)")
        None
      }
    def layoutOf(l: Seq[LakeCommit]) = effectiveLayoutOf(l)
    val (baseLay, mainLay, brLay) = (layoutOf(basePrefix), layoutOf(log), layoutOf(branchLog))
    val mergedLay =
      if (mainLay == baseLay) Some(brLay)
      else if (brLay == baseLay || brLay == mainLay) Some(mainLay)
      else { conflicts += ("layout conflict — both sides changed the " +
        "partition/sort layout differently since the fork"); None }
    // merged view = main's survivors minus the branch's removals, plus the
    // branch's additions (staged under UUID subdirs — never colliding with
    // main's). Each entry carries its own manifest stats.
    val merged = mainEntries.filterNot(e => brRemoved.contains(e.path)) ++
      brEntries.filterNot(e => basePaths.contains(e.path))
    // every carried file must map correctly under the FLATTENED merged id
    // map the overwrite commit records — a spanning rename breaks that
    // (an added-after-write column reading NULL is the normal contract)
    if (mergedIds.exists(m => !merged.forall(e =>
        SnapshotTable.idCompatible(e.writeIds, m))))
      conflicts += s"branch '$name' spans a column rename; merge after OPTIMIZE"
    val cs = conflicts.result()
    if (cs.nonEmpty) Left(cs)
    else Right(MergePlan(merged, mergedDdl.get, mergedIds.get, mergedLay.get))
  }

  private def threeWayMerge(name: String, ref: SnapshotTable.LakeRef,
                            log: Seq[LakeCommit], basePrefix: Seq[LakeCommit],
                            branchLog: Seq[LakeCommit], bcs: Seq[LakeCommit],
                            current: Long): Long =
    threeWayAnalysis(name, ref, log, basePrefix, branchLog, bcs) match {
      case Left(cs) => throw new java.util.ConcurrentModificationException(
        s"MERGE BRANCH $name: ${cs.mkString("; ")}; re-stage the " +
          "conflicting change on a fresh branch")
      case Right(plan) =>
        val rel = plan.entries.map(e => (e.path.stripPrefix(s"$dir/"), e.stats))
        publish(current + 1, "overwrite", rel.map(_._1),
          rel.filter(_._2.nonEmpty).toMap, "", plan.schemaDdl,
          log.lastOption.map(_.timestampMs).getOrElse(0L), log, plan.ids,
          plan.layout._1, plan.layout._2, plan.layout._3)
    }

  /** `MERGE BRANCH ... DRY RUN` (Nessie merge's dry-run flag): report what
    * the merge WOULD do — "fast_forward", "three_way" (clean), or
    * "conflict" with the messages — without publishing anything. Advisory
    * by nature (no lock held): a commit landing after the answer can
    * change it, exactly like Nessie's. */
  def mergeDryRun(name: String): (String, Seq[String]) = {
    val ref = getRef(name)
    require(ref.refType == "branch", s"'$name' is a tag and cannot be merged")
    val log = commits
    val current = log.lastOption.map(_.version).getOrElse(0L)
    val bcs = branchCommits(name)
    if (bcs.isEmpty) return ("empty", Seq("branch has no commits to merge"))
    val basePrefix = log.takeWhile(_.version <= ref.baseVersion)
    if (current == ref.baseVersion) return ("fast_forward", Nil)
    threeWayAnalysis(name, ref, log, basePrefix, basePrefix ++ bcs, bcs) match {
      case Left(cs) => ("conflict", cs)
      case Right(_) => ("three_way", Nil)
    }
  }

  /** MERGE-by-key (upsert) with snapshot isolation AND conflict detection:
    * delta rows replace same-key target rows, the rest are kept, and the
    * swap publishes only against the base version it read (retried against
    * the new base if a concurrent commit lands first). In-flight readers
    * keep the pre-merge snapshot.
    *
    * Granularity: only files whose manifest key range intersects the
    * delta's [min, max] key span are rewritten (plus stat-less files);
    * files provably outside it are carried by reference — a merge into a
    * key-clustered 100 TB table costs O(touched partitions), not O(table). */
  def mergeByKey(delta: DataFrame, key: String): Long =
    mergeByKeyImpl(delta, key, tag = "")

  /** Idempotent upsert: a no-op returning the original commit's version if
    * a commit with `tag` already exists — the replay-safety contract a
    * streaming CDC pipe needs (the tag check re-runs on every optimistic
    * retry, so a replica winning a retry race is also absorbed). */
  def mergeByKeyTagged(delta: DataFrame, key: String, tag: String): Long = {
    require(tag.nonEmpty, "tag must be non-empty")
    mergeByKeyImpl(delta, key, tag)
  }

  private def mergeByKeyImpl(delta: DataFrame, key: String, tag: String): Long = {
    import org.apache.spark.sql.functions.{col, lit, max, min}
    // the delta plan runs several times (key-span probe, anti-join, union —
    // and again per conflict retry); pin it so an expensive SELECT behind
    // a SQL MERGE executes once
    delta.persist()
    try {
      val mm = delta.agg(min(col(key)).as("lo"), max(col(key)).as("hi")).head()
      val touch =
        if (mm.isNullAt(0)) lit(false) // empty/all-null delta touches nothing
        else col(key) >= lit(mm.get(0)) && col(key) <= lit(mm.get(1))
      copyOnWrite(base =>
        base
          .join(delta.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(delta),
        touch = Some(touch),
        tag = tag)
    } finally delta.unpersist()
  }

  /** ANSI MERGE with clause semantics (reference SqlMergeIntoTable,
    * `Parser.tdd:624`; Iceberg copy-on-write MERGE): target rows are
    * matched to source rows on `key` equality; the FIRST `WHEN MATCHED`
    * clause (in order) whose condition holds applies UPDATE SET / DELETE
    * to the pair; a matched row selecting no clause stays unchanged;
    * source rows matching nothing insert when the `WHEN NOT MATCHED`
    * clause accepts them. Conditions and SET expressions are SQL text over
    * aliases `t` (target) and `s` (source), e.g. `"s.bal < t.bal"`.
    *
    * Duplicate (non-null) source keys are rejected up front — ANSI MERGE
    * forbids one target row being updated by several source rows, and
    * failing deterministically beats nondeterministic clause application.
    *
    * Scale shape = mergeByKey's: one conflict-checked copy-on-write
    * commit whose `touch` predicate is the delta's key span, so only
    * files that may hold matched keys are rewritten (partial rewrite);
    * everything else is carried by reference. The insert anti-join runs
    * against the rewrite subset only, which is sound because every base
    * row whose key falls inside the span lives in that subset. */
  def merge(delta: DataFrame, key: String,
            matched: Seq[SnapshotTable.WhenMatched],
            notMatched: Option[SnapshotTable.WhenNotMatched]): Long = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, expr, lit, max, min, when}
    import SnapshotTable.{MatchedAction, WhenMatched, WhenNotMatched}
    require(matched.nonEmpty || notMatched.nonEmpty,
      "MERGE needs at least one WHEN clause")
    delta.persist()
    try {
      val dup = delta.filter(col(key).isNotNull)
        .groupBy(col(key)).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"MERGE source has duplicate values of '$key'" +
          (if (dup.nonEmpty) s" (e.g. ${dup.head.get(0)})" else ""))
      val mm = delta.agg(min(col(key)).as("lo"), max(col(key)).as("hi")).head()
      val touch: Column =
        if (mm.isNullAt(0)) {
          // no non-null source keys: nothing can match — inserts only
          if (notMatched.isEmpty) return latestVersion
          lit(false)
        } else col(key) >= lit(mm.get(0)) && col(key) <= lit(mm.get(1))
      copyOnWrite({ base =>
        val fields = base.schema.fields.toSeq
        // marker survives the outer join even for all-NULL source rows
        val src = delta.withColumn("__g_src", lit(true)).alias("s")
        val joined = base.alias("t")
          .join(src, col(s"t.`$key`") === col(s"s.`$key`"), "left_outer")
        val isMatched = col("s.__g_src").isNotNull
        // first clause (by position) whose condition holds; -1 = keep as-is
        val sel = matched.zipWithIndex.foldRight(lit(-1)) { case ((wm, i), els) =>
          when(wm.condSql.map(expr).getOrElse(lit(true)), lit(i)).otherwise(els)
        }
        val withAct = joined.withColumn("__g_act",
          when(isMatched, sel).otherwise(lit(-1)))
        val deleteIdx = matched.zipWithIndex.collect {
          case (WhenMatched(_, MatchedAction.Delete), i) => i
        }
        val kept = deleteIdx.foldLeft(withAct)((df, i) => df.filter(col("__g_act") =!= i))
        val projected = fields.map { f =>
          matched.zipWithIndex.foldRight(col(s"t.`${f.name}`")) { case ((wm, i), els) =>
            wm.action match {
              case MatchedAction.Update(sets) =>
                sets.find(_._1.equalsIgnoreCase(f.name)) match {
                  case Some((_, e)) => when(col("__g_act") === i, expr(e)).otherwise(els)
                  case None => els
                }
              case MatchedAction.UpdateAll =>
                when(col("__g_act") === i, col(s"s.`${f.name}`")).otherwise(els)
              case MatchedAction.Delete => els
            }
          }.cast(f.dataType).as(f.name)
        }
        val updated = kept.select(projected: _*)
        notMatched match {
          case Some(WhenNotMatched(condSql)) =>
            val ins0 = delta.alias("s").join(
              base.select(col(key)).distinct().alias("tk"),
              col(s"s.`$key`") === col(s"tk.`$key`"), "left_anti")
            val ins = condSql.map(c => ins0.filter(expr(c))).getOrElse(ins0)
            updated.unionByName(ins.select(
              fields.map(f => col(s"s.`${f.name}`").cast(f.dataType).as(f.name)): _*))
          case None => updated
        }
      }, touch = Some(touch))
    } finally delta.unpersist()
  }

  /** Row-level CDC between two versions at O(changed files): reads ONLY
    * the data files added or removed in `(fromVersion, toVersion]` and
    * multiset-diffs them, so unchanged files never leave the manifest and
    * a partial-rewrite DML's change feed costs O(rewritten files), not
    * O(table). Returns the table columns plus `_change_type`
    * ('insert' | 'delete'); an update appears as delete(old row) +
    * insert(new row). Unlike `changes()` (add-only incremental scan) this
    * is exact across copy-on-write DML, compaction, and overwrites:
    * rows a rewrite carried verbatim into new files cancel out of the
    * multiset diff. (Iceberg's changelog scan / Delta CDF re-expressed as
    * a file-diff + exceptAll — no change files are ever written.) */
  def changesBetween(fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(toVersion > fromVersion,
      s"changesBetween needs fromVersion < toVersion (got $fromVersion, $toVersion)")
    val fromVis = visibleCommits(Some(fromVersion), None)
    val toVis = visibleCommits(Some(toVersion), None)
    val (fromEntries, _, _) = replayEntries(fromVis)
    val (toEntries, toSchema, toIds) = replayEntries(toVis)
    val fromPaths = fromEntries.map(_.path).toSet
    val toPaths = toEntries.map(_.path).toSet
    val added = toEntries.filterNot(e => fromPaths(e.path))
    val removed = fromEntries.filterNot(e => toPaths(e.path))
    val tfs = specTransforms(toVis)
    // both sides read under the END schema: removed files resolve through
    // their own write-time field ids, so renames/evolution in the range
    // diff correctly (an added column reads NULL from pre-evolution files)
    def scan(es: Vector[FileEntry]): DataFrame = buildMappedScan(es, toSchema, toIds, tfs)
    val ins = scan(added).exceptAll(scan(removed))
    val del = scan(removed).exceptAll(scan(added))
    ins.withColumn("_change_type", lit("insert"))
      .unionByName(del.withColumn("_change_type", lit("delete")))
  }

  /** Streaming change feed over `(fromVersion, toVersion]`: the table
    * columns plus `_change_type` ('insert' | 'delete') and
    * `_commit_version`, emitted PER COMMIT so a micro-batch covering
    * several versions still attributes every row to the commit that
    * produced it (the Delta CDF / Iceberg changelog-scan column contract).
    * Append commits short-circuit to a direct scan of their added files
    * tagged 'insert' — zero diff work, the overwhelmingly common case
    * under continuous ingest; only DML/compaction/overwrite commits pay
    * [[changesBetween]]'s O(rewritten files) multiset diff. All frames
    * must resolve to one schema — mid-range schema evolution is refused
    * (the streaming source pins its schema anyway). */
  def changeFeed(fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(toVersion > fromVersion,
      s"changeFeed needs fromVersion < toVersion (got $fromVersion, $toVersion)")
    val cs = commits.filter(c => c.version > fromVersion && c.version <= toVersion)
    require(cs.nonEmpty, s"no commits in ($fromVersion, $toVersion]")
    val perVersion = cs.map { c =>
      val changed =
        if (c.action == "append")
          appendsBetween(c.version - 1, c.version)
            .withColumn("_change_type", lit("insert"))
        else changesBetween(c.version - 1, c.version)
      changed.withColumn("_commit_version", lit(c.version))
    }
    val head = perVersion.head
    perVersion.tail.foreach { df =>
      require(df.schema.map(f => (f.name, f.dataType)) ==
                head.schema.map(f => (f.name, f.dataType)),
        s"change feed crosses a schema change inside ($fromVersion, $toVersion] " +
          "— restart the stream to adopt the new schema")
    }
    perVersion.reduce(_.unionByName(_))
  }

  /** DELETE WHERE: rewrite only the files that may hold matching rows
    * (manifest-stats decided), carrying the rest by reference — one atomic
    * conflict-checked overwrite commit (the reference gets row-level DML
    * from Iceberg copy-on-write; same shape AND granularity here). */
  def deleteWhere(cond: org.apache.spark.sql.Column): Long =
    copyOnWrite(base => base.filter(!cond || cond.isNull), touch = Some(cond))

  /** Dry-run analysis of a copy-on-write DML (reference
    * SqlExplainQueryDML — `EXPLAIN PLAN FOR DELETE|UPDATE` without
    * executing): the exact manifest prune the real statement's
    * `copyOnWrite(touch = cond)` performs, reported instead of applied.
    * Returns (live files, files the rewrite would touch, files carried by
    * reference, upper bound on rewritten rows when every candidate
    * recorded a manifest count, bytes to rewrite when recorded,
    * partial-rewrite eligible). METADATA-ONLY — zero data files open; at
    * a 100 TB table this is how an operator checks a DELETE will rewrite
    * 3 files and not 30,000 before running it. */
  def explainDml(cond: org.apache.spark.sql.Column,
                 ref: Option[String] = None)
      : (Int, Int, Int, Option[Long], Option[Long], Boolean) = {
    // forecast against the SAME snapshot the real statement would touch:
    // a branch ref replays the branch-visible log, not main's
    val log = this.log(ref)
    val (entries, schema, curIds) = replayEntries(log)
    val tfs = specTransforms(log)
    val uniformIds = entries.forall(_.writeIds == curIds)
    val resolvedOpt =
      if (!uniformIds) None
      else resolveCond(buildMappedScan(entries, schema, curIds, tfs), cond)
    val (rewriteEntries, carried) = resolvedOpt match {
      case Some(resolved) =>
        val types = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
        val pc = new java.util.IdentityHashMap[
          org.apache.spark.sql.catalyst.expressions.Expression, AnyRef]()
        entries.partition(e => LakeFileIndex.mayMatch(e.stats, types, resolved, tfs, pc))
      case None => (entries, Vector.empty[FileEntry])
    }
    val rows = SnapshotTable.rowsFromStats(rewriteEntries.map(_.stats))
    val bytesEach = rewriteEntries
      .map(_.stats.get(SnapshotTable.BytesStatKey)
        .flatMap(v => scala.util.Try(v._1.toLong).toOption))
    val bytes = if (bytesEach.forall(_.isDefined)) Some(bytesEach.flatten.sum) else None
    (entries.size, rewriteEntries.size, carried.size, rows, bytes,
      resolvedOpt.isDefined)
  }

  /** UPDATE ... SET: copy-on-write update of matching rows, one atomic
    * commit. `sets` maps column name → new-value expression. All SET
    * expressions are evaluated in ONE projection so they read PRE-update
    * values (SQL UPDATE semantics: `SET a = b, b = a` swaps). */
  def updateWhere(cond: org.apache.spark.sql.Column,
                  sets: Map[String, org.apache.spark.sql.Column]): Long =
    copyOnWrite(updateProjection(cond, sets), touch = Some(cond))

  /** The UPDATE rewrite as a reusable transform (main and branch DML share
    * it): all SET expressions evaluate in ONE projection so they read
    * PRE-update values (SQL UPDATE semantics: `SET a = b, b = a` swaps). */
  private def updateProjection(cond: org.apache.spark.sql.Column,
                               sets: Map[String, org.apache.spark.sql.Column])
      : DataFrame => DataFrame = { base =>
    import org.apache.spark.sql.functions.{col, when}
    // resolve SET keys case-insensitively (Spark's default resolver) and
    // FAIL on unknown columns — a silently dropped SET would commit a
    // full rewrite of identical data while the caller believes rows changed
    val byLower = base.columns.map(c => c.toLowerCase -> c).toMap
    // duplicate targets after case folding would silently drop one
    // assignment — reject, as SQL engines do
    val dupes = sets.keys.groupBy(_.toLowerCase).filter(_._2.size > 1)
    require(dupes.isEmpty,
      s"UPDATE SET assigns the same column more than once: ${dupes.keys.mkString(", ")}")
    val resolved: Map[String, org.apache.spark.sql.Column] = sets.map { case (k, v) =>
      byLower.getOrElse(k.toLowerCase,
        throw new IllegalArgumentException(
          s"UPDATE SET references unknown column '$k' (have: ${base.columns.mkString(", ")})")) -> v
    }
    base.select(base.columns.toIndexedSeq.map { c =>
      resolved.get(c) match {
        case Some(v) => when(cond, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
  }

  /** Compaction: rewrite the current snapshot into `numFiles` files as one
    * conflict-checked overwrite commit (the small-files answer for a table
    * fed by many append commits; Iceberg rewrite_data_files). A concurrent
    * append retries the compaction so its rows are never dropped. Readers
    * pinned at older versions are untouched — old files stay until
    * vacuum(). */
  def compact(numFiles: Int = 1): Long = copyOnWrite(_.coalesce(numFiles))

  /** Partition-scoped compaction (Iceberg `rewrite_data_files` with a row
    * filter): rewrite into `numFiles` only the files whose MANIFEST stats
    * say they may hold rows matching `cond` — a hot partition's small
    * files re-lay-out while cold data is carried by reference, so the
    * commit costs O(touched files), not O(table). Rows are never filtered
    * (the transform is a pure coalesce); `cond` only SELECTS files. */
  def compactWhere(cond: org.apache.spark.sql.Column, numFiles: Int = 1): Long =
    copyOnWrite(_.coalesce(numFiles), touch = Some(cond))

  /** Size-based BIN_PACK compaction (reference SqlOptimize's
    * MIN/MAX/TARGET_FILE_SIZE_MB + MIN_INPUT_FILES options; the Iceberg
    * rewrite_data_files bin-pack contract): ONLY files outside the healthy
    * [minFileBytes, maxFileBytes] band rewrite — packed into
    * ceil(candidate bytes / targetFileBytes) files — and every healthy
    * file carries by reference, untouched. The candidate census comes
    * from manifest-carried sizes (zero filesystem calls); fewer than
    * `minInputFiles` candidates is a NO-OP returning the current version
    * (maintenance must not churn versions for nothing). At 100 TB this is
    * THE compaction shape: bin-pack the small-file tail of a streaming
    * ingest without ever rewriting the petabytes of healthy data. */
  def compactBySize(minFileBytes: Long,
                    maxFileBytes: Long = Long.MaxValue,
                    targetFileBytes: Long = 256L * 1024 * 1024,
                    minInputFiles: Int = 1): Long = {
    def sizeOf(st: Map[String, (String, String)]): Option[Long] =
      st.get(SnapshotTable.BytesStatKey).map(_._1.toLong)
    // a file with no recorded size (legacy commit) counts as a candidate —
    // conservative: it gets rewritten and gains a size record
    def isCandidate(st: Map[String, (String, String)]): Boolean =
      sizeOf(st).forall(s => s < minFileBytes || s > maxFileBytes)
    val entries = snapshotWithStats()._1
    val cands = entries.filter(e => isCandidate(e._2))
    if (cands.size < math.max(1, minInputFiles)) return latestVersion
    val bytes = cands.flatMap(e => sizeOf(e._2)).sum
    val n = math.max(1, math.ceil(bytes.toDouble /
      math.max(1L, targetFileBytes)).toInt)
    copyOnWrite(_.coalesce(n), selectFiles = Some(e => isCandidate(e.stats)))
  }

  /** OPTIMIZE ... REWRITE MANIFESTS (reference SqlOptimize's manifest arm;
    * Iceberg rewrite_manifests): compact the METADATA only — write a log
    * checkpoint at the current head so a cold reader replays ONE file
    * instead of O(versions) commit jsons, and drop superseded checkpoints.
    * Zero data files move; idempotent at an already-checkpointed head. */
  def rewriteManifests(): Long = withCommitLock {
    val log = commits
    require(log.nonEmpty, s"empty lake table $dir")
    val v = log.last.version
    val name = f"ckpt-v$v%08d.json"
    if (!LakeIO.listNames(logDir).contains(name)) {
      val ckTmp = logDir.resolve(
        name + "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      try {
        LakeIO.writeString(ckTmp, renderCheckpoint(log))
        LakeIO.publish(ckTmp, logDir.resolve(name))
        LakeIO.listNames(logDir)
          .filter(n => n.matches("ckpt-v\\d{8}\\.json") && n < name)
          .foreach(n => LakeIO.deleteIfExists(logDir.resolve(n)))
      } finally LakeIO.deleteIfExists(ckTmp)
    }
    v
  }

  /** Clustering compaction (Iceberg rewrite_data_files with sort order):
    * rewrite the current snapshot range-clustered + sorted on `cols` into
    * ~`numFiles` files, and START recording min/max manifest stats on
    * those columns — the maintenance op that restores plan-time pruning
    * after many unclustered appends. One conflict-checked overwrite
    * commit; the recorded stats columns persist, so later copy-on-write
    * rewrites keep re-clustering by them. On a partition-transformed table
    * the spec still wins the file layout (files are per partition tuple);
    * the sort then clusters rows WITHIN each partition. */
  def compactSorted(cols: Seq[String], numFiles: Int = 1): Long = {
    require(cols.nonEmpty, "compactSorted needs at least one cluster column")
    import org.apache.spark.sql.functions.col
    copyOnWrite(df =>
      df.repartitionByRange(math.max(1, numFiles), cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*),
      extraStatsCols = cols,
      // on a partitioned table commit() re-shuffles by partition tuple,
      // which would discard this clustering — thread the sort columns so
      // the write re-sorts within each partition
      sortCols = cols, presorted = true)
  }

  /** Multi-column Z-order clustering compaction (the Delta OPTIMIZE
    * ZORDER BY / Iceberg sort-order analog; reference: sort-optimized
    * reflection layouts). Each cluster column is normalized to a
    * `bits`-wide bucket — linear min→max scaling for numeric/date/
    * timestamp columns (one stats pass over the table), hash-spread for
    * other types (clusters equal values, so equality predicates still
    * prune) — the buckets' bits are interleaved into one Z-value, and the
    * rewrite range-partitions + sorts by it. Unlike [[compactSorted]]
    * (lexicographic — only the LEADING column's per-file range stays
    * narrow), Z-order keeps every cluster column's per-file min/max span
    * a small fraction of its domain, so manifest pruning serves
    * predicates on ANY clustered column. Stats on the cluster columns are
    * (re)recorded with the rewrite, so pruning improves immediately. */
  def compactZorder(cols: Seq[String], numFiles: Int = 1): Long = {
    require(cols.size >= 2,
      "Z-order needs at least two cluster columns (one column: compactSorted)")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    copyOnWrite(df => {
      val n = cols.size
      val bits = math.min(16, 63 / n)
      val maxB = (1L << bits) - 1
      val fields = cols.map { c =>
        df.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(s"Z-order: no such column '$c'"))
      }
      def linearize(f: StructField): Option[org.apache.spark.sql.Column] =
        f.dataType match {
          case _: NumericType => Some(col(f.name).cast("double"))
          case DateType => Some(unix_date(col(f.name)).cast("double"))
          case TimestampType | TimestampNTZType =>
            Some(unix_micros(col(f.name).cast("timestamp")).cast("double"))
          case _ => None
        }
      // one aggregation pass collects min/max for every linearizable column
      val statAggs = fields.flatMap(f => linearize(f).toSeq.flatMap(e => Seq(min(e), max(e))))
      val statRow = if (statAggs.nonEmpty) df.agg(statAggs.head, statAggs.tail: _*).head() else null
      var si = 0
      val buckets = fields.map { f =>
        linearize(f) match {
          case Some(e) =>
            val (mn, mx) =
              (if (statRow.isNullAt(si)) 0.0 else statRow.getDouble(si),
               if (statRow.isNullAt(si + 1)) 0.0 else statRow.getDouble(si + 1))
            si += 2
            if (mx <= mn) lit(0L)
            else least(lit(maxB), greatest(lit(0L),
              floor((e - lit(mn)) / lit(mx - mn) * lit(maxB.toDouble))))
          case None => pmod(xxhash64(col(f.name)), lit(maxB + 1))
        }
      }.map(b => coalesce(b, lit(0L))) // NULLs cluster at the low corner
      val z = (0 until bits).flatMap(bit => buckets.zipWithIndex.map { case (b, ci) =>
        shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)), bit * n + ci)
      }).reduce(_.bitwiseOR(_))
      df.withColumn("__z", z)
        .repartitionByRange(math.max(1, numFiles), col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    }, extraStatsCols = cols, sortCols = cols, presorted = true)
  }

  /** Remove data files referenced by NO retained snapshot (the last
    * `retainLast` versions). Time travel to expired versions stops working
    * — same contract as Iceberg's expire_snapshots. Files younger than
    * `graceMs` are kept even when unreferenced: an in-flight writer stages
    * data BEFORE publishing its commit, and deleting those files would
    * corrupt the commit it is about to make (Iceberg's orphan-file
    * retention window, default 1 h). Returns deleted paths. */
  /** Timestamp-based expiry (reference `SqlVacuumTable`'s
    * `EXPIRE SNAPSHOTS OLDER_THAN ts [RETAIN_LAST n]`, Iceberg
    * `expire_snapshots(older_than =>)`): keep every commit stamped at or
    * after `cutoffMs`, but never fewer than `retainLast` (floor 1), then
    * delete what nothing retained references — the age rule and the count
    * rule compose as a max, exactly Iceberg's contract. */
  def vacuumOlderThan(cutoffMs: Long, retainLast: Int = 1,
                      graceMs: Long = 3600000L): Seq[String] = {
    val all = commits
    if (all.isEmpty) return Nil
    // Retained set = the suffix starting at the FIRST commit stamped at or
    // after the cutoff (snapshots are cumulative, so retention must be a
    // version suffix). Selecting by position-of-first-match rather than by
    // count keeps the rule honest under writer clock skew: a late commit
    // carrying an early timestamp stays retained because a commit at/after
    // the cutoff precedes it, instead of silently pushing a genuinely
    // at-cutoff commit out of a count-sized window.
    val idx = all.indexWhere(_.timestampMs >= cutoffMs)
    val byAge = if (idx < 0) 0 else all.length - idx
    vacuum(math.max(1, math.max(byAge, retainLast)), graceMs)
  }

  def vacuum(retainLast: Int, graceMs: Long = 3600000L): Seq[String] = {
    require(retainLast >= 1, "vacuum must retain at least the current snapshot")
    val all = commits
    if (all.isEmpty) return Nil
    val keptVersions = all.takeRight(retainLast).map(_.version)
    // refs pin history beyond the retention window: a tag's snapshot and
    // every branch's full file view (fork prefix + staged commits) stay
    // referenced until the ref is dropped
    val refFiles: Set[String] = listRefs.flatMap { r =>
      replayEntries(refLog(r))._1.map(_.path)
    }.toSet
    val referenced: Set[String] =
      keptVersions.flatMap(v => snapshot(Some(v))._1).toSet ++ refFiles
    val cutoff = System.currentTimeMillis() - graceMs
    val root = LakeIO.path(dir)
    // Compare referenced-vs-walked through ONE canonical spelling: the log
    // records `$dir/$file` in the caller's spelling while walkParquet yields
    // Hadoop-qualified URIs (file:///x vs file:/x would otherwise make every
    // live file look unreferenced and vacuum would eat the table).
    def norm(raw: String): String = LakeIO.qualified(LakeIO.path(raw))
    val logPrefix = norm(logDir.raw) + "/"
    val referencedNorm = referenced.map(norm)
    val walked = LakeIO.walkParquet(root)
      .filter(p => !norm(p.raw).startsWith(logPrefix))
    // Sanity guard: the retained snapshot's files MUST be on disk, so if the
    // table references files but the walk matched none of them, the spelling
    // or the walk is broken — refuse rather than delete all live data.
    if (referencedNorm.nonEmpty && walked.nonEmpty &&
        !walked.exists(p => referencedNorm.contains(norm(p.raw))))
      throw new IllegalStateException(
        s"vacuum refused for $dir: none of the ${referencedNorm.size} " +
        s"referenced data files matched any of the ${walked.size} files on " +
        "disk — path-spelling mismatch would delete all live data")
    val dataFiles = walked
      .filter { p =>
        // a file deleted by a concurrent vacuum between walk and stat is
        // simply no longer our problem — skip, don't abort
        try LakeIO.mtimeMillis(p) < cutoff
        catch { case _: java.io.IOException => false
                case _: java.io.UncheckedIOException => false }
      }
      .map(_.raw)
    val doomed = dataFiles.filterNot(p => referencedNorm.contains(norm(p)))
    doomed.foreach(p => LakeIO.deleteIfExists(LakeIO.path(p)))
    // also sweep staging leftovers from writers that died pre-publish
    // (UUID-named *.tmp in the log dir), under the same grace window
    if (LakeIO.isDirectory(logDir))
      LakeIO.listNames(logDir)
        .filter(_.endsWith(".tmp"))
        .filter { n =>
          try LakeIO.mtimeMillis(logDir.resolve(n)) < cutoff
          catch { case _: java.io.IOException => false
                  case _: java.io.UncheckedIOException => false }
        }
        .foreach(n => LakeIO.deleteIfExists(logDir.resolve(n)))
    spark.catalog.refreshByPath(dir)
    doomed
  }

  /** VACUUM LAKE ... REMOVE ORPHAN FILES (reference `SqlVacuumTable`'s
    * `REMOVE ORPHAN FILES [OLDER_THAN ts] [LOCATION p]`,
    * `VacuumTableRemoveOrphanFilesOptions` — the Iceberg
    * `remove_orphan_files` action): delete files under the table root (or
    * the narrower `location`) that NO commit — any version on main, any
    * branch/tag — references: crashed-writer leftovers, files from
    * aborted compactions. Unlike [[vacuum]]/[[vacuumOlderThan]] this
    * expires NOTHING — every snapshot stays time-travelable, which is why
    * the referenced set is the union over ALL commits (each file any
    * snapshot serves appears in the commit that added it), not a retained
    * suffix. `cutoffMs` age-gates deletion so an in-flight writer's
    * staged-but-unpublished files survive (Iceberg's 3-day default lives
    * in the SQL layer). Metadata-only cost: one log read + one tree walk;
    * no data file is opened. Returns deleted paths. */
  def removeOrphanFiles(cutoffMs: Long, location: Option[String] = None): Seq[String] = {
    val all = commits
    if (all.isEmpty) return Nil
    val referenced: Set[String] =
      (all.flatMap(_.files).map(f => s"$dir/$f") ++
        listRefs.flatMap(r => replayEntries(refLog(r))._1.map(_.path))).toSet
    def norm(raw: String): String = LakeIO.qualified(LakeIO.path(raw))
    val logPrefix = norm(logDir.raw) + "/"
    val referencedNorm = referenced.map(norm)
    val scope = location.map(l => norm(l) + "/")
    scope.foreach(s => require(s.startsWith(norm(dir) + "/") || s == norm(dir) + "/",
      s"REMOVE ORPHAN FILES: LOCATION must be under the table root $dir"))
    val walked = LakeIO.walkParquet(LakeIO.path(dir))
      .filter(p => !norm(p.raw).startsWith(logPrefix))
      .filter(p => scope.forall(s => (norm(p.raw) + "/").startsWith(s) ||
        norm(p.raw).startsWith(s)))
    // same sanity guard as vacuum: if NO referenced file matches the walk,
    // the path spelling is broken — refuse rather than eat live data
    if (referencedNorm.nonEmpty && walked.nonEmpty && scope.isEmpty &&
        !walked.exists(p => referencedNorm.contains(norm(p.raw))))
      throw new IllegalStateException(
        s"remove orphan files refused for $dir: none of the " +
          s"${referencedNorm.size} referenced data files matched any of the " +
          s"${walked.size} files on disk — path-spelling mismatch would " +
          "delete all live data")
    val doomed = walked
      .filter { p =>
        try LakeIO.mtimeMillis(p) < cutoffMs
        catch { case _: java.io.IOException => false
                case _: java.io.UncheckedIOException => false }
      }
      .map(_.raw)
      .filterNot(p => referencedNorm.contains(norm(p)))
    doomed.foreach(p => LakeIO.deleteIfExists(LakeIO.path(p)))
    spark.catalog.refreshByPath(dir)
    doomed
  }

  /** ALTER TABLE RENAME COLUMN: a metadata-only commit (no data files)
    * whose schema carries the new name mapped to the OLD field id, so every
    * file already on disk keeps serving its values under the new name —
    * and time travel to a pre-rename version still shows the old name.
    * (Iceberg column identity; the reference inherits it via
    * `exec/store/iceberg/` field-id mapping. Name-based evolution would
    * silently read a rename as drop+add: history goes NULL.) */
  /** Current table properties (reference SqlShowTableProperties /
    * `AlterTablePropertiesHandler.java`): the last commit that DECLARED a
    * property map wins; commits in between inherit. */
  def properties: Map[String, String] =
    commits.reverseIterator.collectFirst {
      case c if c.tableProps.isDefined => c.tableProps.get
    }.getOrElse(Map.empty)

  /** ALTER ... ADD PRIMARY KEY (reference SqlAlterTableAddPrimaryKey,
    * `alter.ftl`): INFORMATIONAL key metadata, exactly the reference's
    * contract — never enforced on write (no engine at this scale
    * validates uniqueness per commit), consumed by catalog surfaces
    * (Flight SQL GetPrimaryKeys, SHOW CREATE LAKE) and available to
    * planners/joiner tooling. Stored as a table property, so it is
    * versioned, branch-aware and survives DML like any other metadata. */
  def setPrimaryKey(cols: Seq[String]): Long = {
    require(cols.nonEmpty, "PRIMARY KEY needs at least one column")
    val have = snapshot()._2.fieldNames.map(_.toLowerCase).toSet
    val missing = cols.filterNot(c => have(c.toLowerCase))
    require(missing.isEmpty,
      s"PRIMARY KEY columns not in schema: ${missing.mkString(", ")}")
    setProperties(Map(SnapshotTable.PkPropKey -> cols.mkString(",")))
  }

  /** ALTER ... DROP PRIMARY KEY. */
  def dropPrimaryKey(): Long = unsetProperties(Seq(SnapshotTable.PkPropKey))

  /** Declared (informational) primary-key columns, empty when none. */
  def primaryKey: Seq[String] =
    properties.get(SnapshotTable.PkPropKey).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  /** ALTER ... SET TBLPROPERTIES: metadata-only commit declaring the
    * merged map (existing keys overwritten, others kept). */
  def setProperties(kvs: Map[String, String]): Long = {
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val cur = log.reverseIterator.collectFirst {
        case c if c.tableProps.isDefined => c.tableProps.get
      }.getOrElse(Map.empty)
      val (eff, _) = idState(log)
      val (effSpec, effStats, effSort) = effectiveLayoutOf(log)
      publish(last.version + 1, "append", Nil, Map.empty, "",
        last.schemaDdl, last.timestampMs, log, eff, effSpec, effStats,
        effSort, Some(cur ++ kvs))
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** ALTER ... SET PARTITION SPEC: partition-spec EVOLUTION as a
    * metadata-only commit (the Iceberg `ALTER TABLE ... ADD PARTITION
    * FIELD` contract, whole-spec form): the new sticky spec applies to
    * every FUTURE write — existing data files keep the layout they were
    * written under, stay readable, and keep pruning through their
    * per-file transform ranges (the manifest records each file's own
    * ranges, so mixed-era scans prune correctly without rewrites).
    * An empty spec drops partitioning for future writes. Transforms are
    * validated against [[PartitionTransform.parse]] and the current
    * schema's columns before the commit publishes. */
  def setPartitionSpec(spec: Seq[String]): Long = {
    val parsed = spec.map(PartitionTransform.parse)
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val cols = org.apache.spark.sql.types.StructType
        .fromDDL(last.schemaDdl).fieldNames.map(_.toLowerCase).toSet
      parsed.foreach(t => require(cols.contains(t.srcCol.toLowerCase),
        s"partition transform ${t.repr} names an unknown column " +
          s"(table has: ${cols.toSeq.sorted.mkString(", ")})"))
      val cur = log.reverseIterator.collectFirst {
        case c if c.tableProps.isDefined => c.tableProps.get
      }
      val (eff, _) = idState(log)
      val (_, effStats, effSort) = effectiveLayoutOf(log)
      // empty spec must still DECLARE itself sticky: a marker transform
      // would complicate readers, so record a single no-op-free empty
      // list via a props-style tombstone — effectiveLayoutOf picks the
      // NEWEST non-empty spec, so "drop partitioning" writes a 1-element
      // sentinel the writer side treats as none
      val declared =
        if (parsed.isEmpty) Seq(SnapshotTable.ClearedLayoutSentinel)
        else parsed.map(_.repr) // canonical spelling, matches write-side records
      publish(last.version + 1, "append", Nil, Map.empty, "",
        last.schemaDdl, last.timestampMs, log, eff, declared, effStats,
        effSort, cur)
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** ALTER ... SET SORT ORDER: sort-order EVOLUTION (the Iceberg
    * `ALTER TABLE ... WRITE ORDERED BY` contract) — a metadata-only
    * commit makes every future write/compaction sort its data files by
    * the new columns; existing files keep their recorded order. Empty
    * parens drop the sticky order for future writes. */
  def setSortOrder(cols: Seq[String]): Long = {
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val schemaCols = org.apache.spark.sql.types.StructType
        .fromDDL(last.schemaDdl).fieldNames.map(_.toLowerCase).toSet
      cols.foreach(c => require(schemaCols.contains(c.toLowerCase),
        s"sort column '$c' is not in the table schema " +
          s"(${schemaCols.toSeq.sorted.mkString(", ")})"))
      val cur = log.reverseIterator.collectFirst {
        case c if c.tableProps.isDefined => c.tableProps.get
      }
      val (eff, _) = idState(log)
      val (effSpec, effStats, _) = effectiveLayoutOf(log)
      val declared =
        if (cols.isEmpty) Seq(SnapshotTable.ClearedLayoutSentinel) else cols
      publish(last.version + 1, "append", Nil, Map.empty, "",
        last.schemaDdl, last.timestampMs, log, eff, effSpec, effStats,
        declared, cur)
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** ALTER ... UNSET TBLPROPERTIES: metadata-only commit declaring the
    * map without the named keys (absent keys are a no-op, like the
    * reference's IF EXISTS-free unset). */
  def unsetProperties(keys: Seq[String]): Long = {
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val cur = log.reverseIterator.collectFirst {
        case c if c.tableProps.isDefined => c.tableProps.get
      }.getOrElse(Map.empty)
      val (eff, _) = idState(log)
      val (effSpec, effStats, effSort) = effectiveLayoutOf(log)
      publish(last.version + 1, "append", Nil, Map.empty, "",
        last.schemaDdl, last.timestampMs, log, eff, effSpec, effStats,
        effSort, Some(cur -- keys))
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  def renameColumn(oldName: String, newName: String): Long = {
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val schema = StructType.fromDDL(last.schemaDdl)
      require(schema.fieldNames.contains(oldName),
        s"no column '$oldName' in $dir (have: ${schema.fieldNames.mkString(", ")})")
      require(!schema.fieldNames.contains(newName),
        s"column '$newName' already exists in $dir")
      val (eff, _) = idState(log)
      val newSchema = StructType(schema.fields.map(f =>
        if (f.name == oldName) f.copy(name = newName) else f))
      val newIds = eff.map { case (n, i) => (if (n == oldName) newName else n) -> i }
      // layout metadata follows the rename: the spec/statsCols now name the
      // NEW column, so carried-forward rewrites keep partitioning; files
      // already on disk keep pruning through their own (old-name) commits
      // rename re-declares the EFFECTIVE layout (not just the head commit's,
      // which a plain append may have left empty) under the new name, so
      // inheritance keeps working across the rename
      val (effSpec, effStats, effSort) = effectiveLayoutOf(log)
      val newSpec = effSpec.map(s =>
        scala.util.Try(PartitionTransform.rename(PartitionTransform.parse(s),
          oldName, newName).repr).getOrElse(s))
      val newStatsCols = effStats.map(c => if (c == oldName) newName else c)
      val newSort = effSort.map(c => if (c == oldName) newName else c)
      publish(last.version + 1, "append", Nil, Map.empty, "",
        newSchema.toDDL, last.timestampMs, log, newIds, newSpec, newStatsCols,
        newSort)
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** ALTER TABLE ADD COLUMN: metadata-only commit minting a FRESH field
    * id for the new (nullable) column. Files already on disk read NULL
    * for it — and if the name was ever used before, the fresh id keeps
    * retired data from resurfacing (Iceberg add-column semantics). */
  def addColumn(name: String, typeDdl: String): Long = {
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val schema = StructType.fromDDL(last.schemaDdl)
      require(!schema.fieldNames.exists(_.equalsIgnoreCase(name)),
        s"column '$name' already exists in $dir")
      val dt = org.apache.spark.sql.types.DataType.fromDDL(typeDdl)
      val newSchema = schema.add(name, dt, nullable = true)
      val (eff, maxEver) = idState(log)
      val ids = assignFieldIds(newSchema.fieldNames.toSeq, eff, maxEver)
      val (effSpec, effStats, effSort) = effectiveLayoutOf(log)
      publish(last.version + 1, "append", Nil, Map.empty, "",
        newSchema.toDDL, last.timestampMs, log, ids, effSpec, effStats, effSort)
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** ALTER TABLE CHANGE COLUMN — type WIDENING (reference
    * `SqlAlterTableChangeColumn`; the Iceberg type-promotion contract):
    * int→bigint, float→double, and decimal(p,s)→decimal(p',s) with p'>p
    * are metadata-only commits — the new schema carries the SAME field id
    * so every file on disk keeps serving, upcast at read (Spark 4's
    * parquet reader widens int32→int64/float64 natively). Anything
    * narrower or shape-changing refuses: a narrowing read would truncate
    * silently and Iceberg forbids it for the same reason. Time travel to
    * a pre-change version still reads the old type. */
  def changeColumnType(name: String, newTypeDdl: String): Long = {
    import org.apache.spark.sql.types._
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val schema = StructType.fromDDL(last.schemaDdl)
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
      require(i >= 0, s"no column '$name' in $dir " +
        s"(have: ${schema.fieldNames.mkString(", ")})")
      val from = schema.fields(i).dataType
      val to = DataType.fromDDL(newTypeDdl)
      val widens = (from, to) match {
        case (a, b) if a == b => true
        case (IntegerType, LongType) => true
        case (ShortType, IntegerType | LongType) => true
        case (ByteType, ShortType | IntegerType | LongType) => true
        case (FloatType, DoubleType) => true
        case (a: DecimalType, b: DecimalType) =>
          b.scale == a.scale && b.precision > a.precision
        case _ => false
      }
      require(widens,
        s"CHANGE COLUMN $name: $from -> $to is not a widening promotion " +
          "(allowed: int->bigint, float->double, decimal precision growth)")
      // a bucket(n) transform hashes by TYPE (Murmur3 of int 5 != long 5):
      // retyping a bucketed column would make prune-side literals hash to
      // the wrong bucket and silently SKIP matching files — refuse if any
      // commit ever declared a bucket transform on this column (old files
      // keep their recorded bucket values forever)
      val bucketed = log.exists(_.partitionSpec.exists(r =>
        r.replaceAll("\\s", "").toLowerCase
          .matches(s"bucket\\(\\d+,${java.util.regex.Pattern.quote(name.toLowerCase)}\\)")))
      require(!bucketed,
        s"CHANGE COLUMN $name: the column is (or was) a bucket-transform " +
          "partition source; retyping would corrupt bucket pruning " +
          "(rewrite the table into a new layout first)")
      val newSchema = StructType(schema.fields.updated(i,
        schema.fields(i).copy(dataType = to)))
      val (eff, _) = idState(log)
      val (effSpec, effStats, effSort) = effectiveLayoutOf(log)
      publish(last.version + 1, "append", Nil, Map.empty, "",
        newSchema.toDDL, last.timestampMs, log, eff, effSpec, effStats, effSort)
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** ALTER TABLE DROP COLUMN: metadata-only commit retiring the column's
    * field id (a later re-add mints a fresh id, so the dropped data never
    * resurfaces). Partition transforms and stats columns referencing the
    * column are dropped from the carried-forward layout. Time travel to a
    * pre-drop version still shows it. */
  def dropColumn(name: String): Long = {
    val v = withCommitLock {
      val log = commits
      require(log.nonEmpty, s"empty lake table $dir")
      val last = log.last
      val schema = StructType.fromDDL(last.schemaDdl)
      require(schema.fieldNames.exists(_.equalsIgnoreCase(name)),
        s"no column '$name' in $dir (have: ${schema.fieldNames.mkString(", ")})")
      require(schema.fields.length > 1, s"cannot drop the last column of $dir")
      val newSchema = StructType(schema.fields.filterNot(_.name.equalsIgnoreCase(name)))
      val (eff, maxEver) = idState(log)
      val ids = assignFieldIds(newSchema.fieldNames.toSeq, eff, maxEver)
      val (effSpec, effStats, effSort) = effectiveLayoutOf(log)
      val newSpec = effSpec.filterNot(s =>
        scala.util.Try(PartitionTransform.parse(s).srcCol.equalsIgnoreCase(name))
          .getOrElse(false))
      val newStats = effStats.filterNot(_.equalsIgnoreCase(name))
      val newSort = effSort.filterNot(_.equalsIgnoreCase(name))
      publish(last.version + 1, "append", Nil, Map.empty, "",
        newSchema.toDDL, last.timestampMs, log, ids, newSpec, newStats, newSort)
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** ROLLBACK TO VERSION: republish version `v`'s exact file set (stats
    * and all) as a NEW overwrite commit — history stays intact, time
    * travel to the bad commits still works, and no data is rewritten when
    * column identity is uniform (carry by reference, O(1) data). A rename
    * since `v` forces a materializing rewrite so old files aren't
    * misattributed to current ids (Iceberg rollback_to_snapshot / Delta
    * RESTORE semantics). */
  def restoreVersion(v: Long): Long = {
    val carried = withCommitLock {
      val log = commits
      require(log.exists(_.version == v),
        s"no version $v in $dir (latest=${log.lastOption.map(_.version).getOrElse(0L)})")
      val visible = log.takeWhile(_.version <= v)
      val (entries, _, vIds) = replayEntries(visible)
      if (entries.forall(_.writeIds == vIds)) {
        val rel = entries.map(e => (e.path.stripPrefix(s"$dir/"), e.stats))
        val (effSpec, effStats, effSort) = effectiveLayoutOf(visible)
        Some(publish(log.last.version + 1, "overwrite", rel.map(_._1),
          rel.filter(_._2.nonEmpty).toMap, "", visible.last.schemaDdl,
          log.last.timestampMs, log, vIds, effSpec, effStats, effSort))
      } else None
    }
    val out = carried.getOrElse(overwrite(asOf(v)))
    spark.catalog.refreshByPath(dir)
    out
  }

  /** (current field ids, highest id ever minted) after the last commit.
    * Legacy logs (written before ids were recorded) are backfilled by
    * chaining name inheritance from the first commit — exact, since legacy
    * history cannot contain renames. DDL parsing only happens for the
    * legacy prefix: once a commit records ids, all later ones do too. */
  private def idState(log: Seq[LakeCommit]): (Map[String, Int], Int) = {
    var eff = Map.empty[String, Int]
    var maxEver = 0
    log.foreach { c =>
      eff =
        if (c.fieldIds.nonEmpty) c.fieldIds
        else assignFieldIds(StructType.fromDDL(c.schemaDdl).fieldNames.toSeq, eff, maxEver)
      maxEver = math.max(maxEver, (eff.valuesIterator ++ Iterator(0)).max)
    }
    (eff, maxEver)
  }

  /** Write data files for the commit, then claim the next version.
    * `expectedBase` (overwrites only): fail with
    * ConcurrentModificationException — inside the lock, before publishing —
    * if another writer has committed past that version, so a read-modify-
    * write can never erase a concurrent commit.
    * `partitionBy` directory-partitions the batch by the transform values
    * (each data file then holds exactly one partition value) and records
    * each file's transform range in the manifest under the transform repr. */
  private def commit(df: DataFrame, action: String,
                     statsCols: Seq[String] = Nil, tag: String = "",
                     expectedBase: Option[Long] = None,
                     partitionBy: Seq[PartitionTransform] = Nil,
                     // already-committed files carried into this snapshot by
                     // reference (partial rewrites): (relative path, stats)
                     carryFiles: Seq[(String, Map[String, (String, String)])] = Nil,
                     // cluster rows by these columns INSIDE each partition
                     // (OPTIMIZE ... ORDER BY on a partitioned table)
                     sortCols: Seq[String] = Nil,
                     presorted: Boolean = false): Long = {
    val (files, stats) = writeDataFiles(df, partitionBy, statsCols, sortCols, presorted)
    LakeIO.createDirectories(logDir)
    // Publish under a single short-lived commit lock. Data files are
    // already on disk, so the lock covers only the (tag re-check → version
    // claim → json publish) critical section, which (a) linearizes
    // same-tag writers — a replayed batch can never double-commit, (b)
    // makes versions become VISIBLE in order — no retroactive history
    // mutation for incremental consumers, and (c) keeps contention
    // proportional to commit rate, not data size. The log is parsed ONCE
    // inside the section (tag check + next version from the same read).
    val v = withCommitLock {
      val log = commits
      log.find(c => tag.nonEmpty && c.tag == tag) match {
        case Some(existing) => existing.version
        case None =>
          val current = log.lastOption.map(_.version).getOrElse(0L)
          expectedBase.foreach { b =>
            if (current != b)
              throw new java.util.ConcurrentModificationException(
                s"lake table $dir moved from v$b to v$current during a " +
                  "read-modify-write; rewrite must be recomputed against the new base")
          }
          // clamp to the previous commit's timestamp: currentTimeMillis can
          // step backwards (NTP), and one out-of-order timestamp would hide
          // all later commits from TIMESTAMP AS OF's log replay
          val minTs = log.lastOption.map(_.timestampMs).getOrElse(0L)
          // columns keep their stable id when the name survives; new names
          // get fresh ids (drop+re-add = NEW column, Iceberg semantics)
          val (prevIds, maxEver) = idState(log)
          val ids = assignFieldIds(df.schema.fieldNames.toSeq, prevIds, maxEver)
          publish(current + 1, action, carryFiles.map(_._1) ++ files,
            carryFiles.filter(_._2.nonEmpty).toMap ++ stats,
            tag, df.schema.toDDL, minTs, log, ids,
            partitionBy.map(_.repr), statsCols, sortCols)
      }
    }
    spark.catalog.refreshByPath(dir)
    v
  }

  /** Stage a batch's data files under a fresh subdir and compute their
    * manifest stats. Pure data-plane work — no log access, no lock; used
    * by both main-log commits and branch commits. Returns (relative file
    * paths, per-file stats). */
  private def writeDataFiles(df: DataFrame,
                             partitionBy: Seq[PartitionTransform],
                             statsCols: Seq[String],
                             sortCols: Seq[String],
                             presorted: Boolean = false)
      : (Vector[String], Map[String, Map[String, (String, String)]]) = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    val sub = "data-" + java.util.UUID.randomUUID().toString.take(8)
    // declared STATS columns additionally get parquet BLOOM FILTERS: the
    // manifest min/max prune files, the bloom prunes row groups INSIDE a
    // kept file on point predicates — the within-file skipping lever for
    // high-cardinality lookup keys at 100 TB (Iceberg write property
    // `write.parquet.bloom-filter-enabled.column.*`, same contract)
    def withBlooms(w: org.apache.spark.sql.DataFrameWriter[Row])
        : org.apache.spark.sql.DataFrameWriter[Row] =
      statsCols.filter(df.schema.fieldNames.contains)
        .foldLeft(w)((acc, c) =>
          acc.option(s"parquet.bloom.filter.enabled#$c", "true"))
    if (partitionBy.isEmpty) {
      // a sticky sort order applies to UNPARTITIONED writes too: each data
      // file's rows cluster by the sort columns (same per-file contract as
      // the partitioned path below) — UNLESS the caller pre-arranged the
      // rows itself (compactSorted's global sort, compactZorder's Z-curve:
      // a lexicographic re-sort here would destroy the Z-order clustering)
      val src =
        if (sortCols.isEmpty || presorted) df
        else df.sortWithinPartitions(sortCols.map(col): _*)
      withBlooms(src.write).parquet(s"$dir/$sub")
    }
    else {
      // helper partition-value columns exist only in the directory layout
      // (partitionBy moves them out of the files), so file schema == table
      // schema and the read path needs no knowledge of the helpers
      val partCols = partitionBy.zipWithIndex.map { case (t, i) =>
        t.column(col(t.srcCol)).as(s"__gp_$i")
      }
      val names = partitionBy.indices.map(i => s"__gp_$i")
      // cluster rows by partition tuple before the write (Iceberg's hash
      // write-distribution): each tuple lands in ONE task, so a commit adds
      // one file per partition value, not one per (task × value)
      val distributed = df.select(col("*") +: partCols: _*)
        .repartition(names.map(col): _*)
      // the partition shuffle destroys any upstream ordering; re-sort each
      // write task by (partition tuple, sort cols) so a requested ORDER BY
      // clusters rows inside each partition's file — tight parquet
      // row-group stats, not just tight files
      val clustered =
        if (sortCols.isEmpty) distributed
        else distributed.sortWithinPartitions((names ++ sortCols).map(col): _*)
      withBlooms(clustered.write).partitionBy(names: _*).parquet(s"$dir/$sub")
    }
    val dataDir = LakeIO.path(dir, sub)
    // A layout with exactly ONE bucket transform stamps each staged file
    // with its Spark bucket id (`part-..._00003.parquet`): the directory's
    // partition value IS Spark's bucket id, because BucketT.column is
    // pmod(hash(c), n) — the very HashPartitioning.partitionIdExpression
    // bucketed tables use. buildScan later verifies these names and
    // attaches a BucketSpec, so co-bucketed joins and bucket-column
    // aggregations run with zero exchanges (Iceberg bucket transform +
    // storage-partitioned join; reference's hash-distribution elision in
    // HashToRandomExchangePrel). Spark part names carry no underscores, so
    // the suffix can't be mis-parsed from a pre-existing name.
    partitionBy.zipWithIndex.collect {
      case (b: PartitionTransform.BucketT, i) => (b, i)
    } match {
      case Seq((_, bi)) =>
        val pre = s"__gp_$bi="
        LakeIO.walkParquet(dataDir).foreach { p =>
          val id = p.raw.split('/')
            .find(_.startsWith(pre)).map(_.substring(pre.length))
            .filter(v => v.nonEmpty && v.forall(_.isDigit))
          id.foreach { v =>
            val base = p.fileName
            val dot = base.indexOf('.')
            val renamed = base.substring(0, dot) +
              org.apache.spark.sql.graft.Bridge.bucketSuffix(v.toInt) +
              base.substring(dot)
            LakeIO.renameSibling(p, renamed)
          }
        }
      case _ => ()
    }
    // (relative path -> (size bytes, mtime ms)) captured in the same walk:
    // recording sizes in the manifest is what lets LakeFileIndex build its
    // FileStatus list with ZERO filesystem calls at scan time — the
    // Iceberg `file_size_in_bytes` manifest field (reference
    // `exec/store/iceberg/IcebergManifestListRecordReader.java`). Without
    // it, a 10^6-file snapshot paid 10^6 sequential namenode calls per
    // cold scan.
    val fileMeta: Map[String, (Long, Long)] = {
      val root = LakeIO.path(dir)
      LakeIO.walkParquet(dataDir)
        .map { p =>
          val (sz, mtNs) = LakeIO.sizeAndMtimeNanos(p)
          LakeIO.relativize(root, p) -> (sz, mtNs / 1000000L)
        }
        .toMap
    }
    val files = fileMeta.keysIterator.toVector.sorted // partitioned commits nest dirs per value
    // Per-file row counts from the parquet FOOTERS (driver-side metadata
    // reads, no data scan) ride in the stats map under the `__rows` pseudo
    // column: carried files keep them verbatim through DML/compaction, and
    // `LakeFileIndex.manifestRowCount` sums them so a bare COUNT(*) is
    // answered from the manifest (reference: CountOnScanToValuesRule,
    // PlannerPhase.java:337). On a cluster this read distributes with the
    // write tasks; here the commit is already driver-coordinated.
    val hconf = org.apache.spark.sql.graft.Bridge.hadoopConf(spark)
    val needStatsJob = !((statsCols.isEmpty && partitionBy.isEmpty) || files.isEmpty)
    // Stats/row counts come from parquet FOOTER metadata (driver-side,
    // opened concurrently, NO Spark job) whenever every requested stat is
    // footer-EXACT; the distributed read-back job is the fallback. Footer
    // min/max is bit-exact for integral and boolean columns; float/double
    // are excluded (parquet-mr normalizes signed zeros — PARQUET-1222 —
    // so "-0.0" could disagree with the read-back string and these stats
    // feed EXACT manifest MIN/MAX answers, not just pruning), as are
    // string/date/timestamp (binary truncation / formatting divergence).
    // Partition-transform values for integral transforms come from the
    // directory name the writer itself placed the rows under (min == max
    // by construction). Small commits (streaming admits, index builds,
    // lake DML at micro scale) thereby skip one whole Spark job + its
    // scheduling gap per commit; a >4096-file commit keeps the read-back
    // job, which distributes better than driver-side footer opens.
    val footerRows = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val footerStats =
      new java.util.concurrent.ConcurrentHashMap[String, Map[String, (String, String)]]()
    val footerOk = new java.util.concurrent.atomic.AtomicBoolean(true)
    val statColFields: Seq[Option[org.apache.spark.sql.types.StructField]] =
      statsCols.map(c => df.schema.fields.find(_.name.equalsIgnoreCase(c)))
    def footerExactType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.BooleanType => true
      case _ => false
    }
    val transformTypes: Seq[org.apache.spark.sql.types.DataType] =
      if (partitionBy.isEmpty) Nil
      else df.select(partitionBy.map(t => t.column(col(t.srcCol))): _*)
        .schema.map(_.dataType).toSeq
    val footerEligible = !needStatsJob ||
      (files.size <= 4096 &&
        statColFields.forall(_.exists(f => footerExactType(f.dataType))) &&
        transformTypes.forall(footerExactType) &&
        transformTypes.forall(_ != org.apache.spark.sql.types.BooleanType))
    if (footerEligible) {
      import scala.jdk.CollectionConverters._
      files.asJava.parallelStream().forEach { rel =>
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(s"$dir/$rel"), hconf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            footerRows.put(rel, r.getRecordCount.toString)
            if (needStatsJob && footerOk.get) {
              val blocks = r.getFooter.getBlocks.asScala.toSeq
              // column min/max merged across row groups; any chunk with
              // absent/ambiguous statistics poisons the fast path
              def colMinMax(name: String): Option[(String, String)] = {
                var mn: Comparable[Any] = null
                var mx: Comparable[Any] = null
                var ok = true
                blocks.foreach { bg =>
                  bg.getColumns.asScala.find(c =>
                    c.getPath.size == 1 &&
                      c.getPath.toDotString.equalsIgnoreCase(name)) match {
                    case None => ok = false
                    case Some(cc) =>
                      val st = cc.getStatistics
                      if (st == null) ok = false
                      else if (!st.hasNonNullValue) {
                        // statless chunk is fine ONLY when provably all-null
                        if (!st.isNumNullsSet || st.getNumNulls != cc.getValueCount)
                          ok = false
                      } else {
                        val cmn = st.genericGetMin.asInstanceOf[Comparable[Any]]
                        val cmx = st.genericGetMax.asInstanceOf[Comparable[Any]]
                        if (mn == null || cmn.compareTo(mn) < 0) mn = cmn
                        if (mx == null || cmx.compareTo(mx) > 0) mx = cmx
                      }
                  }
                }
                // all-null file → ("null", "null"), matching the read-back's
                // String.valueOf(null)
                if (ok) Some((String.valueOf(mn), String.valueOf(mx))) else None
              }
              val segs = rel.split('/')
              val tVals: Seq[Option[(String, (String, String))]] =
                partitionBy.zipWithIndex.map { case (t, i) =>
                  val pre = s"__gp_$i="
                  segs.find(_.startsWith(pre)).map(_.substring(pre.length))
                    .filter(v => v.matches("-?\\d+"))
                    .map(v => t.repr -> (v, v))
                }
              val cVals: Seq[Option[(String, (String, String))]] =
                statsCols.zip(statColFields).map { case (c, f) =>
                  colMinMax(f.map(_.name).getOrElse(c)).map(v => c -> v)
                }
              if ((tVals ++ cVals).forall(_.isDefined))
                footerStats.put(rel, (tVals ++ cVals).flatten.toMap)
              else footerOk.set(false)
            }
          } finally r.close()
        } catch { case scala.util.control.NonFatal(_) => footerOk.set(false) }
      }
    }
    val statRowCounts = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val stats0: Map[String, Map[String, (String, String)]] =
      if (!needStatsJob) Map.empty
      else if (footerEligible && footerOk.get) {
        import scala.jdk.CollectionConverters._
        footerStats.asScala.toMap
      }
      else {
        // transform values are recomputed from the source columns on
        // read-back (identical expressions to the write side), keyed by the
        // transform repr; a partitioned file records min == max
        val keyed: Seq[(String, org.apache.spark.sql.Column)] =
          statsCols.map(c => c -> col(c)) ++
            partitionBy.map(t => t.repr -> t.column(col(t.srcCol)))
        val aggs = keyed.zipWithIndex.flatMap { case ((_, c), i) =>
          Seq(min(c).as(s"mn_$i"), max(c).as(s"mx_$i"))
        } :+ count(lit(1)).as("__rows")
        spark.read.parquet(s"$dir/$sub")
          .groupBy(input_file_name().as("f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            // input_file_name() is URI-escaped ("NOT SPECIFIED" arrives as
            // NOT%20SPECIFIED) while walked/manifest paths carry the raw
            // name — decode BEFORE keying, or every partition value with a
            // URI-special char silently drops its per-file stats (and,
            // since the row counts ride this job, its __rows). A literal
            // '%' in a partition value (Hive-escaped on disk) would still
            // double-decode — pre-existing, not representable in the
            // engine's fixtures, and harmless for min/max-only stats.
            val fname0 = r.getString(0)
            val fname =
              try new java.net.URI(fname0).getPath
              catch { case _: Exception => fname0 }
            // relative to the table root, including partition-value subdirs
            val rel = fname.substring(fname.indexOf(sub))
            statRowCounts.put(rel, r.getAs[Long]("__rows").toString)
            rel -> keyed.zipWithIndex.map { case ((k, _), i) =>
              k -> (String.valueOf(r.getAs[Any](s"mn_$i")),
                String.valueOf(r.getAs[Any](s"mx_$i")))
            }.toMap
          }.toMap
      }
    // a zero-row data file has no groupBy group in the read-back — but so
    // would a file whose input_file_name() keying diverged from the walked
    // path (URI-escape corner). __rows feeds manifest COUNT(*), so a miss
    // must NOT silently record 0: fall back to that file's parquet footer
    // record count, which is unconditionally correct (r16 ADVICE).
    def footerCount(rel: String): String = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/$rel"), hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount.toString finally r.close()
    }
    val rowCounts: Map[String, String] = files.map { rel =>
      rel -> Option(footerRows.get(rel))
        .orElse(Option(statRowCounts.get(rel)))
        .getOrElse(footerCount(rel))
    }.toMap
    // sort marker: recorded when THIS function sorted each file itself —
    // the partitioned branch always re-sorts (the shuffle destroyed any
    // upstream order), the unpartitioned branch only when not presorted
    // (a presorted df may be Z-ordered, which is NOT a lexicographic sort
    // this marker could truthfully assert).
    val sortMarker: Option[(String, (String, String))] =
      if (sortCols.nonEmpty && (partitionBy.nonEmpty || !presorted)) {
        val csv = sortCols.mkString(",")
        Some(SnapshotTable.SortStatKey -> (csv, csv))
      } else None
    val stats = files.map { f =>
      val rows = SnapshotTable.RowsStatKey -> (rowCounts(f), rowCounts(f))
      val (sz, mt) = fileMeta(f)
      val bytes = SnapshotTable.BytesStatKey -> (sz.toString, mt.toString)
      f -> (stats0.getOrElse(f, Map.empty[String, (String, String)])
        + rows + bytes ++ sortMarker)
    }.toMap
    (files, stats)
  }

  private def publish(v: Long, action: String, files: Seq[String],
                      stats: Map[String, Map[String, (String, String)]],
                      tag: String, schemaDdl: String, minTs: Long,
                      priorLog: Seq[LakeCommit],
                      fieldIds: Map[String, Int],
                      partitionSpec: Seq[String] = Nil,
                      statsCols: Seq[String] = Nil,
                      sortSpec: Seq[String] = Nil,
                      tableProps: Option[Map[String, String]] = None): Long = {
    val ts = math.max(System.currentTimeMillis(), minTs)
    val c = LakeCommit(v, action, ts, schemaDdl, files, stats, tag, fieldIds,
      partitionSpec, statsCols, sortSpec, tableProps)
    // unique tmp name: even a misbehaving concurrent writer can't clobber
    // another's staged json
    val tmp = logDir.resolve(
      f"v$v%08d.json." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    try {
      LakeIO.writeString(tmp, renderCommit(c))
      LakeIO.publish(tmp, logDir.resolve(f"v$v%08d.json"))
    } finally LakeIO.deleteIfExists(tmp) // no-op after a successful move
    // periodic checkpoint (still inside the commit lock, so the full log is
    // exactly priorLog + this commit): one file replacing v reads at cold
    // start. A crash between commit and checkpoint only skips the
    // checkpoint — readers fall back to older checkpoints / raw commits.
    if (v % CheckpointInterval == 0) {
      val ckTmp = logDir.resolve(
        f"ckpt-v$v%08d.json." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      try {
        LakeIO.writeString(ckTmp, renderCheckpoint(priorLog :+ c))
        LakeIO.publish(ckTmp, logDir.resolve(f"ckpt-v$v%08d.json"))
        // superseded checkpoints are pure redundancy (each holds the whole
        // prefix) — drop them so checkpoint storage stays O(log), not O(log²)
        LakeIO.listNames(logDir)
          .filter(n => n.matches("ckpt-v\\d{8}\\.json") && n < f"ckpt-v$v%08d.json")
          .foreach(n => LakeIO.deleteIfExists(logDir.resolve(n)))
      } finally LakeIO.deleteIfExists(ckTmp)
    }
    v
  }

  /** Mutual exclusion for commit publishing: an OS advisory file lock
    * (FileChannel.lock) for cross-process safety — the kernel releases it
    * when the holder dies, so there is no staleness window, no lock
    * stealing, and no ownerless release — plus a per-path JVM monitor so
    * same-JVM writers serialize without tripping
    * OverlappingFileLockException. (NFS caveat: advisory locks there are
    * only as good as the NFS lock manager; object-store deployments should
    * back the log with a catalog service, as Iceberg does.) */
  private def withCommitLock[T](body: => T): T =
    LakeIO.withCommitLock(logDir)(body)
}

object SnapshotTable {
  val LogDirName = "_graft_log"

  /** Can files written under id map `w` be carried into a FLATTENED
    * commit (merge/fast-forward overwrite) recording id map `m`? Safe iff
    * no id changed NAME between the maps (a spanning rename would read
    * NULL where the data lives under the old physical name) and no name
    * was reused for a DIFFERENT id (retired data must not resurface). A
    * column added after the file was written (name only in `m`) reads
    * NULL through the parquet missing-column path — the normal schema-
    * evolution contract, not a conflict. */
  private[sources] def idCompatible(w: Map[String, Int],
                                    m: Map[String, Int]): Boolean = {
    val wById = w.map(_.swap)
    m.forall { case (n, id) =>
      wById.get(id).forall(_ == n) && w.get(n).forall(_ == id)
    }
  }
  /** "Clear this sticky layout field for future writes" marker (SET
    * PARTITION SPEC () / SET SORT ORDER ()): the sticky-layout resolver
    * maps a field that is exactly this to Nil, and the lenient
    * reader-side transform parse skips it like any unknown spec string
    * from a newer writer. It can surface raw in per-commit listings
    * (DESCRIBE LAKE) — hence the neutral spelling. */
  val ClearedLayoutSentinel = "none()"

  /** Table property holding the declared (informational) primary key as
    * a column CSV — reference SqlAlterTableAddPrimaryKey metadata. */
  val PkPropKey = "graft.pk"

  /** Table property set by ALTER LAKE ... ENABLE APPROXIMATE STATS
    * (reference `SqlSetApprox` → `PhysicalDataset.allowApproxStats`,
    * consumed by `CountDistinctConvertlet.java:95`): when "true",
    * COUNT(DISTINCT col) over columns originating from this table may be
    * planned as an NDV sketch. The per-table opt-in is the contract —
    * approximation never applies to tables that didn't ask for it. */
  val ApproxStatsKey = "graft.approx.stats"

  /** Pseudo column carrying per-file parquet row counts inside the stats
    * map (min == max == count). Never collides with predicate pruning —
    * lookups there are by real attribute name. */
  val RowsStatKey = "__rows"

  /** Sum of manifest `__rows` over a per-file-stats list: Some(total)
    * only when EVERY file recorded a parseable count (one legacy or
    * malformed entry makes the total unknowable without a scan → None,
    * callers fall back). An EMPTY list is Some(0) — an empty snapshot's
    * row count is knowable. The single definition behind both the
    * metadata-count rule (via [[LakeFileIndex.manifestRowCount]]) and
    * maintenance sizing ([[SnapshotTable.manifestRowCount]]). */
  private[graft] def rowsFromStats(
      stats: Seq[Map[String, (String, String)]]): Option[Long] = {
    val ns = stats.map(_.get(RowsStatKey))
    if (!ns.forall(_.isDefined)) None
    else scala.util.Try(ns.flatten.map(_._1.toLong).sum).toOption
  }

  /** Pseudo stat key for a file's (size bytes, mtime ms) — the Iceberg
    * `file_size_in_bytes` manifest field. Lets the scan build FileStatus
    * objects from the commit log alone (zero filesystem calls); legacy
    * commits without it fall back to one getFileStatus per file. */
  val BytesStatKey = "__bytes"

  /** Pseudo stat key recording that a file's ROWS are sorted by these
    * columns (comma-joined; min == max). Written only by the partitioned
    * write path, which itself performs the per-file sort — so the marker
    * is a per-file ground truth that rides through carry-by-reference
    * rewrites, and a later unsorted rewrite of the same rows simply lacks
    * it. When a bucketed scan sees the SAME marker on every live file it
    * declares the sort in its BucketSpec, and Spark then claims
    * outputOrdering for single-file buckets — merge joins with neither
    * shuffle NOR sort (the Iceberg write-ordered table contract). */
  val SortStatKey = "__sort"

  /** Inherit ids for surviving names, mint fresh ids for new ones. `maxUsed`
    * is the highest id EVER minted on the table (not just currently live):
    * a name absent from `names` retires its id permanently — fresh ids must
    * never collide with a retired one, or an old file would serve the
    * retired column's data under the new column's name. */
  private[sources] def assignFieldIds(names: Seq[String], prev: Map[String, Int],
                                      maxUsed: Int): Map[String, Int] = {
    var next = math.max(maxUsed, (prev.valuesIterator ++ Iterator(0)).max) + 1
    names.map { n =>
      n -> prev.getOrElse(n, { val i = next; next += 1; i })
    }.toMap
  }
  /** Checkpoint cadence: one consolidated log file per this many commits. */
  val CheckpointInterval = 100
  // parsed-log cache: logDir -> (latest commit file name, its size, its
  // mtime, full parsed log). Append-only log ⇒ a cached prefix is valid
  // forever — UNLESS the table is deleted and recreated at the same path:
  // version numbering restarts, so a NAME-only check would validate
  // against the new incarnation's identically-named v00000001.json and
  // serve the DEAD incarnation's file list (observed as FILE_NOT_EXIST
  // under bench reruns that rebuild scratch lakes in place). The
  // (size, mtime) pair of the last cached commit file is the incarnation
  // identity: two stat calls per revalidation, no file reads.
  private val logCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Long, Long, Vector[LakeCommit])]()
  // metadata-efficiency instrumentation: commit FILES physically parsed
  // (SnapshotTableSpec pins that warm operations parse only new commits)
  private[sources] val commitFilesParsed = new java.util.concurrent.atomic.AtomicLong()
  private[sources] def invalidateLogCache(): Unit = logCache.clear()

  /** A named ref over a lake table's history (reference versionSupport
    * grammar): a `tag` pins `baseVersion` immutably; a `branch` forks
    * there and owns a commit chain until merged or dropped. */
  final case class LakeRef(name: String, refType: String, baseVersion: Long)

  private[sources] def renderRef(r: LakeRef): String = {
    val node = mapper.createObjectNode()
    node.put("name", r.name)
    node.put("refType", r.refType)
    node.put("baseVersion", r.baseVersion)
    node.toString
  }

  private[sources] def parseRef(json: String): LakeRef = {
    val n = mapper.readTree(json)
    LakeRef(n.get("name").asText(), n.get("refType").asText(),
      n.get("baseVersion").asLong())
  }

  /** ANSI MERGE clause model (see [[SnapshotTable.merge]]). Conditions and
    * SET value expressions are SQL text over aliases `t` (target row) and
    * `s` (source row). */
  sealed trait MatchedAction
  object MatchedAction {
    /** UPDATE SET col = expr, ... (unlisted columns keep their values). */
    final case class Update(sets: Seq[(String, String)]) extends MatchedAction
    /** UPDATE SET * — every column takes the source's value. */
    case object UpdateAll extends MatchedAction
    case object Delete extends MatchedAction
  }
  final case class WhenMatched(condSql: Option[String], action: MatchedAction)
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (source must carry every
    * table column). */
  final case class WhenNotMatched(condSql: Option[String])

  def forPath(spark: SparkSession, dir: String): SnapshotTable =
    new SnapshotTable(spark, dir)

  def isLakeTable(dir: String): Boolean =
    LakeIO.isDirectory(LakeIO.path(dir, LogDirName))

  /** Lake tables under `root` (VACUUM CATALOG's sweep set): recursive
    * directory walk that never descends INTO a found table (partition
    * subdirs aren't tables) and skips internal/hidden names. Depth-capped
    * defensively. */
  def findLakeTables(root: String, depth: Int = 0): Seq[String] =
    if (isLakeTable(root)) Seq(root)
    else if (depth >= 16 || !LakeIO.isDirectory(LakeIO.path(root))) Nil
    else {
      val p = LakeIO.path(root)
      LakeIO.listNames(p)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
        .map(p.resolve(_))
        .filter(LakeIO.isDirectory)
        .flatMap(c => findLakeTables(c.raw, depth + 1))
    }

  /** Route commit publishes for lake tables under `pathPrefix` through a
    * claim-based coordinator rooted at `coordDir` (a path with atomic
    * create-new semantics — POSIX dir, NFS mount, leader-held volume).
    * This is the multi-writer deployment story for object stores whose
    * rename is copy+delete (S3A): the claim, not the store's rename,
    * decides each commit's winner — the Iceberg catalog-pointer pattern
    * (SURVEY §2.1; LakeIO scaladoc documents the per-store semantics this
    * replaces). Losers observe ConcurrentModificationException and can
    * re-read + retry. */
  def useCommitCoordination(pathPrefix: String, coordDir: String): Unit =
    LakeIO.registerArbiter(pathPrefix, new LakeIO.PointerCommitArbiter(coordDir))
  def dropCommitCoordination(pathPrefix: String): Unit =
    LakeIO.unregisterArbiter(pathPrefix)

  /** CTAS into a fresh lake table (first commit is an overwrite). A
    * create over a previously-wiped path starts a NEW incarnation — drop
    * any cached log of the dead one deterministically (the stat-based
    * validation in `commits` is the backstop for out-of-band wipes). */
  def create(spark: SparkSession, dir: String, df: DataFrame): SnapshotTable = {
    val t = forPath(spark, dir)
    logCache.remove(LakeIO.path(dir, LogDirName).toString)
    t.overwrite(df)
    t
  }

  private val mapper = new ObjectMapper()

  private[sources] def renderCommit(c: LakeCommit): String = {
    val node = mapper.createObjectNode()
    node.put("version", c.version)
    node.put("action", c.action)
    node.put("timestampMs", c.timestampMs)
    node.put("schemaDdl", c.schemaDdl)
    val arr = node.putArray("files")
    c.files.foreach(arr.add)
    if (c.tag.nonEmpty) node.put("tag", c.tag)
    if (c.fieldIds.nonEmpty) {
      val ids = node.putObject("fieldIds")
      c.fieldIds.toSeq.sortBy(_._2).foreach { case (n, i) => ids.put(n, i) }
    }
    if (c.partitionSpec.nonEmpty) {
      val ps = node.putArray("partitionSpec")
      c.partitionSpec.foreach(ps.add)
    }
    if (c.statsCols.nonEmpty) {
      val sc = node.putArray("statsCols")
      c.statsCols.foreach(sc.add)
    }
    if (c.sortSpec.nonEmpty) {
      val so = node.putArray("sortSpec")
      c.sortSpec.foreach(so.add)
    }
    c.tableProps.foreach { m =>
      // present-but-empty object = cleared; absent = inherit
      val tp = node.putObject("tableProps")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => tp.put(k, v) }
    }
    if (c.stats.nonEmpty) {
      val st = node.putObject("stats")
      c.stats.foreach { case (f, cols) =>
        val fo = st.putObject(f)
        cols.foreach { case (cname, (mn, mx)) =>
          val a = fo.putArray(cname); a.add(mn); a.add(mx)
        }
      }
    }
    node.toString
  }

  /** A checkpoint is the whole log prefix in one file: {"commits":[...]}. */
  private[sources] def renderCheckpoint(cs: Seq[LakeCommit]): String = {
    val node = mapper.createObjectNode()
    val arr = node.putArray("commits")
    cs.foreach(c => arr.add(mapper.readTree(renderCommit(c))))
    node.toString
  }

  private[sources] def parseCheckpoint(s: String): Vector[LakeCommit] =
    mapper.readTree(s).get("commits").elements().asScala
      .map(n => parseCommit(n.toString)).toVector

  private[sources] def parseCommit(s: String): LakeCommit = {
    val n = mapper.readTree(s)
    val stats: Map[String, Map[String, (String, String)]] =
      Option(n.get("stats")).map { st =>
        st.properties().asScala.map { e =>
          e.getKey -> e.getValue.properties().asScala.map { ce =>
            ce.getKey -> (ce.getValue.get(0).asText(), ce.getValue.get(1).asText())
          }.toMap
        }.toMap
      }.getOrElse(Map.empty)
    LakeCommit(
      n.get("version").asLong(),
      n.get("action").asText(),
      n.get("timestampMs").asLong(),
      n.get("schemaDdl").asText(),
      n.get("files").elements().asScala.map(_.asText()).toVector,
      stats,
      Option(n.get("tag")).map(_.asText()).getOrElse(""),
      Option(n.get("fieldIds")).map { ids =>
        ids.properties().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap
      }.getOrElse(Map.empty),
      Option(n.get("partitionSpec")).map(_.elements().asScala.map(_.asText()).toVector)
        .getOrElse(Vector.empty),
      Option(n.get("statsCols")).map(_.elements().asScala.map(_.asText()).toVector)
        .getOrElse(Vector.empty),
      Option(n.get("sortSpec")).map(_.elements().asScala.map(_.asText()).toVector)
        .getOrElse(Vector.empty),
      Option(n.get("tableProps")).map(tp =>
        tp.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap))
  }
}
