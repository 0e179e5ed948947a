package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.sources.SnapshotTable

/** Structured Streaming connector for the graft-lake snapshot format —
  * `spark.readStream.format("graft-lake")` and
  * `df.writeStream.format("graft-lake")`, the continuous generalization of
  * the trigger-driven [[Pipes]] (reference incremental refresh,
  * `IncrementalUpdateUtils.java`; the design follows the public Delta
  * connector's source/sink semantics re-expressed on the graft commit log).
  *
  * Source: offsets are commit VERSIONS. The first batch is the full table
  * snapshot at stream start (or, with `startingVersion`, the appends since
  * that version); every later batch is `appendsBetween(last, end]` — a
  * manifest-resolved multi-file parquet scan of exactly the newly appended
  * files, with pushdown/pruning intact and zero data-file rewrites. A
  * non-append commit (DML/compaction/overwrite) fails the stream loudly by
  * default — rewritten files would replay delivered rows — or is passed
  * over with `skipChangeCommits=true`. `maxVersionsPerTrigger` bounds how
  * many commits one micro-batch may cover (ingest-spike control: at 100 TB
  * a backlogged stream must chew history in bounded bites, not one giant
  * recovery batch). Offset ranges are clamped so a skipped change commit
  * never lands BETWEEN appends of one batch — the range-end file replay
  * stays complete. With `readChangeFeed=true` the source switches to CDC
  * delivery (the Delta CDF contract): every commit — append, DML,
  * compaction, overwrite — arrives as row-level changes stamped
  * `_change_type`/`_commit_version`, the starting snapshot as inserts;
  * append commits scan only their added files (zero diff work), rewrites
  * pay an O(rewritten files) multiset diff.
  *
  * Sink: each micro-batch lands as ONE idempotent tagged commit
  * (`stream:<queryId>:<batchId>` — the query id is stable across restarts
  * from the same checkpoint), so checkpoint-recovery replays are absorbed
  * by the tag: exactly-once, the same contract the reference's pipe ingest
  * and Delta's `txnVersion` use. Append mode appends (optionally
  * partitioned via `partitionBy` or a `partitionSpec` option with
  * transforms, plus `statsCols` for manifest min/max pruning); Complete
  * mode overwrites. The lake table's auto-compaction property then keeps
  * the small-files problem bounded under continuous ingest.
  */
final class LakeStreamProvider
    extends StreamSourceProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-lake stream needs a table path: .load(path) / .option(\"path\", ...)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val t = SnapshotTable.forPath(sqlContext.sparkSession, pathOf(parameters))
    require(t.latestVersion > 0,
      s"graft-lake stream source: no commit log at ${pathOf(parameters)}")
    val base = t.read().schema
    // a user-declared schema the source would not deliver must refuse
    // UP FRONT, not surface as a runtime row-format error mid-stream
    schema.foreach { u =>
      require(u.map(f => (f.name, f.dataType)) == base.map(f => (f.name, f.dataType)),
        s"graft-lake stream source serves the table's own schema " +
          s"(${base.simpleString}); the declared read schema " +
          s"(${u.simpleString}) differs — drop .schema(...) or evolve the table")
    }
    val withCdc =
      if (!parameters.get("readChangeFeed").exists(_.toBoolean)) base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)))
    (shortName(), withCdc)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new LakeStreamSource(sqlContext, pathOf(parameters), parameters, metadataPath)

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String], outputMode: OutputMode): Sink =
    new LakeStreamSink(sqlContext, pathOf(parameters), parameters,
      partitionColumns, outputMode)
}

/** Version-valued stream offset: "commits with version <= `version` have
  * been delivered". */
final case class LakeSourceOffset(version: Long) extends Offset {
  override def json: String = s"""{"version":$version}"""
}

object LakeSourceOffset {
  private val mapper = new ObjectMapper()
  /** Parse any offset the engine hands back (checkpoint recovery wraps
    * offsets as SerializedOffset — only the json survives). */
  def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long = o match {
    case LakeSourceOffset(v) => v
    case other => mapper.readTree(other.json).get("version").asLong()
  }
}

final class LakeStreamSource(sqlContext: SQLContext, path: String,
                             parameters: Map[String, String],
                             metadataPath: String = "") extends Source {
  private val spark = sqlContext.sparkSession
  private val table = SnapshotTable.forPath(spark, path)

  private val startingVersion: Option[Long] =
    parameters.get("startingVersion").map(_.toLong)
  private val maxVersions: Int =
    parameters.get("maxVersionsPerTrigger").map(_.toInt).getOrElse(Int.MaxValue)
  private val skipChanges: Boolean =
    parameters.get("skipChangeCommits").exists(_.toBoolean)
  /** CDC mode (the Delta `readChangeFeed` contract): micro-batches carry
    * row-level changes — table columns + `_change_type`/`_commit_version`
    * — across EVERY commit action, so DML/compaction never fails or skips;
    * an update arrives as delete(old)+insert(new) under one version. */
  private val cdc: Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)
  require(maxVersions > 0, "maxVersionsPerTrigger must be positive")
  require(!(cdc && skipChanges),
    "readChangeFeed delivers change commits as row-level changes — " +
      "skipChangeCommits contradicts it; drop one of the two options")

  override val schema: StructType =
    if (!cdc) table.read().schema
    else StructType(table.read().schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** High-water-mark file under the stream's checkpoint: the newest
    * version this source ever HANDED OUT. Spark's v1 engine only replays
    * getBatch on restart when the last batch was UNCOMMITTED — after a
    * clean stop the first call is getOffset, and a source with no
    * persisted state would treat the restart as a fresh stream:
    * re-planning the snapshot, bypassing `maxVersionsPerTrigger` and the
    * change-commit clamp (a skipped compaction inside one giant recovery
    * range silently loses the appends it rewrote), and in
    * `startingVersion` mode regressing the offset log and re-delivering
    * committed versions. Persisting the mark write-ahead (before the
    * offset is returned) keeps restarts monotonic: recovering a mark for
    * a batch Spark never committed only means the next range starts where
    * the handed-out one ended — exactly the v1 contract. */
  private val markPath: Option[org.apache.hadoop.fs.Path] =
    if (metadataPath.isEmpty) None
    else Some(new org.apache.hadoop.fs.Path(metadataPath, "graft-lake-mark"))
  private def markFs: org.apache.hadoop.fs.FileSystem =
    markPath.get.getFileSystem(spark.sessionState.newHadoopConf())

  private def readMark(): Option[Long] = markPath.flatMap { p =>
    try {
      val fs = markFs
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      }
    } catch { case _: Exception => None } // unreadable mark = fresh start
  }

  /** Consecutive mark-write failures. A single transient failure only
    * costs the restart-monotonicity guarantee for THAT window (tolerable);
    * a PERSISTENT failure (checkpoint dir unwritable) would silently
    * reintroduce the restart-amnesia bug the mark exists to fix — so the
    * first failure WARNs with the path and the cause, and hitting
    * `MaxMarkFailures` in a row fails the stream loudly. */
  @volatile private var markFailures = 0
  private val MaxMarkFailures = 3

  private[streaming] def writeMark(v: Long): Unit = markPath.foreach { p =>
    try {
      val fs = markFs
      val tmp = new org.apache.hadoop.fs.Path(p.getParent,
        p.getName + "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      fs.mkdirs(p.getParent)
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (fs.exists(p)) fs.delete(p, false)
      // rename returning FALSE is a failure, not a soft no-op: the old
      // mark is already gone at this point, so silently accepting it
      // destroys the mark without ever tripping the failure budget
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(s"rename to $p returned false")
      }
      markFailures = 0
    } catch {
      case e: Exception =>
        markFailures += 1
        if (markFailures >= MaxMarkFailures)
          throw new java.io.IOException(
            s"graft-lake stream: $markFailures consecutive failures writing " +
              s"the restart mark at $p — restarts would silently forget " +
              "handed-out offsets (amnesia); fix the checkpoint location",
            e)
        logWarn(s"graft-lake stream: failed to write restart mark $p " +
          s"(attempt $markFailures/$MaxMarkFailures): ${e.getMessage}")
    }
  }

  private def logWarn(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)

  /** Version of the newest offset this source has handed the engine —
    * getOffset clamps ranges forward from here. Recovered from the
    * checkpoint mark at restart; synced from recovered offsets in
    * getBatch as the uncommitted-replay backstop. */
  @volatile private var lastSeen: Long = readMark().getOrElse(Long.MinValue)
  /** True once the initial full-snapshot batch has been planned (only the
    * no-startingVersion mode has one; a recovered mark means it already
    * was, in this stream's earlier life). */
  @volatile private var snapshotDone: Boolean =
    startingVersion.isDefined || lastSeen != Long.MinValue

  override def getOffset: Option[Offset] = {
    val cs = table.commits
    if (cs.isEmpty) return None
    if (!snapshotDone && lastSeen == Long.MinValue) {
      // first batch = whole table at head, pinned to the head version
      lastSeen = cs.last.version
      writeMark(lastSeen)
      return Some(LakeSourceOffset(lastSeen))
    }
    val from = if (lastSeen != Long.MinValue) lastSeen else startingVersion.get - 1
    val pending = cs.filter(_.version > from)
    if (pending.isEmpty)
      return if (from == startingVersion.getOrElse(Long.MinValue) - 1) None
             else Some(LakeSourceOffset(from))
    // clamp: consecutive appends (bounded by maxVersionsPerTrigger); a
    // change commit either leads the range alone (skipChanges absorbs it,
    // fail-loud surfaces it in getBatch) or ends the range BEFORE itself
    var end = from
    var appends = 0
    var done = false
    pending.foreach { c =>
      if (!done) c.action match {
        // CDC delivers every action as row-level changes — only the
        // trigger bound clamps the range
        case _ if cdc =>
          if (appends < maxVersions) { end = c.version; appends += 1 }
          else done = true
        case "append" if appends < maxVersions => end = c.version; appends += 1
        case "append" => done = true
        case _ if appends == 0 => end = c.version; if (!skipChanges) done = true
        case _ => done = true
      }
    }
    if (end == from) None
    else {
      lastSeen = math.max(lastSeen, end)
      writeMark(lastSeen)
      Some(LakeSourceOffset(end))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = LakeSourceOffset.versionOf(end)
    if (e > lastSeen) { lastSeen = e; writeMark(e) } // uncommitted-replay sync
    val batch = start match {
      case None if startingVersion.isEmpty =>
        snapshotDone = true
        val snap = table.read(version = Some(e)) // initial snapshot, pinned
        if (!cdc) snap
        else snap // CDF semantics: the starting snapshot arrives as inserts
          .withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
          .withColumn("_commit_version", org.apache.spark.sql.functions.lit(e))
      case _ =>
        val s = start.map(LakeSourceOffset.versionOf)
          .getOrElse(startingVersion.get - 1)
        if (e <= s)
          spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
        else if (cdc) table.changeFeed(s, e)
        else table.appendsBetween(s, e, skipChanges)
    }
    require(batch.schema.map(f => (f.name, f.dataType)) ==
              schema.map(f => (f.name, f.dataType)),
      s"graft-lake table $path changed schema mid-stream " +
        s"(now ${batch.schema.simpleString}) — restart the stream to adopt it")
    // CDC batches may hold a multiset diff (exceptAll) — those operators
    // must stay batch-planned, not become stateful streaming ops
    if (cdc) Bridge.asStreamingOpaque(batch) else Bridge.asStreaming(batch)
  }

  override def stop(): Unit = ()
  override def toString: String = s"LakeStreamSource[$path]"
}

final class LakeStreamSink(sqlContext: SQLContext, path: String,
                           parameters: Map[String, String],
                           partitionColumns: Seq[String],
                           outputMode: OutputMode) extends Sink {
  private val spark = sqlContext.sparkSession
  private val partitionSpec: Seq[String] =
    parameters.get("partitionSpec")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(partitionColumns)
      // bare column names are identity transforms (`.partitionBy("c")`)
      .map(s => if (s.contains("(")) s else s"identity($s)")
  private val statsCols: Seq[String] =
    parameters.get("statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
    s"graft-lake sink supports Append and Complete output modes, not $outputMode " +
      "(for upsert semantics use a CDC merge pipe: CREATE PIPE ... MERGE KEY)")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // identity for exactly-once: the query id is constant across restarts
    // from one checkpoint, so a replayed batch re-presents the same tag and
    // the commit log absorbs it
    val qid = Bridge.streamingQueryId(spark)
      .orElse(parameters.get("checkpointLocation")).getOrElse("anon")
    val tag = s"stream:$qid:$batchId"
    val df = Bridge.materializedCopy(data)
    val table = SnapshotTable.forPath(spark, path)
    if (outputMode == OutputMode.Complete()) table.overwriteTagged(df, tag)
    else table.appendTagged(df, tag, partitionSpec, statsCols)
  }

  override def toString: String = s"LakeStreamSink[$path]"
}
