package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Auto-ingest pipes (reference: `CREATE PIPE` / `TRIGGER PIPE` —
  * dremio-oss grammar `sabot/grammar/src/main/codegen/includes/ingestion.ftl`,
  * scan `exec/store/easy/triggerpipe/TriggerPipeEasyScanTableFunction.java`):
  * file-arrival-driven loading with per-file dedup.
  *
  * Spark-native equivalent: Structured Streaming file source with
  * `Trigger.AvailableNow` — exactly-once file tracking comes from the
  * checkpoint's file-source log (the same file-identity dedup the reference
  * implements by name/mtime), and each TRIGGER PIPE run drains whatever
  * arrived since the last run, then stops.
  */
final case class Pipe(
    name: String,
    sourceDir: String,
    format: String, // "json" | "csv" | "parquet" | "lakesource" (sourceDir is a lake table)
    schema: StructType,
    targetDir: String,
    checkpointDir: String,
    /** Sink mode: "parquet" (plain dir), "lake" (atomic tagged lake
      * appends), or "merge" (CDC upsert into a lake table by [[mergeKey]]).
      * TRIGGER PIPE dispatches on this, so the SQL surface drives every
      * pipe flavor (reference ingestion grammar `ingestion.ftl`). */
    sink: String = "parquet",
    mergeKey: Option[String] = None,
    /** ALTER PIPE ... SET PIPE_EXECUTION_RUNNING = FALSE (reference
      * `SqlAlterPipeStatus`, ingestion.ftl): a paused pipe keeps its
      * definition and checkpoint but refuses TRIGGER until resumed. */
    paused: Boolean = false,
    /** Event-driven ingestion (reference ingestion.ftl:190-214
      * `NOTIFICATION_PROVIDER`): when set, TRIGGER PIPE loads exactly the
      * files named by the provider's pending events instead of listing
      * the source directory — see [[Notifications]]. */
    notificationProvider: Option[String] = None,
    /** The provider's queue reference (`NOTIFICATION_QUEUE_REFERENCE`):
      * an SQS queue URL, an Azure queue name, or for LOCAL_DIR the spool
      * directory path. */
    notificationQueue: Option[String] = None,
    /** `DEDUPE_LOOKBACK_PERIOD <days>` (reference ingestion.ftl): bound
      * the file-identity dedup memory — a file seen longer ago than the
      * window may re-ingest (the reference's accepted contract; the
      * alternative is dedup state that grows with every file ever
      * loaded). NOTIFIED pipes only (they own the loaded-files log this
      * trims); a listing pipe's Spark file-source log has no
      * loss-free equivalent — `maxFileAge` would silently SKIP
      * old-mtime backfills — so CREATE refuses the combination. */
    dedupeLookbackDays: Option[Int] = None,
    /** `EXPECT <name> AS (<predicate>) [ON VIOLATION WARN|DROP|FAIL]`
      * (Delta Live Tables' ingestion-gate surface, wired to
      * [[graft.operators.Expectations]]): every arriving batch is gated
      * BEFORE it lands — drop/fail violators go to the quarantine table
      * beside the target with per-row rule attribution, a FAIL violation
      * aborts the whole trigger before anything commits. */
    expectations: Seq[PipeExpectation] = Nil)

/** One declarative ingest constraint (predicate is SQL over the pipe's
  * schema; action: warn | drop | fail). */
final case class PipeExpectation(name: String, predicateSql: String,
                                 action: String)

object Pipes {

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Pipe]

  /** Raw JSON of entries the last reload could NOT parse (e.g. a DDL
    * written by a newer coordinator): kept verbatim and re-emitted by
    * [[persist]], so this process' pipe mutations never durably DELETE a
    * foreign coordinator's pipe it merely failed to understand. Keyed by
    * pipe name so a later parseable redefinition supersedes the blob. */
  private val unparsed = scala.collection.concurrent.TrieMap
    .empty[String, com.fasterxml.jackson.databind.JsonNode]

  /** CREATE PIPE: register a pipe definition. */
  def define(pipe: Pipe): Unit = { registry.put(pipe.name, pipe); persist() }
  def get(name: String): Option[Pipe] = registry.get(name)
  def list: Seq[Pipe] = registry.values.toSeq.sortBy(_.name)
  /** DROP PIPE honors an explicit delete even when the name only exists
    * as a retained-unparseable blob from a foreign coordinator. */
  def drop(name: String): Unit =
    { registry.remove(name); unparsed.remove(name); persist() }

  /** ALTER PIPE ... SET PIPE_EXECUTION_RUNNING = TRUE|FALSE. */
  def setRunning(name: String, running: Boolean): Pipe = {
    val p = registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown pipe: $name"))
    val updated = p.copy(paused = !running)
    registry.put(name, updated)
    persist()
    updated
  }

  // ---- durability (GraftStore section "pipes"): pipe CHECKPOINTS and
  // loaded-file logs already survive on disk, but the definitions that
  // drive them lived in JVM memory — a coordinator restart would keep the
  // exactly-once state while losing every pipe. Definitions persist on
  // each mutation; a reloaded pipe TRIGGERs against its existing
  // checkpoint, so no file double-loads across the restart. ----

  private def persist(): Unit =
    graft.catalog.GraftStore.sessionForPersist.foreach { spark =>
      val st = graft.catalog.GraftStore
      val root = st.newObject
      val arr = root.putArray("pipes")
      registry.values.toSeq.sortBy(_.name).foreach { p =>
        val o = arr.addObject()
        o.put("name", p.name); o.put("sourceDir", p.sourceDir)
        o.put("format", p.format); o.put("schema", p.schema.toDDL)
        o.put("targetDir", p.targetDir); o.put("checkpointDir", p.checkpointDir)
        o.put("sink", p.sink)
        p.mergeKey.foreach(o.put("mergeKey", _))
        o.put("paused", p.paused)
        p.notificationProvider.foreach(o.put("notificationProvider", _))
        p.notificationQueue.foreach(o.put("notificationQueue", _))
        p.dedupeLookbackDays.foreach(o.put("dedupeLookbackDays", _))
        if (p.expectations.nonEmpty) {
          val ea = o.putArray("expectations")
          p.expectations.foreach { e =>
            val eo = ea.addObject()
            eo.put("name", e.name); eo.put("predicate", e.predicateSql)
            eo.put("action", e.action)
          }
        }
      }
      // re-emit foreign entries this version could not parse, verbatim —
      // unless a parseable definition has since taken the name
      unparsed.toSeq.sortBy(_._1).foreach { case (name, node) =>
        if (!registry.contains(name)) { arr.add(node.deepCopy[com.fasterxml.jackson.databind.JsonNode]()); () }
      }
      st.saveResync(spark, "pipes", root)(loadFrom)
    }

  def loadFrom(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.catalog.GraftStore.load(spark, "pipes").foreach { root =>
      registry.clear()
      unparsed.clear()
      root.path("pipes").forEach { o =>
        // per-entry guard: one entry another coordinator version wrote
        // with a DDL this version can't parse must not abort the reload
        // mid-way and leave a cleared/partial registry
        try {
          def opt(f: String): Option[String] =
            if (o.has(f)) Some(o.path(f).asText()) else None
          val p = Pipe(o.path("name").asText(), o.path("sourceDir").asText(),
            o.path("format").asText(),
            StructType.fromDDL(o.path("schema").asText()),
            o.path("targetDir").asText(), o.path("checkpointDir").asText(),
            o.path("sink").asText(), opt("mergeKey"),
            o.path("paused").asBoolean(false),
            opt("notificationProvider"), opt("notificationQueue"),
            if (o.has("dedupeLookbackDays"))
              Some(o.path("dedupeLookbackDays").asInt()) else None,
            {
              val b = Seq.newBuilder[PipeExpectation]
              o.path("expectations").forEach(e => b += PipeExpectation(
                e.path("name").asText(), e.path("predicate").asText(),
                e.path("action").asText()))
              b.result()
            })
          registry.put(p.name, p)
          ()
        } catch {
          case e: Exception =>
            // keep the raw blob so our next save re-emits it verbatim;
            // a NAMELESS foreign entry (schema skew on the name field
            // itself) keys by content hash so two such entries cannot
            // collapse onto "" and silently drop each other
            val name = o.path("name").asText()
            val key = if (name.nonEmpty) name
              else "__unnamed__" + java.security.MessageDigest
                .getInstance("MD5").digest(o.toString.getBytes("UTF-8"))
                .map("%02x".format(_)).mkString
            unparsed.put(key,
              o.deepCopy[com.fasterxml.jackson.databind.JsonNode]())
            System.err.println(
              s"[graft-pipes] WARN: skipping unloadable pipe entry " +
                s"'$key' (definition retained): $e")
        }
      }
    }

  /** Test/bootstrap reset — durable section included. */
  def clear(): Unit = {
    registry.clear()
    unparsed.clear()
    graft.catalog.GraftStore.sessionForPersist
      .foreach(s => graft.catalog.GraftStore.delete(s, "pipes"))
  }

  /** Restart simulation for specs: in-memory only, store survives. */
  private[graft] def resetMemoryForTest(): Unit =
    { registry.clear(); unparsed.clear() }

  /** The notified loaded-files log: "#gen=<n>" header, then
    * "<epochMs>\t<gen>\t<path>" lines (the generation that TAGGED the
    * file's commit — what TRIGGER ... FOR BATCH retries by). Legacy
    * 2-field lines read as generation 0; path-only lines as epoch 0. */
  private[streaming] def readNotifiedLog(logFile: java.nio.file.Path)
      : (Long, Seq[(Long, Long, String)]) =
    if (!java.nio.file.Files.exists(logFile)) (0L, Nil)
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
        .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      val g = lines.headOption.filter(_.startsWith("#gen="))
        .map(_.stripPrefix("#gen=").toLong).getOrElse(0L)
      val es = lines.filterNot(_.startsWith("#")).map { l =>
        l.split("\t", 3) match {
          case Array(ts, gn, p) => (ts.toLong, gn.toLong, p)
          case Array(ts, p)     => (ts.toLong, 0L, p)
          case _                => (0L, 0L, l)
        }
      }
      (g, es)
    }

  /** TRIGGER PIPE <name> FOR BATCH <gen> (reference `SqlTriggerPipe`'s
    * `FOR BATCH` arm — manual retry of ONE recorded ingestion batch):
    * re-land exactly the files the named generation loaded, under the
    * ORIGINAL idempotency tag — if the batch's commit exists the retry is
    * absorbed (returns 0), if a crash lost it between log-advance and
    * publish the retry lands it. Notified lake-sink pipes only: they are
    * the pipes whose batches have durable identities. */
  def triggerForBatch(spark: SparkSession, pipe: Pipe, batchGen: Long): Long = {
    require(pipe.notificationProvider.isDefined && pipe.sink == "lake",
      s"TRIGGER ... FOR BATCH: pipe '${pipe.name}' is not a notified " +
        "lake-sink pipe — only those record retryable batch identities")
    val logFile = java.nio.file.Paths.get(pipe.checkpointDir)
      .resolve("notified-files.log")
    val (_, entries) = readNotifiedLog(logFile)
    val files = entries.filter(_._2 == batchGen).map(_._3).distinct
    require(files.nonEmpty,
      s"TRIGGER ... FOR BATCH: pipe '${pipe.name}' has no batch $batchGen " +
        "in its loaded-files log (expired from DEDUPE_LOOKBACK_PERIOD, or never ran)")
    val gated = gateBatch(spark, pipe, readBatch(spark, pipe, files))
    try {
      val lake = graft.sources.SnapshotTable.forPath(spark, pipe.targetDir)
      val (spec, statsCols, _) = lake.effectiveLayout
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(files.sorted.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val before = lake.latestVersion
      val rows = gated.kept.count()
      val v = lake.appendTagged(gated.kept,
        s"pipe:${pipe.name}:notified:$batchGen:$digest", spec, statsCols)
      // an absorbed retry (tag already committed) must not re-append its
      // quarantine diagnostics either
      gated.finish(v <= before)
      if (v > before) rows else 0L
    } catch { case e: Throwable => gated.finish(true); throw e }
  }

  /** Streaming source frame for a listing (non-notified) pipe. NOTE:
    * DEDUPE_LOOKBACK_PERIOD deliberately does NOT map to the file
    * source's `maxFileAge` — that knob SKIPS files whose mtime falls
    * below latest−age (a backfill copied in with a preserved old mtime
    * would silently never load), which is data loss, not bounded dedup
    * memory. The lookback therefore applies only to notified pipes,
    * whose loaded-files log we own; CREATE enforces the pairing. */
  /** Batch load of an explicit file list — the notified-pipe read path.
    * WARC goes through the streaming record reader (not a Spark
    * DataSource) over exactly the named archives; the pipe's declared
    * schema picks the view — WET text or charset-decoded HTTP text (the
    * CREATE gate admits only those two shapes). */
  private def readBatch(spark: SparkSession, pipe: Pipe,
                        files: Seq[String]): DataFrame =
    pipe.format match {
      case "warc" =>
        graft.sources.WarcFiles.viewFor(pipe.schema) match {
          case Some("http") => graft.sources.WarcFiles.readHttpTextFiles(spark, files)
          case Some("wet") => graft.sources.WarcFiles.readTextFiles(spark, files)
          case other => throw new IllegalStateException(
            s"pipe '${pipe.name}': declared schema matches no WARC view " +
              s"($other) — the CREATE gate should have refused this")
        }
      case "csv" => spark.read.schema(pipe.schema).format("csv")
        .option("header", "true").load(files: _*)
      case f => spark.read.schema(pipe.schema).format(f).load(files: _*)
    }

  /** The quarantine table beside the pipe's target (drop/fail violators
    * with per-row `violated_rules` attribution). */
  def quarantineDir(pipe: Pipe): String =
    pipe.targetDir.stripSuffix("/") + "_quarantine"

  /** One EXPECT-gated batch: `kept` is persisted and materialized;
    * `finish(absorbed)` writes the quarantine rows (skipped when the
    * sink ABSORBED the batch — an idempotency-tag replay must not
    * duplicate quarantine diagnostics) and releases both cached frames.
    * Callers must invoke `finish` exactly once. */
  private[streaming] final case class GatedBatch(kept: DataFrame,
                                                 finish: Boolean => Unit)

  /** Gate one arriving batch through the pipe's EXPECT rules
    * ([[graft.operators.Expectations]]): a FAIL violation aborts the
    * trigger BEFORE anything lands (the batch's commit never happens, so
    * the file-source/notified logs retry it after the fix). Scan shape:
    * the input caches once; the FAIL aggregate runs ONLY when a fail
    * rule exists; kept and quarantined materialize from the cache, so
    * the source files are read once per gated trigger. Kept rows keep
    * each sink's exactly-once guarantee; quarantine rows are skipped for
    * ABSORBED replays and can duplicate only in the crash window between
    * quarantine append and sink commit (documented diagnostic contract). */
  private def gateBatch(spark: SparkSession, pipe: Pipe,
                        batch: DataFrame): GatedBatch =
    if (pipe.expectations.isEmpty) GatedBatch(batch, _ => ())
    else {
      import org.apache.spark.sql.functions.{expr, lit}
      val rules = pipe.expectations.map(e =>
        graft.operators.Expectations.Rule(e.name, expr(e.predicateSql), e.action))
      val cached = batch.persist()
      try {
        val res = graft.operators.Expectations.check(cached, rules)
        if (rules.exists(_.action == "fail")) res.enforce()
        val q = res.quarantined
          .withColumn("pipe", lit(pipe.name))
          .withColumn("quarantined_at_ms", lit(System.currentTimeMillis()))
          .persist()
        val nQuarantined = q.count()
        val kept = res.kept.persist()
        kept.count() // materialize from the cached input
        GatedBatch(kept, absorbed => {
          try {
            if (!absorbed && nQuarantined > 0)
              q.write.mode("append").parquet(quarantineDir(pipe))
          } finally { q.unpersist(); kept.unpersist(); () }
        })
      } finally cached.unpersist() // kept/q are materialized (or enforce threw)
    }

  private def srcStream(spark: SparkSession, pipe: Pipe): DataFrame = {
    require(pipe.format != "warc",
      s"pipe '${pipe.name}': FORMAT WARC pipes must be NOTIFIED " +
        "(web archives arrive as drop events; the listing path is a " +
        "Spark file-stream, which has no WARC source)")
    var reader = spark.readStream.schema(pipe.schema).format(pipe.format)
    if (pipe.format == "csv") reader = reader.option("header", "true")
    reader.load(pipe.sourceDir)
  }

  /** TRIGGER PIPE: drain all currently-available files into the target
    * (parquet), exactly once across repeated invocations. Blocks until the
    * drain completes. Returns the number of rows loaded by THIS trigger
    * (from the stream's progress metrics — no O(target) recount). */
  def trigger(spark: SparkSession, pipe: Pipe): Long = {
    val src = srcStream(spark, pipe)
    if (pipe.expectations.nonEmpty) {
      // gated plain-parquet pipes route through foreachBatch so FAIL can
      // abort before the batch lands and violators quarantine; the plain
      // parquet dir has no commit tags, so a crash-replay here is
      // at-least-once — use a lake sink for exactly-once gated ingest
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      val gq = src.writeStream
        .option("checkpointLocation", pipe.checkpointDir)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val gated = gateBatch(spark, pipe, batch)
          try {
            total.addAndGet(gated.kept.count())
            gated.kept.write.mode("append").parquet(pipe.targetDir)
            gated.finish(false)
          } catch { case e: Throwable => gated.finish(true); throw e }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      gq.awaitTermination()
      return total.get
    }
    val q = src.writeStream
      .format("parquet")
      .option("path", pipe.targetDir)
      .option("checkpointLocation", pipe.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // progress-buffer sum: exact up to the configured retention (10k
    // updates, GraftSession) — AvailableNow batches ~1000 files each, so
    // the bound is ~10M files per trigger; the lake paths above count
    // exactly via foreachBatch instead
    q.recentProgress.map(_.numInputRows).sum
  }

  /** Current target contents (the pipe's table). */
  def table(spark: SparkSession, pipe: Pipe): DataFrame =
    spark.read.schema(pipe.schema).parquet(pipe.targetDir)

  /** Event-driven TRIGGER (reference NOTIFICATION_PROVIDER pipes): load
    * exactly the files named by the provider's pending events — NO
    * source-directory listing, so trigger cost is O(arrived files) and
    * never O(source prefix). Exactly-once layering:
    *  1. events poll non-destructively (SQS receive semantics);
    *  2. already-loaded paths (the pipe's loaded-files log — the same
    *     file-identity dedup the reference implements, and the
    *     DEDUPE_LOOKBACK surface) are dropped, so a replayed or duplicate
    *     event loads nothing;
    *  3. a lake sink lands the batch as ONE tagged commit (tag = digest
    *     of the file set) — crash-replays are absorbed by the tag;
    *  4. the log advances (atomic tmp+move), THEN events ack. A crash
    *     anywhere re-polls the same events into step 2's filter.
    * Returns rows loaded by THIS trigger. */
  def triggerNotified(spark: SparkSession, pipe: Pipe): Long = {
    val provider = pipe.notificationProvider.getOrElse(
      throw new IllegalStateException(s"pipe ${pipe.name} has no NOTIFICATION_PROVIDER"))
    val queueRef = pipe.notificationQueue.getOrElse(
      throw new IllegalArgumentException(
        s"pipe ${pipe.name}: NOTIFICATION_PROVIDER needs NOTIFICATION_QUEUE_REFERENCE"))
    val source = Notifications.sourceFor(provider)
    val events = source.poll(queueRef)
    val ckDir = java.nio.file.Paths.get(pipe.checkpointDir)
    java.nio.file.Files.createDirectories(ckDir)
    // an in-flight pending intent must complete even if the queue looks
    // empty (a crash window may sit between its commit and its ack)
    if (events.isEmpty &&
        !java.nio.file.Files.exists(ckDir.resolve("notified-pending")))
      return 0L
    val logFile = ckDir.resolve("notified-files.log")
    // log format: "#gen=<n>" header, then "<epochMs>\t<path>" lines. The
    // generation stamps each trigger's commit tag, so a file legitimately
    // RE-ingested after its log entry expired (DEDUPE_LOOKBACK_PERIOD)
    // lands under a new tag while a crash-replay of the SAME trigger
    // (log not yet advanced → same generation, same file set) is still
    // absorbed by the original tag.
    val (gen, entries) = readNotifiedLog(logFile)
    val now = System.currentTimeMillis()
    // DEDUPE_LOOKBACK_PERIOD: entries older than the window fall out of
    // the dedup memory — the log stays O(files in window), and a file
    // re-arriving after the window re-ingests (the reference's contract)
    val cutoff = pipe.dedupeLookbackDays.map(d => now - d * 86400000L)
    val live = cutoff.fold(entries)(c => entries.filter(_._1 >= c))
    val loaded: Set[String] = live.map(_._3).toSet
    // PENDING intent: the file set of an in-flight trigger is pinned to
    // disk BEFORE its commit, so a crash-replay re-commits exactly that
    // set under exactly that tag even if NEW events arrived in between —
    // tagging the replay by the (grown) polled set would land the old
    // files twice. A pending record whose generation no longer matches
    // the log is from a crash AFTER the log advanced: discard it.
    val pendingFile = ckDir.resolve("notified-pending")
    val pending: Option[Seq[String]] =
      if (!java.nio.file.Files.exists(pendingFile)) None
      else {
        val lines = new String(
          java.nio.file.Files.readAllBytes(pendingFile), "UTF-8")
          .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
        val pGen = lines.headOption.filter(_.startsWith("#gen="))
          .map(_.stripPrefix("#gen=").toLong)
        if (pGen.contains(gen)) Some(lines.filterNot(_.startsWith("#")))
        else { java.nio.file.Files.deleteIfExists(pendingFile); None }
      }
    val fresh = pending.getOrElse(
      events.map(_.path).distinct.filterNot(loaded))
    if (pending.isEmpty && fresh.nonEmpty) {
      // pin the intent atomically before any data moves
      val tmp = ckDir.resolve(".notified-pending.tmp")
      java.nio.file.Files.write(tmp,
        (s"#gen=$gen" +: fresh).mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, pendingFile,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val n: Long =
      if (fresh.isEmpty) 0L
      else {
        val gated = gateBatch(spark, pipe, readBatch(spark, pipe, fresh))
        try {
          val rows = gated.kept.count()
          pipe.sink match {
            case "lake" =>
              val lake = graft.sources.SnapshotTable.forPath(spark, pipe.targetDir)
              val (spec, statsCols, _) = lake.effectiveLayout
              val digest = java.security.MessageDigest.getInstance("MD5")
                .digest(fresh.sorted.mkString("\n").getBytes("UTF-8"))
                .map("%02x".format(_)).mkString
              val before = lake.latestVersion
              // generation in the tag: crash-replay (log not advanced →
              // same gen) absorbs; a post-expiry re-ingest (gen moved on)
              // legitimately lands as a new commit
              val v = lake.appendTagged(gated.kept,
                s"pipe:${pipe.name}:notified:$gen:$digest", spec, statsCols)
              // absorbed replay → skip the quarantine append too
              gated.finish(v <= before)
              if (v > before) rows else 0L
            case _ =>
              // plain parquet sink: no commit tag exists to absorb a crash
              // between write and log advance — the lake sink is the
              // exactly-once target (same caveat as the reference's plain
              // file sinks)
              gated.kept.write.mode("append").parquet(pipe.targetDir)
              gated.finish(false)
              rows
          }
        } catch { case e: Throwable => gated.finish(true); throw e }
      }
    // advance the log atomically (trimmed to the lookback window, new
    // generation), clear the pending intent, then ack ONLY the events
    // this trigger handled — an event for a file outside the pinned
    // pending set must survive in the queue for the next trigger
    if (fresh.nonEmpty || live.size != entries.size) {
      val body = (s"#gen=${gen + 1}" +:
        (live ++ fresh.map(p => (now, gen, p)))
          .sortBy(e => (e._3, e._1))
          .map { case (ts, g, p) => s"$ts\t$g\t$p" }).mkString("\n")
      val tmp = ckDir.resolve(".notified-files.log.tmp")
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, logFile,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    java.nio.file.Files.deleteIfExists(pendingFile)
    val handled = loaded ++ fresh
    source.ack(queueRef, events.filter(e => handled(e.path)))
    n
  }

  /** Incremental materialized-view maintenance from a file stream
    * (SURVEY §2.10 / reference IncrementalUpdateUtils: recompute
    * materializations incrementally): each micro-batch is pre-aggregated
    * to per-key partials, combined with the current materialization by
    * summing, and committed to the lake table with a batch-id tag — so a
    * replayed batch never double-counts. Cost per trigger is
    * O(delta + materialization), never O(fact-table history); for
    * partitioned materializations pair with
    * Reflections.refreshIncremental to touch only affected partitions.
    *
    * `keyCols` are the rollup's grouping keys, `sumCols` its additive
    * measures (SUM/COUNT rollups — the incrementally-maintainable class).
    */
  def triggerIncrementalRollup(spark: SparkSession, pipe: Pipe,
                               keyCols: Seq[String], sumCols: Seq[String],
                               lakeDir: String): Long = {
    import org.apache.spark.sql.functions.{col, sum}
    val src = srcStream(spark, pipe)
    val lake = graft.sources.SnapshotTable.forPath(spark, lakeDir)
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = src.writeStream
      .option("checkpointLocation", pipe.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          val n = batch.count()
          val aggs = sumCols.map(c => sum(col(c)).as(c))
          val delta = batch.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
          // optimistic read-combine-publish: the combine reads the snapshot
          // at `before` and the tagged overwrite publishes ONLY if the table
          // is still there (expectedBase) — a commit from another maintainer
          // landing in between forces a recombine instead of being erased
          var committed = false
          var attempts = 0
          while (!committed) {
            val before = lake.latestVersion
            val combined =
              if (before == 0L) delta
              else lake.read(version = Some(before)).unionByName(delta)
                .groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
            try {
              val v = lake.overwriteTagged(combined,
                s"rollup:${pipe.name}:batch:$batchId", expectedBase = Some(before))
              if (v > before) total.addAndGet(n) // replayed batches combine nothing
              committed = true
            } catch {
              case e: java.util.ConcurrentModificationException =>
                attempts += 1; if (attempts > 5) throw e
            }
          }
        } finally batch.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    total.get
  }

  /** CDC/upsert pipe: each micro-batch MERGEs into the lake table by key
    * (last-writer-wins per key within a batch source is the caller's
    * contract, as in any CDC apply). The merge is a partial copy-on-write
    * rewrite — only files whose key range overlaps the batch are
    * rewritten, O(touched files) not O(table) — and each batch commits
    * under an idempotency tag, so checkpoint-recovery replays apply
    * exactly once. The target lake table must already exist (create it
    * with the seed snapshot; a CDC stream without an initial snapshot is
    * an append pipe). Returns rows applied by THIS trigger. */
  def triggerMergeIntoLake(spark: SparkSession, pipe: Pipe, key: String): Long = {
    val src = srcStream(spark, pipe)
    val lake = graft.sources.SnapshotTable.forPath(spark, pipe.targetDir)
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = src.writeStream
      .option("checkpointLocation", pipe.checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val gated = gateBatch(spark, pipe, batch0)
        try {
          val n = gated.kept.count()
          val before = lake.latestVersion
          val v = lake.mergeByKeyTagged(gated.kept, key,
            s"merge:${pipe.name}:batch:$batchId")
          // replayed batches apply nothing — and re-append no diagnostics
          gated.finish(v <= before)
          if (v > before) total.addAndGet(n)
        } catch { case e: Throwable => gated.finish(true); throw e }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    total.get
  }

  /** TRIGGER PIPE into a graft-lake table: each micro-batch lands as ONE
    * atomic append commit, so downstream readers never see a half-loaded
    * batch (the parquet sink above exposes files as they appear). Replayed
    * batches after checkpoint recovery are absorbed by the commit's
    * idempotency tag — exactly-once end to end: the file-source log dedups
    * input files, the tagged commit dedups output batches. */
  def triggerIntoLake(spark: SparkSession, pipe: Pipe): Long = {
    // inherit the target table's effective layout (sticky spec): a pipe
    // feeding a partitioned table keeps it partitioned instead of landing
    // layout-less commits that would degrade pruning
    val (spec, statsCols, _) =
      graft.sources.SnapshotTable.forPath(spark, pipe.targetDir).effectiveLayout
    triggerIntoLake(spark, pipe, spec, statsCols)
  }

  /** Partitioned variant: each micro-batch lands as one atomic append
    * commit clustered by the table's partition transforms (the realistic
    * 100 TB ingest layout — a day/bucket-partitioned fact table fed by a
    * pipe prunes from the very first commit; no post-hoc re-layout). */
  def triggerIntoLake(spark: SparkSession, pipe: Pipe,
                      partitionSpec: Seq[String],
                      statsCols: Seq[String]): Long = {
    val src = srcStream(spark, pipe)
    val lake = graft.sources.SnapshotTable.forPath(spark, pipe.targetDir)
    // exact count accumulated in foreachBatch — recentProgress is a
    // bounded ring buffer and would silently undercount very large drains
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = src.writeStream
      .option("checkpointLocation", pipe.checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val gated = gateBatch(spark, pipe, batch0)
        try {
          val n = gated.kept.count()
          val before = lake.latestVersion
          val v = lake.appendTagged(gated.kept,
            s"pipe:${pipe.name}:batch:$batchId", partitionSpec, statsCols)
          // a replayed batch (checkpoint recovery) is absorbed by the tag
          // and loads nothing — don't count its rows, don't re-append its
          // quarantine diagnostics
          gated.finish(v <= before)
          if (v > before) total.addAndGet(n)
        } catch { case e: Throwable => gated.finish(true); throw e }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    total.get
  }

  /** Incremental LAKE→LAKE pipe: each TRIGGER ships the source table's
    * commits `(checkpointed version, latest]` to the target — continuous
    * replication / downstream-table maintenance over the snapshot log
    * (the streaming generalization of the reference's incremental
    * reflection refresh, `IncrementalUpdateUtils.java`; Iceberg/Delta
    * users know it as a changelog-driven pipeline).
    *
    * Two flavors, keyed on the pipe's sink:
    *  - append (`sink = "lake"`): the range must be all-append (the
    *    incremental scan REFUSES across DML/overwrite — fail loud beats
    *    silent duplication); the batch lands as ONE idempotent
    *    version-range-tagged commit inheriting the target's sticky
    *    layout. Crash after commit, before checkpoint advance → the
    *    replay hits the tag and loads nothing. Exactly-once.
    *  - CDC (`sink = "merge"` + mergeKey): row-level `changesBetween`
    *    (exact across copy-on-write DML and compaction) nets to per-key
    *    upserts + deletes applied with one clause MERGE. Replay after a
    *    crash re-applies the SAME net changes — value-idempotent (an
    *    extra no-change commit, never wrong rows).
    *
    * Scale: reads O(changed files) of the source, one commit on the
    * target per trigger; the version checkpoint is a tiny atomic file
    * under the pipe's checkpoint dir. */
  def triggerFromLake(spark: SparkSession, pipe: Pipe): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.sources.SnapshotTable
    val src = SnapshotTable.forPath(spark, pipe.sourceDir)
    val target = SnapshotTable.forPath(spark, pipe.targetDir)
    val ckDir = java.nio.file.Paths.get(pipe.checkpointDir)
    java.nio.file.Files.createDirectories(ckDir)
    val ckFile = ckDir.resolve("lake-source-version")
    val lastV =
      if (java.nio.file.Files.exists(ckFile))
        new String(java.nio.file.Files.readAllBytes(ckFile), "UTF-8").trim.toLong
      else 0L
    val curV = src.latestVersion
    if (curV <= lastV) return 0L
    val tag = s"pipe:${pipe.name}:versions:$lastV-$curV"
    val loaded: Long = pipe.sink match {
      case _ if lastV == 0L =>
        // initial sync: ship the full current snapshot as one idempotent
        // tagged commit (a changes-scan from version 0 cannot cross the
        // source's CTAS overwrite), then go incremental from curV
        val batch = src.read()
        val (spec, statsCols, _) = target.effectiveLayout
        val before = target.latestVersion
        val v =
          if (pipe.sink == "merge" && before > 0L)
            // non-empty CDC target: converge by key instead of appending
            target.mergeByKeyTagged(batch, pipe.mergeKey.getOrElse(
              throw new IllegalArgumentException(
                s"pipe ${pipe.name}: CDC lake pipe needs MERGE KEY")), tag)
          else target.appendTagged(batch, tag, spec, statsCols)
        if (v > before) batch.count() else 0L
      case "merge" =>
        val key = pipe.mergeKey.getOrElse(
          throw new IllegalArgumentException(s"pipe ${pipe.name}: CDC lake pipe needs MERGE KEY"))
        val changes = src.changesBetween(lastV, curV).persist()
        try {
          val ins = changes.filter(col("_change_type") === "insert").drop("_change_type")
          val delOnly = changes.filter(col("_change_type") === "delete").drop("_change_type")
            .join(ins.select(col(key)), Seq(key), "left_anti")
          val delta = ins.withColumn("_op", lit("u"))
            .unionByName(delOnly.withColumn("_op", lit("d")))
          val n = delta.count()
          if (n > 0) {
            target.merge(delta, key,
              matched = Seq(
                SnapshotTable.WhenMatched(Some("s._op = 'd'"),
                  SnapshotTable.MatchedAction.Delete),
                SnapshotTable.WhenMatched(Some("s._op = 'u'"),
                  SnapshotTable.MatchedAction.UpdateAll)),
              notMatched = Some(SnapshotTable.WhenNotMatched(Some("s._op = 'u'"))))
          }
          n
        } finally changes.unpersist()
      case _ =>
        val batch = src.changes(lastV, curV) // refuses non-append ranges
        val (spec, statsCols, _) = target.effectiveLayout
        val before = target.latestVersion
        val v = target.appendTagged(batch, tag, spec, statsCols)
        if (v > before)
          // rows of the freshly landed commit, from its own manifest
          target.commits.find(_.version == v).map(_.stats.values
            .flatMap(_.get(SnapshotTable.RowsStatKey)).map(_._1.toLong).sum)
            .getOrElse(0L)
        else 0L // replayed range absorbed by the tag
    }
    // advance the checkpoint ATOMICALLY (tmp + move) only after the commit
    val tmp = ckDir.resolve(s".lake-source-version.tmp")
    java.nio.file.Files.write(tmp, curV.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, ckFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    loaded
  }
}
