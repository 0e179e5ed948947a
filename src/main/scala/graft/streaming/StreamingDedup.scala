package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.Functions
import graft.sources.SnapshotTable

/** Streaming near-duplicate admission: a document stream lands in an
  * output lake table ONLY when it is not a MinHash near-duplicate of any
  * previously admitted document — the continuous form of the corpus
  * dedup sweep (an ingest firehose where today's crawl must not re-admit
  * yesterday's pages).
  *
  * Design: the admitted-signature set is CORPUS-sized, so it does NOT
  * live in an executor state store (those checkpoint per-batch and are
  * sized for keyed windows, not billions of signatures) — it lives in a
  * graft-lake table of banded LSH rows `(doc_id, band, bh, sig)`, giving
  * the state the same durability, time travel, compaction and audit
  * surface as any other table. Each micro-batch:
  *
  *  1. signs the batch once (64-hash MinHash, 16 × 4-row bands — the
  *     [[graft.llm.Dedup.minhashLsh]] banding, same xxhash64 band keys);
  *  2. candidates = banded equi-join of batch bands against state bands
  *     (batch side broadcast — the state scan streams past it, one probe
  *     per state row, no state shuffle) plus a banded self-join for
  *     intra-batch pairs (earlier arrival = smaller doc_id wins);
  *  3. verifies candidates, by default on the SIGNATURE-estimated
  *     Jaccard (fraction of equal MinHash components — the unbiased
  *     estimator; E[frac] = J): state stays a fixed 8·numHashes bytes
  *     per doc. With `exactVerify` the state rows additionally carry the
  *     8-byte n-gram hash set and candidates verify on EXACT set Jaccard
  *     — the batch sweep's verification, deterministic w.r.t. shingle
  *     sets (no estimator variance), at the cost of O(grams) state per
  *     doc. A state table is bound to the mode that created it;
  *  4. appends admitted docs to `out` and their band rows to `state`,
  *     both as TAGGED commits (`dedup:<queryId>:<batchId>`) — a replayed
  *     batch after checkpoint recovery is absorbed by the tag on BOTH
  *     tables, so admission is exactly-once even though the two commits
  *     are not atomic together.
  *
  * Duplicate-of-a-duplicate chains: a doc that matches an earlier
  * IN-BATCH doc is dropped even if that earlier doc is itself dropped
  * against the state (cluster chaining — the LSH-clustering convention;
  * all chain members are near the same cluster and the cluster already
  * has an admitted representative or gets one this batch).
  *
  * Scale: per batch, ONE manifest-PRUNED scan of the state table — state
  * rows write range-clustered on `bh` with per-file min/max stats, and
  * the batch's distinct band keys fold into a static IN-filter on the
  * read ([[prunedStateScan]]), so only the state FILES whose bh range
  * holds a candidate bucket ever open; the kept files stream past the
  * broadcast batch (no shuffle of state rows). Intra-batch comparison
  * is bounded at |bucket|·`maxBucket` (every doc vs its bucket's first
  * arrivals — an identical flood collapses onto its first rep, a
  * pathological bucket can't go quadratic), and state buckets hold only
  * admitted (deduplicated) docs. Compact the state table periodically
  * (OPTIMIZE … ORDER BY bh / `compactSorted(Seq("bh"))`) so accumulated
  * per-batch files re-cluster into disjoint ranges and the prune rate
  * stays high as state grows toward corpus size.
  */
object StreamingDedup {

  /** Band rows for a doc batch: (doc_id, band, bh, sig[, ngrams]). */
  private[graft] def banded(docs: DataFrame, numHashes: Int, bands: Int,
                            exactVerify: Boolean): DataFrame = {
    val rows = numHashes / bands
    val signed = docs
      .withColumn("sig", Functions.minhash(col("text"), numHashes, 3))
      .withColumn("ngrams",
        if (exactVerify) Functions.ngram_hashes(col("text"), 3)
        else array().cast("array<bigint>"))
    signed
      .select(col("doc_id"), col("sig"), col("ngrams"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, " +
            s"xxhash64(b, ${(0 until rows).map(r => s"sig[b * $rows + $r]").mkString(", ")}) as bh))"))
          .as("bb"))
      .select(col("doc_id"), col("sig"), col("ngrams"), col("bb.band"), col("bb.bh"))
  }

  /** Per-batch state read, manifest-pruned by the batch's band keys: the
    * batch's distinct `bh` set is metadata-sized for real micro-batches
    * (|docs|·bands 8-byte hashes), so it folds into a static IN-filter on
    * the state scan — the same trick VectorIndex.search plays with probed
    * buckets — and state FILES whose recorded [min, max] bh range meets
    * no batch key never open. State appends are range-clustered on `bh`
    * (and OPTIMIZE re-clusters), so ranges are tight: per batch the scan
    * cost is O(files holding candidate buckets), not O(state). The filter
    * is a pure superset of the equi-join's own `bh` condition, so results
    * are identical. Batches with more than `maxPruneKeys` distinct band
    * keys (a bulk backfill, not a stream) fall back to the full scan —
    * the IN-fold's plan-time prune walk is O(files·keys) and must stay
    * bounded. */
  private[graft] def prunedStateScan(state: SnapshotTable,
                                     batchBands: DataFrame,
                                     maxPruneKeys: Int = 8192,
                                     minStateFiles: Int = 64): DataFrame = {
    val base = state.read()
    // pruning pays when the state is many files; below the floor the
    // key-collect + IN-fold costs more plan time than the read it saves
    if (state.snapshotWithStats()._1.size < minStateFiles) return base
    // cheap overflow gate BEFORE the distinct+collect: an approximate
    // distinct over the cached batch (map-side partial, one tiny agg row
    // — no shuffle of the values themselves) decides whether the prune
    // set would overflow, so a bulk backfill skips straight to the full
    // scan instead of paying an exact distinct it would discard — while
    // a duplicate-heavy FLOOD (many rows, few distinct band keys: the
    // dedup workload itself) keeps its pruning. The exact distinct below
    // still backstops an approx under-estimate.
    val approxKeys = batchBands
      .agg(approx_count_distinct(col("bh")).as("k")).head().getLong(0)
    if (approxKeys > maxPruneKeys.toLong * 11 / 10) return base
    val keys = batchBands.select(col("bh")).distinct()
      .limit(maxPruneKeys + 1).collect().map(_.getLong(0))
    if (keys.isEmpty) base.limit(0)
    else if (keys.length > maxPruneKeys) base
    else base.filter(col("bh").isin(keys.map(java.lang.Long.valueOf).toSeq: _*))
  }

  /** Signature-estimated Jaccard: fraction of equal MinHash components. */
  private def estJaccard(a: String, b: String) =
    expr(s"size(filter(zip_with($a, $b, (x, y) -> x = y), v -> v))")
      .cast("double") / expr(s"size($a)")

  /** Exact n-gram Jaccard over the 8-byte gram-hash sets. */
  private def exactJaccard(a: String, b: String) =
    expr(s"size(array_intersect($a, $b))").cast("double") /
      expr(s"size(array_union($a, $b))").cast("double")

  /** One micro-batch admission (idempotent under `tag`). Returns the
    * out-table commit version the batch landed as (or already had landed
    * as, on a replay). Exposed for specs and pipe triggers; the streaming
    * entry point is [[start]]. */
  def admitBatch(spark: SparkSession, batchDocs: DataFrame, stateDir: String,
                 outDir: String, tag: String, jaccardThreshold: Double = 0.7,
                 numHashes: Int = 64, bands: Int = 16,
                 maxBucket: Int = 64, exactVerify: Boolean = false): Long = {
    val state = SnapshotTable.forPath(spark, stateDir)
    val out = SnapshotTable.forPath(spark, outDir)
    def verified(a: String, b: String) =
      (if (exactVerify) exactJaccard(a, b) else estJaccard(a, b)) >= jaccardThreshold
    // NOT spread: micro-batches are small by nature — fanning a few
    // hundred rows across every core costs more scheduling than the
    // signing saves (A/B-measured)
    val b = banded(batchDocs.select(col("doc_id"), col("text")), numHashes, bands,
        exactVerify)
      .cache()
    try {
      val batchBands = b.select(col("doc_id"), col("sig"), col("ngrams"),
        col("band"), col("bh"))

      // vs state: broadcast the (small) batch bands; the state scan is
      // manifest-pruned to the files holding the batch's band keys
      // (prunedStateScan) and streams past the broadcast — no shuffle of
      // state rows. State buckets stay naturally small: only ADMITTED
      // (already-deduplicated) docs land band rows, so a boilerplate
      // flood is one state representative.
      val vsState: DataFrame =
        if (state.latestVersion == 0) spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
        else prunedStateScan(state, batchBands)
          .select(col("band"), col("bh"), col("sig").as("s_sig"),
            col("ngrams").as("s_ngrams"))
          .join(broadcast(batchBands), Seq("band", "bh"))
          .filter(if (exactVerify) verified("ngrams", "s_ngrams")
                  else verified("sig", "s_sig"))
          .select(col("doc_id")).distinct()

      // intra-batch: earlier arrival (smaller doc_id) wins. EVERY doc
      // compares against its bucket's first-`maxBucket` arrivals (the
      // representatives) — |bucket|·cap comparisons, not |bucket|² — so
      // an identical flood still collapses (each member matches the first
      // rep) while a pathological bucket can't go quadratic. Docs beyond
      // the cap whose only near-dups are ALSO beyond it trade recall for
      // the bound, exactly like the batch sweep's cap.
      val reps = graft.plans.TopKPerKey(batchBands,
          Seq(col("band"), col("bh")), lit(0.0),
          graft.plans.TopKPerKey.numericTie(batchBands, col("doc_id")), maxBucket)
        .select(col("band"), col("bh"), col("doc_id").as("a_id"),
          col("sig").as("a_sig"), col("ngrams").as("a_ngrams"))
      val intra = reps
        .join(batchBands.select(col("band"), col("bh"), col("doc_id").as("b_id"),
          col("sig").as("b_sig"), col("ngrams").as("b_ngrams")), Seq("band", "bh"))
        .filter(col("a_id") < col("b_id"))
        .dropDuplicates("a_id", "b_id")
        .filter(if (exactVerify) verified("a_ngrams", "b_ngrams")
                else verified("a_sig", "b_sig"))
        .select(col("b_id").as("doc_id")).distinct()

      val dropIds = vsState.unionByName(intra).distinct()
      // pinned: the admission plan feeds the out-append, the state-append
      // semi-join, AND the file-count sizing below — execute it once
      val admitted = batchDocs.join(dropIds, Seq("doc_id"), "left_anti").persist()
      try {
        val n = out.appendTagged(admitted, tag, Nil, Nil)
        // state rows land RANGE-CLUSTERED on bh with per-file min/max (and
        // bloom) stats: each file covers a narrow bh interval, which is
        // what makes prunedStateScan's IN-fold drop files at plan time.
        // File count scales with the batch (one file per ~500k band rows;
        // a typical micro-batch is one file), so a bulk initial load does
        // not produce a single monster file. The admitted row count comes
        // from the out-commit's own manifest (the commit just recorded
        // per-file __rows) — no separate count() job; on a tag replay the
        // original commit's count is the same number by construction.
        val stateRowCount =
          out.commitRowCount(n).getOrElse(admitted.count()) * bands
        val nf = math.max(1, math.ceil(stateRowCount / 500000.0).toInt)
        val stateRows0 = b
          .join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("band"), col("bh"), col("sig"), col("ngrams"))
        // one file (the typical micro-batch): a plain coalesce+sort gives
        // the same tight per-file bh range without repartitionByRange's
        // extra boundary-sampling job and shuffle
        val stateRows =
          if (nf == 1) stateRows0.coalesce(1).sortWithinPartitions(col("bh"))
          else stateRows0.repartitionByRange(nf, col("bh"))
            .sortWithinPartitions(col("bh"))
        state.appendTagged(stateRows, s"$tag:state", Nil, Seq("bh"))
        n
      } finally admitted.unpersist()
    } finally b.unpersist()
  }

  /** Continuous near-dup-filtered ingest: every micro-batch of `stream`
    * (schema must include `doc_id`, `text`) runs [[admitBatch]] with an
    * idempotent per-batch tag.
    *
    * `compactStateEvery` (0 = off): every Nth batch re-clusters the state
    * table by band hash (`compactSorted(bh)`) so accumulated per-batch
    * files merge into disjoint bh ranges and [[prunedStateScan]]'s prune
    * rate holds as state grows — the maintenance the scaladoc otherwise
    * asks the operator to schedule. The rewrite is copy-on-write with
    * conflict retry, and a checkpoint-replayed trigger just compacts
    * again (harmless): admission exactness never depends on it. */
  def start(stream: DataFrame, stateDir: String, outDir: String,
            checkpointDir: String, jaccardThreshold: Double = 0.7,
            numHashes: Int = 64, bands: Int = 16,
            maxBucket: Int = 64, compactStateEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (data: DataFrame, batchId: Long) =>
        val spark = data.sparkSession
        val qid = Bridge.streamingQueryId(spark).getOrElse(checkpointDir)
        val batch = Bridge.materializedCopy(data)
        admitBatch(spark, batch, stateDir, outDir, s"dedup:$qid:$batchId",
          jaccardThreshold, numHashes, bands, maxBucket)
        if (compactStateEvery > 0 && batchId > 0 &&
            batchId % compactStateEvery == 0) {
          val st = SnapshotTable.forPath(spark, stateDir)
          if (st.latestVersion > 0) {
            // target ~500k band rows per file, same sizing as the appends;
            // sized from manifest row counts — at billion-row state a
            // sizing scan would cost more than the compaction it sizes
            // (dedup state files always record __rows, so the count()
            // fallback only fires on a foreign-written state table)
            val rows = st.manifestRowCount.getOrElse(st.read().count())
            st.compactSorted(Seq("bh"),
              numFiles = math.max(1, math.ceil(rows / 500000.0).toInt))
          }
        }
        ()
      }
      .start()
}
