package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** Document deduplication for training-data pipelines, at lakehouse scale.
  *
  * Four families (exact, MinHash+LSH, SimHash, n-gram Jaccard), all built on
  * the custom fingerprint expressions in graft.functions and shaped for
  * 100 TB: every stage is a hash-partitioned shuffle on a compact key
  * (16-byte digest / 8-byte band hash), never a string key, and candidate
  * generation is strictly bucket-local — no all-pairs stage anywhere.
  *
  * The LSH bucket caps plan through [[graft.plans.TopKPerKey]] (bounded
  * heaps), so the session must carry the graft extensions
  * (`graft.sqlext.GraftExtensions` — `GraftSession.local` does) for the
  * near-dup paths to plan.
  */
object Dedup {

  /** Exact dedup: group by content digest, keep the lowest id.
    * Scale: shuffle key is the 16-byte md5, so the join/aggregate is
    * uniformly distributed regardless of document skew. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature + banded LSH candidate pairs + exact n-gram Jaccard
    * verification.
    *
    * numHashes=64 split into 16 bands of 4 rows: P(candidate) ≈
    * 1-(1-J^4)^16, steep around J≈0.5. Bands explode 16× (bounded), pairs
    * come from an equi-join on (band, bandHash) — a plain shuffle join that
    * scales linearly; oversized buckets (degenerate content) are capped to
    * keep the within-bucket pairing quadratic-safe.
    */
  def minhashLsh(docs: DataFrame, jaccardThreshold: Double = 0.5,
                 numHashes: Int = 64, bands: Int = 16,
                 maxBucket: Int = 64): DataFrame = {
    val rows = numHashes / bands
    // spread: MinHash signing (numHashes hashes over every ngram) and the
    // ngram-set projection below are the heavy map work; both fuse into the
    // scan stage and would run one-task on an under-split source. The two
    // identical spread subtrees collapse into ONE exchange via
    // ReuseExchange. Per-row outputs + deterministic heap ties — safe.
    val src = graft.engine.Parallelism.spread(
      docs.select(col("doc_id"), col("text")))
    // Banding carries ONLY (band, bandHash, doc_id): the candidate join
    // shuffles 20 bytes/row ×16 bands, not each doc's ngram array — at
    // corpus scale the candidate-generation shuffle is the dominant cost.
    val banded = src
      .select(col("doc_id"), Functions.minhash(col("text"), numHashes, 3).as("sig"))
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, " +
            s"xxhash64(b, ${(0 until rows).map(r => s"sig[b * $rows + $r]").mkString(", ")}) as bh))"))
          .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))

    // Cap pathological buckets (e.g. empty/boilerplate docs) so the
    // within-bucket pair count stays bounded. TopKPerKey bounded heaps,
    // NOT row_number over a (band, bh) window: the banded table is
    // bands× the corpus, and a window would SORT all of it inside every
    // hash partition (spilling at scale) to keep only `maxBucket` rows
    // per bucket — the heap keeps the identical selection (the
    // `maxBucket` smallest doc_ids per bucket; string/binary ids keep a
    // deterministic hash-ordered subset instead) in O(n log k).
    val bucketed = graft.plans.TopKPerKey(banded,
        Seq(col("band"), col("bh")), lit(0.0),
        graft.plans.TopKPerKey.numericTie(banded, col("doc_id")), maxBucket)
      .select(col("band"), col("bh"), col("doc_id"))

    val a = bucketed.select(col("band"), col("bh"), col("doc_id").as("a_id"))
    val b = bucketed.select(col("band"), col("bh"), col("doc_id").as("b_id"))
    val pairs = a.join(b, Seq("band", "bh")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")

    // Exact-verify only the deduplicated candidates: ngram sets are
    // computed once per doc and joined to the (much smaller) pair set.
    val ngrams = src.select(col("doc_id"), Functions.ngram_hashes(col("text"), 3).as("ngrams"))
    pairs
      .join(ngrams.withColumnRenamed("doc_id", "a_id").withColumnRenamed("ngrams", "a_ngrams"), "a_id")
      .join(ngrams.withColumnRenamed("doc_id", "b_id").withColumnRenamed("ngrams", "b_ngrams"), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("a_ngrams"), col("b_ngrams"))).cast("double") /
          size(array_union(col("a_ngrams"), col("b_ngrams"))).cast("double"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit signature, candidates via the 4×16-bit-chunk
    * pigeonhole (hamming ≤ 3 guarantees one identical chunk), verified with
    * exact hamming distance. Chunk join is an 8-byte-key shuffle. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    simhashJoin(
      graft.engine.Parallelism.spread(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), Functions.simhash64(col("text")).as("sig")),
      maxHamming)

  /** [[simhashPairs]] with a CROSS-ENGINE-REPLAYABLE signature: per-token
    * 64-bit hashes come from md5 (the first/last 8 hex chars as two 32-bit
    * halves — md5 is identical everywhere) instead of the engine-seeded
    * xxhash64, with the same whitespace-lowercase token multiset and the
    * same per-bit majority vote. Candidate generation, hamming verify and
    * dedup are [[simhashJoin]] — the identical machinery the xxhash path
    * runs — so an external engine (the DuckDB oracle) replays the full
    * pipeline bit-for-bit: tokens → md5 halves → bit votes → signature →
    * chunk pigeonhole → hamming. The xxhash64 variant stays the 100 TB hot
    * path (one codegen'd expression per doc vs a token explode + two
    * aggregates here); this one buys EXACT external verifiability. */
  def simhashPairsReplayable(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // spread: tokenize + per-token md5 + the 65-column partial aggregate
    // all fuse into the scan stage; integer bit-vote sums are
    // partition-order-independent, so spreading is exact
    val src = graft.engine.Parallelism.spread(
      docs.select(col("doc_id"), col("text")))
    // token multiset, exactly TextHashing.tokenize's contract: lowercase,
    // split on the six ASCII whitespace chars, drop empties, keep repeats
    val toks = src.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "[ \t\n\r\f\u000B]+"),
        w => length(w) > lit(0))).as("tok"))
    val h = toks.withColumn("m", md5(col("tok").cast("binary")))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h_hi"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h_lo"))
    // ONE map-side-combinable aggregate carrying all 64 bit-majorities:
    // 64 conditional sums + the token count per doc (65 longs through the
    // shuffle), instead of exploding tokens×64 vote rows — identical
    // majorities, since vote-sum Σ(2·bit−1) > 0  ⟺  2·Σbit > n
    val bitSums =
      (0 until 32).map(b =>
        sum(shiftright(col("h_lo"), b).bitwiseAND(lit(1L))).as(s"lo_$b")) ++
      (0 until 32).map(b =>
        sum(shiftright(col("h_hi"), b).bitwiseAND(lit(1L))).as(s"hi_$b")) :+
      count(lit(1)).as("n")
    // signature = sum of distinct bit powers (no intermediate overflow:
    // bits 0..62 sum below 2^63, bit 63 lands the result in signed range)
    val sigExpr =
      ((0 until 32).map(b =>
        when(col(s"lo_$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))) ++
       (0 until 32).map(b =>
        when(col(s"hi_$b") * 2 > col("n"), lit(1L << (b + 32))).otherwise(lit(0L))))
        .reduce(_ + _)
    val sigs = h.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sigExpr.as("sig"))
    // a doc with no tokens folds to signature 0, like the kernel's empty fold
    val allSigs = src.select(col("doc_id")).join(sigs, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("sig"), lit(0L)).as("sig"))
    simhashJoin(allSigs, maxHamming)
  }

  /** Shared candidate+verify stage over (doc_id, sig): 4×16-bit chunk
    * pigeonhole equi-join, exact hamming verify, pair dedup. */
  private def simhashJoin(sigd: DataFrame, maxHamming: Int): DataFrame = {
    val chunked = sigd.select(col("doc_id"), col("sig"),
      explode(expr("transform(sequence(0, 3), c -> struct(c as chunk, " +
        "cast(shiftright(sig, c * 16) & 65535 as int) as ck))")).as("cc"))
      .select(col("doc_id"), col("sig"), col("cc.chunk"), col("cc.ck"))
    val a = chunked.select(col("chunk"), col("ck"), col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val b = chunked.select(col("chunk"), col("ck"), col("doc_id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("chunk", "ck")).filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", Functions.hamming64(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Connected components over dup pairs — the step after candidate
    * generation in a real dedup pipeline: LSH/SimHash emit PAIRS, but
    * keeping one canonical doc per duplicate GROUP needs the transitive
    * closure (A~B, B~C ⇒ {A,B,C} is one cluster even when A~C was never
    * emitted). Hash-to-min label propagation in plain DataFrame ops:
    * every vertex repeatedly adopts the smallest component id among
    * itself and its neighbors until a fixpoint — one shuffle join + one
    * min-aggregate per iteration, converging in O(component diameter)
    * rounds (dup clusters are near-cliques, so 2-4 in practice; hard cap
    * `maxIters` turns a pathological chain into an error, not a hang).
    *
    * Scale: state per round is (id, component) — 16 bytes/vertex — and
    * nothing is ever collected to the driver except the per-round 0/1
    * convergence signal, which rides the SAME job that materializes the
    * round's labels (an `observe` metric on the min-aggregate — no
    * separate probe join/job). Each round's labels are `localCheckpoint`ed:
    * an iterative self-referencing DataFrame otherwise nests the prior
    * round's plan inside the next (join + union both reference it), so
    * the logical plan grows EXPONENTIALLY with rounds and planning OOMs
    * near round 12 — lineage truncation keeps plan depth constant (the
    * same reason GraphFrames checkpoints its CC loop; on a cluster with
    * lossy executors, swap in reliable `checkpoint()`).
    *
    * Returns (id, component) where component = min id reachable. */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
                          maxIters: Int = 25): DataFrame = {
    val aCol = pairs.columns(0); val bCol = pairs.columns(1)
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
    edges.persist()
    val idCol = vertices.columns(0)
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("component"))
      .localCheckpoint(true)
    try {
      var iters = 0
      while (iters < maxIters) {
        val viaEdges = edges.join(labels, edges("src") === labels("id"))
          .select(col("dst").as("id"), col("component"),
            lit(null).cast(labels.schema("component").dataType).as("old"))
        // the vertex's own row carries its previous label in `old`, so
        // min-vs-old is computable inside the aggregate itself; the
        // convergence signal is an observe metric filled by the SAME job
        // the eager localCheckpoint runs — one job per round, no probe
        // join (previously: a second join+limit+count job per round)
        val obs = org.apache.spark.sql.Observation()
        val next = labels
          .select(col("id"), col("component"), col("component").as("old"))
          .union(viaEdges)
          .groupBy("id").agg(min("component").as("component"), max("old").as("old"))
          .observe(obs, sum(when(col("component") < col("old"), 1L)
            .otherwise(0L)).as("improved"))
          .select(col("id"), col("component"))
          .localCheckpoint(true)
        val improved = obs.get("improved").asInstanceOf[Long] > 0
        // `next` is eagerly materialized, so the superseded round's blocks
        // can be dropped NOW — deterministic O(1)-rounds memory instead of
        // waiting on the ContextCleaner's GC cadence. Only the RESULT's
        // checkpoint survives (its lifetime belongs to the caller).
        val prev = labels
        labels = next
        prev.unpersist(blocking = false)
        if (!improved) return labels
        iters += 1
      }
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations")
    } finally edges.unpersist()
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup over
    * embeddings — k-means-cluster the corpus, find cosine-threshold
    * duplicate pairs WITHIN each cluster only, close them transitively,
    * and keep one canonical doc per duplicate group: the member closest
    * to its cluster centroid (tie → lowest id), which the paper argues
    * best represents the group.
    *
    * Pure composition of existing operators: the spherical k-means coarse
    * quantizer ([[Similarity.kmeansCentroids]] — one aggregation pass per
    * Lloyd iteration, centroid matrix broadcast in codegen'd cosine
    * expressions), bucket-local pairing (never all-pairs: candidate space
    * is Σ cluster² not corpus²), and the label-propagation
    * [[connectedComponents]]. Output is one row per SURVIVOR with its
    * cluster, duplicate-group id and size.
    *
    * `centroids`: a SUPPLIED coarse-quantizer set replaces training — the
    * oracle-able path (same contract as VectorIndex.build's fixed
    * quantizer): with fixed centroids every downstream decision
    * (assignment argmax, threshold pairing, keeper ranking) is a pure
    * function of the data, and the cosines compute in DOUBLE precision
    * with in-order accumulation so an external engine doing IEEE double
    * dot products (DuckDB list_cosine_similarity) replays them
    * bit-exactly. The trained path keeps the float kernel (faster; its
    * semantics are pinned by planted-duplicate specs instead). */
  def semDedup(corpus: DataFrame, threshold: Double = 0.95,
               nClusters: Int = 0, kmeansIters: Int = 3,
               centroids: Option[Seq[Seq[Float]]] = None): DataFrame = {
    // nClusters <= 0 → k from corpus size (√N / max-cluster-rows target):
    // with a FIXED k the Σ cluster² candidate space is quadratic in
    // cluster size and a 100 TB corpus would pair (N/k)² rows per bucket
    val cents = centroids.getOrElse {
      val nc = if (nClusters > 0) nClusters
               else Similarity.autoClusters(corpus.count())
      Similarity.kmeansCentroids(corpus, nc, kmeansIters)
    }
    val doublePrec = centroids.isDefined
    // assignment switches plan shape on nc (expression array vs broadcast
    // centroid table + TopKPerKey) — Similarity.withProbedBuckets
    val assigned = Similarity.withProbedBuckets(
        graft.engine.Parallelism.spread(
          corpus.select(col("vec_id"), col("embedding"))),
        "embedding", "vec_id", cents, nProbe = 1,
        cosCol = Some("centroid_cos"), doublePrec = doublePrec)
      .select(col("vec_id"), col("embedding"), col("bucket"), col("centroid_cos"))
      // materialize once (eager, lineage-truncated, GC'd with the plan):
      // both pair sides, the component vertices, and the final keeper join
      // consume this — unmaterialized, each would re-scan the corpus and
      // re-evaluate the nClusters cosine assignments. At extreme corpus
      // sizes the checkpoint pins the embedding column into executor
      // storage (MEMORY_AND_DISK); spark.graft.semdedup.materialize=false
      // trades that for re-computation per consumer.
      .transform { df =>
        val on = df.sparkSession.conf
          .getOption("spark.graft.semdedup.materialize").forall(_.toBoolean)
        if (on) df.localCheckpoint(true) else df
      }
    val a = assigned.select(col("bucket"), col("vec_id").as("a_id"),
      col("embedding").as("a_vec"))
    val b = assigned.select(col("bucket"), col("vec_id").as("b_id"),
      col("embedding").as("b_vec"))
    val pairs = a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cos",
        if (doublePrec)
          Functions.cosine_sim_d(col("a_vec").cast("array<double>"),
            col("b_vec").cast("array<double>"))
        else Functions.cosine_sim(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"))
    // CC only over vertices that appear in a duplicate pair: a vertex with
    // no edge is ALWAYS its own component (the loop could never relabel
    // it), so feeding the whole corpus through the iterative label rounds
    // just re-shuffles singletons every round. Duplicates are typically a
    // small fraction of the corpus, so the per-round join/aggregate drops
    // from O(corpus) to O(duplicated subset); singletons rejoin as
    // component = own id via the left join below. Identical output.
    // pairs is persisted across its two consumers (the vertex projection
    // and CC's edge build) — otherwise the bucket-local cosine join, the
    // most expensive stage here, would execute twice. Safe to release as
    // soon as CC returns: every CC round eagerly localCheckpoints, so the
    // returned labels never re-read the input.
    val pairsP = pairs.persist()
    val comps =
      try {
        val pairVerts = pairsP.select(col("a_id").as("vec_id"))
          .union(pairsP.select(col("b_id").as("vec_id"))).distinct()
        connectedComponents(pairVerts, pairsP)
      } finally { pairsP.unpersist(); () }
    val ranked = assigned.join(comps, assigned("vec_id") === comps("id"), "left")
      .select(col("vec_id"), col("bucket"), col("centroid_cos"),
        coalesce(col("component"), col("vec_id")).as("component"))
    // Keeper per component = ONE map-side-combinable aggregate (arg-max by
    // (centroid_cos, then lowest vec_id), group size riding the same agg)
    // — not a row_number window, which would sort every component's rows
    // corpus-wide just to keep row 1. min_by over (−centroid_cos, vec_id)
    // keeps the ordering total for ANY orderable id type: negating the
    // DOUBLE cosine is exact and never null, where negating the id would
    // be null for string ids and overflow Long.MinValue.
    ranked.groupBy(col("component"))
      .agg(
        min_by(struct(col("vec_id"), col("bucket")),
          struct((-col("centroid_cos")).as("neg_cos"), col("vec_id"))).as("keep"),
        count(lit(1)).as("group_size"))
      .select(col("keep.vec_id").as("vec_id"), col("keep.bucket").as("bucket"),
        col("component"), col("group_size"))
  }

  /** Embedding near-duplicate pairs by signed-random-projection LSH
    * (Charikar 2002 cosine sketches — the embedding analog of the SimHash
    * text path): 64-bit SRP signature per vector (native codegen'd
    * `srp_sign64`, hyperplanes derived from hashes so no matrix ships),
    * banded 4×16-bit chunk equi-join for candidates (pigeonhole
    * guarantees every pair within Hamming 3; E[h] = 64·θ/π puts
    * cos ≥ 0.995 pairs at h ≈ 2), then EXACT cosine verification ≥
    * `threshold`, so emitted pairs are never false positives.
    *
    * vs [[semDedup]]: no clustering passes — one map for signatures, one
    * banded self-join on an 8-byte key, exact verify on candidates only.
    * The scale shape for "find exact/near-exact embedding copies in 100 TB"
    * when cluster structure isn't wanted. */
  def embeddingLshPairs(embeddings: DataFrame, threshold: Double = 0.99,
                        maxHamming: Int = 6): DataFrame = {
    val sig = graft.engine.Parallelism.spread(
        embeddings.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), col("embedding"),
        Functions.srp_sign64(col("embedding")).as("sig"))
    val chunked = sig.select(col("vec_id"), col("embedding"), col("sig"),
      explode(expr("transform(sequence(0, 3), c -> struct(c as chunk, " +
        "cast(shiftright(sig, c * 16) & 65535 as int) as ck))")).as("cc"))
      .select(col("vec_id"), col("embedding"), col("sig"), col("cc.chunk"), col("cc.ck"))
    val a = chunked.select(col("chunk"), col("ck"), col("vec_id").as("a_id"),
      col("embedding").as("a_vec"), col("sig").as("a_sig"))
    val b = chunked.select(col("chunk"), col("ck"), col("vec_id").as("b_id"),
      col("embedding").as("b_vec"), col("sig").as("b_sig"))
    a.join(b, Seq("chunk", "ck")).filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", Functions.hamming64(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .withColumn("cos", Functions.cosine_sim(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("hamming"), col("cos"))
  }

  /** Exact-substring duplication (Lee et al. 2022, arXiv:2107.06499
    * "Deduplicating Training Data Makes Language Models Better"): mark
    * n-token spans that occur VERBATIM in more than one document. The
    * paper builds a single-machine suffix array; the distributed
    * re-expression is positional n-gram fingerprints — explode
    * (gram, doc, pos), count distinct docs per gram (two-phase agg, no
    * per-gram doc lists, so boilerplate grams cost one combiner row per
    * partition), join duplicated grams back, and fold each doc's sorted
    * duplicate positions through an interval merge (`aggregate` lambda —
    * no UDF) into union token coverage + maximal-span count. Adjacent
    * spans ([p, p+n) touching the previous end) merge.
    *
    * Output per doc: n_grams, dup_grams, dup_tokens (union coverage),
    * dup_spans (merged maximal intervals). The caller cuts or drops
    * spans; coverage/n_grams is the doc's duplication score.
    *
    * Scale: one explode of ~tokens rows/doc (string gram key here for the
    * oracle; the hashed variant drops the shuffle key to 8 bytes exactly
    * like `Decontaminate.cleanHashed`), one count agg, one join back on
    * the same key, one per-doc agg. No cross-doc pair generation at all —
    * this family member is LINEAR in corpus size where MinHash/SimHash
    * candidate generation is bucket-quadratic. */
  def substringDuplication(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text", n: Int = 8): DataFrame =
    substringDuplicationOn(docs, idCol, textCol, n, hashedKey = false)

  /** The 100 TB path of [[substringDuplication]]: identical plan, but the
    * gram SHUFFLE KEY is `xxhash64(gram)` — 8 bytes instead of an n-token
    * string (n=8 grams average ~50 B), cutting both shuffles (the count
    * agg and the join back) by the same factor as
    * `Decontaminate.cleanHashed`. Hash collisions can only OVER-mark a
    * span as duplicated (never miss one) at 2⁻⁶⁴ per gram pair —
    * `DedupSpec` pins path equality on the fixture. */
  def substringDuplicationHashed(docs: DataFrame, idCol: String = "doc_id",
                                 textCol: String = "text", n: Int = 8): DataFrame =
    substringDuplicationOn(docs, idCol, textCol, n, hashedKey = true)

  private def substringDuplicationOn(docs: DataFrame, idCol: String,
                                     textCol: String, n: Int,
                                     hashedKey: Boolean): DataFrame = {
    // NOT spread: the map side is a bare n-gram explode feeding partial
    // count aggregates — A/B showed the extra exchange costs what the
    // parallel explode saves
    val raw = docs.select(col(idCol),
      posexplode(Functions.word_ngrams(col(textCol), n, distinct = false)))
    val grams =
      if (hashedKey) raw.select(col(idCol), col("pos"), xxhash64(col("col")).as("gram"))
      else raw.withColumnRenamed("col", "gram")
    val dup = grams.groupBy("gram")
      .agg(countDistinct(col(idCol)).as("nd")).where(col("nd") > 1)
      .select("gram")
    val perDoc = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val dupPerDoc = grams.join(dup, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_grams"),
        sort_array(collect_list(col("pos"))).as("ps"))
      .withColumn("dup_tokens", expr(
        s"""aggregate(ps, named_struct('last', -1, 'cov', 0),
           |  (st, p) -> named_struct(
           |     'last', greatest(st.last, p + $n),
           |     'cov', st.cov + greatest(0, p + $n - greatest(st.last, p))),
           |  st -> st.cov)""".stripMargin))
      .withColumn("dup_spans", expr(
        s"""aggregate(ps, named_struct('last', -1, 'k', 0),
           |  (st, p) -> named_struct(
           |     'last', greatest(st.last, p + $n),
           |     'k', st.k + if(p > st.last, 1, 0)),
           |  st -> st.k)""".stripMargin))
      .drop("ps")
    perDoc.join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        coalesce(col("dup_tokens"), lit(0)).cast("long").as("dup_tokens"),
        coalesce(col("dup_spans"), lit(0)).cast("long").as("dup_spans"))
  }

  /** Repeated-segment (boilerplate) removal — the RefinedWeb/CCNet
    * line-dedup recipe: cut every document into non-overlapping
    * `window`-word segments, drop every segment that occurs in at least
    * `minDocs` DISTINCT documents anywhere in the corpus (headers,
    * footers, navigation chrome, license blurbs), and rebuild each
    * document from its surviving segments in original order.
    *
    * Returns one row per input document: `(doc_id, n_segments,
    * n_dropped, text_dedup)` — a fully-boilerplate document survives
    * with an empty `text_dedup`, never silently disappears.
    *
    * Scale (100 TB): segments shuffle on an 8-byte xxhash64 of the
    * segment text (CCNet hashes lines the same way — a 64-bit collision
    * needs ~2^32 distinct segments in one corpus), the duplicated-set is
    * the output of one count-distinct aggregate and is typically a tiny
    * fraction of the corpus (AQE broadcasts the anti-join side when it
    * fits), and the rebuild is one groupBy(doc_id) with an array_sort —
    * no windows, no global sort, no driver materialization. */
  def dedupSegments(docs: DataFrame, window: Int = 8, minDocs: Int = 2,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = expr(s"filter(split($textCol, '\\\\s+'), w -> length(w) > 0)")
    val nSegs = ceil(size(words).cast("double") / window).cast("int")
    val segList = expr(
      s"transform(sequence(0, cast(ceil(size(ws) / ${window}d) as int) - 1, 1), " +
        s"i -> struct(i as idx, concat_ws(' ', slice(ws, i * $window + 1, $window)) as seg))")
    val segs = docs.select(col(idCol), words.as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col(idCol), explode(segList).as("s"))
      .select(col(idCol), col("s.idx").as("idx"), col("s.seg").as("seg"))
      .withColumn("h", xxhash64(col("seg")))
    val dupSegs = segs.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs).select("h")
    val rebuilt = segs.join(dupSegs, Seq("h"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(idx, seg))), x -> x.seg)"))
          .as("text_dedup"))
    docs.select(col(idCol), nSegs.as("n_segments"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_dropped"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** Embedding near-dup: cosine > threshold within coarse buckets (label
    * as the IVF-style partition — at scale the bucket is a cluster
    * assignment, so the pairing is bucket-local, not all-pairs). */
  def embeddingDups(embeddings: DataFrame, threshold: Double = 0.95,
                    doublePrec: Boolean = false): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = embeddings.select(col("label"), col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    // doublePrec: in-order double folds — bit-identical in any engine
    // (DuckDB's list_cosine_similarity over DOUBLE[] replays it exactly,
    // which is what graduates the registered query to a full oracle)
    val cosine =
      if (doublePrec) Functions.cosine_sim_d(
        col("a_vec").cast("array<double>"), col("b_vec").cast("array<double>"))
      else Functions.cosine_sim(col("a_vec"), col("b_vec"))
    a.join(b, Seq("label")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine)
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("label"), col("cos"))
  }
}
