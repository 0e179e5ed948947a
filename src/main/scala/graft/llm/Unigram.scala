package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-language-model tokenizer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece `--model_type=unigram` algorithm), the second major
  * subword family next to [[Bpe]]: instead of greedy merges, a vocabulary
  * of candidate pieces with probabilities is EM-fitted to maximize corpus
  * likelihood, then pruned to the target size; encoding is the Viterbi
  * (most probable) segmentation.
  *
  * Spark-first shape — every corpus-sized computation stays distributed:
  *  - ONE corpus pass builds the word-type frequency table (the same
  *    two-phase aggregate [[Bpe.wordFrequencies]] uses); all training
  *    passes run over word TYPES (Heaps-law-bounded), never the corpus.
  *    Unlike the BPE trainer, the word-type table itself stays
  *    DISTRIBUTED end-to-end (no driver cap): seeding and every E-step
  *    are cluster-side aggregates.
  *  - Seeding: one substring-explode aggregate (all pieces of length ≤
  *    `maxPieceLen`, frequency-weighted) + a bounded top-`seedSize`
  *    (TakeOrderedAndProject — per-partition heaps, a driver merge of
  *    seedSize rows).
  *  - Each EM iteration is ONE distributed aggregate: per word type a
  *    forward-backward pass over its segmentation lattice (against the
  *    BROADCAST current vocab, ≤ seedSize entries) emits (piece,
  *    expected-count) pairs; a groupBy-sum reduces them and only the
  *    bounded count vector returns to the driver for the M-step
  *    renormalization.
  *  - Pruning keeps the highest-expected-count pieces (the common
  *    reimplementation simplification of Kudo §3.2's likelihood-loss
  *    ranking) and NEVER drops single-character pieces, so every string
  *    stays encodable. `shrink` removes 25% per round until `vocabSize`.
  *  - Encoding is a map-only native expression (UnigramEncode) with the
  *    final vocabulary riding the plan — embarrassingly parallel, per-
  *    word-type memoized, zero shuffles.
  *
  * Pre-tokenization matches the BPE path (letter runs / digit runs /
  * single punctuation; pieces never cross pre-token boundaries) rather
  * than SentencePiece's ▁-marked whitespace convention — one segmentation
  * convention across the tokenizer family (documented divergence).
  *
  * Determinism: seed selection orders by (freq desc, piece asc); EM is
  * pure double arithmetic over a deterministic vocab order; pruning sorts
  * by (count desc, piece asc). Training is reproducible for a given
  * corpus on any cluster layout because every aggregate is
  * order-insensitive (sums) and every selection is totally ordered.
  */
object Unigram {

  /** A trained unigram vocabulary: piece → log probability (natural log),
    * descending probability order (ties: piece ascending). */
  final case class UnigramVocab(pieces: Vector[(String, Double)]) {
    @transient lazy val logp: Map[String, Double] = pieces.toMap
    def maxPieceLen: Int = if (pieces.isEmpty) 1 else pieces.iterator.map(_._1.length).max
  }

  /** Seed candidates: every substring (length ≤ `maxPieceLen`) of every
    * word type, weighted by word frequency — distributed substring
    * explode + sum. Single characters are force-included downstream. */
  private def seedCounts(wordFreqs: DataFrame, maxPieceLen: Int): DataFrame =
    wordFreqs
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(i, least(i + $maxPieceLen - 1, length(word))),
           |    j -> substring(word, i, j - i + 1))))""".stripMargin.replace("\n", " ")))
        .as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Train a unigram vocabulary of (at most) `vocabSize` pieces.
    *
    * @param emSubIters  EM iterations between prunes (SentencePiece: 2)
    * @param shrink      fraction of prunable pieces kept per round (0.75)
    */
  def train(docs: DataFrame, textCol: String = "text", vocabSize: Int = 400,
            maxPieceLen: Int = 8, seedSize: Int = 4000, emSubIters: Int = 2,
            shrink: Double = 0.75): UnigramVocab = {
    require(vocabSize > 0 && seedSize >= vocabSize && shrink > 0 && shrink < 1)
    val spark = docs.sparkSession
    import spark.implicits._

    val wordFreqs = Bpe.wordFrequencies(docs, textCol).cache()
    try {
      // ---- seed: top substrings by weighted count, chars always in ----
      val seeded = seedCounts(wordFreqs, maxPieceLen)
        .orderBy(desc("cnt"), asc("piece")).limit(seedSize)
        .as[(String, Long)].collect()
      val chars = seeded.filter(_._1.length == 1) ++
        seedCounts(wordFreqs, 1).as[(String, Long)].collect()
          .filterNot(c => seeded.exists(_._1 == c._1))
      val seedAll = (seeded.filter(_._1.length > 1) ++ chars).distinct
      val total = seedAll.map(_._2.toDouble).sum
      var vocab: Vector[(String, Double)] = seedAll.toVector
        .map { case (p, c) => (p, math.log(c / total)) }
        .sortBy { case (p, lp) => (-lp, p) }

      val words = wordFreqs.as[(String, Long)]

      // one EM iteration: distributed E-step, driver M-step
      def emStep(cur: Vector[(String, Double)]): Vector[(String, Double)] = {
        val bc = spark.sparkContext.broadcast(cur.toMap)
        val maxLen = cur.iterator.map(_._1.length).max
        val counts = try {
          words.mapPartitions { it =>
            val lp = bc.value
            it.flatMap { case (word, freq) =>
              expectedCounts(word, freq, lp, maxLen)
            }
          }.toDF("piece", "c")
            .groupBy("piece").agg(sum(col("c")).as("c"))
            .as[(String, Double)].collect()
          // the aggregate is fully materialized here, so the per-iteration
          // vocabulary broadcast can be torn down eagerly — dozens of EM
          // iterations per train call would otherwise pin dozens of copies
          // on the driver and every executor for the session's lifetime
        } finally bc.destroy()
        val cm = counts.toMap
        val z = counts.map(_._2).sum
        // ML M-step: p = c / Z; unseen pieces get a floor far below any
        // live piece so they sort (and prune) last deterministically
        cur.map { case (p, _) =>
          val c = cm.getOrElse(p, 0.0)
          (p, if (c > 0 && z > 0) math.log(c / z) else -1e9)
        }.sortBy { case (p, lp2) => (-lp2, p) }
      }

      // ---- prune rounds: EM subiters, then keep top `shrink` ----
      while (vocab.count(_._1.length > 1) > 0 && vocab.length > vocabSize) {
        for (_ <- 1 to emSubIters) vocab = emStep(vocab)
        val (chars1, multi) = vocab.partition(_._1.length == 1)
        val keepN = math.max(vocabSize - chars1.length,
          math.min(multi.length, (multi.length * shrink).toInt))
        val kept = multi.take(keepN) // vocab is sorted by prob already
        vocab = (chars1 ++ kept).sortBy { case (p, lp) => (-lp, p) }
        if (kept.length == multi.length) {
          // nothing prunable shrank — final trim to the target size
          vocab = (chars1 ++ multi.take(math.max(0, vocabSize - chars1.length)))
            .sortBy { case (p, lp) => (-lp, p) }
        }
      }
      for (_ <- 1 to emSubIters) vocab = emStep(vocab) // final fit
      UnigramVocab(vocab)
    } finally wordFreqs.unpersist()
  }

  /** Forward-backward expected piece counts for one word type (freq-
    * weighted), in probability domain (pre-tokens are short; doubles hold
    * p^len without underflow for any realistic word). Returns (piece,
    * expected count) pairs — the per-word E-step contribution. */
  private[llm] def expectedCounts(word: String, freq: Long,
                                  lp: Map[String, Double],
                                  maxLen: Int): Iterator[(String, Double)] = {
    val n = word.length
    if (n == 0) return Iterator.empty
    val p = new Array[Array[Double]](n) // p(i)(l-1): prob of piece i..i+l
    var i = 0
    while (i < n) {
      val row = new Array[Double](math.min(maxLen, n - i))
      var l = 1
      while (l <= row.length) {
        row(l - 1) = lp.get(word.substring(i, i + l))
          .map(math.exp).getOrElse(0.0)
        l += 1
      }
      p(i) = row; i += 1
    }
    val alpha = new Array[Double](n + 1); alpha(0) = 1.0
    i = 0
    while (i < n) {
      if (alpha(i) != 0.0) {
        var l = 1
        while (l <= p(i).length) {
          if (p(i)(l - 1) > 0.0) alpha(i + l) += alpha(i) * p(i)(l - 1)
          l += 1
        }
      }
      i += 1
    }
    val z = alpha(n)
    if (z == 0.0) return Iterator.empty // word not coverable (no char piece)
    val beta = new Array[Double](n + 1); beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= p(i).length) {
        if (p(i)(l - 1) > 0.0 && beta(i + l) != 0.0)
          beta(i) += p(i)(l - 1) * beta(i + l)
        l += 1
      }
      i -= 1
    }
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    i = 0
    while (i < n) {
      var l = 1
      while (l <= p(i).length) {
        val pij = p(i)(l - 1)
        if (pij > 0.0 && alpha(i) != 0.0 && beta(i + l) != 0.0) {
          val e = freq.toDouble * alpha(i) * pij * beta(i + l) / z
          val piece = word.substring(i, i + l)
          acc.update(piece, acc.getOrElse(piece, 0.0) + e)
        }
        l += 1
      }
      i += 1
    }
    acc.iterator
  }

  /** Viterbi segmentation of one word under a vocabulary: the maximum-
    * log-probability split; ties prefer the LONGER final piece (fewer,
    * bigger tokens — deterministic). Guaranteed total when every char is
    * in the vocab; uncovered chars fall back to themselves at a penalty
    * floor so encoding never fails. */
  private[graft] def viterbiWord(word: String, lp: Map[String, Double],
                               maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val Floor = -1e9
    val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
    val back = new Array[Int](n + 1) // length of the piece ending at i
    var i = 1
    while (i <= n) {
      var l = 1
      val lim = math.min(maxLen, i)
      while (l <= lim) {
        val piece = word.substring(i - l, i)
        val plp = lp.getOrElse(piece, if (l == 1) Floor else Double.NegativeInfinity)
        if (plp > Double.NegativeInfinity && best(i - l) > Double.NegativeInfinity) {
          val s = best(i - l) + plp
          if (s > best(i) || (s == best(i) && l > back(i))) {
            best(i) = s; back(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = n
    while (at > 0) { out += word.substring(at - back(at), at); at -= back(at) }
    out.reverseIterator.toArray
  }

  /** Token stream per document under a trained vocabulary — map-only, the
    * vocab rides the plan (see UnigramEncode). */
  def encode(df: DataFrame, vocab: UnigramVocab,
             textCol: String = "text"): DataFrame =
    // spread: the per-row Viterbi encode is the heavy map work
    graft.engine.Parallelism.spread(df)
      .withColumn("tokens",
        graft.functions.Functions.unigram_encode(col(textCol), vocab.pieces))
}
