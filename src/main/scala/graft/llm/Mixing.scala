package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixing: deterministic per-stratum sampling so a corpus
  * can be re-weighted (e.g. upsample code, downsample boilerplate) with
  * REPRODUCIBLE membership — every run, every engine, the same rows.
  * Systematic every-n-th selection inside each stratum replaces RNG
  * sampling: membership is a pure function of (stratum, rank), so the
  * mix is diffable and oracle-checkable, and there is no seed to drift.
  *
  * Scale: one window rank per stratum (hash-partitioned by the stratum
  * column — strata are few and large, so the sort is the per-partition
  * cost) followed by a codegen'd modulo filter. No collect, no RNG
  * state. A heavily skewed stratum (one giant language) sorts within
  * its own partitions only — the window key keeps parallelism at
  * #strata × shuffle partitions.
  */
object Mixing {

  /** Keep every n-th row per stratum, ranked by `idCol` (deterministic
    * tiebreak-free when ids are unique). `rates` maps stratum value →
    * n (1 = keep all); unlisted strata use `defaultEvery`. */
  def stratifiedEveryNth(df: DataFrame, stratumCol: String, idCol: String,
                         rates: Map[String, Int], defaultEvery: Int): DataFrame = {
    require(defaultEvery >= 1 && rates.values.forall(_ >= 1),
      "sampling rates must be >= 1")
    val rate: Column = rates.foldLeft(lit(defaultEvery)) { case (els, (v, n)) =>
      when(col(stratumCol) === v, lit(n)).otherwise(els)
    }
    val rn = row_number().over(
      Window.partitionBy(col(stratumCol)).orderBy(col(idCol)))
    df.withColumn("__g_rn", rn)
      .filter((col("__g_rn") - 1) % rate === 0)
      .drop("__g_rn")
  }

  /** Temperature-weighted source mixing — the standard multilingual /
    * multi-source LLM reweighting (sample source s with probability
    * ∝ n_s^α, α<1 flattens the distribution so big sources stop drowning
    * small ones; α=0.5 is the multilingual-BERT/mT5 convention).
    * Deterministic re-expression: per-source TARGET COUNTS are computed
    * from the exact source counts (t_s = clamp(round(totalOut·w_s), 1,
    * n_s), w_s = n_s^α / Σ n^α, sources summed in ascending order), then
    * exactly t_s of the n_s rows are kept by integer systematic selection
    * — row ranked r (1-based by `idCol`) survives iff
    * ⌊r·t/n⌋ > ⌊(r−1)·t/n⌋, which picks an evenly-spaced t-of-n subset.
    * Membership is a pure integer function of (rank, t, n): no RNG, no
    * float boundary, any engine reproduces it row-for-row (α=0.5 keeps
    * even the weights engine-portable — IEEE sqrt is correctly rounded;
    * arbitrary pow may differ by ulps across libm implementations).
    *
    * Scale: one tiny groupBy-count (collected — #sources rows), then one
    * window rank per source + a codegen'd integer filter. The count pass
    * and the rank window shuffle on the same source key. */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     totalOut: Long, alpha: Double = 0.5): DataFrame = {
    require(totalOut > 0 && alpha > 0)
    val counts: Seq[(String, Long)] = df.groupBy(col(sourceCol)).count()
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq.sortBy(_._1)
    val ws = counts.map { case (_, n) =>
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    }
    val sumW = ws.sum // fixed ascending-source order — reproducible
    val targets: Seq[(String, Long, Long)] = counts.zip(ws).map { case ((s, n), w) =>
      (s, n, math.min(n, math.max(1L, math.round(totalOut * w / sumW))))
    }
    val tCol = targets.foldLeft(lit(0L)) { case (els, (s, _, t)) =>
      when(col(sourceCol) === s, lit(t)).otherwise(els)
    }
    val nCol = targets.foldLeft(lit(1L)) { case (els, (s, n, _)) =>
      when(col(sourceCol) === s, lit(n)).otherwise(els)
    }
    val rn = row_number().over(
      Window.partitionBy(col(sourceCol)).orderBy(col(idCol))).cast("long")
    // ⌊r·t/n⌋ increments exactly when (r·t) mod n < t (Bresenham), so the
    // survival test is a single exact modulo — computed in decimal(38,0)
    // (19+19-digit product) so r·t cannot overflow at any corpus size
    val rD = col("__r").cast("decimal(19,0)")
    val tD = col("__t").cast("decimal(19,0)")
    val nD = col("__n").cast("decimal(19,0)")
    df.withColumn("__t", tCol).withColumn("__n", nCol).withColumn("__r", rn)
      .filter((rD * tD) % nD < tD)
      .drop("__t", "__n", "__r")
  }

  /** Stable train/val/test assignment by content-independent hash: bucket
    * a row id into 256 md5 buckets (first hex byte of md5) and carve the
    * bucket space by cumulative fraction. Assignment is a pure per-row
    * function — no shuffle, no RNG, no drift when the corpus grows, and
    * any engine with md5 reproduces it bit-for-bit. `splits` maps split
    * name → fraction (fractions quantized to 1/256 bucket boundaries).
    */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = substring(md5(col(idCol).cast("string")), 1, 2)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val assign = splits.map(_._1).zip(bounds).dropRight(1)
      .foldRight(lit(splits.last._1)) { case ((name, hi), els) =>
        when(bucket < lit(f"${math.round(hi * 256)}%02x"), lit(name)).otherwise(els)
      }
    df.withColumn("split", assign)
  }

  /** Deterministic global training order: sort by a salted md5 of the row
    * id. A full-corpus sort is a range shuffle (Spark samples bounds), and
    * hashes distribute uniformly, so partitions balance perfectly; with a
    * LIMIT on top Catalyst plans TakeOrderedAndProject instead (per-
    * partition top-k, no global sort materialized). */
  def deterministicOrder(df: DataFrame, idCol: String, salt: String): DataFrame =
    df.withColumn("shuffle_key", md5(concat(lit(salt + ":"), col(idCol).cast("string"))))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Token-budget corpus selection: keep the highest-`scoreCol` documents
    * whose running token total fits `budget` — "fill a 1T-token training
    * budget with the best documents", the selection step between quality
    * scoring and tokenization in every budgeted pretraining mix.
    *
    * Semantics = the global prefix sum: a doc is kept iff
    * `sum(tokens) OVER (ORDER BY score DESC, id) <= budget` — but a
    * global-order window collapses to ONE partition, so at scale this
    * computes the same answer as a THRESHOLD scan instead:
    *  1. coarse score bins (`floor(score·100)`, value-disjoint) → one
    *     map-side-combinable aggregate of per-bin token totals;
    *  2. the driver prefix-sums the (few hundred) bins descending and
    *     finds the boundary bin where the budget crosses;
    *  3. every doc ABOVE the boundary bin keeps outright (a codegen'd
    *     filter — no sort anywhere); only the boundary BIN's docs (1/bins
    *     of the corpus, but possibly the whole corpus when scores
    *     cluster) partial-fill via a RANGE-partitioned parallel prefix
    *     sum — per-partition cumsum windows lifted by driver-prefix-
    *     summed offsets — so even a degenerate single bin sorts 1/nParts
    *     per task, never in one partition.
    * Bins are value-disjoint in the sort key, so the result is
    * bit-identical to the naive global window (the oracle replays that
    * form). Ties inside the boundary bin break on `idCol`.
    *
    * Rows whose score or token count is NULL are dropped (no quality
    * score = not a selection candidate); negative token counts refuse
    * loudly — a non-monotone cumsum has no single-threshold equivalent,
    * so silently diverging from the naive-window contract is worse than
    * an error.
    *
    * Memory shape: the input projection is cached for the run (callers
    * should pass the (id, score, tokens) metadata, not document bodies —
    * tens of bytes per doc) and the RESULT materializes via
    * localCheckpoint before the cache releases, so the returned frame
    * never re-executes the upstream scoring plan; its size is the kept
    * set's metadata, bounded by the budget. Returns the kept rows with
    * their bin and the within-bin running total for the boundary bin
    * (null elsewhere). */
  def budgetSelect(df: DataFrame, scoreCol: String, tokensCol: String,
                   idCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val bin = floor(col(scoreCol) * lit(100.0)).cast("long")
    // cache: the bin totals, the above-boundary keep and the boundary
    // window each consume this projection — without the cache the whole
    // upstream scoring plan would execute three times
    val binned = df
      .filter(col(scoreCol).isNotNull && col(tokensCol).isNotNull)
      .withColumn("score_bin", bin).cache()
    try {
      // min rides the same aggregate as the totals: the non-negativity
      // gate costs no extra pass
      val totals = binned.groupBy(col("score_bin"))
        .agg(sum(col(tokensCol)).as("bin_tokens"),
          min(col(tokensCol).cast("long")).as("min_tok"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(-_._1)
      require(totals.forall(_._3 >= 0L),
        s"budgetSelect: negative $tokensCol values — the running total is " +
          "non-monotone and has no threshold-scan equivalent")
      var acc = 0L
      var boundary: Option[(Long, Long)] = None // (bin, budget left before it)
      val it = totals.iterator
      while (boundary.isEmpty && it.hasNext) {
        val (b, t, _) = it.next()
        if (acc + t > budget) boundary = Some((b, budget - acc))
        else acc += t
      }
      val result = boundary match {
        case None => // whole corpus fits
          binned.withColumn("boundary_cum", lit(null).cast("long"))
        case Some((b, left)) =>
          val above = binned.filter(col("score_bin") > lit(b))
            .withColumn("boundary_cum", lit(null).cast("long"))
          // Boundary partial fill WITHOUT a single-partition window: a
          // score-clustered corpus (a saturated classifier emitting ≈1.0
          // for everything) can make the boundary bin the WHOLE corpus,
          // and `Window.partitionBy(score_bin)` would then sort it in ONE
          // task. Range-partition the bin by the fill order instead (the
          // range sampler IS a rank-quantile re-binner — it splits equal
          // scores by id, which score-refinement never could), cumsum
          // inside each range partition in parallel, and lift to the
          // global running total with per-partition offsets. Sort work is
          // 1/nParts per task under ANY score distribution, and the
          // result is bit-identical to the naive global window because
          // (score desc, id) is a total order, so the running total of a
          // row is independent of where partition boundaries fall.
          val spark = df.sparkSession
          val nParts = math.max(1,
            spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
          val ranged = binned.filter(col("score_bin") === lit(b))
            .repartitionByRange(nParts, col(scoreCol).desc, col(idCol))
            .withColumn("__pid", spark_partition_id())
            // pin partition assignment: the range sampler must not re-draw
            // boundaries between the offsets job and the fill job
            .localCheckpoint(true)
          val partTotals = ranged.groupBy(col("__pid"))
            .agg(sum(col(tokensCol).cast("long")).as("__ptok"))
            .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
          var run = 0L
          val offRows = partTotals.map { case (pid, t) =>
            val o = run; run += t; (pid, o)
          }.toSeq
          val offDf = spark.createDataFrame(offRows).toDF("__pid", "__off")
          val w = Window.partitionBy(col("__pid"))
            .orderBy(col(scoreCol).desc, col(idCol))
          val atBoundary = ranged
            .join(broadcast(offDf), Seq("__pid"))
            .withColumn("boundary_cum", sum(col(tokensCol)).over(w) + col("__off"))
            .filter(col("boundary_cum") <= lit(left))
            .drop("__pid", "__off")
          above.unionByName(atBoundary)
      }
      // materialize off the cache before releasing it: the caller gets a
      // localCheckpoint-backed frame instead of a plan over unpersisted data
      result.localCheckpoint(eager = true)
    } finally { binned.unpersist(); () }
  }
}
