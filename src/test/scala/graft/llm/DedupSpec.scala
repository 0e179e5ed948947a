package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "large scale data processing engines shuffle partition join " +
    "aggregate window sort filter project scan the columns of a table quickly"

  private lazy val corpus = Seq(
    (0L, base),
    (1L, base), // exact duplicate of 0
    (2L, base.replace("quickly", "slowly")), // near duplicate of 0
    (3L, "gardening guide tulips roses daffodils watering schedule for a sunny spring garden bed"),
    (4L, "astrophysics overview stellar fusion galactic dynamics dark matter rotation curve lecture notes")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val dups = Dedup.exact(corpus).filter(col("n_copies") > 1).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("keep_id") == 0L)
    assert(dups.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashLsh(corpus, jaccardThreshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) && Set(a, b).contains(4L) })
  }

  test("simhash pairs flags near-duplicates within hamming budget") {
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(3L, 4L) })
  }

  test("replayable (md5) simhash agrees with the xxhash path's dup structure") {
    // same pipeline, different per-token hash family — exact duplicates
    // are hamming 0 under ANY hash, and unrelated topics stay apart
    val pairs = Dedup.simhashPairsReplayable(corpus, maxHamming = 6)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .as[(Long, Long, Int)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((0L, 1L)).contains(0), s"exact dup must be hamming 0: $byPair")
    assert(!byPair.keySet.exists { case (a, b) => Set(a, b) == Set(3L, 4L) })
  }

  test("LSH recall vs exact Jaccard: every exact pair is recovered on the fixture") {
    // Falsifiability anchor (VERDICT r1): LSH output must contain every
    // exact n-gram-Jaccard pair above threshold on the same corpus slice —
    // recall measured numerically against a brute-force oracle, not just
    // non-emptiness. Fixture near-dups all have J ≥ 0.88, where the 16×4
    // banding's miss probability is ~1e-7 (and the hashes are seeded, so
    // the outcome is deterministic).
    val docs = graft.engine.Tables(spark, graft.TestSpark.sf).documents
      .select(col("doc_id"), col("text"))
    val ng = docs.select(col("doc_id"),
      graft.functions.Functions.ngram_hashes(col("text"), 3).as("ng"))
    val a = ng.select(col("doc_id").as("a_id"), col("ng").as("a_ng"))
    val b = ng.select(col("doc_id").as("b_id"), col("ng").as("b_ng"))
    val exact = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("j",
        size(array_intersect(col("a_ng"), col("b_ng"))).cast("double") /
          size(array_union(col("a_ng"), col("b_ng"))).cast("double"))
      .filter(col("j") >= 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.size >= 20, s"fixture should contain planted near-dups, got ${exact.size}")

    val lsh = Dedup.minhashLsh(docs, jaccardThreshold = 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall == 1.0, s"LSH recall $recall < 1.0; missed ${exact.diff(lsh)}")
    // precision 1.0 by construction (candidates are exact-verified) —
    // assert it anyway so a verification regression is caught
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh.diff(exact)}")
  }

  test("substring duplication: planted verbatim passage detected, spans merge, unique docs zero") {
    // doc 1 and 2 share a verbatim 8-token passage embedded in different
    // surroundings; doc 3 is unrelated; doc 4 repeats the passage TWICE
    // (overlapping grams must merge into maximal spans, not double-count)
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"intro words here $passage and some trailing text"),
      (2L, s"$passage completely different ending follows now"),
      (3L, "nothing in this document matches anything else at all okay"),
      (4L, s"$passage $passage")
    ).toDF("doc_id", "text")
    val n = 5
    val got = Dedup.substringDuplication(docs, n = n).orderBy("doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // unrelated doc: zero duplication
    assert(got(3L) == (6L, 0L, 0L, 0L), s"doc3 ${got(3L)}")
    // docs 1/2: every gram inside the 10-token passage is shared (6 grams
    // of n=5), one merged span covering exactly the passage's 10 tokens
    assert(got(1L)._2 == 6L && got(1L)._3 == 10L && got(1L)._4 == 1L, s"doc1 ${got(1L)}")
    assert(got(2L)._2 == 6L && got(2L)._3 == 10L && got(2L)._4 == 1L, s"doc2 ${got(2L)}")
    // doc 4 = passage twice: the 12 shared grams (6 per occurrence; the 4
    // boundary-spanning grams exist only here) tile all 20 tokens, and the
    // two occurrences' intervals touch (pos 10 == previous end) → ONE span
    assert(got(4L)._2 == 12L && got(4L)._3 == 20L && got(4L)._4 == 1L, s"doc4 ${got(4L)}")
    // oracle-free invariant: coverage never exceeds token count
    assert(got.values.forall { case (ng, dg, dt, ds) => dt <= ng + n - 1 && ds <= dg })
    // the hashed scale path (8-byte shuffle keys) is value-identical
    val hashed = Dedup.substringDuplicationHashed(docs, n = n).orderBy("doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(hashed == got, s"hashed substring path diverged: $hashed vs $got")
  }

  test("connected components groups transitive dup chains, leaves isolates alone") {
    // chain 1-2-3 (2~3 never directly paired), clique 10-11, isolates 20, 21
    val verts = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.connectedComponents(verts, pairs)
    val comp = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.unpersist()
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
    // a longer chain exercises multiple propagation rounds
    val chainV = (0L to 12L).toDF("id")
    val chainP = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val chain = Dedup.connectedComponents(chainV, chainP)
    val cc = chain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chain.unpersist()
    assert(cc.values.toSet == Set(0L), "a 13-node chain is one component rooted at 0")
    // pathological: cap exceeded raises instead of hanging
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chainV, chainP, maxIters = 2).collect()
    }
  }

  test("CC runs one Spark job per propagation round (probe rides the aggregate)") {
    val verts = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = Dedup.connectedComponents(verts, pairs)
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
      // chain 1-2-3 converges in 3 rounds (2 improving + 1 fixpoint check).
      // Under AQE each round's checkpoint runs ~3 stage-jobs (join stage,
      // agg stage, result) — measured 12 total with the observe-based
      // signal. A reintroduced per-round probe JOIN adds its own stage
      // jobs (≥2/round → ≥18 total), so 13 is a regression tripwire.
      assert(jobs.get <= 13, s"${jobs.get} jobs for a 3-round CC — probe job is back?")
      got.unpersist()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("embedding dups finds planted near-identical vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.1f), 1),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.1f), 1), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingDups(vecs, threshold = 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("semDedup keeps one canonical per planted duplicate group") {
    // two well-separated clusters (x-axis and z-axis); a planted near-dup
    // pair in each, plus one non-dup per cluster. k-means seeds are the
    // first two ids, one from each cluster, so assignment converges.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),    // cluster A
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),    // cluster B
      (2L, Array(2.0f, 0.02f, 0.0f, 0.0f)),   // dup of 0 (cos ≈ 0.99995)
      (3L, Array(0.7f, 0.7f, 0.0f, 0.0f)),    // cluster A, not a dup (cos ≈ 0.71)
      (4L, Array(0.0f, 0.0f, 5.0f, 0.05f)),   // dup of 1
      (5L, Array(0.0f, 0.0f, 0.6f, 0.8f))     // cluster B, not a dup
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semDedup(vecs, threshold = 0.95, nClusters = 2, kmeansIters = 3)
    val rows = kept.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("group_size")).toMap
    val ids = rows.keySet
    assert(ids.size == 4, s"expected 4 survivors, got $ids")
    assert(ids.contains(3L) && ids.contains(5L), "non-dups must survive")
    assert(Set(0L, 2L).intersect(ids).size == 1, "exactly one of the A-dups survives")
    assert(Set(1L, 4L).intersect(ids).size == 1, "exactly one of the B-dups survives")
    // group sizes: the dup-group survivors report 2, singles report 1
    assert(rows(3L) == 1L && rows(5L) == 1L)
    assert(Set(0L, 2L).intersect(ids).forall(rows(_) == 2L))
    // deterministic across runs
    val again = Dedup.semDedup(vecs, threshold = 0.95, nClusters = 2, kmeansIters = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(again == ids)
    // auto-k (default): k sizes itself from the corpus; dup pairs are
    // near-identical so they share an argmax bucket under ANY clustering —
    // the same survivors contract must hold without an explicit k
    val autoIds = Dedup.semDedup(vecs, threshold = 0.95)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(autoIds.size == 4 && autoIds.contains(3L) && autoIds.contains(5L))
    assert(Set(0L, 2L).intersect(autoIds).size == 1)
    assert(Set(1L, 4L).intersect(autoIds).size == 1)
  }

  test("LSH bucket cap and semDedup keeper plan without Window sorts") {
    // The bucket cap must be TopKPerKey bounded heaps, not row_number over
    // a (band, bh) window: the banded table is bands× the corpus and a
    // window would fully sort it inside every hash partition. Same class
    // as the r14 FuzzyJoin fix.
    val lshPlan = Dedup.minhashLsh(corpus).queryExecution.executedPlan.toString
    assert(lshPlan.contains("TopKPerKey"),
      s"LSH bucket cap should plan TopKPerKey bounded heaps:\n$lshPlan")
    assert(!lshPlan.contains("Window"),
      s"LSH bucket cap must not plan a Window over the banded table:\n$lshPlan")

    // Keeper-per-component must be one aggregate (max_by + count riding a
    // hash agg), not two corpus-wide windows over the component join.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Array(2.0f, 0.02f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Some(Seq(Seq(1.0f, 0.0f, 0.0f, 0.0f), Seq(0.0f, 0.0f, 1.0f, 0.0f)))
    val keepPlan = Dedup.semDedup(vecs, threshold = 0.95, centroids = cents)
      .queryExecution.executedPlan.toString
    assert(!keepPlan.contains("Window"),
      s"semDedup keeper selection must not plan a Window:\n$keepPlan")
  }

  test("auto cluster count scales with corpus size (k ≈ √N, bucket-size cap)") {
    import graft.llm.Similarity.autoClusters
    assert(autoClusters(0) == 1 && autoClusters(1) == 1)
    assert(autoClusters(100) == 10)
    assert(autoClusters(1000000) == 1000)
    // monotone non-decreasing in N
    val ks = Seq(10L, 100L, 10000L, 1000000L, 100000000L).map(autoClusters(_))
    assert(ks == ks.sorted, s"k not monotone: $ks")
    // the max-cluster-rows target dominates √N for huge corpora:
    // 2^44 rows at 2^20 rows/cluster needs 2^24 clusters — capped at 2^16
    assert(autoClusters(1L << 44) == (1 << 16))
    // explicit target: 10^6 rows at 10^4/cluster → 100 > √N would give 1000;
    // max(√N, target) keeps the LARGER k (√N here)
    assert(autoClusters(1000000L, maxClusterRows = 10000L) == 1000)
    assert(autoClusters(1000000L, maxClusterRows = 100L) == 10000)
  }

  test("SRP-LSH embedding pairs: planted copies found, verified-exact, no false positives") {
    // deterministic pseudo-random base vectors + exact/near-exact copies
    def vec(seed: Int): Array[Float] = Array.tabulate(32) { d =>
      val m = (seed * 73856093) ^ (d * 19349663)
      (((m >>> 7) & 0xFFFF) / 65536.0f) - 0.5f
    }
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    val copies = (0 until 8).map(i => (1000L + i, vec(i).clone)) // exact dups of 0..7
    val jiggled = { val v = vec(0).clone; v(0) += 1e-4f; Seq((2000L, v)) } // near-dup of 0
    val df = (base ++ copies ++ jiggled).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingLshPairs(df, threshold = 0.999)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val want = (0 until 8).map(i => (i.toLong, 1000L + i)).toSet ++
      Set((0L, 2000L), (1000L, 2000L))
    assert(pairs == want, s"got $pairs")
  }

  test("SRP signature: identical vectors collide; hamming tracks the angle") {
    import graft.functions.Functions
    val a = Array.tabulate(32)(d => math.sin(d * 1.7).toFloat)
    val tilt = a.zipWithIndex.map { case (x, d) => x + 0.02f * math.cos(d * 0.9).toFloat }
    val opp = a.map(-_)
    val df = Seq((1L, a), (2L, a.clone), (3L, tilt), (4L, opp)).toDF("id", "v")
      .select(col("id"), Functions.srp_sign64(col("v")).as("sig"))
    val sig = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(sig(1L) == sig(2L))
    assert(ham(sig(1L), sig(3L)) < 12, s"small tilt: ${ham(sig(1L), sig(3L))}")
    // opposite vector flips every hyperplane side: E[h] = 64
    assert(ham(sig(1L), sig(4L)) >= 56, s"antipode: ${ham(sig(1L), sig(4L))}")
  }

  test("segment dedup strips planted boilerplate, keeps unique prose, order intact") {
    // 8-word boilerplate header planted in three docs; bodies unique
    val header = "subscribe to our newsletter for weekly updates today"
    val docs = Seq(
      (0L, s"$header alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$header one two three four five six seven eight"),
      (2L, s"$header red orange yellow green blue indigo violet ultraviolet"),
      (3L, "completely unrelated standalone document with its own words here"),
      (4L, header) // all-boilerplate doc: survives as an empty row
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, window = 8, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 5, "every input doc must emit a row")
    // header segment dropped everywhere, bodies kept verbatim in order
    assert(out(0).getAs[String]("text_dedup") ==
      "alpha beta gamma delta epsilon zeta eta theta")
    assert(out(1).getAs[String]("text_dedup") ==
      "one two three four five six seven eight")
    assert(out(3).getAs[String]("text_dedup") ==
      "completely unrelated standalone document with its own words here")
    assert(out(4).getAs[String]("text_dedup") == "" &&
      out(4).getAs[Long]("n_dropped") == 1L, "all-boilerplate doc goes empty")
    assert(out.take(3).forall(_.getAs[Long]("n_dropped") == 1L))
    // raising minDocs above the plant count (4 docs carry the header) keeps everything
    val keepAll = Dedup.dedupSegments(docs, window = 8, minDocs = 5)
    assert(keepAll.agg(sum("n_dropped")).head.getLong(0) == 0L)
  }

  test("perplexity buckets: thirds of the corpus per tier, fluent docs in head") {
    val t = graft.engine.Tables.ensure(spark, graft.TestSpark.sf)
    val out = TextAnalysis.perplexityBuckets(t.documents.filter(col("doc_id") < 300))
    val counts = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("head", "middle", "tail"))
    val n = counts.values.sum
    // exact-percentile cuts put ~n/3 per tier (ties can shift a few)
    counts.values.foreach(c =>
      assert(math.abs(c - n / 3.0) < n * 0.1, s"skewed tiers: $counts"))
    // every head doc scores above every tail doc
    val minHead = out.filter(col("bucket") === "head")
      .agg(min("mean_log2p")).head.getDouble(0)
    val maxTail = out.filter(col("bucket") === "tail")
      .agg(max("mean_log2p")).head.getDouble(0)
    assert(minHead > maxTail)
  }
}
