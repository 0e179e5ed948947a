package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Opt-in scale-stress tier (`sbt -Dgraft.scale=1 "testOnly *ScaleStressSpec"`):
  * synthesizes ~20× the sf0.1 fixture volumes WITH a planted ~10%-skew key
  * and executes the five scale-critical operators, asserting the structural
  * properties the 100 TB design arguments rest on — bounded candidate
  * generation, O(diameter) job counts, spill-path activation, zero-exchange
  * co-located joins — never wall time (load noise is the bench's problem,
  * not correctness's).
  *
  * Skipped (canceled, not failed) unless -Dgraft.scale=1 so the default
  * test wall time stays flat; build.sbt forwards the flag into the forked
  * test JVM.
  */
class ScaleStressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val enabled = sys.props.get("graft.scale").contains("1")
  private def gate(): Unit = assume(enabled, "opt-in: run with -Dgraft.scale=1")

  /** ~30 unique pseudo-words per doc, deterministic in (seed, i). */
  private def wordsExpr(seed: String, n: Int) =
    expr(s"concat_ws(' ', transform(sequence(0, ${n - 1}), " +
      s"i -> substring(md5(concat($seed, '_', cast(i AS string))), 1, 8)))")

  test("notified pipe at 2k events: one exactly-once batch, O(events) trigger, bounded log") {
    gate()
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_scale_pipe").toString
    val spool = s"$root/spool"; Files.createDirectories(Paths.get(spool))
    val data = s"$root/data"; Files.createDirectories(Paths.get(data))
    // 2000 arrived files, each with 5 rows; the pipe's FROM directory is
    // never created, so only the event-named paths can feed the load —
    // trigger cost is O(events), never O(source prefix)
    val n = 2000
    (0 until n).foreach { i =>
      val rows = (0 until 5).map(j =>
        s"""{"event_id":${i * 5 + j},"value":$i.5}""").mkString("\n")
      Files.write(Paths.get(f"$data/f$i%05d.json"), rows.getBytes)
      Files.write(Paths.get(f"$spool/evt-$i%05d"),
        f"$data/f$i%05d.json".getBytes)
      ()
    }
    spark.sql(s"CREATE PIPE scale_np DEDUPE_LOOKBACK_PERIOD 7 FROM '$root/ghost' " +
      "FORMAT json SCHEMA 'event_id BIGINT, value DOUBLE' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER LOCAL_DIR NOTIFICATION_QUEUE_REFERENCE '$spool'")
    try {
      assert(spark.sql("TRIGGER PIPE scale_np").collect()
        .head.getString(1) == (n * 5).toString)
      val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
      assert(lake.read().count() == n * 5L)
      assert(lake.latestVersion == 1L, "one trigger = ONE atomic commit")
      // the spool drained and a replayed trigger is a no-op
      val spoolLeft = {
        val s = Files.list(Paths.get(spool))
        try s.count() finally s.close()
      }
      assert(spoolLeft == 0L, s"spool acked, $spoolLeft left")
      assert(spark.sql("TRIGGER PIPE scale_np").collect().head.getString(1) == "0")
      // the dedup log holds exactly the in-window file set (one line per
      // file + the generation header) — the lookback keeps it O(window),
      // and nothing in the checkpoint scales with files-ever-loaded
      val log = new String(Files.readAllBytes(
        Paths.get(s"$root/_chk/notified-files.log")), "UTF-8")
        .split("\n").filter(_.nonEmpty)
      assert(log.length == n + 1, s"log lines: ${log.length}")
    } finally spark.sql("DROP PIPE scale_np")
  }

  test("MinHash LSH at 100k docs: hot boilerplate bucket stays bounded, planted near-dups found") {
    gate()
    // 10% of the corpus is ONE identical boilerplate text (the pathological
    // LSH bucket: all 16 bands collide for all 10k docs). The rest form
    // 45k planted near-dup pairs (28 of 30 words shared).
    val docs = spark.range(100000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit("the quick brown fox jumps over the lazy dog " * 4))
        .otherwise(concat(
          wordsExpr("cast(id DIV 2 AS string)", 28), lit(" "),
          wordsExpr("cast(id AS string)", 2))).as("text"))
      .localCheckpoint(true)
    val pairs = graft.llm.Dedup.minhashLsh(docs, jaccardThreshold = 0.5)
      .localCheckpoint(true)
    // bucket cap: the 10k-doc boilerplate bucket may contribute at most
    // C(maxBucket=64, 2) distinct pairs — NOT C(10k, 2) ≈ 50M. This is the
    // difference between a plan that survives 100 TB and one that doesn't.
    val boiler = pairs
      .filter(col("a_id") % 10 === 0 && col("b_id") % 10 === 0).count()
    assert(boiler > 0 && boiler <= 64L * 63 / 2,
      s"boilerplate bucket produced $boiler pairs (cap is ${64 * 63 / 2})")
    // planted recall: pair (2i, 2i+1) shares 28/30 words (Jaccard of
    // 3-shingles ≈ 0.87 → 16-band detection probability ≈ 1)
    val planted = pairs.filter(col("a_id") % 10 =!= 0 && col("b_id") === col("a_id") + 1 &&
      col("a_id") % 2 === 0).count()
    val plantedTotal = docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 10 =!= 0)
      .filter((col("doc_id") + 1) % 10 =!= 0).count()
    assert(planted >= (plantedTotal * 0.95).toLong,
      s"LSH recall too low: $planted of $plantedTotal planted pairs")
  }

  test("connected components at 200k vertices with a 20k-spoke star: O(diameter) jobs") {
    gate()
    // one hub (10% of the star ids) + 36k chains of 5 — the skewed shape
    // label propagation must absorb without per-key blowup
    val vertices = spark.range(200000).select(col("id"))
    val starEdges = spark.range(1, 20000).select(lit(0L).as("a"), col("id").as("b"))
    val chainEdges = spark.range(20000, 200000)
      .filter(col("id") % 5 =!= 4)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val edges = starEdges.union(chainEdges).localCheckpoint(true)

    val sc = spark.sparkContext
    sc.setJobGroup("scale_cc", "scale-stress cc", interruptOnCancel = false)
    val labels =
      try graft.llm.Dedup.connectedComponents(vertices, edges).localCheckpoint(true)
      finally sc.clearJobGroup()
    val jobs = sc.statusTracker.getJobIdsForGroup("scale_cc").length
    // diameter is 5 (chains); hash-to-min converges in O(diameter) rounds
    // and each round is a constant number of jobs. 80 is generous; an
    // O(N)-rounds regression would be tens of thousands.
    assert(jobs > 0 && jobs <= 80, s"CC ran $jobs jobs for a diameter-5 graph")
    val comps = labels.groupBy(col("component")).count().localCheckpoint(true)
    assert(comps.count() == 1 + 36000,
      s"expected 36001 components, got ${comps.count()}")
    val starSize = labels.filter(col("id") === 0)
      .join(labels.withColumnRenamed("id", "id2"), "component")
      .count()
    assert(starSize == 20000L, s"star component has $starSize members, want 20000")
  }

  test("semDedup at 40k embeddings: self-scaling k, planted duplicate groups collapse") {
    gate()
    // 1000 planted groups of 4 IDENTICAL vectors (ids 0..3999, group =
    // id/4), 36k unique tails — k must self-scale to ≥ √N so bucket-local
    // pair space stays O(N)
    val vec = (seed: String) =>
      expr(s"transform(sequence(0, 31), j -> cast(pmod(hash($seed, j), 1000) / 1000.0 AS float))")
    val corpus = spark.range(40000).select(
      col("id").as("vec_id"),
      when(col("id") < 4000, vec("cast(id DIV 4 AS string)"))
        .otherwise(vec("cast(id AS string)")).as("embedding"))
      .localCheckpoint(true)
    val kept = graft.llm.Dedup.semDedup(corpus, threshold = 0.999)
      .localCheckpoint(true)
    // every planted group: identical vectors → same bucket, cos = 1 →
    // one component of (at least) 4 → exactly one keeper
    val plantedKeepers = kept.filter(col("vec_id") < 4000)
    assert(plantedKeepers.count() == 1000L,
      s"planted groups kept ${plantedKeepers.count()} reps, want 1000")
    assert(plantedKeepers.filter(col("group_size") < 4).count() == 0L,
      "a planted group of 4 identical vectors was split across components")
    // uniques stay: total keepers = 1000 groups + 36000 singletons
    assert(kept.count() == 37000L, s"total keepers ${kept.count()}, want 37000")
  }

  test("semDedup CC rounds at 60k vertices / 20% dup subset: shuffle ∝ dup subset, not corpus") {
    gate()
    // The r16 semDedup rework runs connected components over PAIR-INCIDENT
    // vertices only (singletons rejoin via left join + coalesce). At sf0.1
    // the dup fraction is too small for the bench to show it; this tier
    // plants a 60k corpus whose duplicate subset is 12k vertices (3k
    // groups of 4) and asserts the structural claim directly: CC over the
    // dup subset shuffles a small fraction of what CC over the full corpus
    // shuffles, with identical labels for every pair-incident vertex.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    // 750 duplicate CHAINS of 8 (6k pair-incident vertices, 10% of 60k):
    // chains give diameter 7, so label propagation runs ~8 rounds and the
    // per-round vertex traffic — the term the rework shrinks — dominates
    // the fixed edge-join term (which is identical in both arms)
    val chains = 750
    val pairs = spark.range(chains).select(col("id").as("g"))
      .select(col("g"), explode(expr("sequence(0, 6)")).as("j"))
      .select((col("g") * 8 + col("j")).as("a_id"),
        (col("g") * 8 + col("j") + 1).as("b_id"))
      .localCheckpoint(true)
    val dupVerts = pairs.select(col("a_id").as("vec_id"))
      .union(pairs.select(col("b_id").as("vec_id"))).distinct()
      .localCheckpoint(true)
    val corpusVerts = spark.range(60000).select(col("id").as("vec_id"))
    assert(dupVerts.count() == chains * 8L)

    val recs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        recs.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def measured(f: => org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      recs.set(0L)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val out = try f.localCheckpoint(true) finally {
        org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
        spark.sparkContext.removeSparkListener(listener)
      }
      (out.count(), recs.get(), (System.nanoTime() - t0) / 1e9)
    }
    val (nSub, recsSub, tSub) =
      measured(graft.llm.Dedup.connectedComponents(dupVerts, pairs))
    val (nAll, recsAll, tAll) =
      measured(graft.llm.Dedup.connectedComponents(corpusVerts, pairs))
    assert(nSub == chains * 8L && nAll == 60000L)
    // identical labels on the pair-incident subset either way
    val sub = graft.llm.Dedup.connectedComponents(dupVerts, pairs)
      .withColumnRenamed("component", "c1")
    val all = graft.llm.Dedup.connectedComponents(corpusVerts, pairs)
      .withColumnRenamed("component", "c2")
    assert(sub.join(all, "id").filter(col("c1") =!= col("c2")).count() == 0L)
    // the structural claim: per-round label traffic carries the dup subset,
    // not the corpus. Per round the floor is (V_sub + E)/(V_corpus + E) ≈
    // (6k + 5.25k)/(60k + 5.25k) ≈ 0.17; require < 0.4 to stay robust.
    assert(recsSub * 5 < recsAll * 2,
      s"CC over dup subset shuffled $recsSub records vs $recsAll over the corpus " +
        s"(want < 40%); walls ${f"$tSub%.2f"}s vs ${f"$tAll%.2f"}s")
    info(f"[scale] semdedup-cc shuffleRecords subset=$recsSub corpus=$recsAll " +
      f"wall subset=$tSub%.2fs corpus=$tAll%.2fs")
  }

  test("TopKPerKey at 12M rows / 600k keys under a 1MB budget: spills and stays correct") {
    gate()
    import graft.plans.{TopKPerKey, TopKPerKeyExec}
    val df = spark.range(12000000L).select(
      (col("id") % 600000).as("k"),
      pmod(col("id") * 2654435761L, lit(1000000L)).cast("double").as("s"),
      col("id").as("tie"))
    spark.conf.set("spark.graft.topKPerKey.memoryBytes", (1024 * 1024).toString)
    try {
      val topk = TopKPerKey(df, col("k"), col("s"), col("tie"), 3)
      val n = topk.count()
      assert(n == 600000L * 3, s"got $n rows")
      // re-run as collect on one probed key and validate against a direct sort
      val probe = TopKPerKey(df, col("k"), col("s"), col("tie"), 3)
      val got = probe.collect().filter(_.getLong(0) == 0L)
        .map(r => (r.getDouble(1), r.getLong(2))).sortBy(x => (-x._1, x._2)).toSeq
      val want = df.filter(col("k") === 0L).orderBy(col("s").desc, col("tie"))
        .limit(3).collect().map(r => (r.getDouble(1), r.getLong(2))).toSeq
      assert(got == want, s"top-3 for key 0 diverged: $got vs $want")
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def findTopK(p: SparkPlan): Option[TopKPerKeyExec] = p match {
        case e: TopKPerKeyExec => Some(e)
        case a: AdaptiveSparkPlanExec => findTopK(a.executedPlan)
        case q: QueryStageExec => findTopK(q.plan)
        case other => other.children.iterator.map(findTopK).collectFirst { case Some(e) => e }
      }
      val node = findTopK(probe.queryExecution.executedPlan)
      assert(node.exists(_.metrics("spilledRuns").value > 0),
        s"no spilled runs at 12M rows under a 1MB budget: ${node.map(_.metrics("spilledRuns").value)}")
    } finally spark.conf.unset("spark.graft.topKPerKey.memoryBytes")
  }

  test("co-bucketed lake join at 1.2M rows with a 10% hot key: zero exchanges") {
    gate()
    val cd = graft.queries.Lake.scratchDir("scale_bkt_c")
    val od = graft.queries.Lake.scratchDir("scale_bkt_o")
    spark.range(60000).select(col("id").as("c_custkey"),
        concat(lit("c"), col("id")).as("c_name"))
      .createOrReplaceTempView("scale_customers")
    // 10% of all orders land on custkey 42 — bucket-pruned storage joins
    // must survive key skew without re-shuffling either side
    spark.range(1200000L).select(col("id").as("o_orderkey"),
        when(col("id") % 10 === 0, lit(42L)).otherwise(col("id") % 60000).as("o_custkey"))
      .createOrReplaceTempView("scale_orders")
    spark.sql(s"""CREATE LAKE '$cd' PARTITION BY (bucket(8,c_custkey))
                 |AS SELECT * FROM scale_customers""".stripMargin)
    spark.sql(s"""CREATE LAKE '$od' PARTITION BY (bucket(8,o_custkey))
                 |AS SELECT * FROM scale_orders""".stripMargin)
    spark.sql(s"CREATE LAKE VIEW scale_bkt_c FROM '$cd'")
    spark.sql(s"CREATE LAKE VIEW scale_bkt_o FROM '$od'")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("scale_bkt_c")
        .join(spark.table("scale_bkt_o"), col("c_custkey") === col("o_custkey"))
      assert(joined.count() == 1200000L)
      val hot = joined.filter(col("o_custkey") === 42).count()
      assert(hot == 120000L + 20L, s"hot key rows $hot") // 120k planted + 20 natural
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join re-shuffled under skew:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SRP-LSH at 60k embeddings with a 10%-identical hot vector: candidates stay banded, no false positives") {
    gate()
    // 6k copies of ONE vector (the pathological SRP bucket: every band
    // collides for all 6k) + 54k distinct vectors + 100 planted dup pairs
    val vecs = spark.range(60000).select(
      col("id").as("vec_id"),
      when(col("id") % 10 === 0,
        expr("transform(sequence(0, 31), i -> CAST(sin(i * 0.7) AS FLOAT))"))
        .otherwise(when(col("id") < 200,
          // ids 0..199: pairs (2k, 2k+1) share a vector → planted dups
          expr("transform(sequence(0, 31), i -> CAST(sin((CAST(id DIV 2 AS INT) * 37 + i) * 1.3) + cos(i * 0.31 * (id DIV 2 + 2)) AS FLOAT))"))
        .otherwise(
          expr("transform(sequence(0, 31), i -> CAST(sin((id * 37 + i) * 1.3) + cos(i * 0.31 * (id + 2)) AS FLOAT))")))
        .as("embedding"))
      .localCheckpoint(true)
    val pairs = graft.llm.Dedup.embeddingLshPairs(vecs, threshold = 0.9999)
      .localCheckpoint(true)
    // exact-cosine verification: every emitted pair really is a duplicate
    assert(pairs.filter(col("cos") < 0.9999).count() == 0)
    // the planted distinct-id dup pairs are all found (hamming 0 → banded
    // join must surface them); hot-vector pairs are capped by the same
    // dropDuplicates+verify pipeline, not quadratic materialization
    val planted = pairs.filter(col("a_id") < 200 && col("b_id") < 200 &&
      col("a_id") % 10 =!= 0 && col("b_id") % 10 =!= 0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 200L by 2).map(k => (k, k + 1))
      .filter { case (a, b) => a % 10 != 0 && b % 10 != 0 }.toSet
    assert(want.subsetOf(planted), s"missing ${(want -- planted).size} planted pairs")
  }

  test("PCA at 50k x 64-dim embeddings: one treeAggregate pass, planted axis recovered") {
    gate()
    // variance concentrated on a planted direction: x = a * u + noise
    val d = 64
    val vecs = spark.range(50000).select(
      col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${d - 1}), i ->
        CAST((CAST(id % 41 AS DOUBLE) - 20) * cos(i * 0.7) / 8 +
             sin((id * $d + i) * 2.1) * 0.05 AS FLOAT))""").as("embedding"))
      .localCheckpoint(true)
    spark.sparkContext.setJobGroup("scale_pca", "scale-stress pca", interruptOnCancel = false)
    val model = graft.llm.Projection.fitPca(vecs)
    spark.sparkContext.clearJobGroup()
    org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
    // ONE corpus pass: the fit runs a single treeAggregate job (+ the
    // first() dimension probe)
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("scale_pca").length
    assert(jobs <= 3, s"PCA fit ran $jobs jobs — the design is one aggregate pass")
    val u = Array.tabulate(d)(i => math.cos(i * 0.7))
    val un = { val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n) }
    val cos = math.abs(model.components(0).zip(un).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"planted axis alignment $cos")
    assert(model.varianceCaptured(1) > 0.8, s"var ${model.varianceCaptured(1)}")
  }

  test("Delta deletion vectors at 1M rows / 100k deletions: bitmap codec + anti-join stay exact") {
    gate()
    import graft.sources.{DeltaInterop, SnapshotTable}
    val src = java.nio.file.Files.createTempDirectory("scale_dv_src").toString
    val df = spark.range(1000000).select(col("id"),
      (col("id") % 97).as("bucket"), md5(col("id").cast("string")).as("v"))
    SnapshotTable.create(spark, src, df)
    val dst = java.nio.file.Files.createTempDirectory("scale_dv_dst").toString + "/tbl"
    DeltaInterop.exportTo(spark, src, dst)
    val st = DeltaInterop.readState(spark, dst)
    // every 10th row by position across all files: 100k (file, pos) pairs
    // through the real RoaringBitmapArray serializer (bitmap + array
    // containers at this density)
    val victims = spark.read.parquet(st.files.map(f => s"$dst/${f.path}"): _*)
      .selectExpr("id", "_metadata.file_path AS fp", "_metadata.row_index AS pos")
      .filter(col("id") % 10 === 0).collect()
    assert(victims.length == 100000)
    val byFile = victims.groupBy(r => st.files.map(_.path)
        .find(p => r.getString(1).endsWith(p)).get)
      .map { case (p, rs) => p -> rs.map(_.getLong(2)).toSeq }
    DeltaInterop.publishDeletionVectors(spark, dst, byFile)
    val after = DeltaInterop.scan(spark, dst)
    assert(after.count() == 900000L, "exactly the 100k DV positions removed")
    assert(after.filter(col("id") % 10 === 0).count() == 0L,
      "no deleted row may survive the bitmap anti-join")
    // checksum + cardinality validated per vector on read (positionsOf)
  }

  test("segment dedup at 300k docs with a 10% hot boilerplate header: linear, header stripped everywhere") {
    gate()
    // 30k docs share ONE 8-word header segment (the pathological hot key:
    // a single xxhash64 shuffle key carrying 10% of the corpus) followed by
    // a unique 8-word body; the other 270k docs are 16 unique words. The
    // op must stay LINEAR — per-doc output rows, no pair generation — and
    // strip the hot segment from every carrier without touching bodies.
    val header = "subscribe to our newsletter for weekly updates now"
    val docs = spark.range(300000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0,
        concat(lit(header + " "), wordsExpr("cast(id AS string)", 8)))
        .otherwise(wordsExpr("cast(id AS string)", 16)).as("text"))
      .localCheckpoint(true)
    val out = graft.llm.Dedup.dedupSegments(docs, window = 8, minDocs = 2)
      .localCheckpoint(true)
    assert(out.count() == 300000L, "one output row per input doc — linear, no pairs")
    val carriers = out.filter(col("doc_id") % 10 === 0)
    assert(carriers.filter(col("n_dropped") =!= 1L).count() == 0,
      "every carrier loses exactly the header segment")
    assert(carriers.filter(col("text_dedup").contains("subscribe")).count() == 0,
      "hot header must be stripped from all 30k carriers")
    assert(out.filter(col("doc_id") % 10 =!= 0)
      .filter(col("n_dropped") =!= 0L).count() == 0,
      "unique-body docs must be untouched")
  }

  test("lake commit log over the Hadoop FS backend at 1M rows: DML, travel, vacuum stay exact") {
    gate()
    import graft.sources.SnapshotTable
    // file:-scheme path → every metadata I/O goes through the Hadoop
    // FileSystem client (LakeIO's scheme'd branch). Volume proves the
    // backend carries real tables, not just the unit fixture: 1M rows,
    // multi-file snapshots, COW DML, time travel, ref pin, vacuum.
    val dir = "file:" + java.nio.file.Files.createTempDirectory("scale_hfs").toString
    val t = SnapshotTable.create(spark, dir,
      spark.range(1000000).select(col("id"), (col("id") % 1000).as("grp"),
        md5(col("id").cast("string")).as("v")))
    t.append(spark.range(1000000, 1100000).select(col("id"),
      (col("id") % 1000).as("grp"), md5(col("id").cast("string")).as("v")))
    assert(t.read().count() == 1100000L)
    t.createTag("before_dml", Some(2L))
    t.deleteWhere(col("id") % 10 === 0)
    assert(t.read().count() == 990000L)
    assert(t.read().filter(col("id") % 10 === 0).count() == 0L)
    // time travel + tag pin across the scheme'd log
    assert(t.read(Some(1L)).count() == 1000000L)
    assert(t.readRef("before_dml").count() == 1100000L)
    // vacuum reclaims the COW-orphaned files through the Hadoop walk
    t.dropRef("before_dml")
    val doomed = t.vacuum(retainLast = 1, graceMs = 0L)
    assert(doomed.nonEmpty, "COW DML must leave reclaimable files")
    assert(t.read().count() == 990000L, "vacuum must not touch live data")
  }

  test("partition-scoped equality delete at 1M rows: out-of-scope partitions fully survive") {
    gate()
    import graft.sources.{IcebergRead, LakeExport, SnapshotTable}
    // 1M rows in 10 identity partitions; every partition carries the SAME
    // band values. A grp-scoped equality delete of band=0 must remove
    // ~10k rows from ONE partition — a global (mis)application would
    // remove ~100k across all ten.
    val src = java.nio.file.Files.createTempDirectory("scale_eqd_src").toString
    SnapshotTable.create(spark, src, spark.range(1000000).select(
      col("id"), (col("id") % 10).cast("int").as("grp"),
      (col("id") % 100).cast("int").as("band")))
    val dst = java.nio.file.Files.createTempDirectory("scale_eqd_dst").toString + "/tree"
    LakeExport.exportTo(spark, src, dst, partitionBy = Seq("grp"))
    import spark.implicits._
    LakeExport.publishEqualityDeletes(spark, dst,
      Seq("band"), Seq(0).toDF("band"), scope = Seq("grp" -> Int.box(3)))
    val after = IcebergRead.scan(spark, dst)
    assert(after.filter(col("grp") === 3 && col("band") === 0).count() == 0L,
      "in-scope tuples must vanish")
    val expectedOut = spark.range(1000000)
      .filter(col("id") % 10 =!= 3 && col("id") % 100 === 0).count()
    assert(after.filter(col("grp") =!= 3 && col("band") === 0).count() == expectedOut,
      "out-of-partition tuples must ALL survive a scoped delete")
    assert(after.count() == 1000000L -
      spark.range(1000000).filter(col("id") % 10 === 3 && col("id") % 100 === 0).count())
  }

  test("Flight DoGet at 5M rows: the columnar wire streams exact results in many batches") {
    gate()
    val pyflight =
      try new ProcessBuilder("python3", "-c", "import pyarrow.flight")
        .start().waitFor() == 0
      catch { case _: Exception => false }
    assume(pyflight, "pyarrow.flight not available")
    val port = graft.server.flight.GraftFlightServer.port
      .getOrElse(graft.server.flight.GraftFlightServer.start(spark))
    // 5M rows ≈ hundreds of MB of Arrow batches: the server must stream
    // (toLocalIterator, one partition at a time), never collect; the
    // client checksums WITHOUT materializing python objects
    val script = java.nio.file.Files.createTempFile("flight_scale", ".py")
    java.nio.file.Files.writeString(script,
      """import sys
        |import pyarrow.flight as fl
        |import pyarrow.compute as pc
        |client = fl.connect(f"grpc://localhost:{sys.argv[1]}")
        |sql = "SELECT id, id * 2 AS v FROM range(5000000)"
        |info = client.get_flight_info(fl.FlightDescriptor.for_command(sql.encode()))
        |reader = client.do_get(info.endpoints[0].ticket)
        |rows = 0; batches = 0; vsum = 0
        |for chunk in reader:
        |    b = chunk.data
        |    rows += b.num_rows; batches += 1
        |    vsum += pc.sum(b.column(1)).as_py()
        |print(f"ROWS {rows} BATCHES {batches} VSUM {vsum}")
        |""".stripMargin)
    val p = new ProcessBuilder("python3", script.toString, port.toString)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, out.take(600))
    assert(out.contains("ROWS 5000000"), out.take(600))
    // expected Σ 2i for i in [0, 5M) = 5M * (5M - 1)
    assert(out.contains(s"VSUM ${5000000L * 4999999L}"), out.take(600))
    val batches = "BATCHES (\\d+)".r.findFirstMatchIn(out).get.group(1).toInt
    assert(batches > 1, s"result must stream in multiple record batches: $out")
  }

  test("Flight DoPut at 1M rows: multi-batch wire ingest lands one atomic lake commit, exact") {
    gate()
    val pyflight =
      try new ProcessBuilder("python3", "-c", "import pyarrow.flight")
        .start().waitFor() == 0
      catch { case _: Exception => false }
    assume(pyflight, "pyarrow.flight not available")
    val port = graft.server.flight.GraftFlightServer.port
      .getOrElse(graft.server.flight.GraftFlightServer.start(spark))
    val dir = java.nio.file.Files.createTempDirectory("flight_put_scale")
      .toString + "/t"
    val script = java.nio.file.Files.createTempFile("flight_put_scale", ".py")
    java.nio.file.Files.writeString(script,
      """import sys
        |import pyarrow as pa
        |import pyarrow.flight as fl
        |client = fl.connect(f"grpc://localhost:{sys.argv[1]}")
        |n, chunk = 1000000, 100000
        |desc = fl.FlightDescriptor.for_path(sys.argv[2])
        |schema = pa.schema([("id", pa.int64()), ("v", pa.int64())])
        |w, meta = client.do_put(desc, schema)
        |for lo in range(0, n, chunk):
        |    ids = pa.array(range(lo, lo + chunk), pa.int64())
        |    vs = pa.array(range(2 * lo, 2 * (lo + chunk), 2), pa.int64())
        |    w.write_batch(pa.record_batch([ids, vs], schema=schema))
        |w.done_writing()
        |print("PUTMETA " + meta.read().to_pybytes().decode())
        |w.close()
        |""".stripMargin)
    val spilledBefore = graft.server.flight.GraftFlightServer.spilledPuts.get
    val p = new ProcessBuilder("python3", script.toString, port.toString, dir)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, out.take(600))
    assert(out.contains("""PUTMETA {"rows":1000000}"""), out.take(600))
    // bounded driver heap: the bulk upload must take the staged-spill
    // path (one batch in memory at a time), never a driver-materialized
    // local relation (r10 VERDICT #3)
    assert(graft.server.flight.GraftFlightServer.spilledPuts.get > spilledBefore,
      "1M-row DoPut must land via staged Arrow files, not driver memory")
    // one atomic commit, exact content (Σ 2i for i in [0, 1M))
    val t = graft.sources.SnapshotTable.forPath(spark, dir)
    assert(t.latestVersion == 1L)
    val row = t.read().agg(count(lit(1)), sum(col("v"))).head()
    assert(row.getLong(0) == 1000000L)
    assert(row.getLong(1) == 1000000L * 999999L)
  }

  test("40 coordinated commits from 8 concurrent writers on a blind-overwrite store: none lost") {
    gate()
    spark.sparkContext.hadoopConfiguration.set("fs.s3mock.impl",
      classOf[graft.sources.S3MockFileSystem].getName)
    val dir = "s3mock:" + java.nio.file.Files
      .createTempDirectory("arb_scale").toString + "/t"
    val coord = java.nio.file.Files.createTempDirectory("arb_scale_coord").toString
    graft.sources.SnapshotTable.useCommitCoordination("s3mock:", coord)
    try {
      import spark.implicits._
      val t = graft.sources.SnapshotTable.create(spark, dir,
        Seq((0L, 0L)).toDF("writer", "seq"))
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 8).map { w =>
        new Thread(() => {
          try (1 to 5).foreach { s =>
            graft.sources.SnapshotTable.forPath(spark, dir)
              .append(Seq((w.toLong, s.toLong)).toDF("writer", "seq"))
          } catch { case e: Throwable => errors.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
      // every one of the 40 concurrent appends is visible — nothing lost
      // to the store's blind-overwrite rename — and each claimed its own
      // version in the coordination dir
      assert(t.latestVersion == 41L)
      assert(t.read().count() == 41L)
      assert(t.read().filter(col("writer") > 0).count() == 40L)
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(coord)).count() >= 41L)
    } finally graft.sources.SnapshotTable.dropCommitCoordination("s3mock:")
  }

  test("three-way MERGE BRANCH at 1M rows under concurrent main ingest: metadata-only, exact") {
    gate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("merge3_scale").toString
    val t = graft.sources.SnapshotTable.create(spark, dir,
      spark.range(1000000).select(col("id"), (col("id") % 97).as("v"))
        .repartitionByRange(16, col("id")))
    t.compactSorted(Seq("id"), numFiles = 16) // disjoint id ranges per file
    // branch stages a file-precise DELETE (manifest prunes to the low
    // files) while EIGHT writers keep appending to main concurrently
    t.createBranch("audit")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (1 to 8).map { w =>
      new Thread(() => {
        try (1 to 3).foreach { s =>
          graft.sources.SnapshotTable.forPath(spark, dir).append(
            Seq((2000000L + w * 10L + s, 7L)).toDF("id", "v"))
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    writers.foreach(_.start())
    t.deleteFromBranch("audit", col("id") < 50000)
    writers.foreach(_.join(120000))
    assert(errors.isEmpty, s"main writer failed: ${errors.peek()}")
    assert(t.read().count() == 1000024L, "main must carry all appends pre-merge")
    // capture both sides' physical files: the merge must publish by
    // REFERENCE (metadata-only commit), never rewrite data
    val before = (t.read().inputFiles ++ t.readRef("audit").inputFiles).toSet
    t.mergeBranch("audit")
    val after = t.read()
    assert(after.inputFiles.toSet.subsetOf(before),
      "diverged merge must not write new data files")
    // exact: branch's delete applied AND every concurrent append kept
    assert(after.count() == 1000000L - 50000L + 24L)
    assert(after.filter(col("id") < 50000).count() == 0L)
    assert(after.filter(col("id") >= 2000000L).count() == 24L)
    // a genuinely conflicting branch still refuses: same-file rewrite
    t.compactSorted(Seq("id"), numFiles = 16)
    t.createBranch("clash")
    t.deleteFromBranch("clash", col("id") === 60000L)
    t.deleteWhere(col("id") === 60001L) // same low file on main
    intercept[java.util.ConcurrentModificationException](t.mergeBranch("clash"))
    t.dropRef("clash")
  }

  test("BM25 at 200k docs: planted needle ranks first, k bounds hold, no global sort") {
    gate()
    // 200k docs of deterministic filler vocabulary; one needle doc with a
    // rare term repeated (high tf, df=2: the needle + one weak mention).
    // BM25's idf must rank the needle first for its query even though
    // every doc matches the common term.
    val docs = spark.range(200000).select(
      col("id").as("doc_id"),
      concat(
        wordsExpr("cast(id % 1000 AS string)", 20),
        lit(" common common"),
        when(col("id") === 123456L, lit(" zebra zebra zebra zebra"))
          .when(col("id") === 7L, lit(" zebra"))
          .otherwise(lit(""))).as("text"))
      .localCheckpoint(true)
    val top = graft.llm.Retrieval.bm25TopK(docs,
      Seq(0 -> "zebra common", 1 -> "common"), k = 10)
      .collect()
    val q0 = top.filter(_.getInt(0) == 0).map(r => (r.getLong(1), r.getDouble(2)))
    assert(q0.length == 10, s"k bound: ${q0.length}")
    assert(q0.head._1 == 123456L,
      s"high-tf rare-term doc must rank first: ${q0.take(3).toSeq}")
    assert(q0(1)._1 == 7L, s"the weak mention ranks second: ${q0.take(3).toSeq}")
    assert(q0.map(_._2).sliding(2).forall(p => p.head >= p.last), "scores descend")
    val q1 = top.filter(_.getInt(0) == 1)
    assert(q1.length == 10, s"k bound on the all-match query: ${q1.length}")
    // the ranking operator is the bounded-heap TopKPerKey, not a global sort
    val plan = graft.llm.Retrieval.bm25TopK(docs, Seq(0 -> "zebra"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey in:\n$plan")
  }

  test("CDC streaming at 1M rows: row-level change feed exact across append + DML") {
    gate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_cdc").toString
    val t = graft.sources.SnapshotTable.forPath(spark, dir)
    t.append(spark.range(1000000).select(col("id").as("k"),
      (col("id") % 1000).as("g")))                       // v1: 1M rows
    t.append(spark.range(1000000, 1010000).select(col("id").as("k"),
      (col("id") % 1000).as("g")))                       // v2: +10k append
    t.deleteWhere(col("k") >= 999000 && col("k") < 1000000) // v3: 1k deletes
    val q = spark.readStream.format("graft-lake")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(dir)
      .writeStream.format("memory").queryName("scale_cdc")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_scale_cdc_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val byType = spark.table("scale_cdc")
        .groupBy("_change_type", "_commit_version").count()
        .as[(String, Long, Long)].collect().toSet
      // v2 appends arrive as 10k inserts with ZERO diff work (direct
      // added-file scan); v3's rewrite diffs to exactly the 1k deleted
      // rows — rows the rewrite carried verbatim cancel out
      assert(byType == Set(("insert", 2L, 10000L), ("delete", 3L, 1000L)), byType)
      val deletedKeys = spark.table("scale_cdc")
        .filter(col("_change_type") === "delete")
        .agg(min("k"), max("k")).as[(Long, Long)].head()
      assert(deletedKeys == ((999000L, 999999L)), deletedKeys.toString)
    } finally q.stop()
  }

  test("streaming near-dup admission at 100k state docs: re-crawl batch drops, bucket cap holds") {
    gate()
    val state = java.nio.file.Files.createTempDirectory("graft_scale_sdd_s").toString
    val out = java.nio.file.Files.createTempDirectory("graft_scale_sdd_o").toString
    // batch 1: 100k distinct docs PLUS a 10% boilerplate flood (the
    // pathological bucket — all bands collide); cap must keep the
    // candidate join bounded while the flood still collapses to one
    val b1 = spark.range(100000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit("the quick brown fox jumps over the lazy dog " * 4))
        .otherwise(wordsExpr("cast(id AS string)", 30)).as("text"))
      .localCheckpoint(true)
    graft.streaming.StreamingDedup.admitBatch(spark, b1, state, out, "t:1",
      jaccardThreshold = 0.5)
    val admitted1 = graft.sources.SnapshotTable.forPath(spark, out).read().count()
    // one boilerplate representative (doc 0) + 90k distinct docs
    assert(admitted1 == 90001L, s"batch-1 admissions: $admitted1")
    // batch 2: a 10k "re-crawl" — 5k exact re-fetches of admitted batch-1
    // docs (shifted ids) + 5k genuinely new docs
    val b2 = spark.range(10000).select(
      (col("id") + 1000000).as("doc_id"),
      when(col("id") < 5000, wordsExpr("cast((id * 2 + 1) AS string)", 30)) // re-crawl of odd (admitted) docs
        .otherwise(wordsExpr("cast((id + 5000000) AS string)", 30)).as("text"))
      .localCheckpoint(true)
    graft.streaming.StreamingDedup.admitBatch(spark, b2, state, out, "t:2",
      jaccardThreshold = 0.5)
    val total = graft.sources.SnapshotTable.forPath(spark, out).read().count()
    assert(total == admitted1 + 5000L,
      s"all 5k re-crawls must drop against the lake state: $total")

    // r12: manifest-pruned per-batch state scans. Re-cluster the state
    // into disjoint bh ranges (the recommended maintenance op), then a
    // small trigger batch must OPEN only the files its band keys land in
    // — the scan cost scales with the BATCH, not the state. 4 docs × 16
    // bands = 64 keys against 512 range-files → ≲ 60 files expected.
    val st = graft.sources.SnapshotTable.forPath(spark, state)
    st.compactSorted(Seq("bh"), numFiles = 512)
    val stateFiles = st.read().inputFiles.length
    assert(stateFiles >= 256, s"compaction should leave many files: $stateFiles")
    val b3 = spark.range(4).select((col("id") + 2000000).as("doc_id"),
      wordsExpr("cast((id + 9000000) AS string)", 30).as("text"))
    val bands3 = graft.streaming.StreamingDedup.banded(b3, 64, 16, exactVerify = false)
      .localCheckpoint(true)
    val scan = graft.streaming.StreamingDedup.prunedStateScan(st, bands3)
    scan.collect() // execute ONCE; metrics read from this run
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: QueryStageExec => findScans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val opened = findScans(scan.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(opened > 0 && opened <= stateFiles / 4,
      s"pruned state scan opened $opened of $stateFiles files " +
        s"(≤ ${stateFiles / 4} allowed)")
    // and admission through the pruned path stays exact: a re-crawl of an
    // admitted doc still drops, a fresh doc still lands
    val b4 = spark.range(2).select((col("id") + 3000000).as("doc_id"),
      when(col("id") === 0, wordsExpr("cast(1 AS string)", 30)) // re-crawl of admitted doc 1
        .otherwise(wordsExpr("cast(7777777 AS string)", 30)).as("text"))
      .localCheckpoint(true)
    graft.streaming.StreamingDedup.admitBatch(spark, b4, state, out, "t:4",
      jaccardThreshold = 0.5)
    val total4 = graft.sources.SnapshotTable.forPath(spark, out).read().count()
    assert(total4 == total + 1L,
      s"pruned admission must drop the re-crawl and admit the fresh doc: $total4")
  }

  test("persisted IVF index at 1M vectors: serve path opens only probed partitions") {
    gate()
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_vidx").toString
    // 1M deterministic pseudo-random 16-dim vectors; vector 999_999 is an
    // EXACT copy of vector 5 (the planted needle — SQ8 of identical input
    // dequantizes identically, so its cosine is exactly 1.0)
    val vecExpr = "transform(sequence(0, 15), j -> " +
      "cast(pmod(xxhash64(vid * 16 + j), 2001) - 1000 AS float) / 1000.0)"
    val corpus = spark.range(1000000).select(
      col("id").as("vec_id"),
      expr(vecExpr.replace("vid", "CASE WHEN id = 999999 THEN 5 ELSE id END"))
        .as("embedding"))
      .localCheckpoint(true)
    // 64 supplied pseudo-random centroids (a Knuth-hash spread — the tier
    // tests the LAYOUT, not k-means, which has its own specs)
    val cents: Seq[Seq[Float]] = Seq.tabulate(64)(c =>
      Seq.tabulate(16) { j =>
        val h = ((c * 16 + j + 1) * 2654435761L) >>> 16
        ((h % 2001L) - 1000L) / 1000.0f
      })
    graft.llm.VectorIndex.build(corpus, dir, centroids = Some(cents))
    val postings = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings").read()
    val allFiles = postings.inputFiles.length
    val nBuckets = postings.select(col("bucket")).distinct().count()
    assert(nBuckets >= 32, s"degenerate quantizer: only $nBuckets buckets won vectors")
    assert(allFiles >= nBuckets, s"expected >= $nBuckets posting files, got $allFiles")
    assert(postings.count() == 1000000L)
    // a 3-query batch probing 2 of 64 buckets must OPEN at most 6 buckets'
    // files — the partition-pruned serve path, independent of corpus size
    val queries = corpus.filter(col("vec_id").isin(5L, 77777L, 555555L))
    val res = graft.llm.VectorIndex.search(spark, dir, queries, k = 10, nProbe = 2)
    val rows = res.collect() // execute ONCE; metrics read from this run
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: QueryStageExec => findScans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val opened = findScans(res.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    // ≤ 6 of ≥32 buckets probed → the scan must open well under a quarter
    // of the files; at a real corpus this is the O(probed bytes) property
    assert(opened > 0 && opened <= allFiles / 4,
      s"serve path opened $opened of $allFiles files (≤ ${allFiles / 4} allowed)")
    // the planted exact duplicate ranks FIRST for query 5 (same bucket by
    // construction, cosine exactly 1.0 after dequantization)
    val top = rows.find(r =>
      r.getAs[Long]("q_id") == 5L && r.getAs[Int]("rk") == 1).get
    assert(top.getAs[Long]("c_id") == 999999L && top.getAs[Double]("cos") >= 0.9999,
      top.toString)
  }

  test("lucene_match at 300k docs: exact planted hits, map-only exchange-free plan") {
    gate()
    graft.functions.Functions.registerAll(spark)
    // 300k filler docs; three planted shapes exercise phrase / NOT /
    // wildcard together — the compound query must hit exactly two of them
    val docs = spark.range(300000).select(
      col("id").as("doc_id"),
      concat(
        wordsExpr("cast(id % 997 AS string)", 25),
        when(col("id") === 111L, lit(" fatal heap overflow detected"))
          .when(col("id") === 222L, lit(" fatal heap overflow but benign"))
          .when(col("id") === 333L, lit(" heap overflow without the f-word"))
          .otherwise(lit(""))).as("text"))
      .localCheckpoint(true)
    val q = docs.where(graft.functions.Functions.lucene_match(col("text"),
      "\"heap overflow\" AND fat* AND NOT benign"))
    val hits = q.collect().map(_.getLong(0)).toSet
    assert(hits == Set(111L), s"hits=$hits")
    val two = docs.where(graft.functions.Functions.lucene_match(col("text"),
      "\"heap overflow\" AND fat*")).count()
    assert(two == 2L)
    // the predicate is a map-only filter: no exchange anywhere in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"lucene filter must not shuffle:\n$plan")
    assert(plan.contains("Filter lucene_match"), plan)
  }

  test("persisted BM25 index at 150k docs: serve opens only probed buckets, needle ranks first") {
    gate()
    val docs = spark.range(150000).select(
      col("id").as("doc_id"),
      concat(
        wordsExpr("cast(id % 1000 AS string)", 20),
        lit(" common common"),
        when(col("id") === 54321L, lit(" qzneedle qzneedle qzneedle"))
          .when(col("id") === 11L, lit(" qzneedle"))
          .otherwise(lit(""))).as("text"))
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_txtidx").toString + "/idx"
    graft.llm.TextIndex.build(docs, dir, nBuckets = 64)
    val all = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings")
      .snapshot()._1.size
    assert(all >= 32, s"postings should spread wide, got $all files")
    val res = graft.llm.TextIndex.search(spark, dir,
      Seq(0 -> "qzneedle common"), k = 10)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: QueryStageExec => findScans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val top = res.collect()
    // the high-tf rare-term doc outranks everything; the weak mention next
    assert(top.head.getLong(1) == 54321L, top.take(3).toSeq.toString)
    assert(top(1).getLong(1) == 11L, top.take(3).toSeq.toString)
    // 2 query terms → ≤ 2 of 64 buckets' files open — the serve cost is
    // O(query-term postings), not O(corpus)
    val opened = findScans(res.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(opened <= all / 8,
      s"bucket pruning failed at scale: opened $opened of $all files")
  }

  test("fuzzy join at 500k keys: planted typo pairs found, equi-join only, hot cluster capped") {
    gate()
    // 500k distinct keys (zero-padded ids: neighbors differ by >=1 digit);
    // plant 3 typo'd copies of key 123456 under high ids, plus a 2k-row
    // identical-key cluster that the hot-variant cap must absorb
    val base = spark.range(500000).select(
      col("id"),
      concat(lit("rec_"), lpad(col("id").cast("string"), 9, "0")).as("name"))
    val planted = spark.createDataFrame(Seq(
      (9000001L, "rec_00012345x"), // substitution of the last digit region
      (9000002L, "rec_00123456"),  // one-char deletion of rec_000123456
      (9000003L, "rec_000123456")  // insertion
    )).toDF("id", "name")
    val hot = spark.range(2000).select(
      (col("id") + 8000000L).as("id"), lit("rec_hothothot").as("name"))
    val df = base.union(planted).union(hot).localCheckpoint(true)
    val out = graft.operators.FuzzyJoin.selfJoin(df, "id", "name",
      maxEdits = 1, maxBucket = 256)
    // the planted deletion/insertion pair with the base key:
    // "rec_000123456" (id 123456) vs its planted variants
    val withBase = out.where(col("a_id") === 123456L || col("b_id") === 123456L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withBase.contains((123456L, 9000002L)), s"deletion pair missing: $withBase")
    assert(withBase.contains((123456L, 9000003L)), s"insertion pair missing: $withBase")
    // the 2k identical-key cluster would be ~2M pairs — the cap absorbs it
    val hotPairs = out.where(col("a_id") >= 8000000L && col("a_id") < 9000000L).count()
    assert(hotPairs == 0L, s"hot cluster must be capped, got $hotPairs pairs")
    // equi-join shape at scale: no cartesian/BNLJ anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("bucketed bitext mining at 120k vectors: planted pairs found, equi-join only") {
    gate()
    // deterministic md5-derived pseudo-embeddings (dim 16, components
    // uniform in [-1, 1], properly decorrelated across ids — sin-based
    // vectors carry hidden periodic correlations that both skew the
    // buckets and inflate the neighborhood means); 100 planted
    // translations = exact copies of the first 100 sources
    def vecs(n: Long, idOffset: Long, seed: Int) =
      spark.range(n).select(
        (col("id") + idOffset).as("vec_id"),
        expr(s"transform(sequence(1, 16), i -> cast(" +
          s"conv(substring(md5(concat(id + $idOffset, '_$seed', i)), 1, 4), 16, 10)" +
          s" / 32767.5 - 1.0 AS float))").as("embedding"))
    val src = vecs(10000, 0, 3).localCheckpoint(true)
    val tgt = vecs(50000, 1000000, 5)
      .unionByName(src.filter(col("vec_id") < 100)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding")))
      .localCheckpoint(true)
    val out = graft.llm.Bitext.minePairsBucketed(src, tgt, k = 4,
      threshold = 1.05, nClusters = 64, nProbe = 2, iters = 2)
    val mined = out.filter(col("src_id") < 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // an exact copy shares its source's argmax bucket under any trained
    // quantizer — every planted pair must surface
    val recovered = (0L until 100L).count(i => mined.get(i).contains(5000000L + i))
    assert(recovered == 100, s"planted recovery $recovered/100")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"corpus-scale mining must never cross-product:\n$plan")
  }

  test("REMOVE ORPHAN FILES with 3k orphans: zero Spark jobs, live snapshot untouched") {
    gate()
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_orphan").toString + "/t"
    spark.sql(s"CREATE LAKE '$dir' AS SELECT id FROM range(100000)")
    val t = graft.sources.SnapshotTable.forPath(spark, dir)
    t.overwrite(spark.range(500).toDF("id")) // history version to protect
    // plant 3k orphans across nested directories (crashed-writer shape)
    val seed = java.nio.file.Paths.get(s"$dir/${t.commits.head.files.head}")
    (0 until 3000).foreach { i =>
      val sub = java.nio.file.Paths.get(s"$dir/stage_${i % 7}")
      java.nio.file.Files.createDirectories(sub)
      java.nio.file.Files.copy(seed, sub.resolve(s"orphan_$i.parquet"))
    }
    val future = System.currentTimeMillis() + 60000
    spark.sparkContext.setJobGroup("scale_orphan", "orphan sweep", interruptOnCancel = false)
    val deleted = t.removeOrphanFiles(future)
    spark.sparkContext.clearJobGroup()
    org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
    assert(deleted.size == 3000, s"deleted ${deleted.size}")
    // the sweep is metadata-only: one log read + one tree walk, NO Spark
    // job — at 100 TB an executor-side orphan scan would be the bug
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("scale_orphan").length
    assert(jobs == 0, s"orphan sweep ran $jobs Spark jobs — must be driver metadata only")
    // every snapshot still reads exactly (history expiry is NOT this op)
    assert(t.read().count() == 500L)
    assert(t.read(Some(t.commits.head.version)).count() == 100000L)
  }

  test("phrase_hits at 10k phrases x 100k docs: one automaton pass, map-only, planted hits exact") {
    gate()
    import spark.implicits._
    import graft.functions.Functions
    // a 10k-phrase blocklist — the regime where OR'ed LIKEs/regex
    // alternations are O(text × phrases) and unusable
    val phrases = (0 until 10000).map(i => s"blk${i}marker")
    val docs = spark.range(100000).toDF("doc_id")
      .withColumn("text", expr(
        // every 97th doc carries exactly one planted phrase
        "concat('filler text before ', " +
          "CASE WHEN doc_id % 97 = 0 THEN concat('blk', CAST((doc_id / 97) % 10000 AS INT), 'marker') ELSE 'clean' END, " +
          "' filler after')"))
    val hits = docs.select(col("doc_id"),
      Functions.phrase_hits(col("text"), phrases).as("h"))
    val plan = hits.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phrase scan must be map-only:\n$plan")
    val n = hits.selectExpr("sum(size(h)) AS s").head().getLong(0)
    assert(n == (100000L + 96) / 97, s"planted hit count: $n")
    // spot-check one planted doc resolves to ITS phrase
    val one = hits.filter(col("doc_id") === 97L * 5).head().getSeq[String](1)
    assert(one == Seq("blk5marker"), one.toString)
  }

  test("REFRESH DATASET FOR FILES at 3k files: O(changed) metadata calls, zero re-lists") {
    gate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_rfds").toString + "/ds"
    // one job, ~3000 part files — the promoted dataset a slow full
    // listing would hurt (at 100M files the per-query/-refresh re-list
    // IS the planning bottleneck)
    spark.range(150000).toDF("id").repartition(3000)
      .write.parquet(dir)
    // AUTO PROMOTION lists EXACTLY ONCE (validation listing doubles as
    // the reconcile) and pins the index
    val listingsBefore = graft.server.GraftRestServer.listingCount.get()
    val r0 = spark.sql(s"REFRESH DATASET '$dir' AUTO PROMOTION").head()
    assert(r0.getString(0) == "ds", r0.toString)
    val total0 = r0.getString(2).toInt
    assert(total0 >= 2990, s"expected ~3000 files, got $total0")
    val listingsAfterPromote = graft.server.GraftRestServer.listingCount.get()
    assert(listingsAfterPromote == listingsBefore + 1,
      s"AUTO PROMOTION listed ${listingsAfterPromote - listingsBefore} times — must be once")

    // one late file arrives; the scoped refresh stats THAT file only
    val tmp = java.nio.file.Files.createTempDirectory("rfds_late").toString
    Seq(999999L).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/late_arrival.parquet"))
    val r1 = spark.sql(
      "REFRESH DATASET ds FOR FILES ('late_arrival.parquet')").head()
    assert(r1.getString(3) == "1" && r1.getString(2).toInt == total0 + 1, r1.toString)
    assert(graft.server.GraftRestServer.listingCount.get() == listingsAfterPromote,
      "file-scoped refresh re-listed the directory — must be O(changed)")
    assert(graft.server.GraftRestServer.indexedFileCount("ds") == total0 + 1)

    // serving plans from the index: the promoted scan reads exactly the
    // indexed rows, still without a directory listing
    val port = graft.server.GraftRestServer.port
      .getOrElse(graft.server.GraftRestServer.start(spark))
    val http = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(
      java.net.URI.create(s"http://localhost:$port/sql"))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        """{"sql": "SELECT count(*) AS n, max(id) AS m FROM ds"}""")).build()
    val body = http.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    assert(body.contains("\"n\":150001") && body.contains("\"m\":999999"), body.take(300))
    assert(graft.server.GraftRestServer.listingCount.get() == listingsAfterPromote,
      "promoted scan re-listed the directory — must plan from the index")
  }
}
