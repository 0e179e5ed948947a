package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitByHash carves md5 buckets into stable fractions") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
    val split = Mixing.splitByHash(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform; at 500 docs the 90% split lands within a few points
    assert(counts("train") / n > 0.84 && counts("train") / n < 0.96)
    // assignment is per-row deterministic: rerun must be identical
    val again = Mixing.splitByHash(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("splitByHash rejects fractions that do not sum to 1") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Mixing.splitByHash(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.1))
    }
  }

  test("deterministicOrder is stable and id-complete") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
    val a = Mixing.deterministicOrder(docs, "doc_id", "s1")
      .select("doc_id").as[Long].collect().toSeq
    val b = Mixing.deterministicOrder(docs, "doc_id", "s1")
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b)
    assert(a.sorted != a) // hash order actually shuffles
    assert(a.toSet == docs.select("doc_id").as[Long].collect().toSet)
    // different salt -> different order
    val c = Mixing.deterministicOrder(docs, "doc_id", "s2")
      .select("doc_id").as[Long].collect().toSeq
    assert(c != a)
  }

  test("temperatureMix: sqrt-weighted targets hit exactly, evenly spaced, deterministic") {
    import spark.implicits._
    // sources A:100, B:25, C:4 -> sqrt weights 10/5/2, sum 17; budget 34
    // -> targets 20/10/4 (C clamped to its size)
    val rows = (1 to 100).map(i => (i.toLong, "A")) ++
      (101 to 125).map(i => (i.toLong, "B")) ++ (126 to 129).map(i => (i.toLong, "C"))
    val df = rows.toDF("doc_id", "source")
    val kept = Mixing.temperatureMix(df, "source", "doc_id", totalOut = 34)
      .select("doc_id", "source").as[(Long, String)].collect().sortBy(_._1)
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("A" -> 20, "B" -> 10, "C" -> 4), s"targets off: $bySrc")
    // systematic selection spreads evenly: consecutive kept ranks in A are
    // exactly 5 apart (100/20), and ALL of C survives
    val aIds = kept.filter(_._2 == "A").map(_._1)
    assert(aIds.sliding(2).forall(p => p(1) - p(0) == 5L), aIds.mkString(","))
    assert(kept.filter(_._2 == "C").map(_._1).toSeq == Seq(126L, 127L, 128L, 129L))
    // pure function of the data: a rerun yields the identical mix
    val again = Mixing.temperatureMix(df, "source", "doc_id", totalOut = 34)
      .select("doc_id", "source").as[(Long, String)].collect().sortBy(_._1)
    assert(kept.toSeq == again.toSeq)
  }

  test("leakage-safe split: every duplicate group lands in exactly one split") {
    import org.apache.spark.sql.expressions.Window
    // 30 groups of 1-4 identical texts each
    val docs = (0 until 90).map { i =>
      val g = i % 30
      (i.toLong, s"text of group $g repeated content")
    }.toDF("doc_id", "text")
    val grouped = docs.withColumn("grp_id",
      min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
    val assigned = Mixing.splitByHash(grouped, "grp_id",
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
    // each text (dup group) maps to exactly one split — no leakage
    val perGroup = assigned.groupBy("text")
      .agg(countDistinct(col("split")).as("n_splits")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L),
      "a duplicate group straddled splits")
    // contrast: splitting by doc_id DOES leak on this fixture
    val naive = Mixing.splitByHash(docs, "doc_id",
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
    val leaked = naive.groupBy("text")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(leaked > 0, "fixture should demonstrate naive-split leakage")
  }

  test("budgetSelect equals the naive global prefix-sum window (threshold-bin parity)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // adversarial scores: duplicates, negatives, values straddling bin
    // edges (x.00 exactly), varied token counts
    val rows = (0 until 400).map { i =>
      val score = math.rint(((i * 37) % 97 - 48) / 7.0 * 1e6) / 1e6
      (i.toLong, score, 1 + (i * 13) % 50)
    }
    val df = rows.toDF("doc_id", "s", "tok").repartition(7)
    val naive = df.withColumn("cum",
        sum(col("tok")).over(Window.orderBy(col("s").desc, col("doc_id"))))
      .filter(col("cum") <= 3000).select("doc_id").as[Long].collect().sorted.toSeq
    val fast = Mixing.budgetSelect(df, "s", "tok", "doc_id", 3000L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fast == naive)
    assert(fast.nonEmpty && fast.size < rows.size, "budget must bind")
    // budget 0 keeps nothing; budget >= total keeps everything
    assert(Mixing.budgetSelect(df, "s", "tok", "doc_id", 0L).count() == 0)
    val total = rows.map(_._3.toLong).sum
    assert(Mixing.budgetSelect(df, "s", "tok", "doc_id", total).count() == rows.size)
    // only the boundary bin carries a running total; higher bins skip the sort
    val out = Mixing.budgetSelect(df, "s", "tok", "doc_id", 3000L)
    val binsWithCum = out.filter(col("boundary_cum").isNotNull)
      .select("score_bin").distinct().count()
    assert(binsWithCum <= 1)
  }

  test("budgetSelect constant-score corpus: boundary fill stays parallel and exact") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // A saturated classifier emitting the SAME score for every doc puts
    // the whole corpus in one bin — the degenerate shape for a
    // score-binned threshold scan. The fill order then reduces to doc_id,
    // and the range-partitioned prefix sum must (a) split the bin across
    // many tasks, (b) still match the naive global window row-for-row.
    val rows = (0 until 1000).map(i => (i.toLong, 0.999999, 1 + (i * 7) % 23))
    val df = rows.toDF("doc_id", "s", "tok").repartition(9)
    // budget ≈ 3/4 of the corpus so the kept prefix spans most of the
    // range partitions (the partition pin below must not be foiled by a
    // hash collision of a couple of surviving __pids into one bucket)
    val budget = 9000L
    val naive = df.withColumn("cum",
        sum(col("tok")).over(Window.orderBy(col("s").desc, col("doc_id"))))
      .filter(col("cum") <= budget).select("doc_id").as[Long].collect().sorted.toSeq
    // AQE rightly coalesces this tiny fixture's shuffles to one partition;
    // disable coalescing so the partition pin below observes the fill's
    // STRUCTURAL layout (what a full-size bin would get), not the
    // small-data optimization.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    val out =
      try { spark.conf.set(coalesceKey, "false")
            Mixing.budgetSelect(df, "s", "tok", "doc_id", budget) }
      finally spark.conf.set(coalesceKey, prev)
    val fast = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(fast == naive, "constant-score fill diverged from the naive window")
    // the boundary running total is exact (last kept row's cum <= budget,
    // and adding any one more token would exceed it)
    val maxCum = out.agg(max(col("boundary_cum"))).collect().head.getLong(0)
    assert(maxCum <= budget && maxCum + 1 > budget - 23)
    // parallelism pin: the result is localCheckpoint-materialized with the
    // fill's physical layout, so if the boundary fill had collapsed to a
    // single task (the old partitionBy(score_bin) shape hashes the one
    // bin to ONE partition) every kept row would sit in one partition —
    // the range-partitioned fill must spread them
    val partsUsed = out.select(spark_partition_id().as("p"))
      .distinct().count()
    assert(partsUsed > 1,
      s"constant-score boundary fill ran in $partsUsed partition(s) — " +
        "the degenerate bin collapsed to a single task")
  }
}
