package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Margin-kNN bitext mining (Bitext.minePairs): planted translations are
  * recovered, the margin suppresses hub vectors that raw cosine would
  * over-emit, and mining is deterministic under repartitioning. */
class BitextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted translations mined with margin >> threshold; distractors stay out") {
    val e = graft.engine.Tables(spark, TestSpark.sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val src = e.filter(col("vec_id") < 100)
    // targets: 200 real distractors + exact copies of the first 30 sources
    val tgt = e.filter(col("vec_id") >= 100 && col("vec_id") < 300)
      .unionByName(e.filter(col("vec_id") < 30)
        .select((col("vec_id") + 5000L).as("vec_id"), col("embedding")))
    val mined = Bitext.minePairs(src, tgt, k = 4, threshold = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val bynSrc = mined.map(m => m._1 -> m).toMap
    // every planted pair is recovered as the forward top-1 for its source
    // with a decisive margin — an exact translation must beat every
    // same-label semantic neighbor the fixture provides
    (0L until 30L).foreach { i =>
      val hit = bynSrc.get(i)
      assert(hit.exists(_._2 == 5000L + i),
        s"planted pair $i -> ${5000 + i} not mined: $hit")
      assert(hit.exists(_._3 > 1.2), s"planted margin should be decisive: $hit")
    }
    // the fixture's same-label neighbors are genuine semantic pairs, so
    // non-planted sources MAY clear the threshold — but planted margins
    // must sit clearly above the non-planted POPULATION (mean separation;
    // the hub test below carries the suppression property on a
    // controlled fixture)
    val planted = mined.filter(_._1 < 30L).map(_._3)
    val rest = mined.filter(_._1 >= 30L).map(_._3)
    assert(planted.length == 30)
    if (rest.nonEmpty) {
      val mp = planted.sum / planted.length
      val mr = rest.sum / rest.length
      assert(mp > mr + 0.1,
        s"planted margins ($mp) should dominate semantic-pair margins ($mr)")
    }
  }

  test("margin suppresses a hub cluster that raw cosine would emit for every source") {
    // a CLUSTER of near-identical hub targets moderately close to every
    // source: raw cosine top-1s into the cluster for most sources, but
    // each source's forward top-k is then FULL of hub copies (avgF ≈ the
    // pair cosine) and the hubs' backward top-k is full of sources
    // (avgB ≈ the pair cosine), so margin ≈ 1 — below threshold —
    // exactly the hubness pathology the ratio margin was designed to kill
    val dim = 8
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }
    val hub = Array.fill(dim)(1.0f)
    val srcRows = (0 until 20).map { i =>
      val n = vec(i)
      (i.toLong, hub.zip(n).map { case (h, x) => h + 1.0f * x })
    }
    val tgtRows = (0 until 20).map(j => (1000L + j, vec(100 + j))) ++
      (0 until 5).map { j => // hub cluster: tiny perturbations of the hub
        val n = vec(500 + j)
        (2000L + j, hub.zip(n).map { case (h, x) => h + 0.02f * x })
      }
    val src = srcRows.toDF("vec_id", "embedding")
    val tgt = tgtRows.toDF("vec_id", "embedding")
    // raw cosine pairs most sources into the hub cluster...
    val rawTop = Similarity.bruteForceTopK(tgt, src, k = 1)
      .collect().map(r => r.getAs[Long]("c_id"))
    assert(rawTop.count(_ >= 2000L) >= 12,
      s"fixture should make the hub cluster the raw top-1 for most sources: ${rawTop.toSeq}")
    // ...the margin emits none of those hub pairs
    val mined = Bitext.minePairs(src, tgt, k = 4, threshold = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!mined.exists(_._2 >= 2000L),
      s"hub pairs must be margin-suppressed: ${mined.toSeq}")
  }

  test("bucketed mining recovers planted pairs through the bucket equi-join") {
    val e = graft.engine.Tables(spark, TestSpark.sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val src = e.filter(col("vec_id") < 100)
    val tgt = e.filter(col("vec_id") >= 100 && col("vec_id") < 300)
      .unionByName(e.filter(col("vec_id") < 30)
        .select((col("vec_id") + 5000L).as("vec_id"), col("embedding")))
    val cents = e.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toSeq).toSeq
    val out = Bitext.minePairsBucketed(src, tgt, k = 4, threshold = 1.05,
      nProbe = 2, centroids = Some(cents))
    // an exact copy shares its source's argmax bucket under ANY quantizer,
    // and the source's probe list contains its argmax — every planted
    // pair must meet in a bucket and win the margin
    val mined = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 30L).foreach { i =>
      assert(mined.get(i).contains(5000L + i),
        s"planted pair $i not recovered through buckets: ${mined.get(i)}")
    }
    // scale shape: candidates come from a bucket EQUI-join, never a
    // cross product of the two collections
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"bucketed mining must not plan a cross product:\n$plan")
    // ...and the backward-neighborhood mean (avg_b — one row per DISTINCT
    // target, corpus cardinality on this path) must join by SHUFFLE, never
    // a driver-collecting broadcast
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def findBcast(p: SparkPlan): Seq[BroadcastHashJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => findBcast(a.executedPlan)
      case q: QueryStageExec => findBcast(q.plan)
      case b: BroadcastHashJoinExec =>
        b +: b.children.flatMap(findBcast)
      case other => other.children.flatMap(findBcast)
    }
    val bcastAvgB = findBcast(out.queryExecution.executedPlan).filter { b =>
      val build = b.buildSide match { case BuildLeft => b.left; case BuildRight => b.right }
      build.output.exists(_.name == "avg_b")
    }
    assert(bcastAvgB.isEmpty,
      s"corpus-scale path must not broadcast the O(|tgt|) avg_b side: $bcastAvgB")
  }

  test("mining is deterministic under repartitioning (doublePrec)") {
    val e = graft.engine.Tables(spark, TestSpark.sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val src = e.filter(col("vec_id") < 80)
    val tgt = e.filter(col("vec_id") >= 80 && col("vec_id") < 250)
      .unionByName(e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 7000L).as("vec_id"), col("embedding")))
    def run(parts: Int): Seq[(Long, Long, Double, Double)] =
      Bitext.minePairs(src.repartition(parts), tgt.repartition(parts),
          k = 4, threshold = 1.05, doublePrec = true)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).sortBy(_._1).toSeq
    val a = run(2)
    val b = run(7)
    assert(a == b, "margins must be bit-identical under any partitioning")
    assert(a.nonEmpty)
  }
}
