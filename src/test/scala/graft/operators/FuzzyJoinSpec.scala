package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selfJoin finds exactly the <=k pairs; brute-force parity at k=1 and k=2") {
    import spark.implicits._
    val rows = Seq(
      (1L, "johnson"), (2L, "jonson"),   // deletion, d=1
      (3L, "johnsen"),                   // substitution vs 1, d=1
      (4L, "johnsons"),                  // insertion vs 1, d=1
      (5L, "jonsen"),                    // d=2 from johnson
      (6L, "smith"), (7L, "smyth"),      // substitution, d=1
      (8L, "completely-different"),
      (9L, "JOHNSON")                    // case-insensitive candidates, d=0 after lower? no: verify is exact
    ).toDF("id", "name")
    // verify runs on the RAW strings (levenshtein is case-sensitive),
    // so compare against a raw-string brute force:
    def bruteRaw(k: Int): Set[(Long, Long)] = {
      val xs = rows.collect().map(r => (r.getLong(0), r.getString(1)))
      (for { (ai, as) <- xs; (bi, bs) <- xs if ai < bi }
        yield (ai, bi, levenshteinScala(as, bs))).filter(_._3 <= k)
        .map(t => (t._1, t._2)).toSet
    }
    val got1 = FuzzyJoin.selfJoin(rows, "id", "name", maxEdits = 1)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got1 == bruteRaw(1), s"k=1: got $got1 expected ${bruteRaw(1)}")
    assert(got1.contains((1L, 2L)) && got1.contains((6L, 7L)))
    assert(!got1.exists(p => p._1 == 8L || p._2 == 8L))
    val got2 = FuzzyJoin.selfJoin(rows, "id", "name", maxEdits = 2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == bruteRaw(2), s"k=2: got $got2 expected ${bruteRaw(2)}")
    assert(got2.contains((1L, 5L)), "jonsen is 2 edits from johnson")
  }

  test("lookupJoin resolves dirty keys against a reference list") {
    import spark.implicits._
    val ref = Seq((100L, "berlin"), (200L, "paris"), (300L, "madrid")).toDF("rid", "city")
    val dirty = Seq((1L, "berlln"), (2L, "pariss"), (3L, "tokyo")).toDF("did", "city")
    val got = FuzzyJoin.lookupJoin(dirty, "did", "city", ref, "rid", "city", maxEdits = 1)
      .select("l_id", "r_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 100L, 1), (2L, 200L, 1)), got.toString)
  }

  test("hot-variant cap bounds candidate buckets; plan has no cartesian product") {
    import spark.implicits._
    // 500 identical short keys would make one quadratic bucket — the cap
    // drops that variant; distinct near keys still pair up
    val df = spark.range(500).select(col("id"), lit("aaaa").as("name"))
      .union(Seq((9001L, "zzzz"), (9002L, "zzzy")).toDF("id", "name"))
    val out = FuzzyJoin.selfJoin(df, "id", "name", maxEdits = 1, maxBucket = 50)
    val pairs = out.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((9001L, 9002L)), s"capped bucket must not pair: ${pairs.take(5)}")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"fuzzy join must be an equi-join:\n$plan")
    // the hot-cap is TopKPerKey bounded heaps + a bounded collect_list,
    // NOT a window: a window count would sort every hash partition of the
    // len+1×-corpus variant table (VERDICT r13); and the one-pass shape
    // must not re-evaluate the variant explode for a count branch
    assert(!plan.contains("Window"),
      s"hot-variant cap must not plan a Window over the variant table:\n$plan")
    assert(plan.contains("TopKPerKey"), s"expected bounded-heap bucket cap:\n$plan")
    assert(plan.split("Generate explode").length - 1 <= 3,
      s"variant explode should be evaluated once (plus the two pair generators):\n$plan")
  }

  test("property: selfJoin equals the brute-force all-pairs on random corpora (k=1 and k=2)") {
    import spark.implicits._
    // random lowercase words over a SMALL alphabet so near-pairs actually
    // occur; fixed seeds for reproducibility
    val gen = org.scalacheck.Gen.chooseNum(1, 8).flatMap(n =>
      org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
    val params = org.scalacheck.Gen.Parameters.default
    (0 until 4).foreach { round =>
      val words = (0 until 60).flatMap(i =>
        gen.apply(params, org.scalacheck.rng.Seed(round * 1000L + i)))
      val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val df = rows.toDF("id", "name")
      (1 to 2).foreach { k =>
        val got = FuzzyJoin.selfJoin(df, "id", "name", maxEdits = k,
            maxBucket = 10000)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (ai, as) <- rows; (bi, bs) <- rows
          if ai < bi && levenshteinScala(as, bs) <= k
        } yield (ai, bi)).toSet
        assert(got == want,
          s"round=$round k=$k missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      }
    }
  }

  private def levenshteinScala(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
