package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-based function tests (ScalaCheck generators) — an improvement
  * over the reference's suite, which has no property testing (SURVEY §5
  * item 5). Uses a fixed seed for reproducibility.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i =>
      gen.apply(params, org.scalacheck.rng.Seed(42L + i)))
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.chooseNum(1, 30)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("cosine_sim is bounded in [-1, 1] and symmetric") {
    import spark.implicits._
    val vecGen = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)))
    val pairs = samples(Gen.zip(vecGen, vecGen), 25)
    val df = pairs.map { case (a, b) =>
      val n = math.min(a.length, b.length)
      (a.take(n).toArray, b.take(n).toArray)
    }.toDF("a", "b")
    df.select(
      Functions.cosine_sim(col("a"), col("b")).as("ab"),
      Functions.cosine_sim(col("b"), col("a")).as("ba"))
      .collect().foreach { r =>
        assert(r.getDouble(0) >= -1.0 && r.getDouble(0) <= 1.0)
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      }
  }

  test("minhash signature overlap is 100% for identical text") {
    import spark.implicits._
    val df = samples(textGen, 15).map(t => (t, t)).toDF("x", "y")
    df.select(size(array_intersect(
      Functions.minhash(col("x")), Functions.minhash(col("y")))).as("n"))
      .collect().foreach(r => assert(r.getInt(0) == 64))
  }

  test("simhash is permutation-stable over token order") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = samples(textGen, 15)
      .map(t => (t, rnd.shuffle(t.split(" ").toList).mkString(" "))).toDF("x", "y")
    df.select(Functions.simhash64(col("x")).as("a"), Functions.simhash64(col("y")).as("b"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("joda translation is identity on java-compatible patterns and idempotent") {
    val patGen = Gen.someOf(Seq("yyyy", "MM", "dd", "HH", "mm", "ss")).suchThat(_.nonEmpty)
      .map(_.mkString("-"))
    samples(patGen, 20).foreach { p =>
      assert(JodaFormat.translate(p) == p)
      assert(JodaFormat.translate(JodaFormat.translate("YYYY" + p)) ==
        JodaFormat.translate("YYYY" + p))
    }
  }

  test("hamming64 is a metric and Spark agrees with the JVM computation") {
    import spark.implicits._
    def h(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val triples = samples(Gen.zip(Gen.long, Gen.long, Gen.long), 50)
    triples.foreach { case (a, b, c) =>
      assert(h(a, a) == 0)
      assert(h(a, b) == h(b, a))
      assert(h(a, c) <= h(a, b) + h(b, c))
    }
    val df = triples.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(Functions.hamming64(col("a"), col("b"))).collect().map(_.getInt(0))
    got.zip(triples).foreach { case (g, (a, b, _)) => assert(g == h(a, b)) }
  }

  test("lucene parser never crashes on arbitrary input; term queries agree with token containment") {
    // robustness: any string either parses or refuses with the typed
    // IllegalArgumentException — no stack overflow, no NPE, no hang
    val junkGen = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
        '(', ')', '"', '[', ']', '{', '}', '+', '-', '!', '~', '^', ':',
        '*', '?', '/', '\\', ' ', '\t')))).map(_.mkString)
    samples(junkGen, 400).foreach { s =>
      try { Lucene.parse(s); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"parser blew up on ${s.take(60)}: $e")
      }
    }
    // semantics: a single analyzed term matches iff the analyzed doc
    // contains it; AND of two terms iff both do
    samples(Gen.zip(textGen, wordGen, wordGen), 150).foreach { case (doc, w1, w2) =>
      val toks = Lucene.analyze(doc).toSet
      val rt1 = new Lucene.Runtime(w1, Array("_text"))
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(doc)
      assert(rt1.matches(u) == toks.contains(w1),
        s"term '$w1' vs doc '${doc.take(40)}'")
      val rtAnd = new Lucene.Runtime(s"$w1 AND $w2", Array("_text"))
      assert(rtAnd.matches(u) == (toks.contains(w1) && toks.contains(w2)))
      val rtNot = new Lucene.Runtime(s"$w1 AND NOT $w2", Array("_text"))
      assert(rtNot.matches(u) == (toks.contains(w1) && !toks.contains(w2)))
    }
    // fuzzy agrees with the exact Damerau-Levenshtein on the token set
    samples(Gen.zip(textGen, wordGen), 100).foreach { case (doc, w) =>
      val rt = new Lucene.Runtime(s"$w~1", Array("_text"))
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(doc)
      val expect = Lucene.analyze(doc).exists(t => Lucene.editsWithin(w, t, 1))
      assert(rt.matches(u) == expect, s"fuzzy '$w~1' vs '${doc.take(40)}'")
    }
  }
}
