package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eps = 1e-12

  test("cosine_sim matches reference computation (codegen path)") {
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f), 0.0),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(Functions.cosine_sim(col("a"), col("b")).as("c"), col("expected"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < eps))
  }

  test("cosine_sim of zero vector is 0.0, null input is null") {
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(Functions.cosine_sim(col("a"), col("b"))).head().getDouble(0)
    assert(z == 0.0)
    val n = Seq((Option.empty[Array[Float]], Some(Array(1.0f))))
      .toDF("a", "b").select(Functions.cosine_sim(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }

  test("dot_product and l2_norm agree with manual math") {
    val row = Seq((Array(3.0f, 4.0f), Array(2.0f, 1.0f))).toDF("a", "b")
      .select(
        Functions.dot_product(col("a"), col("b")).as("d"),
        Functions.l2_norm(col("a")).as("n"))
      .head()
    assert(math.abs(row.getDouble(0) - 10.0) < eps)
    assert(math.abs(row.getDouble(1) - 5.0) < eps)
  }

  test("expressions are SQL-callable after registerAll") {
    Functions.registerAll(spark)
    val v = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float)), array(cast(1.0 as float)))")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < eps)
  }

  test("quantize_int8/dequantize_int8 reject non-float/double arrays at analysis") {
    val ints = Seq(Tuple1(Array(1, 2, 3))).toDF("v")
    val eQ = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(Functions.quantize_int8(col("v"))).schema
    }
    assert(eQ.getMessage.contains("quantize_int8"))
    val eD = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(Functions.dequantize_int8(col("v"))).schema
    }
    assert(eD.getMessage.contains("dequantize_int8"))
    // non-array child also fails analysis, not eval
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1("s")).toDF("v").select(Functions.quantize_int8(col("v"))).schema
    }
  }

  test("quantize_int8/dequantize_int8: a null element yields a null result") {
    val df = Seq(Tuple1(Array[java.lang.Float](1.0f, null, 3.0f))).toDF("v")
    val r = df.select(
      Functions.quantize_int8(col("v")).as("q"),
      Functions.dequantize_int8(col("v")).as("d")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("minhash: identical texts share full signature; unrelated don't") {
    val df = Seq(
      ("spark makes distributed queries fast and simple to run at scale",
       "spark makes distributed queries fast and simple to run at scale"),
      ("spark makes distributed queries fast and simple to run at scale",
       "completely different words about gardening tulips and spring weather")
    ).toDF("x", "y")
    val sims = df.select(
      size(array_intersect(
        Functions.minhash(col("x")), Functions.minhash(col("y"))))
        .as("shared")).collect().map(_.getInt(0))
    assert(sims(0) == 64)
    assert(sims(1) < 16)
  }

  test("simhash: near-identical texts have small hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base.replace("today", "tonight")
    val far = "astrophysics lectures cover stellar nucleosynthesis and galactic rotation curves"
    val df = Seq((base, near, far)).toDF("a", "b", "c")
    val r = df.select(
      Functions.hamming64(Functions.simhash64(col("a")), Functions.simhash64(col("b"))).as("near"),
      Functions.hamming64(Functions.simhash64(col("a")), Functions.simhash64(col("c"))).as("far"))
      .head()
    assert(r.getInt(0) < r.getInt(1))
    assert(r.getInt(0) <= 12)
  }

  test("ngram_hashes is sorted-distinct and deterministic") {
    val a = Seq("one two three four five").toDF("t")
      .select(Functions.ngram_hashes(col("t"))).head().getSeq[Long](0)
    assert(a == a.sorted && a.distinct.size == a.size)
    val b = Seq("one two three four five").toDF("t")
      .select(Functions.ngram_hashes(col("t"))).head().getSeq[Long](0)
    assert(a == b)
  }

  test("word_ngrams matches the declarative transform/element_at form") {
    import org.apache.spark.sql.functions.{filter => afilter, _}
    val texts = Seq(
      "The quick  brown fox\tjumps over the lazy dog the quick brown fox",
      "Ünïcode   MiXeD CaSe tokens here",
      "two words", "one", "", "   ",
      "a b c a b c a b c")
    val df = texts.toDF("text")
    val toks = afilter(split(lower(col("text")), "\\s+"), w => length(w) > 0)
    val declarative = array_distinct(
      when(size(toks) < 3, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2)))))
    val rows = df.select(
      Functions.word_ngrams(col("text"), 3).as("fast"),
      declarative.as("slow")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"word_ngrams diverged from declarative form on: '$t'")
    }
  }

  test("cosine_sim_d is bit-identical to the declarative double fold") {
    import org.apache.spark.sql.functions.{aggregate => aagg, _}
    val df = Seq(
      (Seq(0.1, -2.5, 3.75, 0.0), Seq(1.5, 0.25, -0.5, 2.0)),
      (Seq(1e-300, 2e-300, 3e-300), Seq(3e-300, 2e-300, 1e-300)),
      (Seq(0.0, 0.0), Seq(1.0, 2.0)) // zero norm -> 0.0
    ).toDF("a", "b")
    def fold(v: org.apache.spark.sql.Column) = aagg(v, lit(0.0), (s, x) => s + x)
    val dot = fold(zip_with(col("a"), col("b"), (x, y) => x * y))
    val nx = fold(transform(col("a"), x => x * x))
    val ny = fold(transform(col("b"), x => x * x))
    val rows = df.select(
      Functions.cosine_sim_d(col("a"), col("b")).as("fast"),
      when(nx === 0.0 || ny === 0.0, lit(0.0))
        .otherwise(dot / (sqrt(nx) * sqrt(ny))).as("slow")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("word_ngrams distinct=false keeps duplicate grams in order") {
    val r = Seq("x y x y x").toDF("t")
      .select(Functions.word_ngrams(col("t"), 2, distinct = false)).head().getSeq[String](0)
    assert(r == Seq("x y", "y x", "x y", "y x"))
    val d = Seq("x y x y x").toDF("t")
      .select(Functions.word_ngrams(col("t"), 2)).head().getSeq[String](0)
    assert(d == Seq("x y", "y x"))
  }

  test("geo_distance: Paris to London ~ 344 km") {
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("lat1", "lon1", "lat2", "lon2")
      .select(Functions.geo_distance(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .head().getDouble(0)
    assert(d > 330000 && d < 360000)
  }

  test("kvgen explodes a map to entries (reference Mappify)") {
    val n = Seq(Map("a" -> 1, "b" -> 2)).toDF("m")
      .select(explode(Functions.kvgen(col("m")))).count()
    assert(n == 2)
  }
}
