package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packGreedy assigns bins by running token total per stratum") {
    val docs = Seq(
      // stratum "a", budget 100: cum-before = 0, 60, 110, 160
      (1L, "a", 60), (2L, "a", 50), (3L, "a", 50), (4L, "a", 10),
      // stratum "b" restarts at bin 0
      (10L, "b", 250), (11L, "b", 10)
    ).toDF("doc_id", "lang", "n_tokens")
    val got = Packing.packGreedy(docs, "n_tokens", "doc_id", 100, Seq("lang"))
      .select("doc_id", "bin", "bin_offset")
      .as[(Long, Long, Long)].collect().map { case (k, b, o) => k -> ((b, o)) }.toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((0L, 60L)))  // straddles the 100 boundary, starts in bin 0
    assert(got(3L) == ((1L, 10L)))
    assert(got(4L) == ((1L, 60L)))
    assert(got(10L) == ((0L, 0L)))  // oversized doc still gets a slot
    assert(got(11L) == ((2L, 50L))) // 250 div 100 = bin 2, offset 50
  }

  test("packNextFit keeps docs whole: no straddling, oversized doc owns its bin") {
    val docs = Seq(
      // stratum "a", budget 100: 60 -> bin0@0; 50 doesn't fit (rem 40) ->
      // bin1@0; 40 fits bin1 (rem 50->10) @50; 20 doesn't fit -> bin2@0
      (1L, "a", 60), (2L, "a", 50), (3L, "a", 40), (4L, "a", 20),
      // stratum "b": oversized 250 lands alone in bin0; next opens bin1
      (10L, "b", 250), (11L, "b", 10),
      // stratum "c": a zero-token doc needs no space — it shares even a
      // FULL bin (zero-length placement at the boundary)
      (20L, "c", 100), (21L, "c", 0)
    ).toDF("doc_id", "lang", "n_tokens")
    val got = Packing.packNextFit(docs, "n_tokens", "doc_id", 100, Seq("lang"))
      .select("doc_id", "bin", "bin_offset")
      .as[(Long, Long, Long)].collect().map { case (k, b, o) => k -> ((b, o)) }.toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((1L, 0L)), s"no straddle: $got")
    assert(got(3L) == ((1L, 50L)))
    assert(got(4L) == ((2L, 0L)))
    assert(got(10L) == ((0L, 0L)), "oversized doc placed while bin empty")
    assert(got(11L) == ((1L, 0L)))
    assert(got(20L) == ((0L, 0L)))
    assert(got(21L) == ((0L, 100L)), "0-token doc: zero-length boundary placement")
  }

  test("packNextFit: every bin except possibly the last respects the budget") {
    val docs = (1 to 200).map(i => (i.toLong, "x", 7 + (i % 23))).toDF("doc_id", "lang", "n_tokens")
    val packed = Packing.packNextFit(docs, "n_tokens", "doc_id", 64, Seq("lang"))
    val byBin = packed.groupBy("bin")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(byBin.values.forall(_ <= 64), s"bin overflow: $byBin")
    // and packing is a permutation of the input (no doc lost or split)
    assert(packed.count() == 200)
  }

  test("chunkTokens windows cover the doc with stride overlap") {
    // 10 tokens, chunk 4, stride 3 -> starts 1,4,7 (ceil((10-4)/3)+1 = 3)
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Packing.chunkTokens(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_chunk_tokens").as[(Long, Long, Int)]
      .collect().toSeq
    assert(got == Seq((0L, 1L, 4), (1L, 4L, 4), (2L, 7L, 4)))
  }

  test("chunkTokens: short doc yields one full-doc chunk; last window ragged") {
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    val s = Packing.chunkTokens(short, "doc_id", "text", 4, 3).collect()
    assert(s.length == 1 && s.head.getAs[Int]("n_chunk_tokens") == 2)
    // 9 tokens, chunk 4, stride 3 -> starts 1,4,7; last chunk has 3 tokens
    val nine = Seq((2L, (1 to 9).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val r = Packing.chunkTokens(nine, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").select("n_chunk_tokens").as[Int].collect().toSeq
    assert(r == Seq(4, 4, 3))
  }

  test("chunkTokens md5 gates chunk content and is deterministic") {
    val df = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val rows = Packing.chunkTokens(df, "doc_id", "text", 3, 2)
      .orderBy("chunk_idx").collect()
    // chunks: [alpha beta gamma], [gamma delta epsilon]
    assert(rows.length == 2)
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(0).getAs[String]("chunk_md5") == m("alpha beta gamma"))
    assert(rows(1).getAs[String]("chunk_md5") == m("gamma delta epsilon"))
  }

  test("packing is deterministic across runs") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
      .selectExpr("doc_id", "lang", "n_chars div 5 as n_tokens")
    val a = Packing.packGreedy(docs, "n_tokens", "doc_id", 2048, Seq("lang"))
      .select("doc_id", "bin", "bin_offset").collect().toSeq
    val b = Packing.packGreedy(docs, "n_tokens", "doc_id", 2048, Seq("lang"))
      .select("doc_id", "bin", "bin_offset").collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }
}
