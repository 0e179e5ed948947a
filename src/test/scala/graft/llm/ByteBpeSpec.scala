package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.engine.Tables

/** Byte-level BPE (GPT-2 family) pinned against the published
  * bytes_to_unicode table, the leading-space convention, multi-byte and
  * emoji round trips, and training determinism on the fixture. */
class ByteBpeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("byte remap matches the published GPT-2 bytes_to_unicode table") {
    // printable latin-1 maps to itself
    ByteBpe.byteToChar('a'.toInt) shouldBe 'a'
    ByteBpe.byteToChar('!'.toInt) shouldBe '!'
    ByteBpe.byteToChar(0xFF) shouldBe 'ÿ'
    // the canonical displaced bytes: space → Ġ (U+0120), newline → Ċ
    // (U+010A), tab → ĉ (U+0109), NUL → Ā (U+0100); DEL (0x7F) is the
    // 34th displaced byte (after 0x00..0x20) → 256+33 = U+0121 = ġ
    ByteBpe.byteToChar(0x20) shouldBe 'Ġ'
    ByteBpe.byteToChar(0x0A) shouldBe 'Ċ'
    ByteBpe.byteToChar(0x09) shouldBe 'ĉ'
    ByteBpe.byteToChar(0x00) shouldBe 'Ā'
    ByteBpe.byteToChar(0x7F) shouldBe 'ġ'
    // total and invertible: 256 distinct chars, inverse is exact
    ByteBpe.byteToChar.distinct.length shouldBe 256
    (0 until 256).foreach(b =>
      ByteBpe.charToByte(ByteBpe.byteToChar(b)) shouldBe b)
  }

  test("pre-tokenization follows GPT-2: contractions split, spaces prefix words") {
    val p = java.util.regex.Pattern.compile(ByteBpe.PreTokenPattern)
    def toks(s: String): Seq[String] = {
      val m = p.matcher(s); val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }
    toks("I'll go") shouldBe Seq("I", "'ll", " go")
    toks("Hello, world!") shouldBe Seq("Hello", ",", " world", "!")
    toks("a  b") shouldBe Seq("a", " ", " b") // trailing-aware \s+(?!\S)
    toks("x42y") shouldBe Seq("x", "42", "y")
    // total coverage: every char of any string lands in exactly one token
    val s = "mixed: \t tabs\nNEW‑lines, ünïcode & 🚀!"
    toks(s).mkString shouldBe s
  }

  test("zero merges: one token per UTF-8 byte, space carries as Ġ") {
    val ranks = Map.empty[(String, String), Int]
    ByteBpe.encodeWord(" the", ranks).toSeq shouldBe
      Seq("Ġ", "t", "h", "e")
    // é = 2 UTF-8 bytes, 🚀 (U+1F680) = 4 bytes
    ByteBpe.encodeWord("é", ranks).length shouldBe 2
    ByteBpe.encodeWord("🚀", ranks).length shouldBe 4
  }

  test("merges rejoin multi-byte sequences; decode round-trips emoji exactly") {
    // train on a tiny corpus where the rocket dominates: its four bytes
    // must merge back into one token
    import spark.implicits._
    val docs = Seq.fill(50)("🚀").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val v = ByteBpe.train(docs, numMerges = 3, maxWordTypes = 100)
    v.merges.length shouldBe 3
    val toks = ByteBpe.encodeWord("🚀", v.ranks).toSeq
    toks.length shouldBe 1
    ByteBpe.decode(toks) shouldBe "🚀"
    // lossless decode INCLUDING whitespace (the byte-level property)
    val text = "I'll take\tünïcode 🚀🚀 — twice.\n"
    val enc = ByteBpe.encode(Seq((1L, text)).toDF("doc_id", "text"), v)
      .select(col("tokens")).head().getSeq[String](0)
    ByteBpe.decode(enc) shouldBe text
  }

  test("leading-space convention distinguishes word-initial from word-internal") {
    import spark.implicits._
    // " the" appears often → merges produce a Ġ-prefixed token distinct
    // from any "the"-internal merge
    val docs = Seq.fill(40)("on the mat the cat the end").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val v = ByteBpe.train(docs, numMerges = 30, maxWordTypes = 1000)
    val toks = ByteBpe.encodeWord(" the", v.ranks).toSeq
    toks shouldBe Seq("Ġthe")
  }

  test("training is deterministic across runs and row orders") {
    val docs = Tables.ensure(spark, TestSpark.sf).documents
    val a = ByteBpe.train(docs, numMerges = 60, maxWordTypes = 20000)
    val b = ByteBpe.train(docs.repartition(7), numMerges = 60, maxWordTypes = 20000)
    a.merges shouldBe b.merges
    a.merges.length shouldBe 60
  }

  test("vocabulary persists and reloads exactly through the lake store") {
    val docs = Tables.ensure(spark, TestSpark.sf).documents.limit(100)
    val v = ByteBpe.train(docs, numMerges = 40, maxWordTypes = 10000)
    val dir = java.nio.file.Files.createTempDirectory("graft_tok_bb").toString
    TokenizerStore.saveByteBpe(spark, dir, v)
    TokenizerStore.kindOf(spark, dir) shouldBe "bpe_byte"
    TokenizerStore.loadByteBpe(spark, dir).merges shouldBe v.merges
    // a byte-BPE table refuses to load as the character family
    assertThrows[IllegalArgumentException](TokenizerStore.loadBpe(spark, dir))
  }

  test("distributed encode is lossless over the fixture corpus") {
    val docs = Tables.ensure(spark, TestSpark.sf).documents.limit(80)
    val v = ByteBpe.train(docs, numMerges = 120, maxWordTypes = 20000)
    val rows = ByteBpe.encode(docs, v)
      .select(col("text"), col("tokens")).collect()
    rows.foreach { r =>
      ByteBpe.decode(r.getSeq[String](1)) shouldBe r.getString(0)
    }
    // merges compress: trained tokens ≤ byte count, and strictly fewer
    // in aggregate
    val agg = ByteBpe.encode(docs, v)
      .agg(sum(org.apache.spark.sql.functions.size(col("tokens"))).cast("long"),
        sum(octet_length(col("text"))).cast("long"))
      .head()
    assert(agg.getLong(0) < agg.getLong(1))
  }
}
