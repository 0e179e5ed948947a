package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.TestSpark

/** ChatML rendering + loss-mask span semantics ([[SftFormat]]): exact
  * template output, span/content agreement, role filtering, turn
  * ordering, multi-conversation isolation. */
class SftFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def turnsDf(rows: (Long, Int, String, String)*) =
    rows.toDF("conv_id", "turn_idx", "role", "content")

  test("exact ChatML rendering of a two-turn conversation") {
    val out = SftFormat.renderChatMl(turnsDf(
      (1L, 0, "user", "hi"), (1L, 1, "assistant", "hello there"))).collect()
    assert(out.length == 1)
    val r = out.head
    val text = r.getAs[String]("text")
    assert(text ==
      "<|im_start|>user\nhi<|im_end|>\n" +
      "<|im_start|>assistant\nhello there<|im_end|>\n", text)
    val spans = r.getSeq[Row](r.fieldIndex("mask_spans"))
    assert(spans.length == 1)
    val (st, en) = (spans.head.getAs[Long]("start"), spans.head.getAs[Long]("end"))
    assert(text.substring(st.toInt, en.toInt) == "hello there", (st, en))
    assert(r.getAs[Long]("n_mask_chars") == 11L)
    assert(r.getAs[Long]("n_turns") == 2L)
  }

  test("every span slices back to exactly its turn's content") {
    val turns = turnsDf(
      (7L, 0, "system", "be terse"),
      (7L, 1, "user", "what is spark"),
      (7L, 2, "assistant", "a distributed engine"),
      (7L, 3, "user", "and catalyst"),
      (7L, 4, "assistant", "its optimizer"))
    val r = SftFormat.renderChatMl(turns).collect().head
    val text = r.getAs[String]("text")
    val spans = r.getSeq[Row](r.fieldIndex("mask_spans"))
    assert(spans.map(_.getAs[Int]("turn_idx")) == Seq(2, 4))
    val contents = spans.map(sp => text.substring(
      sp.getAs[Long]("start").toInt, sp.getAs[Long]("end").toInt))
    assert(contents == Seq("a distributed engine", "its optimizer"))
  }

  test("maskRoles is configurable (mask user turns instead)") {
    val r = SftFormat.renderChatMl(
      turnsDf((1L, 0, "user", "abc"), (1L, 1, "assistant", "defgh")),
      maskRoles = Seq("user")).collect().head
    val spans = r.getSeq[Row](r.fieldIndex("mask_spans"))
    assert(spans.map(_.getAs[Int]("turn_idx")) == Seq(0))
    assert(r.getAs[Long]("n_mask_chars") == 3L)
  }

  test("turns render in turn_idx order regardless of input row order") {
    val r = SftFormat.renderChatMl(turnsDf(
      (1L, 2, "assistant", "second"), (1L, 1, "user", "first"))).collect().head
    val text = r.getAs[String]("text")
    assert(text.indexOf("first") >= 0 && text.indexOf("first") < text.indexOf("second"))
    val sp = r.getSeq[Row](r.fieldIndex("mask_spans")).head
    assert(text.substring(sp.getAs[Long]("start").toInt,
      sp.getAs[Long]("end").toInt) == "second")
  }

  test("conversations are isolated; a no-assistant conv gets an empty mask") {
    val out = SftFormat.renderChatMl(turnsDf(
      (1L, 0, "user", "a"), (1L, 1, "assistant", "bb"),
      (2L, 0, "user", "only user"))).collect()
      .map(r => r.getAs[Long]("conv_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_mask_chars") == 2L)
    assert(out(2L).getSeq[Row](out(2L).fieldIndex("mask_spans")).isEmpty)
    assert(out(2L).getAs[Long]("n_mask_chars") == 0L)
  }

  test("multi-line and empty contents keep offsets exact") {
    val r = SftFormat.renderChatMl(turnsDf(
      (1L, 0, "user", "line1\nline2"), (1L, 1, "assistant", ""))).collect().head
    val text = r.getAs[String]("text")
    val sp = r.getSeq[Row](r.fieldIndex("mask_spans")).head
    assert(sp.getAs[Long]("start") == sp.getAs[Long]("end"))
    // the empty assistant content sits right between its \n and <|im_end|>
    val at = sp.getAs[Long]("start").toInt
    assert(text.charAt(at - 1) == '\n' && text.startsWith(SftFormat.ImEnd, at))
  }

  // ---- DPO preference pairs ----

  private def pairsDf(rows: (Long, String, String)*) =
    rows.toDF("pair_id", "chosen", "rejected")

  test("DPO pair: exact texts, shared prefix, per-side spans") {
    val prompts = Seq((7L, 0, "system", "Be terse."), (7L, 1, "user", "2+2?"))
      .toDF("pair_id", "turn_idx", "role", "content")
    val r = SftFormat.renderDpoPairs(prompts, pairsDf((7L, "4", "five maybe")))
      .collect().head
    val prefix = "<|im_start|>system\nBe terse.<|im_end|>\n" +
      "<|im_start|>user\n2+2?<|im_end|>\n<|im_start|>assistant\n"
    val chosenText = r.getAs[String]("chosen_text")
    val rejectedText = r.getAs[String]("rejected_text")
    assert(chosenText == prefix + "4<|im_end|>\n", chosenText)
    assert(rejectedText == prefix + "five maybe<|im_end|>\n", rejectedText)
    assert(r.getAs[Long]("prefix_len") == prefix.length.toLong)
    assert(chosenText.take(prefix.length) == rejectedText.take(prefix.length))
    val (cs, ce) = (r.getAs[Long]("chosen_start"), r.getAs[Long]("chosen_end"))
    val (rs, re) = (r.getAs[Long]("rejected_start"), r.getAs[Long]("rejected_end"))
    assert(chosenText.substring(cs.toInt, ce.toInt) == "4")
    assert(rejectedText.substring(rs.toInt, re.toInt) == "five maybe")
    assert(r.getAs[Long]("n_prompt_turns") == 2L)
  }

  test("DPO prompt turns render by turn_idx regardless of input row order") {
    val shuffled = Seq((1L, 2, "user", "second"), (1L, 0, "system", "s"),
      (1L, 1, "user", "first"))
      .toDF("pair_id", "turn_idx", "role", "content")
    val r = SftFormat.renderDpoPairs(shuffled, pairsDf((1L, "ok", "no")))
      .collect().head
    val t = r.getAs[String]("chosen_text")
    assert(t.indexOf("first") >= 0 && t.indexOf("first") < t.indexOf("second"), t)
    assert(t.indexOf("\ns<|im_end|>") < t.indexOf("first"), t)
  }

  test("DPO empty rejected: empty span at the prefix boundary, prefix still shared") {
    val prompts = Seq((3L, 0, "user", "hi"))
      .toDF("pair_id", "turn_idx", "role", "content")
    val r = SftFormat.renderDpoPairs(prompts, pairsDf((3L, "yes", "")))
      .collect().head
    val (rs, re) = (r.getAs[Long]("rejected_start"), r.getAs[Long]("rejected_end"))
    assert(rs == re && rs == r.getAs[Long]("prefix_len"))
    val rejectedText = r.getAs[String]("rejected_text")
    assert(rejectedText.startsWith(
      r.getAs[String]("chosen_text").take(r.getAs[Long]("prefix_len").toInt)))
    assert(rejectedText.drop(rs.toInt) == SftFormat.ImEnd + "\n")
  }
}
