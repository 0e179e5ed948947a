package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning (instruction-data) formatting: render multi-turn
  * conversations into a chat template and emit the LOSS-MASK character
  * spans — the byte ranges a trainer computes loss over (assistant
  * completions), everything else (system prompt, user turns, template
  * chrome) masked out. Every SFT pipeline does exactly this step between
  * "conversations in a table" and "token streams in a trainer"; doing it
  * engine-side keeps the span arithmetic next to the data instead of in a
  * per-file Python loop.
  *
  * Template: ChatML (`<|im_start|>role\ncontent<|im_end|>\n` per turn) —
  * the convention popularized by OpenAI and adopted by Qwen/Mistral-
  * instruct-style corpora.
  *
  * Spark-first shape: ONE hash shuffle on the conversation key. Per-turn
  * rendering and offset arithmetic are pure column expressions; a window
  * over (conv, turn order) accumulates character offsets (running sum —
  * no materialized frames beyond the running aggregate); the per-conv
  * assembly is an ordered collect_list + array_join in the SAME exchange.
  * Map-rate at 100 TB: conversations are small (KBs), keys are uniform,
  * no driver state.
  */
object SftFormat {

  val ImStart = "<|im_start|>"
  val ImEnd = "<|im_end|>"

  /** Preference-pair (DPO/RLHF) formatting: render (prompt, chosen,
    * rejected) triples with the same ChatML template and emit what a
    * preference trainer consumes — the SHARED-PREFIX length (prompt +
    * assistant header, identical on both sides by construction: DPO
    * implementations cache its KV/logits once) and each side's loss span
    * (the response content's half-open character range in its rendered
    * text).
    *
    * Input: `promptTurns` — one row per prompt turn (`pairCol`, `idxCol`,
    * `roleCol`, `contentCol`; any row order, turns render by ascending
    * idx); `responses` — one row per pair (`pairCol`, `chosenCol`,
    * `rejectedCol`). An empty rejected string renders to an empty span
    * (start == end) — the degenerate-pair shape, kept rather than dropped
    * so the caller decides.
    *
    * Output per pair: `pair_id`, `n_prompt_turns`, `prefix_len`,
    * `chosen_text`, `rejected_text`, `chosen_start/end`,
    * `rejected_start/end`. Invariants (spec- and oracle-pinned):
    * both texts share their first `prefix_len` chars exactly, and
    * `substring(side_text, start+1, end-start)` is that side's response.
    *
    * Scale: the prompt render is [[renderChatMl]]'s single hash shuffle;
    * the response join is one more equi-join on the pair key (broadcast
    * when the pair table is dimension-sized). Map-rate per row after. */
  def renderDpoPairs(promptTurns: DataFrame, responses: DataFrame,
                     pairCol: String = "pair_id", idxCol: String = "turn_idx",
                     roleCol: String = "role", contentCol: String = "content",
                     chosenCol: String = "chosen",
                     rejectedCol: String = "rejected",
                     responseRole: String = "assistant"): DataFrame = {
    val header = ImStart + responseRole + "\n"
    val tail = ImEnd + "\n"
    val prompts = renderChatMl(promptTurns, maskRoles = Nil, convCol = pairCol,
        idxCol = idxCol, roleCol = roleCol, contentCol = contentCol)
      .select(col("conv_id").as("pair_id"), col("text").as("prompt_text"),
        col("n_turns").as("n_prompt_turns"))
    prompts
      .join(responses.select(col(pairCol).as("pair_id"),
        col(chosenCol).as("chosen"), col(rejectedCol).as("rejected")),
        Seq("pair_id"))
      .select(
        col("pair_id"), col("n_prompt_turns"),
        (length(col("prompt_text")) + lit(header.length)).cast("long")
          .as("prefix_len"),
        concat(col("prompt_text"), lit(header), col("chosen"), lit(tail))
          .as("chosen_text"),
        concat(col("prompt_text"), lit(header), col("rejected"), lit(tail))
          .as("rejected_text"),
        length(col("chosen")).cast("long").as("chosen_len"),
        length(col("rejected")).cast("long").as("rejected_len"))
      .select(
        col("pair_id"), col("n_prompt_turns"), col("prefix_len"),
        col("chosen_text"), col("rejected_text"),
        col("prefix_len").as("chosen_start"),
        (col("prefix_len") + col("chosen_len")).as("chosen_end"),
        col("prefix_len").as("rejected_start"),
        (col("prefix_len") + col("rejected_len")).as("rejected_end"))
  }

  /** Render conversations into ChatML + loss-mask spans.
    *
    * Input: one row per turn — (`convCol`, `idxCol`, `roleCol`,
    * `contentCol`); turns render in ascending `idxCol` order.
    *
    * Output: one row per conversation —
    *  - `conv_id`, `text` (the rendered ChatML document)
    *  - `mask_spans`: array<struct<turn_idx, start, end>> — half-open
    *    CHARACTER ranges of each mask-role turn's content within `text`
    *  - `n_turns`, `n_mask_chars`
    *
    * Invariant (spec- and oracle-pinned): for every span,
    * `substring(text, start+1, end-start) == ` that turn's content.
    */
  def renderChatMl(turns: DataFrame, maskRoles: Seq[String] = Seq("assistant"),
                   convCol: String = "conv_id", idxCol: String = "turn_idx",
                   roleCol: String = "role",
                   contentCol: String = "content"): DataFrame = {
    val conv = col(convCol)
    val role = col(roleCol)
    val content = col(contentCol)
    val rendered: Column =
      concat(lit(ImStart), role, lit("\n"), content, lit(ImEnd), lit("\n"))

    val w = Window.partitionBy(conv).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val turnStart = coalesce(sum(length(rendered)).over(w), lit(0L))
    val contentStart = turnStart + lit(ImStart.length) + length(role) + lit(1)

    val perTurn = turns.select(
      conv.as("conv_id"),
      col(idxCol).as("turn_idx"),
      role.as("role"),
      rendered.as("rendered"),
      contentStart.as("span_start"),
      (contentStart + length(content)).as("span_end"))

    perTurn
      .groupBy(col("conv_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("turn_idx"), col("rendered")))),
          t => t.getField("rendered")), "").as("text"),
        array_sort(collect_list(
          when(col("role").isin(maskRoles.map(lit): _*),
            struct(col("turn_idx"), col("span_start").as("start"),
              col("span_end").as("end"))))).as("mask_spans"),
        count(lit(1)).as("n_turns"))
      .withColumn("n_mask_chars",
        coalesce(aggregate(col("mask_spans"), lit(0L),
          (acc, sp) => acc + sp.getField("end") - sp.getField("start")), lit(0L)))
  }
}
