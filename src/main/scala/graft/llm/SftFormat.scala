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
