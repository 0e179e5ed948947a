package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training bins
  * ("which context window does this doc land in, at what offset") by
  * streaming documents in a deterministic order and cutting a new bin each
  * time the running token total crosses the budget. Documents may straddle
  * a boundary — the trainer truncates or overflows; what matters here is
  * that the assignment is a pure function of (stratum, order), so every
  * run and every engine produces the same packing.
  *
  * Scale design: one window (hash shuffle on the strata, per-partition
  * sort) and codegen'd arithmetic — the same cost shape as sessionization.
  * Strata double as the parallelism unit: packing a 100 TB corpus in one
  * global order would serialize into a single sort, so callers pass a
  * shard column among `strata` (e.g. `pmod(xxhash64(doc_id), 1024)`) and
  * pack within (stratum, shard) — bins are still deterministic, just
  * numbered per shard, which is how training shards are consumed anyway.
  */
object Packing {

  /** @param tokenCol per-row token count column (integral)
    * @param orderCol deterministic within-stratum order (unique id)
    * @param budget   tokens per bin (context length)
    * @param strata   partition columns (language, source, shard…)
    * @return input plus `bin` (0-based bin index within the stratum) and
    *         `bin_offset` (token offset of this doc inside its bin)
    */
  def packGreedy(df: DataFrame, tokenCol: String, orderCol: String,
                 budget: Int, strata: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(strata.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__g_cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("__g_cum") / budget))
      .withColumn("bin_offset", col("__g_cum") % budget)
      .drop("__g_cum")
  }

  /** Overlapping token-window chunking — the retrieval/embedding-pipeline
    * step that splits each document into fixed-size windows with stride
    * overlap (chunk i covers tokens [i·stride+1, i·stride+chunkSize]).
    * A doc of n tokens yields 1 chunk when n ≤ chunkSize, else
    * ceil((n−chunkSize)/stride)+1, so the final window always reaches the
    * last token. Pure per-row explode (sequence + slice, all codegen'd):
    * no shuffle at all — at 100 TB this is a map-only pass whose output
    * fan-out is bounded by n/stride per doc.
    *
    * @return idCol, chunk_idx (0-based), start_tok (1-based token offset),
    *         n_chunk_tokens, chunk_md5 (hash of the space-joined window —
    *         gates the exact chunk content without shipping it)
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(stride > 0 && stride <= chunkSize, "need 0 < stride <= chunkSize")
    val t = TextAnalysis.tokens(col(textCol))
    val n = size(t)
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(ceil((n - chunkSize).cast("double") / stride) + 1L)
    val start = col("chunk_idx") * stride + 1L
    docs.select(col(idCol), t.as("__t"), nChunks.as("__nc"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"), start.as("start_tok"),
        slice(col("__t"), start, lit(chunkSize)).as("__ck"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(col("__ck")).as("n_chunk_tokens"),
        md5(array_join(col("__ck"), " ")).as("chunk_md5"))
  }

  /** Whole-document next-fit packing — the "sample packing" used for
    * instruction tuning, where a document must NOT straddle a context
    * boundary: scanning each stratum in deterministic order, a doc joins
    * the current bin when it fits, else opens the next bin. A doc larger
    * than the budget gets a bin of its own (placed when the current bin
    * is still empty). Unlike [[packGreedy]] no doc is ever split, at the
    * cost of internal fragmentation (next-fit is the streaming-friendly
    * member of the bin-packing family — one O(1) state scan, no
    * lookback).
    *
    * Scale: hash shuffle on the strata + per-partition sort (the
    * packGreedy cost shape), then ONE forward iterator pass per
    * partition carrying two longs of state — no window materialization,
    * no collect; strata/shards are the parallelism unit exactly as in
    * [[packGreedy]].
    *
    * @return input plus `bin` (0-based within stratum) and `bin_offset`
    *         (token offset of this doc inside its bin)
    */
  def packNextFit(df: DataFrame, tokenCol: String, orderCol: String,
                  budget: Int, strata: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(strata.nonEmpty, "pass at least one stratum/shard column")
    val cols = df.columns.toSeq
    val sIdx = strata.map(cols.indexOf)
    val tIdx = cols.indexOf(tokenCol)
    require(tIdx >= 0 && sIdx.forall(_ >= 0), "unknown column")
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bin_offset",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val sorted = df.repartition(strata.map(col): _*)
      .sortWithinPartitions((strata :+ orderCol).map(col): _*)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var bin = 0L
      var rem = 0L
      it.map { r =>
        val key = sIdx.map(r.get)
        val t = r.get(tIdx).asInstanceOf[Number].longValue()
        if (key != curKey) { curKey = key; bin = 0L; rem = budget.toLong }
        else if (t > rem && rem != budget.toLong) { bin += 1; rem = budget.toLong }
        val off = budget.toLong - rem
        rem -= t
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(bin, off))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
