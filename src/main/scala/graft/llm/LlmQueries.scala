package graft.llm

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.queries.QueryFn

/** Driver-contract wiring for the LLM-pipeline operator surface.
  * SQL-expressible analytics carry DuckDB oracles; signature/ANN ops
  * (engine-specific hashing / float ordering) get rows-only checks plus
  * dedicated unit specs.
  */
object LlmQueries {

  val dedupExact: QueryFn = (s, dir) =>
    Dedup.exact(Tables.ensure(s, dir).documents).orderBy(col("digest"))
  val dedupExactSql: String = """
    SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY digest"""

  val dedupMinhash: QueryFn = (s, dir) =>
    Dedup.minhashLsh(Tables.ensure(s, dir).documents)
      .orderBy(col("a_id"), col("b_id"))

  val dedupSimhash: QueryFn = (s, dir) =>
    Dedup.simhashPairs(Tables.ensure(s, dir).documents, maxHamming = 6)
      .orderBy(col("a_id"), col("b_id"))

  val dedupEmbedding: QueryFn = (s, dir) =>
    // Fixture embeddings are near-random (max within-label cosine ≈ 0.47),
    // so 0.4 marks the "suspiciously similar" tail; real corpora use ~0.95.
    Dedup.embeddingDups(Tables.ensure(s, dir).embeddings, threshold = 0.4)
      .orderBy(col("a_id"), col("b_id"))

  val annBrute: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("q_id"), col("rk"))
  }

  val annIvf: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("q_id"), col("rk"))
  }

  val textQuality: QueryFn = (s, dir) =>
    TextAnalysis.qualitySignals(Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))
  val textQualitySql: String = """
    WITH toks AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500)
    SELECT doc_id,
      CAST(length(text) AS INT) AS len_chars,
      CAST(len(t) AS INT) AS n_tokens,
      CAST(length(text) AS DOUBLE) / len(t) AS avg_token_span,
      CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
      CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
      CAST(len(list_filter(t, w -> list_contains(['the','a','an','of','and','or','to','in','is','it','for','on','with','as','at','by','from','that','this'], w))) AS DOUBLE) / len(t) AS stopword_ratio,
      CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_token_ratio
    FROM toks ORDER BY doc_id"""

  val textTokens: QueryFn = (s, dir) =>
    TextAnalysis.tokenCounts(Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))
  val textTokensSql: String = """
    SELECT doc_id,
      CAST(len(list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS INT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpeish_tokens,
      CAST(length(text) - length(regexp_replace(text, '\s', '', 'g')) AS INT) AS ws_chars
    FROM documents WHERE doc_id < 500 ORDER BY doc_id"""

  val textFingerprint: QueryFn = (s, dir) =>
    TextAnalysis.fingerprint(Tables.ensure(s, dir).documents)
      .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("fp"))
  val textFingerprintSql: String = """
    SELECT md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0))), ' ')) AS fp,
           COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
    FROM documents GROUP BY 1 ORDER BY fp"""

  val textLangid: QueryFn = (s, dir) =>
    TextAnalysis.languageId(Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))

  val multimodalFeatures: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 200)
    Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .select(col("id"), col("format"), col("width"), col("height"),
        size(col("features")).as("n_features"))
      .orderBy(col("id"))
  }

  val queries: Map[String, QueryFn] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_minhash_lsh" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding_cos" -> dedupEmbedding,
    "ann_brute_force" -> annBrute,
    "ann_ivf_label" -> annIvf,
    "text_quality" -> textQuality,
    "text_tokens" -> textTokens,
    "text_fingerprint" -> textFingerprint,
    "text_langid" -> textLangid,
    "multimodal_features" -> multimodalFeatures)

  val oracle: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "text_quality" -> textQualitySql,
    "text_tokens" -> textTokensSql,
    "text_fingerprint" -> textFingerprintSql)
}
