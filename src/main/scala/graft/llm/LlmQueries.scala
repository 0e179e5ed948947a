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
  /** FULL oracle: at oracle scale (500 docs) DuckDB replays the exact
    * quadratic word-3-gram Jaccard join — the selection LSH approximates.
    * Coincidence is a MEASURED fixture property, not an assumption: every
    * sf0.01 pair at J ≥ 0.5 actually sits at J ≥ 0.9 (nothing in
    * 0.3–0.9), where the 16-band×4-row banding's miss probability is
    * (1−0.9⁴)¹⁶ ≈ 4e-8 — and the minhash seeds are fixed, so the match
    * is deterministic once green, and DedupSpec's recall==1.0 pin guards
    * the property. Jaccard VALUES agree because the 64-bit ngram hashes
    * are collision-free at this gram cardinality, so both engines divide
    * identical integer counts (IEEE-exact). */
  val dedupMinhashSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents),
    d AS (
      SELECT doc_id,
        list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
          ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS grams
      FROM toks)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
        / (len(a.grams) + len(b.grams)
           - len(list_filter(a.grams, g -> list_contains(b.grams, g)))) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
        / (len(a.grams) + len(b.grams)
           - len(list_filter(a.grams, g -> list_contains(b.grams, g)))) >= 0.5
    ORDER BY a_id, b_id"""

  /** FULL oracle via [[Dedup.simhashPairsReplayable]]: the signature's
    * per-token hash is md5 (identical in every engine) instead of the
    * engine-seeded xxhash64, so DuckDB replays the ENTIRE pipeline
    * exactly — token multiset → md5 halves → per-bit majority → 64-bit
    * signature → 4×16-bit chunk pigeonhole join → hamming verify. All
    * integer arithmetic end to end (no float anywhere), so the match is
    * bit-exact by construction, not a fixture coincidence. The xxhash64
    * signature path ([[Dedup.simhashPairs]]) stays the 100 TB hot path,
    * spec-covered in DedupSpec. */
  val dedupSimhash: QueryFn = (s, dir) =>
    Dedup.simhashPairsReplayable(Tables.ensure(s, dir).documents, maxHamming = 6)
      .orderBy(col("a_id"), col("b_id"))
  val dedupSimhashSql: String = """
    WITH toks AS (
      SELECT d.doc_id, t.tok
      FROM documents d,
           unnest(list_filter(string_split_regex(lower(d.text),
             '[ \t\n\r\f\x0B]+'), w -> len(w) > 0)) AS t(tok)),
    th AS (
      SELECT doc_id,
        list_reduce(list_transform(generate_series(1, 8),
          i -> CAST(strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1
                    AS BIGINT)), (a, b) -> a * 16 + b) AS h_hi,
        list_reduce(list_transform(generate_series(9, 16),
          i -> CAST(strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1
                    AS BIGINT)), (a, b) -> a * 16 + b) AS h_lo
      FROM toks),
    votes AS (
      SELECT doc_id, b.bit,
        SUM(CASE WHEN (CASE WHEN b.bit < 32 THEN (h_lo >> b.bit) & 1
                       ELSE (h_hi >> (b.bit - 32)) & 1 END) = 1
            THEN 1 ELSE -1 END) AS v
      FROM th, (SELECT unnest(generate_series(0, 63)) AS bit) b
      GROUP BY doc_id, b.bit),
    sigs AS (
      SELECT doc_id,
        SUM(CASE WHEN v > 0 AND bit < 32 THEN 1::BIGINT << bit ELSE 0 END) AS sig_lo,
        SUM(CASE WHEN v > 0 AND bit >= 32 THEN 1::BIGINT << (bit - 32) ELSE 0 END) AS sig_hi
      FROM votes GROUP BY doc_id),
    allsigs AS (
      SELECT d.doc_id, COALESCE(s.sig_lo, 0) AS sig_lo, COALESCE(s.sig_hi, 0) AS sig_hi
      FROM documents d LEFT JOIN sigs s ON d.doc_id = s.doc_id),
    chunks AS (
      SELECT doc_id, c.chunk,
        CASE c.chunk WHEN 0 THEN sig_lo & 65535
                     WHEN 1 THEN (sig_lo >> 16) & 65535
                     WHEN 2 THEN sig_hi & 65535
                     ELSE (sig_hi >> 16) & 65535 END AS ck,
        sig_lo, sig_hi
      FROM allsigs, (SELECT unnest(generate_series(0, 3)) AS chunk) c),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        a.sig_lo AS a_lo, a.sig_hi AS a_hi, b.sig_lo AS b_lo, b.sig_hi AS b_hi
      FROM chunks a JOIN chunks b
        ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id)
    SELECT a_id, b_id,
      CAST(bit_count(xor(a_lo, b_lo)) + bit_count(xor(a_hi, b_hi)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(a_lo, b_lo)) + bit_count(xor(a_hi, b_hi)) <= 6
    ORDER BY a_id, b_id"""

  val dedupEmbedding: QueryFn = (s, dir) =>
    // Fixture embeddings are near-random (max within-label cosine ≈ 0.47),
    // so 0.4 marks the "suspiciously similar" tail; real corpora use ~0.95.
    // Double-precision scoring makes DuckDB an exact replay (the same
    // graduation as ann_brute_force): in-order double folds are
    // bit-identical to list_cosine_similarity over DOUBLE[].
    Dedup.embeddingDups(Tables.ensure(s, dir).embeddings, threshold = 0.4,
        doublePrec = true)
      .orderBy(col("a_id"), col("b_id"))
  val dedupEmbeddingSql: String = """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
           list_cosine_similarity(a.v, b.v) AS cos
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    ORDER BY a_id, b_id"""

  /** SRP-LSH embedding near-dup (Dedup.embeddingLshPairs). The fixture's
    * near-random embeddings have no cos ≥ 0.99 pairs, so the query plants
    * exact copies of the first 20 vectors under shifted ids — every
    * planted pair has Hamming 0 and cosine 1, so the LSH path must emit
    * exactly those pairs (verified-exact output → deterministic). */
  val dedupEmbeddingLsh: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings.select(col("vec_id"), col("embedding"))
    val planted = e.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    Dedup.embeddingLshPairs(e.unionByName(planted), threshold = 0.99)
      .select(col("a_id"), col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }
  val dedupEmbeddingLshSql: String = """
    SELECT vec_id AS a_id, vec_id + 1000000 AS b_id
    FROM embeddings WHERE vec_id < 20 ORDER BY a_id, b_id"""

  /** Perceptual-hash image near-dup (Multimodal.imageNearDups) over
    * deterministic stub payloads built from document text — the planted
    * copies (same payload re-keyed) are the only Hamming-0 pairs, so the
    * banded join + verify must return exactly them. Real-pixel aHash/dHash
    * semantics are pinned in MultimodalSpec with synthesized PNGs. */
  val imagePhashDups: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val planted = Multimodal.asMedia(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .filter(col("doc_id") < 1000020L), "doc_id", "text")
    Multimodal.imageNearDups(media.unionByName(planted), maxHamming = 0)
      .select(col("a_id"), col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }
  val imagePhashDupsSql: String = """
    WITH d AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 300),
    p AS (SELECT doc_id + 1000000 AS doc_id, h FROM d WHERE doc_id + 1000000 < 1000020),
    u AS (SELECT * FROM d UNION ALL SELECT * FROM p)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id
    FROM u a JOIN u b ON a.h = b.h AND a.doc_id < b.doc_id
    ORDER BY a_id, b_id"""

  /** Corpus topic map (Clustering.documentClusters): k-means clusters over
    * embeddings + per-cluster tf-idf distinctive terms via TopKPerKey.
    * Cluster identities are kmeans-engine-specific → rows-only;
    * ClusteringSpec pins topic recovery on planted corpora. The terms
    * array is emitted as a JSON string so every output column is a
    * flat scalar the rows-only harness can sort. */
  /** Corpus topic map under a FULL oracle: the quantizer is FIXED to the
    * first four embeddings (the semDedup/VectorIndex contract), so DuckDB
    * replays assignment (double-precision argmax), cluster sizes, the
    * whole tf-idf computation (cnt × ln(N/df) — identical IEEE doubles),
    * and the per-cluster term ranking with its lexicographic tie-break. */
  val clusterDocuments: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val cents = t.embeddings.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val joined = t.documents.select(col("doc_id"), col("text"))
      .join(t.embeddings.select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
    Clustering.documentClusters(joined, topTerms = 5, centroids = Some(cents))
      .select(col("cluster"), col("n_docs"),
        to_json(col("top_terms")).as("top_terms_json"))
      .orderBy(col("cluster"))
  }
  val clusterDocumentsSql: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT CAST(vec_id AS INT) AS bucket, v AS cv FROM e WHERE vec_id < 4),
    corpus AS (SELECT d.doc_id, d.text, e.v
               FROM documents d JOIN e ON e.vec_id = d.doc_id),
    nn AS (SELECT count(*) AS n FROM corpus),
    asg0 AS (SELECT c.doc_id, ct.bucket,
               row_number() OVER (PARTITION BY c.doc_id
                 ORDER BY list_cosine_similarity(c.v, ct.cv) DESC, ct.bucket) AS rn
             FROM corpus c CROSS JOIN cents ct),
    asg AS (SELECT doc_id, bucket FROM asg0 WHERE rn = 1),
    sizes AS (SELECT bucket, count(*) AS n_docs FROM asg GROUP BY bucket),
    terms AS (SELECT a.bucket, u.term
              FROM corpus c JOIN asg a USING (doc_id),
              unnest(list_distinct(list_filter(
                string_split_regex(lower(c.text), '\s+'),
                w -> len(w) > 0))) AS u(term)),
    pc AS (SELECT bucket, term, count(*) AS cnt FROM terms GROUP BY bucket, term),
    dft AS (SELECT term, sum(cnt) AS df FROM pc GROUP BY term),
    scored AS (SELECT pc.bucket, pc.term,
                 pc.cnt * ln(CAST(nn.n AS DOUBLE) / dft.df) AS score
               FROM pc JOIN dft USING (term) CROSS JOIN nn),
    ranked AS (SELECT bucket, term, score,
                 row_number() OVER (PARTITION BY bucket
                   ORDER BY score DESC, term) AS rk
               FROM scored),
    topt AS (SELECT bucket,
               to_json(array_agg(term ORDER BY score DESC, term)) AS top_terms_json
             FROM ranked WHERE rk <= 5 GROUP BY bucket)
    SELECT s.bucket AS cluster, s.n_docs, t.top_terms_json
    FROM sizes s LEFT JOIN topt t USING (bucket)
    ORDER BY cluster"""

  /** One-pass PCA to 8 dims over the embedding corpus (Projection.pca:
    * treeAggregate covariance sketch + driver Jacobi; projection in pure
    * codegen'd lambdas). Signs/rotations are eigen-solver-specific →
    * rows-only; ProjectionSpec pins recovery, ordering, isometry. */
  val embedPca: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings.select(col("vec_id"), col("embedding"))
    val (proj, model) = Projection.pca(e, k = 8)
    // flat scalars only: rounded-JSON vector (sortable string), the
    // projected norm, and the captured-variance ratio
    proj.select(col("vec_id"),
        to_json(transform(col("pca"), x => round(x, 6))).as("pca_json"),
        round(sqrt(aggregate(col("pca"), lit(0.0d), (a, x) => a + x * x)), 6)
          .as("pca_norm"),
        round(lit(model.varianceCaptured(8)), 6).as("variance_captured"))
      .orderBy(col("vec_id"))
  }

  /** The PCA eigen-decomposition under a REAL oracle (r10 VERDICT #4):
    * per dimension j, the spectral reconstruction of the covariance
    * diagonal Σᵢ λᵢ·vᵢ(j)² must equal the population variance of
    * coordinate j — an invariant DuckDB verifies INDEPENDENTLY from the
    * raw parquet (var_pop), with the mean vector checked alongside. A
    * wrong eigenvalue, a non-unit eigenvector, or a covariance
    * accumulation bug all break the reconstruction; signs/rotations
    * (the reason embed_pca itself is rows-only) cancel in the squares. */
  val embedPcaVariance: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings.select(col("embedding"))
    val model = Projection.fitPca(e)
    val d = model.mean.length
    import s.implicits._
    val rows = (0 until d).map { j =>
      val varJ = model.eigenvalues.indices.iterator
        .map(i => model.eigenvalues(i) *
          model.components(i)(j) * model.components(i)(j)).sum
      (j, model.mean(j), varJ)
    }
    rows.toDF("j", "m", "v")
      .select(col("j"), round(col("m"), 6).as("mean_j"),
        round(col("v"), 6).as("var_j"))
      .orderBy(col("j"))
  }

  /** DuckDB recomputes each dimension's mean and population variance
    * straight from the parquet (fixture embeddings are d=64) — no part
    * of the engine's math is trusted by the oracle. */
  val embedPcaVarianceSql: String =
    (0 until 64).map { j =>
      s"SELECT $j AS j, round(avg(CAST(embedding[${j + 1}] AS DOUBLE)), 6) AS mean_j, " +
        s"round(var_pop(CAST(embedding[${j + 1}] AS DOUBLE)), 6) AS var_j FROM embeddings"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY j")

  private val PcaPinnedMean: Seq[Double] = Seq(
    0.002165, -0.004548, 0.00393, -0.004793, 0.009943, 0.007773, -0.018231, 0.009217, -0.002427, -0.000618, 0.006436, 0.003354, -0.002659, 0.002054, -0.000215, 0.00591, 0.003334, 0.005826, -0.000461, 0.001232, -0.003839, 0.002302, 0.004168, -0.008055, -0.001891, 0.012808, -0.001597, 0.010626, -0.001153, 0.00039, 0.005605, -0.005793, 0.008335, -0.006675, 0.005156, 0.001177, -0.005335, -0.001594, -0.000967, -0.001141, -0.001744, -0.011834, 0.000314, -0.000563, -0.011521, 0.003833, -0.000598, 0.00589, -0.00375, -0.010264, 0.009377, -0.001482, 0.00777, -0.003918, 0.00471, -0.003577, 0.004774, -0.00247, -0.004845, -0.008721, -0.000281, 0.005004, -0.001159, -0.013266)
  private val PcaPinnedEigen: Seq[Double] = Seq(
    0.027513, 0.027167, 0.026618, 0.025589, 0.025365, 0.025076, 0.023944, 0.023166)
  private val PcaPinnedComponents: Seq[Seq[Double]] = Seq(
    Seq(-0.209639, -0.120573, 0.036548, 0.01182, 0.07567, 0.013215, 0.090584, 0.286619, 0.049547, 0.414057, 0.065305, 0.182079, 0.065132, -0.036532, 0.171149, -0.18535, 0.08899, -0.157027, -0.030137, 0.032179, 0.061213, -0.110688, -0.083475, -0.055437, 0.01955, 0.199125, -0.037517, 0.149508, -0.17288, -0.006123, -0.058716, 0.062038, 0.296539, 0.106165, -0.032042, 0.104144, 0.044539, 0.061464, 0.013007, 0.021771, -0.116679, 0.005525, -0.240837, 0.095708, -0.028308, -0.225127, 0.008732, -0.079038, -0.083681, -0.118451, 0.120459, 0.072483, -0.017186, 0.081604, -0.015031, -0.066765, -0.055651, -0.051376, 0.060196, -0.091139, 0.121987, 0.05065, -0.218211, -0.102014),
    Seq(-0.003837, -0.05443, -0.012568, -0.088134, 0.174858, 0.025214, 0.074947, -0.069981, 0.077448, 0.030696, 0.105758, -0.017883, 0.012976, 0.133697, 0.014559, 0.041392, 0.148411, 0.36031, -0.054189, -0.050765, 0.032543, 0.035391, 0.065335, -0.309123, -0.257682, -0.239066, -0.020638, -0.000223, -0.086286, -0.174533, -0.024068, -0.217545, 0.029464, 0.061539, 0.033753, 0.07922, 0.059467, 0.036498, 0.182107, 0.046674, 9e-06, 0.046987, -0.062767, -0.17919, 0.172686, -0.188835, -0.046946, 0.145779, 0.112924, -0.113281, -0.157431, -0.081975, 0.01298, -0.016092, 0.238035, 0.023384, -0.30282, 0.016383, 0.135434, -0.121586, -0.08367, 0.084839, -0.000443, -0.078616))

  /** PCA serve from a PERSISTED matrix ([[ModelStore.savePca]] — the
    * lr_score_persisted treatment for linear algebra): the pinned
    * mean/top-2-component matrix is saved as a lake table, loaded back
    * (bit-identical binary64), and the projection runs from the LOADED
    * model — the serve path a fresh coordinator takes after a restart.
    * Coordinates are the left-associated centered dot product
    * ([[Projection.pcaCoordCols]]), so DuckDB replays them exactly from
    * the same literals. */
  val embedPcaPersisted: QueryFn = (s, dir) => {
    val store = graft.queries.Lake.scratchDir("llm_pca_model")
    ModelStore.savePca(s, store, Projection.PcaModel(
      PcaPinnedMean.toArray, PcaPinnedEigen.toArray,
      PcaPinnedComponents.map(_.toArray).toArray))
    val m = ModelStore.loadPca(s, store)
    val e = Tables.ensure(s, dir).embeddings.select(col("vec_id"), col("embedding"))
    val coords = Projection.pcaCoordCols(col("embedding"), m, 2)
    e.select(col("vec_id"),
        posexplode(array(coords.map(c => round(c, 6)): _*)))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "pc")
      .orderBy(col("vec_id"), col("j"))
  }

  /** The oracle rebuilds each coordinate from the SAME pinned constants:
    * `0.0 + (v[1]-m1)*w1 + ...` left-associated, matching the engine's
    * aggregate fold bit for bit. */
  val embedPcaPersistedSql: String = {
    val branches = PcaPinnedComponents.zipWithIndex.map { case (row, j) =>
      val terms = row.zip(PcaPinnedMean).zipWithIndex.map { case ((w, m), dim) =>
        s"(CAST(embedding[${dim + 1}] AS DOUBLE) - $m) * $w"
      }.mkString(" + ")
      s"SELECT vec_id, $j AS j, round(0.0 + $terms, 6) AS pc FROM embeddings"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY vec_id, j")
  }

  /** Johnson–Lindenstrauss random projection (no fit pass; hash-derived
    * deterministic planes shared with srp_sign64). Output is the exploded
    * (vec_id, coordinate j, value rounded to 6dp) relation so the DuckDB
    * oracle — which recomputes the SAME left-associated double dot
    * products from the SAME literal plane weights
    * ([[Projection.randomProjectWeights]] is a pure function of
    * (seed,k,d)) — hash-matches it exactly (r9 VERDICT #6: rows-only →
    * full oracle). */
  val embedRandomProject: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings.select(col("vec_id"), col("embedding"))
    val d = e.select(size(col("embedding"))).head().getInt(0)
    val coords = Projection.randomProjectCoords(col("embedding"), k = 16, d = d)
    e.select(col("vec_id"),
        posexplode(array(coords.map(c => round(c, 6)): _*)))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "rp")
      .orderBy(col("vec_id"), col("j"))
  }

  /** The oracle recomputes each coordinate as the literal-weighted
    * left-associated sum `0.0 + v[1]*w0 + v[2]*w1 + …` — identical
    * fold order and identical double literals (Double.toString
    * round-trips through DuckDB's decimal parser), so the doubles agree
    * bit-for-bit before the 6dp round. Fixture embeddings are d=64. */
  val embedRandomProjectSql: String = {
    val weights = Projection.randomProjectWeights(k = 16, d = 64)
    val branches = weights.zipWithIndex.map { case (row, j) =>
      val terms = row.zipWithIndex.map { case (w, dim) =>
        s"CAST(embedding[${dim + 1}] AS DOUBLE) * $w"
      }.mkString(" + ")
      s"SELECT vec_id, $j AS j, round(0.0 + $terms, 6) AS rp FROM embeddings"
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY vec_id, j")
  }

  /** Exact ANN baseline under a FULL oracle (r12): the double-precision
    * scoring path makes ids, ranks AND the cosine values bit-identical to
    * DuckDB's list_cosine_similarity — no margins argument needed. */
  val annBrute: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10,
        doublePrec = true)
      .orderBy(col("q_id"), col("rk"))
  }
  val annBruteSql: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
    s AS (SELECT q.q_id, e.vec_id AS c_id,
            list_cosine_similarity(q.qv, e.v) AS cos
          FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
    r AS (SELECT q_id, c_id, cos,
            row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, c_id) AS rk
          FROM s)
    SELECT q_id, c_id, cos, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** ANN result IDENTITY under a DuckDB oracle: the cosine VALUES diverge
    * between engines at ~1e-8 (different accumulation order), but the
    * neighbor ids and ranks are stable — adjacent-rank cosine gaps on the
    * fixture are ≥2e-4, four orders above the float divergence — so the
    * id/rank projection is hash-exact and the ANN semantics (who the
    * neighbors are, in what order) get a real oracle, not a rows-only
    * check. */
  val annTopkIds: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .select(col("q_id"), col("c_id"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  val annTopkIdsSql: String = """
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings),
    s AS (SELECT q_id, c_id,
            list_cosine_similarity(CAST(q_vec AS DOUBLE[]), CAST(c_vec AS DOUBLE[])) AS cos
          FROM c, q WHERE q_id <> c_id),
    r AS (SELECT q_id, c_id,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
    SELECT q_id, c_id, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** Binary-quantized ANN: sign-bit packing (32 dims per long word) +
    * integer Hamming ranking — ids, ranks AND distances are bit-exact in
    * both engines (no float argument needed; ties break by c_id). */
  val annBinaryHamming: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.binaryHammingTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .orderBy(col("q_id"), col("rk"))
  }
  val annBinaryHammingSql: String = """
    WITH e AS (SELECT vec_id,
      list_transform(generate_series(0, CAST(ceil(len(embedding)/32.0) AS BIGINT) - 1),
        w -> list_sum(list_transform(generate_series(w*32 + 1, least(w*32 + 32, len(embedding))),
          i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) << ((i-1) % 32))
               ELSE CAST(0 AS BIGINT) END))) AS bits
      FROM embeddings),
    q AS (SELECT vec_id AS q_id, bits AS qb FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS c_id, bits AS cb FROM e),
    s AS (SELECT q_id, c_id,
            CAST(list_sum(list_transform(generate_series(1, len(qb)),
              w -> bit_count(xor(qb[w], cb[w])))) AS INT) AS hamming
          FROM c, q WHERE q_id <> c_id),
    r AS (SELECT q_id, c_id, hamming,
            row_number() OVER (PARTITION BY q_id ORDER BY hamming, c_id) AS rk FROM s)
    SELECT q_id, c_id, hamming, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** Embedding near-dup identity under an oracle (same reasoning: the 0.4
    * threshold margin on the fixture is ≥1.7e-3, so membership is stable
    * across the engines' 1e-8 cosine divergence). */
  val dedupEmbeddingIds: QueryFn = (s, dir) =>
    Dedup.embeddingDups(Tables.ensure(s, dir).embeddings, threshold = 0.4)
      .select(col("a_id"), col("b_id"), col("label"))
      .orderBy(col("a_id"), col("b_id"))
  val dedupEmbeddingIdsSql: String = """
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    ORDER BY a_id, b_id"""

  // ----- in-order double-fold SQL fragments (DuckDB list_reduce IS a
  // strict left fold — unlike list_sum/list_inner_product, whose block
  // accumulation diverges from sequential IEEE addition at 1 ulp — so
  // these replay DotProduct/CosineSimilarityD bit-for-bit) -----
  private def drDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, len($a)), " +
      s"i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
  private def drNsq(a: String): String =
    s"list_reduce(list_prepend(0.0, list_transform($a, x -> x * x)), (acc, x) -> acc + x)"
  private def drCos(a: String, b: String): String =
    s"(CASE WHEN ${drNsq(a)} = 0.0 OR ${drNsq(b)} = 0.0 THEN 0.0 " +
      s"ELSE ${drDot(a, b)} / (sqrt(${drNsq(a)}) * sqrt(${drNsq(b)})) END)"

  /** Label-bucketed IVF ANN under a FULL oracle: double-precision scoring
    * (in-order accumulation) makes ids, ranks AND the cosines themselves
    * bit-identical to the DuckDB fold replay. */
  val annIvf: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), k = 10, doublePrec = true)
      .orderBy(col("q_id"), col("rk"))
  }
  val annIvfSql: String = s"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT label, vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
    s AS (SELECT q.label, q_id, e.vec_id AS c_id, ${drCos("q.qv", "e.v")} AS cos
          FROM e JOIN q USING (label) WHERE e.vec_id <> q.q_id),
    r AS (SELECT label, q_id, c_id, cos,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
    SELECT q_id, label, c_id, cos, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** PQ-compressed ANN under a FULL oracle (r13): the codebook is FIXED
    * to data slices — block b, centroid j = block b of the vector with
    * the j-th smallest id ([[Similarity.pqCodebookFixed]]) — and every
    * arithmetic step (|c|²−2x·c encode argmin, reconstruction, cosine)
    * runs as in-order IEEE-double folds, so DuckDB rebuilds the codebook
    * from the raw table and replays codes, reconstructions, cosines and
    * ranks bit-for-bit. m=8 blocks × 32 centroids: the corpus resides as
    * 8 codes instead of 64 floats — 32× compression, the billion-scale
    * IVF-PQ layout. The TRAINED-codebook path (k-means Lloyd) stays
    * pinned by recall floors + determinism in SimilaritySpec. */
  val annPq: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    val cb = Similarity.pqCodebookFixed(e, m = 8, ksub = 32)
    Similarity.pqTopK(e, e.filter(col("vec_id") < 5), k = 10, m = 8, ksub = 32,
      codebook0 = Some(cb), doublePrec = true)
      .orderBy(col("q_id"), col("rk"))
  }
  val annPqSql: String = {
    val bdot = "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8), " +
      "i -> ev.v[c.b*8 + i] * c.c[i])), (acc, x) -> acc + x)"
    s"""
    WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    blk AS (SELECT b FROM generate_series(0, 7) t(b)),
    cents AS (SELECT blk.b, CAST(e.vec_id AS INT) AS j,
                e.v[blk.b*8+1 : blk.b*8+8] AS c
              FROM ev e CROSS JOIN blk WHERE e.vec_id < 32),
    d AS (SELECT ev.vec_id, c.b, c.j, ${drNsq("c.c")} - 2.0 * $bdot AS dist
          FROM ev CROSS JOIN cents c),
    codes AS (SELECT vec_id, b, j FROM (
        SELECT vec_id, b, j,
          row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, j) AS rn FROM d) t
      WHERE rn = 1),
    rec AS (SELECT codes.vec_id, flatten(list(cents.c ORDER BY codes.b)) AS rv
            FROM codes JOIN cents ON cents.b = codes.b AND cents.j = codes.j
            GROUP BY codes.vec_id),
    q AS (SELECT vec_id AS q_id, v AS qv FROM ev WHERE vec_id < 5),
    s AS (SELECT q_id, r.vec_id AS c_id, ${drCos("q.qv", "r.rv")} AS cos
          FROM rec r CROSS JOIN q WHERE r.vec_id <> q.q_id),
    rk AS (SELECT q_id, c_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
    SELECT q_id, c_id, cos, CAST(rk AS INT) AS rk FROM rk WHERE rk <= 10
    ORDER BY q_id, rk"""
  }

  /** IVF-PQ with ADC scoring under a FULL oracle (r13): coarse centroids
    * FIXED to the 16 lowest-id vectors, PQ codebook FIXED to data slices,
    * coarse assignment in double-precision cosines — so bucket argmax,
    * probe sets, codes, the per-query LUTs, the ADC sums (sequential over
    * blocks, exactly [[graft.functions.Functions.pq_adc_dot]]'s loop) and
    * the final cosines all replay in DuckDB as in-order double folds. The
    * corpus crosses the bucket join as (bucket, 8 codes, |x̂|²) — no fp32
    * vectors — and each candidate scores in m lookups via the codegen'd
    * pq_adc_dot kernel. Trained path: SimilaritySpec. */
  /** ONE bounded fetch pins both oracle artifacts for the IVF-PQ family:
    * the 32 lowest-id vectors are the codebook seed, their first 16 the
    * coarse centroids. Shared by ann_ivf_pq and ann_ivf_pq_rerank so the
    * two queries can never drift from the shared oracle CTEs. */
  private def ivfPqPinned(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame,
         Option[Seq[Seq[Float]]], Option[Seq[Seq[Seq[Float]]]]) = {
    val e = Tables.ensure(s, dir).embeddings
    val seed = e.orderBy(col("vec_id")).limit(32)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    (e, Some(seed.take(16)),
      Some(Similarity.pqCodebookFromRows(seed, m = 8, ksub = 32)))
  }

  val annIvfPq: QueryFn = (s, dir) => {
    val (e, coarse, cb) = ivfPqPinned(s, dir)
    Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 5), k = 10,
      nClusters = 16, nProbe = 4, m = 8, ksub = 32,
      coarse0 = coarse, codebook0 = cb, doublePrec = true)
      .orderBy(col("q_id"), col("rk"))
  }
  /** Shared ADC pipeline CTEs for the IVF-PQ oracles, through the ranked
    * `rk` relation (ADC cosine, rank per query by cos desc then c_id). */
  private val ivfPqAdcCtes: String = {
    val bdot = "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8), " +
      "i -> ev.v[c.b*8 + i] * c.c[i])), (acc, x) -> acc + x)"
    val qbdot = "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 8), " +
      "i -> q.qv[c.b*8 + i] * c.c[i])), (acc, x) -> acc + x)"
    s"""
    WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    blk AS (SELECT b FROM generate_series(0, 7) t(b)),
    cents AS (SELECT blk.b, CAST(e.vec_id AS INT) AS j,
                e.v[blk.b*8+1 : blk.b*8+8] AS c,
                ${drNsq("e.v[blk.b*8+1 : blk.b*8+8]")} AS cn
              FROM ev e CROSS JOIN blk WHERE e.vec_id < 32),
    coarse AS (SELECT CAST(vec_id AS INT) AS bucket, v AS cv FROM ev WHERE vec_id < 16),
    casg AS (SELECT ev.vec_id, co.bucket,
               row_number() OVER (PARTITION BY ev.vec_id
                 ORDER BY ${drCos("ev.v", "co.cv")} DESC, co.bucket) AS rn
             FROM ev CROSS JOIN coarse co),
    cbk AS (SELECT vec_id, bucket FROM casg WHERE rn = 1),
    d AS (SELECT ev.vec_id, c.b, c.j, c.cn - 2.0 * $bdot AS dist
          FROM ev CROSS JOIN cents c),
    codes AS (SELECT vec_id, b, j FROM (
        SELECT vec_id, b, j,
          row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, j) AS rn FROM d) t
      WHERE rn = 1),
    xn AS (SELECT codes.vec_id,
             list_reduce(list_prepend(0.0, list(cents.cn ORDER BY codes.b)),
               (acc, x) -> acc + x) AS xnormsq
           FROM codes JOIN cents ON cents.b = codes.b AND cents.j = codes.j
           GROUP BY codes.vec_id),
    q AS (SELECT vec_id AS q_id, v AS qv, sqrt(${drNsq("v")}) AS qnorm
          FROM ev WHERE vec_id < 5),
    qp AS (SELECT q.q_id, co.bucket,
             row_number() OVER (PARTITION BY q.q_id
               ORDER BY ${drCos("q.qv", "co.cv")} DESC, co.bucket) AS rn
           FROM q CROSS JOIN coarse co),
    probe AS (SELECT q_id, bucket FROM qp WHERE rn <= 4),
    lut AS (SELECT q.q_id, c.b, c.j, $qbdot AS lv FROM q CROSS JOIN cents c),
    cand AS (SELECT DISTINCT p.q_id, cb2.vec_id AS c_id
             FROM probe p JOIN cbk cb2 ON cb2.bucket = p.bucket
             WHERE cb2.vec_id <> p.q_id),
    adc AS (SELECT cand.q_id, cand.c_id,
              list_reduce(list_prepend(0.0, list(lut.lv ORDER BY codes.b)),
                (acc, x) -> acc + x) AS adcv
            FROM cand JOIN codes ON codes.vec_id = cand.c_id
                      JOIN lut ON lut.q_id = cand.q_id AND lut.b = codes.b
                               AND lut.j = codes.j
            GROUP BY cand.q_id, cand.c_id),
    s AS (SELECT adc.q_id, adc.c_id,
            CASE WHEN q.qnorm = 0.0 OR xn.xnormsq <= 0.0 THEN 0.0
                 ELSE adc.adcv / (q.qnorm * sqrt(xn.xnormsq)) END AS cos
          FROM adc JOIN q ON q.q_id = adc.q_id JOIN xn ON xn.vec_id = adc.c_id),
    rk AS (SELECT q_id, c_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)"""
  }
  val annIvfPqSql: String = s"""$ivfPqAdcCtes
    SELECT q_id, c_id, cos, CAST(rk AS INT) AS rk FROM rk WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** Two-stage serve: ADC shortlist (k·refine = 40) re-ranked by the EXACT
    * double cosine over the raw vectors — same CTE pipeline, then the
    * refine join the Spark side performs. */
  val annIvfPqRerank: QueryFn = (s, dir) => {
    val (e, coarse, cb) = ivfPqPinned(s, dir)
    Similarity.ivfPqRerankTopK(e, e.filter(col("vec_id") < 5), k = 10,
      refine = 4, nClusters = 16, nProbe = 4, m = 8, ksub = 32,
      coarse0 = coarse, codebook0 = cb, doublePrec = true)
      .orderBy(col("q_id"), col("rk"))
  }
  val annIvfPqRerankSql: String = s"""$ivfPqAdcCtes,
    short AS (SELECT q_id, c_id FROM rk WHERE rk <= 40),
    ex AS (SELECT sh.q_id, sh.c_id, ${drCos("qe.v", "ce.v")} AS cos
           FROM short sh JOIN ev qe ON qe.vec_id = sh.q_id
                         JOIN ev ce ON ce.vec_id = sh.c_id),
    fr AS (SELECT q_id, c_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM ex)
    SELECT q_id, c_id, cos, CAST(rk AS INT) AS rk FROM fr WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** IVF bucket-restricted ANN identity under an oracle (adjacent-rank
    * gaps ≥1.6e-4 on the fixture — see annTopkIds). */
  val annIvfIds: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .select(col("q_id"), col("label"), col("c_id"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  val annIvfIdsSql: String = """
    WITH q AS (SELECT label, vec_id AS q_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT label, vec_id AS c_id, embedding AS c_vec FROM embeddings),
    s AS (SELECT q.label, q_id, c_id,
            list_cosine_similarity(CAST(q_vec AS DOUBLE[]), CAST(c_vec AS DOUBLE[])) AS cos
          FROM c JOIN q USING (label) WHERE q_id <> c_id),
    r AS (SELECT label, q_id, c_id,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
    SELECT q_id, label, c_id, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
    ORDER BY q_id, rk"""


  /** Data-quality expectations over the ingest corpus
    * ([[graft.operators.Expectations]] — the DLT EXPECT pattern): four
    * rules spanning all three actions; the metrics are ONE aggregate and
    * the quarantine split reuses the same codegen'd violation bitmap.
    * Every predicate is integer/regex/set logic both engines evaluate
    * identically, and pass_rate is one IEEE division of exact integer
    * operands — EXACT by construction. */
  private def expectationRules = Seq(
    graft.operators.Expectations.Rule("min_len",
      length(col("text")) >= 100, "drop"),
    graft.operators.Expectations.Rule("ends_sentence",
      col("text").rlike("[.!?]$"), "warn"),
    graft.operators.Expectations.Rule("lang_known",
      col("lang").isInCollection(Seq("en", "de", "fr", "es")), "drop"),
    graft.operators.Expectations.Rule("id_nonneg",
      col("doc_id") >= 0, "fail"))
  val qualityExpectations: QueryFn = (s, dir) =>
    graft.operators.Expectations
      .checkEnforced(Tables.ensure(s, dir).documents, expectationRules)
      .metrics.orderBy(col("rule"))
  val qualityExpectationsSql: String = """
    WITH v AS (
      SELECT
        count(*)::BIGINT AS total,
        count(*) FILTER (WHERE NOT coalesce(length(text) >= 100, false))::BIGINT AS v_min_len,
        count(*) FILTER (WHERE NOT coalesce(regexp_matches(text, '[.!?]$'), false))::BIGINT AS v_ends,
        count(*) FILTER (WHERE NOT coalesce(lang IN ('en','de','fr','es'), false))::BIGINT AS v_lang,
        count(*) FILTER (WHERE NOT coalesce(doc_id >= 0, false))::BIGINT AS v_id
      FROM documents)
    SELECT rule, action, violations, total AS "rows",
           (total - violations)::DOUBLE / total AS pass_rate
    FROM v, (VALUES
      ('min_len', 'drop'), ('ends_sentence', 'warn'),
      ('lang_known', 'drop'), ('id_nonneg', 'fail')) r(rule, action),
    LATERAL (SELECT CASE rule WHEN 'min_len' THEN v_min_len
                              WHEN 'ends_sentence' THEN v_ends
                              WHEN 'lang_known' THEN v_lang
                              ELSE v_id END AS violations)
    ORDER BY rule"""

  /** The quarantine side of the same gate: which rows, and WHY (the
    * violated-rule attribution, warn rules included for triage). */
  val qualityExpectationsQuarantine: QueryFn = (s, dir) =>
    graft.operators.Expectations
      .check(Tables.ensure(s, dir).documents, expectationRules)
      .quarantined
      .select(col("doc_id"),
        array_join(col("violated_rules"), ",").as("violated"))
      .orderBy(col("doc_id"))
  val qualityExpectationsQuarantineSql: String = """
    WITH f AS (
      SELECT doc_id,
        NOT coalesce(length(text) >= 100, false) AS v1,
        NOT coalesce(regexp_matches(text, '[.!?]$'), false) AS v2,
        NOT coalesce(lang IN ('en','de','fr','es'), false) AS v3,
        NOT coalesce(doc_id >= 0, false) AS v4
      FROM documents)
    SELECT doc_id,
      array_to_string(list_filter([
        CASE WHEN v1 THEN 'min_len' END,
        CASE WHEN v2 THEN 'ends_sentence' END,
        CASE WHEN v3 THEN 'lang_known' END,
        CASE WHEN v4 THEN 'id_nonneg' END], x -> x IS NOT NULL), ',') AS violated
    FROM f WHERE v1 OR v3 OR v4
    ORDER BY doc_id"""

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

  /** BM25 top-k lexical retrieval (Retrieval.bm25TopK) over four fixed
    * keyword queries in the corpus vocabulary. The oracle recomputes tf,
    * doc length, document frequency, the Lucene idf, and the rank — so
    * the whole scorer, not just the output shape, is hash-gated. Scores
    * round to 6dp BEFORE ranking on both engines; ties break on doc_id. */
  /** Shared retrieval seed set: 4 keyword queries whose ids double as the
    * seed DOCUMENT ids for the dense half of hybrid search. */
  private val retrievalSeeds = Seq(
    0 -> "hash join table", 1 -> "window agg batch",
    2 -> "fast scan filter", 3 -> "customer query line value")

  val bm25Search: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    Retrieval.bm25TopK(docs, retrievalSeeds, k = 10)
  }
  /** BM25 served from the PERSISTED inverted index ([[TextIndex]] —
    * build-once/serve-many; probed term buckets fold into a static
    * IN-filter so the postings scan is partition-pruned). The oracle
    * recomputes the same ranking from the raw corpus: Spark must
    * round-trip tf/dl/df/N/avgdl through the on-disk tables exactly. */
  val bm25IndexSearch: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val idx = graft.queries.Lake.scratchDir("llm_text_index")
    TextIndex.build(docs, idx, nBuckets = 16)
    TextIndex.search(s, idx,
      Seq(0 -> "hash join table", 1 -> "window agg batch"), k = 10)
      .select(col("q_id"), col("doc_id"), col("bm25"), col("rk"))
  }
  val bm25IndexSearchSql: String = """
    WITH toks AS (
      SELECT doc_id, unnest(
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS w
      FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    totals AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
    q(q_id, q_text) AS (VALUES (0, 'hash join table'), (1, 'window agg batch')),
    qt AS (SELECT DISTINCT q_id, unnest(
        list_filter(string_split_regex(lower(q_text), '\s+'), w -> len(w) > 0)) AS w
      FROM q),
    dft AS (
      SELECT w, COUNT(*) AS df FROM tf
      WHERE w IN (SELECT w FROM qt) GROUP BY w),
    scored AS (
      SELECT qt.q_id, tf.doc_id,
        round(SUM(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
                  (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
      FROM tf JOIN qt USING (w) JOIN dft USING (w) JOIN dl USING (doc_id), totals
      GROUP BY qt.q_id, tf.doc_id),
    ranked AS (SELECT *, row_number() OVER
        (PARTITION BY q_id ORDER BY bm25 DESC, doc_id) AS rn FROM scored)
    SELECT q_id, doc_id, bm25, CAST(rn AS INT) AS rk FROM ranked WHERE rn <= 10
    ORDER BY q_id, bm25 DESC, doc_id"""

  val bm25SearchSql: String = """
    WITH toks AS (
      SELECT doc_id, unnest(
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS w
      FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    totals AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
    q(q_id, q_text) AS (VALUES
      (0, 'hash join table'), (1, 'window agg batch'),
      (2, 'fast scan filter'), (3, 'customer query line value')),
    qt AS (SELECT DISTINCT q_id, unnest(
        list_filter(string_split_regex(lower(q_text), '\s+'), w -> len(w) > 0)) AS w
      FROM q),
    dft AS (
      SELECT w, COUNT(*) AS df FROM tf
      WHERE w IN (SELECT w FROM qt) GROUP BY w),
    scored AS (
      SELECT qt.q_id, tf.doc_id,
        round(SUM(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
                  (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
      FROM tf JOIN qt USING (w) JOIN dft USING (w) JOIN dl USING (doc_id), totals
      GROUP BY qt.q_id, tf.doc_id),
    ranked AS (SELECT *, row_number() OVER
        (PARTITION BY q_id ORDER BY bm25 DESC, doc_id) AS rn FROM scored)
    SELECT q_id, doc_id, bm25 FROM ranked WHERE rn <= 10
    ORDER BY q_id, bm25 DESC, doc_id"""

  /** The lexical-candidate CTE chain shared by the hybrid-retrieval
    * oracles: BM25 over `documents` for the 4 seed queries, ranked, pool
    * of 50 (mirrors `Retrieval.bm25Ranked`). */
  private val lexPoolCtes: String = """
    toks AS (
      SELECT doc_id, unnest(
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS w
      FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    totals AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
    q(q_id, q_text) AS (VALUES
      (0, 'hash join table'), (1, 'window agg batch'),
      (2, 'fast scan filter'), (3, 'customer query line value')),
    qt AS (SELECT DISTINCT q_id, unnest(
        list_filter(string_split_regex(lower(q_text), '\s+'), w -> len(w) > 0)) AS w
      FROM q),
    dft AS (
      SELECT w, COUNT(*) AS df FROM tf
      WHERE w IN (SELECT w FROM qt) GROUP BY w),
    lscored AS (
      SELECT qt.q_id, tf.doc_id,
        round(SUM(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
                  (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
      FROM tf JOIN qt USING (w) JOIN dft USING (w) JOIN dl USING (doc_id), totals
      GROUP BY qt.q_id, tf.doc_id),
    lexr AS (SELECT q_id, doc_id, CAST(row_number() OVER
        (PARTITION BY q_id ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rk FROM lscored),
    lex AS (SELECT * FROM lexr WHERE lex_rk <= 50)"""

  /** Dense-candidate CTE chain: cosine top-50 of each seed document's
    * embedding (vec_id ≡ doc_id; mirrors `Retrieval.denseRanked`). */
  private val densePoolCtes: String = """
    qe AS (SELECT CAST(vec_id AS INT) AS q_id, embedding AS qv
           FROM embeddings WHERE vec_id < 4),
    ds AS (SELECT q_id, vec_id AS doc_id,
             list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS cos
           FROM embeddings, qe WHERE vec_id <> q_id),
    dsr AS (SELECT q_id, doc_id, CAST(row_number() OVER
        (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS INT) AS dense_rk FROM ds),
    dense AS (SELECT q_id, doc_id, dense_rk FROM dsr WHERE dense_rk <= 50)"""

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 and dense-cosine
    * candidate lists of 4 seed docs (ids double as keyword queries and as
    * dense query vectors) — rrf ranked on the unrounded fused score,
    * reported at 6dp. */
  val hybridRrf: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    Retrieval.hybridRrfTopK(t.documents, t.embeddings, retrievalSeeds, k = 10)
  }
  val hybridRrfSql: String = s"""
    WITH $lexPoolCtes, $densePoolCtes,
    fused AS (
      SELECT coalesce(lex.q_id, dense.q_id) AS q_id,
             coalesce(lex.doc_id, dense.doc_id) AS doc_id,
             lex.lex_rk, dense.dense_rk,
             coalesce(1.0 / (60 + lex.lex_rk), 0) +
             coalesce(1.0 / (60 + dense.dense_rk), 0) AS rrf_raw
      FROM lex FULL JOIN dense
        ON lex.q_id = dense.q_id AND lex.doc_id = dense.doc_id),
    rr AS (SELECT *, row_number() OVER
        (PARTITION BY q_id ORDER BY rrf_raw DESC, doc_id) AS rn FROM fused)
    SELECT q_id, doc_id, lex_rk, dense_rk, round(rrf_raw, 6) AS rrf
    FROM rr WHERE rn <= 10
    ORDER BY q_id, rrf_raw DESC, doc_id"""

  /** DPR-style hard negatives: lexically top-ranked docs absent from the
    * dense candidate pool — the training negatives a retriever learns the
    * most from. */
  val retrievalHardNegatives: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    Retrieval.hardNegatives(t.documents, t.embeddings, retrievalSeeds, k = 10)
  }
  val retrievalHardNegativesSql: String = s"""
    WITH $lexPoolCtes, $densePoolCtes,
    neg AS (
      SELECT lex.* FROM lex
      WHERE NOT EXISTS (SELECT 1 FROM dense
        WHERE dense.q_id = lex.q_id AND dense.doc_id = lex.doc_id)),
    rr AS (SELECT *, row_number() OVER
        (PARTITION BY q_id ORDER BY lex_rk, doc_id) AS rn FROM neg)
    SELECT q_id, doc_id, lex_rk FROM rr WHERE rn <= 10
    ORDER BY q_id, lex_rk, doc_id"""

  /** MMR diversified re-ranking under a full identity oracle: DuckDB
    * replays the greedy λ·rel − (1−λ)·max-sim selection as a recursive
    * CTE carrying the chosen set per query (6dp-rounded argmax, c_id
    * ties — winner-vs-runner-up margins on the fixture are ≥5.6e-4, four
    * orders above cross-engine cosine divergence). */
  val retrievalMmr: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Retrieval.mmrDiversify(e, Seq(0, 1, 2), k = 8, poolK = 20, lambda = 0.7)
      .orderBy(col("q_id"), col("rk"))
  }
  val retrievalMmrSql: String = """
    WITH RECURSIVE
    cand0 AS (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS rel,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id) AS rk
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 3 AND q.vec_id <> c.vec_id),
    cand AS (SELECT q_id, c_id, rel FROM cand0 WHERE rk <= 20),
    psim AS (
      SELECT a.q_id, a.c_id AS a_id, b.c_id AS b_id,
             list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])) AS sim
      FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.c_id <> b.c_id
      JOIN embeddings ea ON ea.vec_id = a.c_id
      JOIN embeddings eb ON eb.vec_id = b.c_id),
    sel(q_id, step, chosen) AS (
      SELECT q_id, 1, [c_id] FROM cand0 WHERE rk = 1
      UNION ALL
      SELECT q_id, step + 1, list_append(chosen, pick)
      FROM (
        SELECT g.q_id, g.step, g.chosen, g.c_id AS pick,
               row_number() OVER (PARTITION BY g.q_id
                                  ORDER BY g.score DESC, g.c_id) AS rn
        FROM (
          SELECT s.q_id, s.step, s.chosen, c.c_id,
                 round(0.7 * any_value(c.rel) - 0.3 * max(p.sim), 6) AS score
          FROM sel s
          JOIN cand c ON c.q_id = s.q_id AND NOT list_contains(s.chosen, c.c_id)
          JOIN psim p ON p.q_id = s.q_id AND p.a_id = c.c_id
                     AND list_contains(s.chosen, p.b_id)
          WHERE s.step < 8
          GROUP BY s.q_id, s.step, s.chosen, c.c_id
        ) g
      ) x WHERE rn = 1)
    SELECT q_id, chosen[rk] AS c_id, CAST(rk AS INT) AS rk
    FROM sel, generate_series(1, 8) AS t(rk)
    WHERE step = 8
    ORDER BY q_id, rk"""

  /** Within-document line dedup (TextAnalysis.dedupLinesInDoc). The
    * fixture corpus has no naturally repeated lines, so the query doctors
    * it deterministically (same expressions both engines): ' value '
    * becomes a line break, then the doc's own first line and a doubled
    * nav line are appended — every doc has true intra-doc duplicates and
    * the rebuilt text's md5 is hash-gated. */
  val textLineDedup: QueryFn = (s, dir) => {
    val base = Tables.ensure(s, dir).documents.filter(col("doc_id") < 500)
    val t = expr("replace(text, ' value ', chr(10))")
    val doctored = base.select(col("doc_id"),
      concat(t, lit("\n"), substring_index(t, "\n", 1),
        lit("\nnav menu\nnav menu")).as("text"))
    TextAnalysis.dedupLinesInDoc(doctored).orderBy(col("doc_id"))
  }
  val textLineDedupSql: String = """
    WITH d AS (
      SELECT doc_id,
        replace(text, ' value ', chr(10)) || chr(10) ||
        split_part(replace(text, ' value ', chr(10)), chr(10), 1) ||
        chr(10) || 'nav menu' || chr(10) || 'nav menu' AS text
      FROM documents WHERE doc_id < 500),
    l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM d),
    k AS (SELECT doc_id, lines,
            list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
          FROM l)
    SELECT doc_id,
      CAST(len(lines) AS INT) AS n_lines,
      CAST(len(kept) AS INT) AS n_kept,
      CAST(len(array_to_string(kept, chr(10))) AS INT) AS clean_chars,
      md5(array_to_string(kept, chr(10))) AS clean_md5
    FROM k ORDER BY doc_id"""

  /** C4 cleaning gate (TextAnalysis.c4Rules — arXiv:1910.10683 §2.2).
    * The fixture corpus is single-line and unpunctuated, so the query
    * first DOCTORS it deterministically (same expressions on both
    * engines): ' value ' becomes a sentence break + newline, and
    * doc_id-keyed suffixes inject javascript lines, curly braces, and
    * lorem ipsum so every rule fires on some docs and not others. */
  val textC4Rules: QueryFn = (s, dir) => {
    val base = Tables.ensure(s, dir).documents.filter(col("doc_id") < 500)
    val doctored = base.select(col("doc_id"), concat(
      expr("replace(text, ' value ', concat('.', chr(10)))"),
      when(col("doc_id") % 5 === 0, lit("\nuses javascript here.")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit("\ncode { x }")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit("\nLorem Ipsum dolor sit.")).otherwise(lit("")),
      lit("\nshort line\nthis line ends properly.")).as("text"))
    TextAnalysis.c4Rules(doctored, minLineWords = 3, minSentences = 3)
      .orderBy(col("doc_id"))
  }
  val textC4RulesSql: String = """
    WITH d AS (
      SELECT doc_id,
        replace(text, ' value ', '.' || chr(10)) ||
        CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'uses javascript here.' ELSE '' END ||
        CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'code { x }' ELSE '' END ||
        CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Lorem Ipsum dolor sit.' ELSE '' END ||
        chr(10) || 'short line' || chr(10) || 'this line ends properly.' AS text
      FROM documents WHERE doc_id < 500),
    l AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM d),
    k AS (SELECT doc_id, text, lines,
        list_filter(lines, x -> regexp_matches(trim(x), '[.!?"]$')
          AND len(string_split_regex(trim(x), '\s+')) >= 3
          AND NOT contains(lower(x), 'javascript')) AS kept
      FROM l),
    c AS (SELECT doc_id, text, lines, kept,
        array_to_string(kept, chr(10)) AS cleaned FROM k)
    SELECT doc_id,
      CAST(len(lines) AS INT) AS n_lines,
      CAST(len(kept) AS INT) AS n_lines_kept,
      CAST(length(regexp_replace(cleaned, '[^.!?]', '', 'g')) AS INT) AS n_sentences,
      contains(lower(text), 'lorem ipsum') AS has_lorem,
      contains(text, '{') AS has_brace,
      (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
        AND length(regexp_replace(cleaned, '[^.!?]', '', 'g')) >= 3) AS page_keep,
      md5(cleaned) AS clean_md5,
      CAST(length(cleaned) AS INT) AS clean_len
    FROM c ORDER BY doc_id"""

  /** Gopher rule gate (TextAnalysis.gopherRules — arXiv:2112.11446 App. A)
    * with fixture-sized thresholds so both verdicts appear; DuckDB
    * recomputes every signal from the same rules. */
  val qualityGopher: QueryFn = (s, dir) =>
    TextAnalysis.gopherRules(
        Tables.ensure(s, dir).documents.filter(col("doc_id") < 500),
        minWords = 10, minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
        minAlphaFrac = 0.8, minStopwords = 1)
      .orderBy(col("doc_id"))
  val qualityGopherSql: String = """
    WITH t AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS toks,
        string_split(text, chr(10)) AS lines
      FROM documents WHERE doc_id < 500)
    SELECT doc_id,
      CAST(len(toks) AS INT) AS n_words,
      CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / len(toks) AS mean_word_len,
      (length(regexp_replace(text, '[^#]', '', 'g')) +
        (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3) / len(toks) AS symbol_ratio,
      CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR
        starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS DOUBLE) / len(lines) AS bullet_frac,
      CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...') OR
        ends_with(rtrim(l), '…'))) AS DOUBLE) / len(lines) AS ellipsis_frac,
      CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(toks) AS alpha_frac,
      CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        sw -> list_contains(toks, sw))) AS INT) AS n_stop_hits,
      (len(toks) >= 10 AND len(toks) <= 100000 AND
        CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / len(toks) >= 3.0 AND
        CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / len(toks) <= 10.0 AND
        (length(regexp_replace(text, '[^#]', '', 'g')) +
          (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3) / len(toks) <= 0.1 AND
        CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '-') OR
          starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•'))) AS DOUBLE) / len(lines) <= 0.9 AND
        CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...') OR
          ends_with(rtrim(l), '…'))) AS DOUBLE) / len(lines) <= 0.3 AND
        CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(toks) >= 0.8 AND
        len(list_filter(['the','be','to','of','and','that','have','with'],
          sw -> list_contains(toks, sw))) >= 1) AS pass
    FROM t ORDER BY doc_id"""

  /** URL-filter stage over deterministically synthesized URLs (the fixture
    * has no url column; host/domain/depth/blocklist semantics are what's
    * under test, and DuckDB recomputes all of them from the same urls). */
  /** CONTAINS / lucene_match over the corpus (reference `SqlContains` +
    * `lucene.ftl` — the Lucene query-string predicate; here evaluated
    * natively, a codegen'd map-only filter). Exercises field scoping over
    * a struct, prefix wildcard, sloppy phrase, NOT, fuzzy, range — every
    * piece replayed exactly by DuckDB over the same analyzer
    * (`regexp_split_to_array(lower(text), '[^a-z0-9]+')`). */
  val luceneContains: QueryFn = (s, dir) => {
    import graft.functions.{Functions => F}
    Tables.ensure(s, dir).documents
      .where(F.lucene_match(struct(col("text"), col("lang")),
        "lang:en AND (text:scan* OR text:\"hash join\"~1) AND NOT text:vector"))
      .select(col("doc_id"),
        F.lucene_match(col("text"), "\"merge join\"~2").as("near_phrase"),
        F.lucene_match(col("text"), "vektor~1").as("fuzzy_hit"),
        F.lucene_match(col("text"), "[wind TO windz]").as("range_hit"))
      .orderBy(col("doc_id"))
  }
  val luceneContainsSql: String = """
    WITH t AS (
      SELECT doc_id, lang,
        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x <> '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id, lang, toks,
        len(list_filter(range(1, len(toks) + 1), i ->
          toks[i] = 'hash' AND ((i + 1 <= len(toks) AND toks[i+1] = 'join')
            OR (i + 2 <= len(toks) AND toks[i+2] = 'join')))) > 0 AS hash_join_1,
        len(list_filter(toks, x -> x LIKE 'scan%')) > 0 AS scan_pre,
        list_contains(toks, 'vector') AS has_vector
      FROM t
    )
    SELECT doc_id,
      len(list_filter(range(1, len(toks) + 1), i ->
        toks[i] = 'merge' AND ((i + 1 <= len(toks) AND toks[i+1] = 'join')
          OR (i + 2 <= len(toks) AND toks[i+2] = 'join')
          OR (i + 3 <= len(toks) AND toks[i+3] = 'join')))) > 0 AS near_phrase,
      len(list_filter(toks, x ->
        damerau_levenshtein(x, 'vektor') <= 1)) > 0 AS fuzzy_hit,
      len(list_filter(toks, x -> x >= 'wind' AND x <= 'windz')) > 0 AS range_hit
    FROM m
    WHERE lang = 'en' AND (scan_pre OR hash_join_1) AND NOT has_vector
    ORDER BY doc_id"""

  /** Blocklist scan via the Aho–Corasick expression ([[graft.functions
    * .PhraseHits]]): every phrase of a literal list matched in ONE
    * automaton pass per document — O(text + hits) regardless of phrase
    * count, where OR'ed LIKEs are O(text × phrases). Map-only, stays in
    * whole-stage codegen via the reference-object kernel. DuckDB replays
    * with per-phrase position() containment — exact. */
  val blocklistPhrases: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val phrases = Seq("scan slow", "table part", "merge batch",
      "hash value", "value table part", "a a the")
    docs.select(col("doc_id"),
        graft.functions.Functions.phrase_hits(col("text"), phrases).as("h"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("h")).cast("long").as("n_hits"),
        org.apache.spark.sql.functions.array_join(col("h"), ",").as("hits_csv"))
      .orderBy(col("doc_id"))
  }
  val blocklistPhrasesSql: String = """
    WITH p(ph, ord) AS (VALUES
      ('scan slow', 1), ('table part', 2), ('merge batch', 3),
      ('hash value', 4), ('value table part', 5), ('a a the', 6))
    SELECT d.doc_id,
           count(p.ph) AS n_hits,
           coalesce(string_agg(p.ph, ',' ORDER BY p.ord), '') AS hits_csv
    FROM documents d
    LEFT JOIN p ON position(p.ph IN d.text) > 0
    GROUP BY d.doc_id ORDER BY d.doc_id"""

  val urlFilter: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val withUrl = docs.select(col("doc_id"), expr(
      "concat('https://', " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END, " +
        "source, " +
        "CASE CAST(doc_id % 2 AS INT) WHEN 0 THEN '.example.com' ELSE '.example.org' END, " +
        "'/', lang, '/p/', CAST(doc_id AS STRING))").as("url"))
    TextAnalysis.urlSignals(withUrl,
        blocklist = Seq("example.org", "cdn.src3.example.com"))
      .select(col("doc_id"), col("host"), col("registrable_domain"),
        col("path_depth"), col("blocked"))
      .orderBy(col("doc_id"))
  }
  val urlFilterSql: String = """
    WITH u AS (
      SELECT doc_id,
        concat('https://',
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END,
          source,
          CASE CAST(doc_id % 2 AS INT) WHEN 0 THEN '.example.com' ELSE '.example.org' END,
          '/', lang, '/p/', CAST(doc_id AS VARCHAR)) AS url
      FROM documents),
    h AS (SELECT doc_id, url,
            lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) AS host
          FROM u)
    SELECT doc_id, host,
      regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS registrable_domain,
      CAST(len(list_filter(string_split(
        regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1), '/'),
        x -> x <> '')) AS INT) AS path_depth,
      (host = 'example.org' OR host LIKE '%.example.org'
       OR host = 'cdn.src3.example.com' OR host LIKE '%.cdn.src3.example.com')
        AS blocked
    FROM h ORDER BY doc_id"""

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

  /** Standalone n-gram Jaccard dedup, oracle-verified: shingles are raw
    * 3-word strings (not engine hashes) built identically in both engines;
    * candidate pairing is bucket-local ((lang, length-bucket)) so the pair
    * space stays bounded; doc range capped for the oracle's nested-loop
    * containment check. */
  /** Bucket-local raw-3-gram Jaccard pairs over doc_id < 500 (shared by
    * the standalone pair query and the connected-components grouping). */
  /** (doc_id, lang, bucket, grams): distinct raw 3-word shingles plus the
    * (lang, length-bucket) locality key shared by the exact-Jaccard pair
    * queries — candidate pairing stays bucket-local so the pair space is
    * bounded. */
  private def gramSets(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("lang"),
      expr("n_chars div 50").as("bucket"),
      // native tokenize-once n-gram kernel — the lambda/element_at form
      // re-tokenizes per gram, O(tokens²) per doc (WordNgrams scaladoc)
      graft.functions.Functions.word_ngrams(col("text"), 3).as("grams"))

  private def ngramJaccardPairs(docs: org.apache.spark.sql.DataFrame,
                                threshold: Double): org.apache.spark.sql.DataFrame = {
    val d = gramSets(docs)
    val a = d.select(col("lang"), col("bucket"), col("doc_id").as("a_id"), col("grams").as("a_grams"))
    val b = d.select(col("lang"), col("bucket"), col("doc_id").as("b_id"), col("grams").as("b_grams"))
    val inter = size(array_intersect(col("a_grams"), col("b_grams")))
    a.join(b, Seq("lang", "bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("a_grams")) + size(col("b_grams")) - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  val dedupNgramJaccard: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 500)
    ngramJaccardPairs(docs, 0.5).orderBy(col("a_id"), col("b_id"))
  }
  val dedupNgramJaccardSql: String = """
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    d AS (
      SELECT doc_id, lang, n_chars // 50 AS bucket,
        list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
          ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS grams
      FROM toks)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
        / (len(a.grams) + len(b.grams)
           - len(list_filter(a.grams, g -> list_contains(b.grams, g)))) AS jaccard
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
        / (len(a.grams) + len(b.grams)
           - len(list_filter(a.grams, g -> list_contains(b.grams, g)))) >= 0.5
    ORDER BY a_id, b_id"""

  /** Duplicate GROUPS from pairs (the post-LSH step of a real dedup
    * pipeline): transitive closure over Jaccard pairs via distributed
    * label propagation; component = min doc_id reachable. The oracle
    * reproduces it with a recursive CTE, so the grouping semantics —
    * not just the pairs — are hash-gated. Threshold 0.3 admits enough
    * pairs that real multi-hop chains exist on the fixture. */
  val dedupComponents: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 500)
    val pairs = ngramJaccardPairs(docs, 0.3).select(col("a_id"), col("b_id"))
    val out = Dedup.connectedComponents(docs.select(col("doc_id")), pairs)
      .select(col("id").as("doc_id"), col("component"))
      .orderBy(col("doc_id"))
    out
  }
  val dedupComponentsSql: String = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, n_chars,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    d AS (
      SELECT doc_id, lang, n_chars // 50 AS bucket,
        list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
          ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS grams
      FROM toks),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
          / (len(a.grams) + len(b.grams)
             - len(list_filter(a.grams, g -> list_contains(b.grams, g)))) >= 0.3),
    edges AS (SELECT a_id AS s, b_id AS t FROM pairs
              UNION SELECT b_id, a_id FROM pairs),
    reach(s, t) AS (
      SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
      UNION
      SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s)
    SELECT s AS doc_id, MIN(t) AS component FROM reach GROUP BY s
    ORDER BY doc_id"""

  val textLangid: QueryFn = (s, dir) =>
    TextAnalysis.languageId(Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))
  /** Deterministic stopword-profile argmax, reproduced in DuckDB: a struct
    * (score, lang) per profile, sorted DESC (struct comparison = score then
    * lang, identical to Spark's greatest()), first element wins. */
  val textLangidSql: String = """
    WITH toks AS (
      SELECT doc_id, lang,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    scored AS (
      SELECT doc_id, lang, list_sort([
        {'score': CAST(len(list_filter(t, w -> list_contains(['der','die','und','das','von','zu','mit','den','im','ein'], w))) AS INT), 'lang': 'de'},
        {'score': CAST(len(list_filter(t, w -> list_contains(['the','a','an','of','and','or','to','in','is','it','for','on','with','as','at','by','from','that','this'], w))) AS INT), 'lang': 'en'},
        {'score': CAST(len(list_filter(t, w -> list_contains(['el','la','de','que','y','en','un','los','se','del'], w))) AS INT), 'lang': 'es'},
        {'score': CAST(len(list_filter(t, w -> list_contains(['le','la','de','et','les','des','en','un','du','une'], w))) AS INT), 'lang': 'fr'},
        {'score': CAST(len(list_filter(t, w -> list_contains(['de','shi','le','wo','ni','ta','men','zai','you','he'], w))) AS INT), 'lang': 'zh'}
        ], 'DESC')[1] AS best
      FROM toks)
    SELECT doc_id, lang AS labeled_lang, best.lang AS predicted_lang, best.score AS score
    FROM scored ORDER BY doc_id"""

  /** Stratified deterministic sampling (training-data mixing): upsample
    * English (every 3rd doc), downsample everything else (every 7th) —
    * membership is a pure function of per-stratum rank, so DuckDB
    * reproduces the exact mix. */
  val sampleStratified: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    Mixing.stratifiedEveryNth(docs, "lang", "doc_id",
      Map("en" -> 3), defaultEvery = 7)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }
  val sampleStratifiedSql: String = """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang FROM r
    WHERE (rn - 1) % (CASE WHEN lang = 'en' THEN 3 ELSE 7 END) = 0
    ORDER BY doc_id"""

  /** Temperature-weighted source mixing (α=0.5, the multilingual-BERT/mT5
    * convention): per-source targets t_s ∝ √n_s scaled to a 2500-row
    * budget, members picked by exact integer systematic selection — the
    * whole mix is a pure function of the source counts, so DuckDB
    * reproduces it row-for-row (IEEE sqrt is correctly rounded; the
    * survival test is a decimal/hugeint modulo). */
  val mixTemperature: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    Mixing.temperatureMix(docs, "source", "doc_id", totalOut = 2500, alpha = 0.5)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }
  val mixTemperatureSql: String = """
    WITH stats AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT sum(sqrt(n) ORDER BY source) AS sw FROM stats),
    tgt AS (SELECT source, n,
                   LEAST(n, GREATEST(1, CAST(round(2500 * sqrt(n) / sw) AS BIGINT))) AS t
            FROM stats, tot),
    ranked AS (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
               FROM documents)
    SELECT k.doc_id, k.source
    FROM ranked k JOIN tgt g USING (source)
    WHERE (CAST(k.r AS HUGEINT) * g.t) % g.n < g.t
    ORDER BY doc_id"""

  /** End-to-end corpus curation — the composed pipeline a pre-training
    * run actually executes: quality gate (token count + digit ratio) ∧
    * exact-dup canonical keeper, in one plan. Each stage is an existing
    * operator; the composition itself is hash-gated against DuckDB
    * running the same three stages. */
  val corpusCuration: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val quality = TextAnalysis.qualitySignals(docs)
      .select(col("doc_id"), col("n_tokens"), col("digit_ratio"))
    val keepers = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    docs.join(quality, "doc_id").join(keepers, "doc_id")
      .filter(col("n_tokens") >= 10 && col("digit_ratio") <= 0.3)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }
  val corpusCurationSql: String = """
    WITH q AS (
      SELECT doc_id, lang,
        len(list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS n_tokens,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
          / length(text) AS digit_ratio
      FROM documents),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
    SELECT q.doc_id, q.lang, CAST(q.n_tokens AS INT) AS n_tokens
    FROM q JOIN keepers USING (doc_id)
    WHERE n_tokens >= 10 AND digit_ratio <= 0.3
    ORDER BY doc_id"""

  /** The curation FUNNEL report — per-stage drop attribution, the
    * ablation bookkeeping every data team builds NEXT to the pipeline
    * (`corpus_curation` emits the survivors; this explains the rest):
    * per language, how many documents entered, how many each stage
    * removed, how many survived. Attribution convention: the EARLIEST
    * failing stage owns the drop (a duplicate that also fails quality
    * counts as a quality drop) — fixed order, so the numbers add up. */
  val corpusFunnel: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val quality = TextAnalysis.qualitySignals(docs)
      .select(col("doc_id"), col("n_tokens"), col("digit_ratio"))
    val keepers = Dedup.exact(docs)
      .select(col("keep_id").as("doc_id"), lit(true).as("is_canonical"))
    val staged = docs.join(quality, "doc_id")
      .join(keepers, Seq("doc_id"), "left")
      .withColumn("verdict",
        when(!(col("n_tokens") >= 10 && col("digit_ratio") <= 0.3),
          "fail_quality")
          .when(!coalesce(col("is_canonical"), lit(false)), "dup_dropped")
          .otherwise("kept"))
    staged.groupBy(col("lang")).agg(
        count(lit(1)).as("n_input"),
        sum(when(col("verdict") === "fail_quality", 1L).otherwise(0L))
          .as("n_fail_quality"),
        sum(when(col("verdict") === "dup_dropped", 1L).otherwise(0L))
          .as("n_dup_dropped"),
        sum(when(col("verdict") === "kept", 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }
  val corpusFunnelSql: String = """
    WITH q AS (
      SELECT doc_id, lang, text,
        len(list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS n_tokens,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
          / length(text) AS digit_ratio
      FROM documents),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    staged AS (
      SELECT q.lang,
        CASE WHEN NOT (q.n_tokens >= 10 AND q.digit_ratio <= 0.3)
               THEN 'fail_quality'
             WHEN k.doc_id IS NULL THEN 'dup_dropped'
             ELSE 'kept' END AS verdict
      FROM q LEFT JOIN keepers k USING (doc_id))
    SELECT lang, COUNT(*) AS n_input,
      CAST(sum(CASE WHEN verdict = 'fail_quality' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_fail_quality,
      CAST(sum(CASE WHEN verdict = 'dup_dropped' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_dup_dropped,
      CAST(sum(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM staged GROUP BY lang ORDER BY lang"""

  /** Benchmark decontamination: eval set = every 97th doc; training docs
    * sharing >= 5 distinct 3-grams with any eval doc are dropped. */
  val decontaminate: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    Decontaminate.clean(train, evalSet, n = 3, minShared = 5)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }
  val decontaminateSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        ELSE list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS gram
      FROM toks),
    eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    shared AS (
      SELECT g.doc_id, COUNT(*) AS n FROM g JOIN eg USING (gram)
      WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id)
    SELECT d.doc_id, d.lang
    FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
    WHERE d.doc_id % 97 <> 0 AND COALESCE(s.n, 0) < 5
    ORDER BY d.doc_id"""

  /** Sequence packing into 2048-token bins per language stratum. */
  val packSequences: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val d = docs.select(col("doc_id"), col("lang"),
      size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
    Packing.packGreedy(d, tokenCol = "n_tokens", orderCol = "doc_id",
      budget = 2048, strata = Seq("lang"))
      .orderBy(col("doc_id"))
  }
  val packSequencesSql: String = """
    WITH toks AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                             w -> len(w) > 0)) AS INT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
        COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM toks)
    SELECT doc_id, lang, n_tokens,
           CAST(cum // 2048 AS BIGINT) AS bin,
           CAST(cum % 2048 AS BIGINT) AS bin_offset
    FROM c ORDER BY doc_id"""

  /** PII redaction over text with synthesized PII (the fixture corpus has
    * none): emails, IPv4s, phone numbers appended deterministically, then
    * redacted; the md5 of the redacted text gates the full output. */
  val textPiiRedact: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    val aug = docs.select(col("doc_id"), concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or 10."), (col("doc_id") % 200).cast("string"),
      lit(".0."), (col("doc_id") % 250).cast("string"),
      lit(" phone 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
      lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
    TextAnalysis.piiRedact(aug).orderBy(col("doc_id"))
  }
  val textPiiRedactSql: String = """
    WITH aug AS (
      SELECT doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 10.' ||
        CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ||
        ' phone 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents WHERE doc_id < 300)
    SELECT doc_id,
      CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
      CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
      md5(regexp_replace(regexp_replace(regexp_replace(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g')) AS red_md5,
      CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g')) AS INT) AS red_len
    FROM aug ORDER BY doc_id"""

  /** Gopher-style repetition signals per doc. */
  val textRepetition: QueryFn = (s, dir) =>
    TextAnalysis.repetitionSignals(
      Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))
  val textRepetitionSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    b AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        ELSE list_transform(generate_series(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1]) END) AS gram
      FROM toks),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                 COUNT(*) AS n_distinct, CAST(MAX(cnt) AS BIGINT) AS top_n
          FROM c GROUP BY 1)
    SELECT doc_id, n_bigrams, n_distinct, top_n,
      1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams AS dup_bigram_frac,
      CAST(top_n AS DOUBLE) / n_bigrams AS top_bigram_frac
    FROM a ORDER BY doc_id"""

  /** Hash-stable train/val/test split (90/5/5 via md5 bucket carving). */
  val splitAssign: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    Mixing.splitByHash(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))
  }
  val splitAssignSql: String = """
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs
    FROM documents GROUP BY 1, 2 ORDER BY split, lang"""

  /** Leakage-safe split assignment: duplicate documents must land in the
    * SAME split (a train/test pair of near-identical docs is benchmark
    * leakage — the reason Lee et al. 2022 dedup before splitting). The
    * split hash is taken over the doc's DUP-GROUP id (min doc_id of the
    * md5(text) group here; the LSH/SimHash component id drops into the
    * same slot at scale), so a whole group moves together. One shuffle on
    * the content hash, then the same shuffle-free md5-bucket carving as
    * split_assign. */
  val splitLeakageSafe: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val grouped = docs.withColumn("grp_id",
      min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
    Mixing.splitByHash(grouped, "grp_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))
  }
  val splitLeakageSafeSql: String = """
    WITH g AS (
      SELECT lang, min(doc_id) OVER (PARTITION BY md5(text)) AS grp_id
      FROM documents)
    SELECT CASE WHEN substr(md5(CAST(grp_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                WHEN substr(md5(CAST(grp_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs
    FROM g GROUP BY 1, 2 ORDER BY split, lang"""

  /** Deterministic global training order (salted-hash sort), first 100. */
  val shuffleDeterministic: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    Mixing.deterministicOrder(docs, "doc_id", salt = "graft-shuffle-0")
      .select(col("doc_id"), col("shuffle_key"))
      .limit(100)
  }
  val shuffleDeterministicSql: String = """
    SELECT doc_id, md5('graft-shuffle-0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents ORDER BY shuffle_key, doc_id LIMIT 100"""

  /** Int8 embedding quantization (ANN compression, IVF-SQ8 shape): codes
    * are deterministic double arithmetic, so DuckDB reproduces them
    * bit-for-bit; the md5 over the joined code string gates every
    * component of every vector. */
  val embedQuantize: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.quantizeInt8(e)
      .select(col("vec_id"), col("q_min"), col("q_scale"),
        md5(array_join(transform(col("q_codes"), _.cast("string")), ","))
          .as("codes_md5"),
        aggregate(col("q_codes"), lit(0L), (a, x) => a + x).as("codes_sum"))
      .orderBy(col("vec_id"))
  }
  val embedQuantizeSql: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
    qq AS (SELECT vec_id, mn,
            CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn) / 255.0 END AS q_scale,
            CASE WHEN mx = mn THEN list_transform(v, x -> 0)
                 ELSE list_transform(v,
                   x -> CAST(round((x - mn) / ((mx - mn) / 255.0)) AS INT) - 128)
            END AS codes
           FROM m)
    SELECT vec_id, mn AS q_min, q_scale,
           md5(array_to_string(codes, ',')) AS codes_md5,
           CAST(list_sum(codes) AS BIGINT) AS codes_sum
    FROM qq ORDER BY vec_id"""

  /** Per-source document cap — "at most K docs per domain", the standard
    * guard against a single crawl domain dominating the training mix.
    * Runs through the custom TopKPerKey physical operator (bounded per-key
    * heaps, O(n log k), spill-capable) instead of a window sort: at 100 TB
    * a row_number() window would sort whole partitions to keep 20 rows.
    * The oracle expresses the same semantics with row_number. */
  val sourceCapTopk: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    graft.plans.TopKPerKey(docs, col("source"), col("n_chars"), col("doc_id"), k = 20)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("source"), col("doc_id"))
  }
  val sourceCapTopkSql: String = """
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    SELECT doc_id, source, n_chars FROM r WHERE rn <= 20
    ORDER BY source, doc_id"""

  /** Uniform-without-replacement sample of K docs per source — the
    * "cap every domain at K RANDOM docs" mix stage (vs source_cap_topk's
    * top-K-by-length). Scoring by a salted md5 makes the sample
    * deterministic and engine-reproducible, and the bounded-heap
    * TopKPerKey operator keeps K rows per key in O(n log k) with spill —
    * no window sort of whole partitions at 100 TB. The oracle ranks by
    * the same hash: fixed-width hex orders identically as string (DuckDB)
    * and as parsed number (Spark), so both engines pick the same docs. */
  val samplePerSource: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val h = conv(substring(
      md5(concat(lit("s8|"), col("doc_id").cast("string"))), 1, 12), 16, 10)
      .cast("double")
    graft.plans.TopKPerKey(docs.withColumn("h", h),
        col("source"), col("h"), col("doc_id"), k = 10)
      .select(col("doc_id"), col("source"))
      .orderBy(col("source"), col("doc_id"))
  }
  val samplePerSourceSql: String = """
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY substr(md5(concat('s8|', CAST(doc_id AS VARCHAR))), 1, 12) DESC,
                        doc_id) AS rn
      FROM documents)
    SELECT doc_id, source FROM r WHERE rn <= 10 ORDER BY source, doc_id"""

  /** Incremental corpus dedup — the continuous-ingestion shape: a delta
    * batch (new crawl) is admitted only where it is NOT a near-dup of the
    * existing corpus. Same bucket-local exact-Jaccard candidate scheme as
    * `dedup_ngram_jaccard` (raw shingles, so the oracle reproduces it);
    * the production scale path swaps the candidate stage for MinHash LSH
    * (`Dedup.minhashLsh`) with identical join shape. Left-anti join keeps
    * novel docs — no full-corpus rewrite, O(delta × bucket) work. */
  val dedupIncremental: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val corpus = gramSets(docs.filter(col("doc_id") < 300))
      .select(col("lang"), col("bucket"), col("grams").as("c_grams"))
    val delta = gramSets(docs.filter(col("doc_id") >= 300 && col("doc_id") < 500))
    val inter = size(array_intersect(col("grams"), col("c_grams")))
    val dupIds = delta.join(corpus, Seq("lang", "bucket"))
      .filter(inter.cast("double") /
        (size(col("grams")) + size(col("c_grams")) - inter) >= 0.5)
      .select(col("doc_id")).distinct()
    delta.join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }
  val dedupIncrementalSql: String = """
    WITH toks AS (
      SELECT doc_id, lang, n_chars,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    d AS (
      SELECT doc_id, lang, n_chars // 50 AS bucket,
        list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
          ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS grams
      FROM toks),
    dup AS (
      SELECT DISTINCT n.doc_id
      FROM d n JOIN d c ON n.lang = c.lang AND n.bucket = c.bucket
      WHERE n.doc_id >= 300 AND c.doc_id < 300
        AND CAST(len(list_filter(n.grams, g -> list_contains(c.grams, g))) AS DOUBLE)
            / (len(n.grams) + len(c.grams)
               - len(list_filter(n.grams, g -> list_contains(c.grams, g)))) >= 0.5)
    SELECT doc_id, lang FROM d
    WHERE doc_id >= 300 AND doc_id NOT IN (SELECT doc_id FROM dup)
    ORDER BY doc_id"""

  /** ANN over int8-quantized vectors (IVF-SQ8 scoring path): neighbor
    * identity under a DuckDB oracle — dequantized values are bit-identical
    * across engines (deterministic double arithmetic), and adjacent-rank
    * cosine gaps on the quantized fixture are ≥5.5e-5, three orders above
    * cross-engine accumulation divergence. */
  val annQuantizedIds: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    Similarity.quantizedTopK(e, e.filter(col("vec_id") < 5), k = 10)
      .select(col("q_id"), col("c_id"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  val annQuantizedIdsSql: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
    dq AS (SELECT vec_id,
            CASE WHEN mx = mn THEN list_transform(v, x -> mn)
                 ELSE list_transform(v, x ->
                   CAST(round((x - mn) / ((mx - mn) / 255.0)) AS INT)
                     * ((mx - mn) / 255.0) + mn)
            END AS dv
           FROM m),
    q AS (SELECT vec_id AS q_id, dv AS qv FROM dq WHERE vec_id < 5),
    c AS (SELECT vec_id AS c_id, dv AS cv FROM dq),
    s AS (SELECT q_id, c_id, list_cosine_similarity(qv, cv) AS cos
          FROM c, q WHERE q_id <> c_id),
    r AS (SELECT q_id, c_id,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
          FROM s)
    SELECT q_id, c_id, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** Unicode text normalization under a FULL oracle: documents doctored
    * with accented and COMBINING-mark text run the canonical
    * pre-tokenization chain — NFC normalize (composes e+U+0301 into é),
    * strip accents (NFD + drop Mn: Ünïçödé→Unicode), lowercase — on both
    * engines; UAX #15 and utf8proc agree on Latin script, which the md5
    * gate proves. The step every hash-keyed dedup needs FIRST: the same
    * page crawled twice can differ only in accent composition. */
  val textNormalize: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    // explicit escapes, byte-identical to the oracle's chr()-built tail:
    // precomposed accents + COMBINING acute sequences (the NFC work)
    val doctored = docs.select(col("doc_id"),
      concat(col("text"), lit(" \u00dcn\u00ef\u00e7\u00f6d\u00e9 " +
        "\u00f1a\u00efve e\u0301to\u0301")).as("t"))
    doctored.select(col("doc_id"),
        length(col("t")).as("len_before"),
        lower(graft.functions.Functions.strip_accents(
          graft.functions.Functions.unicode_normalize(col("t")))).as("norm"))
      .select(col("doc_id"), col("len_before"), length(col("norm")).as("len_after"),
        md5(col("norm")).as("norm_md5"))
      .orderBy(col("doc_id"))
  }
  val textNormalizeSql: String = """
    WITH d AS (
      SELECT doc_id,
        text || ' ' || chr(220) || 'n' || chr(239) || chr(231) || chr(246)
             || 'd' || chr(233) || ' ' || chr(241) || 'a' || chr(239) || 've '
             || 'e' || chr(769) || 'to' || chr(769) AS t
      FROM documents WHERE doc_id < 300),
    n AS (SELECT doc_id, length(t) AS len_before,
            lower(strip_accents(nfc_normalize(t))) AS norm
          FROM d)
    SELECT doc_id, CAST(len_before AS INT) AS len_before,
           CAST(length(norm) AS INT) AS len_after, md5(norm) AS norm_md5
    FROM n ORDER BY doc_id"""

  /** HTML → text extraction under a FULL oracle: documents are wrapped in
    * deterministic synthetic HTML (title/style/optional script blocks,
    * comments, headings, links, pre-escaped entities) and the WARC→WET
    * extraction ([[TextAnalysis.htmlExtract]]) runs on both engines —
    * block handling, tag stripping, entity-decode ORDER (`&amp;lt;` must
    * yield `&lt;`), whitespace normalization, and the link/script counts
    * are all hash-gated. */
  val htmlExtract: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    val html = docs.select(col("doc_id"), expr(
      """concat('<html><head><title>Doc ', CAST(doc_id AS STRING),
        |'</title><style>p {color: red}</style>',
        |CASE WHEN doc_id % 3 = 0
        |  THEN '<script type="text/js">var x = 1 < 2;</script>' ELSE '' END,
        |'</head><body><!-- hidden --><h1>Doc ', CAST(doc_id AS STRING),
        |'</h1><p>', text, '</p>',
        |'<div><a href="https://x.test/1">one</a> &amp;
        |<a href="https://x.test/2">two</a></div>',
        |'tail &amp;lt; &lt;b&gt; &#39;q&#39;&nbsp;end</body></html>')"""
        .stripMargin.replace("\n", " ")).as("html"))
    TextAnalysis.htmlExtract(html)
      .select(col("doc_id"), col("n_links"), col("n_scripts"),
        md5(col("text")).as("text_md5"),
        round(col("extract_ratio"), 6).as("extract_ratio"))
      .orderBy(col("doc_id"))
  }
  val htmlExtractSql: String = """
    WITH h AS (
      SELECT doc_id,
        concat('<html><head><title>Doc ', CAST(doc_id AS VARCHAR),
          '</title><style>p {color: red}</style>',
          CASE WHEN doc_id % 3 = 0
            THEN '<script type="text/js">var x = 1 < 2;</script>' ELSE '' END,
          '</head><body><!-- hidden --><h1>Doc ', CAST(doc_id AS VARCHAR),
          '</h1><p>', text, '</p>',
          '<div><a href="https://x.test/1">one</a> &amp; ',
          '<a href="https://x.test/2">two</a></div>',
          'tail &amp;lt; &lt;b&gt; &#39;q&#39;&nbsp;end</body></html>') AS html
      FROM documents WHERE doc_id < 300),
    e AS (
      SELECT doc_id, html,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(
            html,
            '(?is)<script\b[^>]*>.*?</script>', '', 'g'),
            '(?is)<style\b[^>]*>.*?</style>', '', 'g'),
            '(?s)<!--.*?-->', '', 'g'),
            '(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table)\b[^>]*>', chr(10), 'g'),
            '(?s)<[^>]*>', '', 'g'),
            '&nbsp;', ' ', 'g'),
            '&lt;', '<', 'g'),
            '&gt;', '>', 'g'),
            '&quot;', '"', 'g'),
            '&#39;', chr(39), 'g'),
            '&amp;', '&', 'g'),
            '[ \t]+', ' ', 'g'),
            ' ?\n ?', chr(10), 'g'),
            '\n{3,}', chr(10) || chr(10), 'g') AS t0
      FROM h),
    c AS (SELECT doc_id, html,
            regexp_replace(t0, '^\s+|\s+$', '', 'g') AS text
          FROM e)
    SELECT doc_id,
      CAST(len(regexp_extract_all(html, '(?i)<a\b')) AS INT) AS n_links,
      CAST(len(regexp_extract_all(html, '(?is)<script\b[^>]*>')) AS INT) AS n_scripts,
      md5(text) AS text_md5,
      round(CAST(length(text) AS DOUBLE) / length(html), 6) AS extract_ratio
    FROM c ORDER BY doc_id"""

  /** URL canonicalization under a FULL oracle: messy synthetic URLs
    * (shouting scheme/host case, default ports, tracking params in
    * scrambled order, fragments) normalize identically on both engines —
    * the key-building step before URL-keyed crawl dedup. */
  val urlCanonicalize: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val withUrl = docs.select(col("doc_id"), expr(
      """concat(
        |CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'hTTps://' END,
        |CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END,
        |source, '.Example.COM',
        |CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END,
        |'/Path', CAST(doc_id AS STRING),
        |CASE WHEN doc_id % 5 = 0 THEN '?utm_source=news&gclid=9'
        |     ELSE concat('?b=2&utm_campaign=x&a=', lang) END,
        |'#Sec', CAST(doc_id AS STRING))""".stripMargin.replace("\n", " "))
      .as("url"))
    TextAnalysis.canonicalizeUrls(withUrl)
      .select(col("doc_id"), col("url"), col("url_canonical"))
      .orderBy(col("doc_id"))
  }
  val urlCanonicalizeSql: String = """
    WITH u AS (
      SELECT doc_id,
        concat(
          CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'hTTps://' END,
          CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END,
          source, '.Example.COM',
          CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END,
          '/Path', CAST(doc_id AS VARCHAR),
          CASE WHEN doc_id % 5 = 0 THEN '?utm_source=news&gclid=9'
               ELSE concat('?b=2&utm_campaign=x&a=', lang) END,
          '#Sec', CAST(doc_id AS VARCHAR)) AS url
      FROM documents),
    s1 AS (SELECT doc_id, url,
             regexp_replace(url, '#.*$', '') AS nofrag FROM u),
    s2 AS (SELECT doc_id, url,
             regexp_replace(nofrag, '\?.*$', '') AS base,
             regexp_extract(nofrag, '\?(.*)$', 1) AS query FROM s1),
    s3 AS (SELECT doc_id, url, query,
             lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
               || regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', '')
               AS lowered FROM s2),
    s4 AS (SELECT doc_id, url, query,
             regexp_replace(regexp_replace(lowered,
               '^(http://[^/:]+):80(/.*)?$', '\1\2'),
               '^(https://[^/:]+):443(/.*)?$', '\1\2') AS noport FROM s3),
    s5 AS (SELECT doc_id, url, noport,
             list_sort(list_filter(string_split(query, '&'),
               p -> len(p) > 0 AND NOT regexp_matches(p,
                      '^(utm_[^=]*|gclid|fbclid|ref)='))) AS params FROM s4)
    SELECT doc_id, url,
      noport || CASE WHEN len(params) > 0
                     THEN '?' || array_to_string(params, '&') ELSE '' END
        AS url_canonical
    FROM s5 ORDER BY doc_id"""

  /** URL-level decontamination under a FULL oracle: training docs whose
    * CANONICAL url matches any benchmark/eval url are dropped (the
    * address-level first pass before content-level `decontaminate` —
    * an eval page re-crawled under a differently-spelled url must still
    * match, which is exactly what canonicalization buys). Anti-join on
    * the canonical key: one shuffle, O(corpus) + O(eval). */
  val decontaminateByUrl: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val withUrl = docs.select(col("doc_id"), col("lang"), expr(
      """concat(
        |CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END,
        |'www.', source, '.example.com',
        |CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END,
        |'/p/', CAST(doc_id % 200 AS STRING),
        |'?utm_source=x#f')""".stripMargin.replace("\n", " ")).as("url"))
    // the "benchmark" set: cleanly-spelled urls for doc ids 0..49 — every
    // TRAINING doc whose id ≡ an eval id (mod 200) canonicalizes onto it
    val evalUrls = docs.filter(col("doc_id") < 50)
      .select(concat(lit("http://www."), col("source"),
        lit(".example.com/p/"), col("doc_id").cast("string")).as("url"))
    val canon = TextAnalysis.canonicalizeUrls(withUrl)
    val evalCanon = TextAnalysis.canonicalizeUrls(evalUrls)
      .select(col("url_canonical"))
    canon.join(evalCanon, Seq("url_canonical"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("lang"))
  }
  /** Semantic decontamination under a FULL oracle: embeddings with
    * vec_id % 10 == 0 pose as the benchmark, the rest as the corpus; the
    * coarse quantizer is FIXED to the first four vectors, so DuckDB
    * replays corpus assignment (argmax), eval 2-probe, bucket-joined
    * double-precision cosine scoring against the 0.4 threshold, and the
    * best-match-per-doc ranking — flagged ids, matched eval ids and the
    * cosines themselves all hash-gated (both engines compute the same
    * IEEE doubles). */
  val decontaminateSemantic: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    val cents = e.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val evalSet = e.filter(col("vec_id") % 10 === 0)
    Decontaminate.semanticMatches(corpus, evalSet, cents, threshold = 0.4)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("eval_id"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("eval_id"), col("cos"))
      .orderBy(col("vec_id"))
  }
  val decontaminateSemanticSql: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT CAST(vec_id AS INT) AS bucket, v AS cv FROM e WHERE vec_id < 4),
    corpus AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 0),
    evals AS (SELECT vec_id AS eval_id, v FROM e WHERE vec_id % 10 = 0),
    casg AS (SELECT c.vec_id, c.v, ct.bucket,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_cosine_similarity(c.v, ct.cv) DESC, ct.bucket) AS rn
             FROM corpus c CROSS JOIN cents ct),
    cb AS (SELECT vec_id, v, bucket FROM casg WHERE rn = 1),
    easg AS (SELECT ev.eval_id, ev.v, ct.bucket,
               row_number() OVER (PARTITION BY ev.eval_id
                 ORDER BY list_cosine_similarity(ev.v, ct.cv) DESC, ct.bucket) AS rn
             FROM evals ev CROSS JOIN cents ct),
    eb AS (SELECT eval_id, v, bucket FROM easg WHERE rn <= 2),
    pairs AS (SELECT DISTINCT cb.vec_id, eb.eval_id,
                list_cosine_similarity(cb.v, eb.v) AS cos
              FROM cb JOIN eb ON cb.bucket = eb.bucket
              WHERE list_cosine_similarity(cb.v, eb.v) >= 0.4),
    best AS (SELECT vec_id, eval_id, cos,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, eval_id) AS rk
             FROM pairs)
    SELECT vec_id, eval_id, cos FROM best WHERE rk = 1 ORDER BY vec_id"""

  val decontaminateByUrlSql: String = """
    WITH t AS (
      SELECT doc_id, lang,
        'http://www.' || source || '.example.com/p/'
          || CAST(doc_id % 200 AS VARCHAR) AS url_canonical
      FROM documents),
    e AS (
      SELECT DISTINCT 'http://www.' || source || '.example.com/p/'
          || CAST(doc_id AS VARCHAR) AS url_canonical
      FROM documents WHERE doc_id < 50)
    SELECT lang, COUNT(*) AS n_kept
    FROM t LEFT JOIN e USING (url_canonical)
    WHERE e.url_canonical IS NULL
    GROUP BY lang ORDER BY lang"""

  /** Winnowing fingerprints (MOSS) under a FULL oracle: the gram hash is
    * fixed-width md5 hex, so window minima — and with them every
    * selection, including rightmost-tie positions — agree across engines
    * as plain string comparisons; DuckDB replays grams, windows, minima
    * and the distinct selection set, and the per-doc fingerprint list is
    * md5-gated in sorted order. */
  val textWinnow: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    TextAnalysis.winnowFingerprints(docs, k = 8, w = 5)
      .select(col("doc_id"), col("n_grams"), col("n_fps"),
        md5(array_join(array_sort(col("fingerprints")), ",")).as("fps_md5"))
      .orderBy(col("doc_id"))
  }
  val textWinnowSql: String = """
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 300),
    g AS (SELECT doc_id,
            CASE WHEN length(t) < 8 THEN []
                 ELSE list_transform(generate_series(1, length(t) - 8 + 1),
                        i -> substr(md5(substr(t, i, 8)), 1, 12)) END AS gr
          FROM d),
    f AS (SELECT doc_id, len(gr) AS n_grams,
            CASE WHEN len(gr) < 5 THEN []
                 ELSE list_distinct(list_transform(generate_series(1, len(gr) - 5 + 1),
                   j -> list_min(gr[j : j + 4]) || ':' ||
                        CAST(j + 5 - list_position(list_reverse(gr[j : j + 4]),
                                                   list_min(gr[j : j + 4])) AS VARCHAR)))
            END AS fps
          FROM g)
    SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
           CAST(len(fps) AS INT) AS n_fps,
           md5(array_to_string(list_sort(fps), ',')) AS fps_md5
    FROM f ORDER BY doc_id"""

  /** Persisted IVF-SQ8 index, built then served ([[VectorIndex]]): the
    * coarse quantizer is FIXED to the first four corpus vectors so DuckDB
    * can replay the whole pipeline — assignment (argmax centroid cosine,
    * ties toward the lower bucket), per-query 2-probe, int8
    * dequantization (bit-identical doubles), candidate scoring and
    * ranking. The Spark side must round-trip everything through the two
    * lake tables on disk: nothing is recomputed from the in-memory
    * corpus at search time. Assignment/probe argmax margins on the
    * near-random fixture are orders above cross-engine float-vs-double
    * cosine divergence (~1e-8); scoring itself is exact doubles. */
  val annIndexPersisted: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    val idx = graft.queries.Lake.scratchDir("llm_vec_index")
    val cents = e.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    VectorIndex.build(e, idx, centroids = Some(cents))
    VectorIndex.search(s, idx, e.filter(col("vec_id") < 6), k = 10, nProbe = 2)
      .select(col("q_id"), col("c_id"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  val annIndexPersistedSql: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT CAST(vec_id AS INT) AS bucket, v AS cv FROM e WHERE vec_id < 4),
    asg AS (SELECT e.vec_id, c.bucket,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.bucket) AS rn
            FROM e CROSS JOIN cents c),
    cbucket AS (SELECT vec_id, bucket FROM asg WHERE rn = 1),
    m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
    dq AS (SELECT vec_id,
            CASE WHEN mx = mn THEN list_transform(v, x -> mn)
                 ELSE list_transform(v, x ->
                   CAST(round((x - mn) / ((mx - mn) / 255.0)) AS INT)
                     * ((mx - mn) / 255.0) + mn)
            END AS dv
           FROM m),
    qp AS (SELECT e.vec_id AS q_id, c.bucket,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.bucket) AS rn
           FROM e CROSS JOIN cents c WHERE e.vec_id < 6),
    probe AS (SELECT q_id, bucket FROM qp WHERE rn <= 2),
    qv AS (SELECT vec_id AS q_id, v AS qvec FROM e WHERE vec_id < 6),
    cand AS (SELECT DISTINCT p.q_id, cb.vec_id AS c_id
             FROM probe p JOIN cbucket cb ON cb.bucket = p.bucket
             WHERE cb.vec_id <> p.q_id),
    s AS (SELECT cand.q_id, cand.c_id,
            list_cosine_similarity(qv.qvec, dq.dv) AS cos
          FROM cand JOIN qv ON qv.q_id = cand.q_id
                    JOIN dq ON dq.vec_id = cand.c_id),
    r AS (SELECT q_id, c_id,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
          FROM s)
    SELECT q_id, c_id, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10
    ORDER BY q_id, rk"""

  /** Persisted IVF-PQ index (the 64× residency tier of [[VectorIndex]])
    * under a FULL oracle (r13): coarse quantizer FIXED to the first four
    * corpus vectors (the VectorIndex.build contract annIndexPersisted
    * already uses) and the codebook FIXED to data slices, so every
    * persisted artifact is reproducible from the raw table — floats
    * round-trip parquet exactly — and DuckDB replays assignment (argmax
    * centroid cosine, the annIndexPersisted margin argument), codes, ADC
    * sums and ranks. Output is ids+ranks; the cos stays internal. The
    * TRAINED build keeps its recall floor + serve-from-disk identity in
    * VectorIndexSpec. */
  val annIndexPqPersisted: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    val idx = graft.queries.Lake.scratchDir("llm_vec_index_pq")
    // ONE bounded fetch pins both artifacts: 16 codebook seed vectors,
    // their first 4 the coarse quantizer
    val seed = e.orderBy(col("vec_id")).limit(16)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    VectorIndex.buildPq(e, idx, m = 4, ksub = 16,
      centroids = Some(seed.take(4)),
      codebook = Some(Similarity.pqCodebookFromRows(seed, m = 4, ksub = 16)))
    VectorIndex.searchPq(s, idx, e.filter(col("vec_id") < 5), k = 10, nProbe = 2)
      .select(col("q_id"), col("c_id"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  val annIndexPqPersistedSql: String = {
    val bdot = "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 16), " +
      "i -> ev.v[c.b*16 + i] * c.c[i])), (acc, x) -> acc + x)"
    val qbdot = "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 16), " +
      "i -> q.qv[c.b*16 + i] * c.c[i])), (acc, x) -> acc + x)"
    s"""
    WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    blk AS (SELECT b FROM generate_series(0, 3) t(b)),
    cents AS (SELECT blk.b, CAST(e.vec_id AS INT) AS j,
                e.v[blk.b*16+1 : blk.b*16+16] AS c,
                ${drNsq("e.v[blk.b*16+1 : blk.b*16+16]")} AS cn
              FROM ev e CROSS JOIN blk WHERE e.vec_id < 16),
    coarse AS (SELECT CAST(vec_id AS INT) AS bucket, v AS cv FROM ev WHERE vec_id < 4),
    casg AS (SELECT ev.vec_id, co.bucket,
               row_number() OVER (PARTITION BY ev.vec_id
                 ORDER BY ${drCos("ev.v", "co.cv")} DESC, co.bucket) AS rn
             FROM ev CROSS JOIN coarse co),
    cbk AS (SELECT vec_id, bucket FROM casg WHERE rn = 1),
    d AS (SELECT ev.vec_id, c.b, c.j, c.cn - 2.0 * $bdot AS dist
          FROM ev CROSS JOIN cents c),
    codes AS (SELECT vec_id, b, j FROM (
        SELECT vec_id, b, j,
          row_number() OVER (PARTITION BY vec_id, b ORDER BY dist, j) AS rn FROM d) t
      WHERE rn = 1),
    xn AS (SELECT codes.vec_id,
             list_reduce(list_prepend(0.0, list(cents.cn ORDER BY codes.b)),
               (acc, x) -> acc + x) AS xnormsq
           FROM codes JOIN cents ON cents.b = codes.b AND cents.j = codes.j
           GROUP BY codes.vec_id),
    q AS (SELECT vec_id AS q_id, v AS qv, sqrt(${drNsq("v")}) AS qnorm
          FROM ev WHERE vec_id < 5),
    qp AS (SELECT q.q_id, co.bucket,
             row_number() OVER (PARTITION BY q.q_id
               ORDER BY ${drCos("q.qv", "co.cv")} DESC, co.bucket) AS rn
           FROM q CROSS JOIN coarse co),
    probe AS (SELECT q_id, bucket FROM qp WHERE rn <= 2),
    lut AS (SELECT q.q_id, c.b, c.j, $qbdot AS lv FROM q CROSS JOIN cents c),
    cand AS (SELECT DISTINCT p.q_id, cb2.vec_id AS c_id
             FROM probe p JOIN cbk cb2 ON cb2.bucket = p.bucket
             WHERE cb2.vec_id <> p.q_id),
    adc AS (SELECT cand.q_id, cand.c_id,
              list_reduce(list_prepend(0.0, list(lut.lv ORDER BY codes.b)),
                (acc, x) -> acc + x) AS adcv
            FROM cand JOIN codes ON codes.vec_id = cand.c_id
                      JOIN lut ON lut.q_id = cand.q_id AND lut.b = codes.b
                               AND lut.j = codes.j
            GROUP BY cand.q_id, cand.c_id),
    s AS (SELECT adc.q_id, adc.c_id,
            CASE WHEN q.qnorm = 0.0 OR xn.xnormsq <= 0.0 THEN 0.0
                 ELSE adc.adcv / (q.qnorm * sqrt(xn.xnormsq)) END AS cos
          FROM adc JOIN q ON q.q_id = adc.q_id JOIN xn ON xn.vec_id = adc.c_id),
    rk AS (SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
    SELECT q_id, c_id, CAST(rk AS INT) AS rk FROM rk WHERE rk <= 10
    ORDER BY q_id, rk"""
  }

  /** SemDeDup survivors under a FULL oracle: the coarse quantizer is
    * FIXED to the first four corpus vectors (the VectorIndex.build
    * contract), so DuckDB replays the whole pipeline — assignment
    * (argmax centroid cosine, ties toward the lower bucket), in-bucket
    * threshold pairing, transitive closure as a recursive CTE
    * (component = min reachable id, the connectedComponents label), and
    * keeper selection (highest centroid cosine, tie → lowest id). The
    * fixed-centroid path computes cosines in DOUBLE with in-order
    * accumulation, bit-identical to list_cosine_similarity, so the
    * threshold and both argmaxes cannot flip between engines. Threshold
    * 0.4 marks the near-dup tail of the near-random fixture vectors,
    * matching dedup_embedding_cos. */
  val semdedupKeep: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings
    val cents = e.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    Dedup.semDedup(e, threshold = 0.4, centroids = Some(cents))
      .orderBy(col("vec_id"))
  }
  val semdedupKeepSql: String = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT CAST(vec_id AS INT) AS bucket, v AS cv FROM e WHERE vec_id < 4),
    asg0 AS (SELECT e.vec_id, c.bucket,
               list_cosine_similarity(e.v, c.cv) AS ccos,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.bucket) AS rn
             FROM e CROSS JOIN cents c),
    asg AS (SELECT vec_id, bucket, ccos AS centroid_cos FROM asg0 WHERE rn = 1),
    pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM asg a JOIN asg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           JOIN e ea ON ea.vec_id = a.vec_id
           JOIN e eb ON eb.vec_id = b.vec_id
           WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4),
    edges AS (SELECT a_id AS src, b_id AS dst FROM pr
              UNION SELECT b_id, a_id FROM pr),
    reach AS (
      WITH RECURSIVE r(id, n) AS (
        SELECT vec_id, vec_id FROM asg
        UNION
        SELECT r.id, e2.dst FROM r JOIN edges e2 ON e2.src = r.n)
      SELECT id, min(n) AS component FROM r GROUP BY id),
    ranked AS (SELECT a.vec_id, a.bucket, a.centroid_cos, c.component,
                 count(*) OVER (PARTITION BY c.component) AS group_size,
                 row_number() OVER (PARTITION BY c.component
                   ORDER BY a.centroid_cos DESC, a.vec_id) AS rk
               FROM asg a JOIN reach c ON c.id = a.vec_id)
    SELECT vec_id, bucket, CAST(component AS BIGINT) AS component,
           CAST(group_size AS BIGINT) AS group_size
    FROM ranked WHERE rk = 1 ORDER BY vec_id"""

  /** Corpus-trained BPE merge table, under a FULL oracle since r16: the
    * iterative merge loop IS SQL-expressible -- DuckDB replays it as a
    * recursive CTE (see [[bpeTrainMergesSql]]); BpeSpec still pins the
    * loop against a hand-derived sequence. Deterministic given the
    * corpus. */
  val bpeTrainMerges: QueryFn = (s, dir) => {
    import s.implicits._
    val v = Bpe.train(Tables.ensure(s, dir).documents,
      numMerges = 200, maxWordTypes = 50000)
    v.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left_sym", "right_sym")
      .orderBy(col("rank"))
  }

  /** DuckDB replays the ENTIRE training loop as a recursive CTE. Encoding:
    * each word type is ONE string of unit-separator (U+001F) delimited
    * symbols ("<US>a<US><US>b</w><US>", <US> = U+001F), so applying a merge is a
    * plain string replace of "<US>L<US><US>R<US>" -> "<US>LR<US>" -- left-to-right non-overlapping, exactly the merge
    * pass's semantics -- and pair counting unnests adjacent symbol pairs
    * weighted by type frequency (overlapping adjacencies counted, like
    * addWordPairs). The argmax replays the engine's tie-break (count desc,
    * then (left, right) asc -- ASCII, so UTF-16 and byte order agree), the
    * best-count<2 early stop, and the 200-merge cap. One 'm' row per
    * iteration rides the recursive working table (anchored to the
    * lexicographically-first word row so exactly ONE is emitted). Exactness
    * preconditions, all verified on the fixture: no U+001F and no VT (U+000B) in
    * any document (delimiter safety; RE2's \s lacks VT where Java's
    * includes it), and 31 word types -- far under the engine's 50000
    * maxWordTypes cap, which the oracle does not model.
    *
    * The BYTE-level variant graduates through the degenerate-shape
    * argument `bpe_byte_fixed_tokens` proved: GPT-2's lookahead RE2
    * cannot run, but on the fixture's doc shape the pre-tokenizer
    * provably degenerates to a lookahead-free form (see
    * [[bpeByteTrainMergesSql]]). */
  /** Shared recursive merge-loop CTE fragment (`words0`, `st`): the BPE
    * pair-frequency training loop over delimited symbol strings, for any
    * `words0Body` yielding (s, freq). `bpe_train_merges`,
    * `bpe_byte_train_merges` and `bpe_tokens` all compose it. */
  private def bpeMergeLoopCte(words0Body: String): String = {
    val D = "\u001f"
    s"""
    words0 AS ($words0Body),
    st AS (
      SELECT 0 AS it, 'w' AS kind, s, freq, NULL::VARCHAR AS l, NULL::VARCHAR AS r
      FROM words0
      UNION ALL
      (
        WITH cur AS (SELECT * FROM st WHERE kind = 'w' AND it < 200),
        syms AS (
          SELECT s, freq, string_split(trim(s, '$D'), '$D$D') AS sl FROM cur),
        pairs AS (
          SELECT p.l, p.r, SUM(freq)::BIGINT AS cnt
          FROM syms,
            LATERAL (SELECT unnest(list_transform(generate_series(1, len(sl) - 1),
              i -> struct_pack(l := sl[i], r := sl[i + 1])), recursive := true)) p
          GROUP BY p.l, p.r),
        best AS (
          SELECT l, r FROM pairs WHERE cnt >= 2
          ORDER BY cnt DESC, l, r LIMIT 1)
        SELECT c.it + 1, x.kind,
          CASE WHEN x.kind = 'w'
            THEN replace(c.s, '$D' || b.l || '$D$D' || b.r || '$D',
                              '$D' || b.l || b.r || '$D')
            ELSE NULL END,
          CASE WHEN x.kind = 'w' THEN c.freq ELSE NULL END,
          CASE WHEN x.kind = 'm' THEN b.l ELSE NULL END,
          CASE WHEN x.kind = 'm' THEN b.r ELSE NULL END
        FROM cur c, best b, (SELECT 'w' AS kind UNION ALL SELECT 'm') x
        WHERE x.kind = 'w' OR c.s = (SELECT min(s) FROM cur)
      ))"""
  }

  /** Char-level `words0` body: code-point symbols, `</w>` fused onto the
    * last, one row per word TYPE with its corpus frequency. */
  private def bpeCharWords0: String = {
    val D = "\u001f"
    s"""
      SELECT
        list_reduce(
          list_transform(generate_series(1, length(w)),
            i -> '$D' || substr(w, i, 1) ||
                 CASE WHEN i = length(w) THEN '</w>' ELSE '' END || '$D'),
          (a, b) -> a || b) AS s,
        count(*)::BIGINT AS freq
      FROM (
        SELECT unnest(regexp_extract_all(text,
          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS w
        FROM documents)
      GROUP BY 1"""
  }

  val bpeTrainMergesSql: String =
    s"""
    WITH RECURSIVE
    ${bpeMergeLoopCte(bpeCharWords0)}
    SELECT (it - 1)::INT AS rank, l AS left_sym, r AS right_sym
    FROM st WHERE kind = 'm' ORDER BY rank"""


  /** Corpus tokenized with its OWN trained BPE vocabulary, under a FULL
    * oracle since r16: the trained-merge recursive CTE chains into the
    * rank-ordered encode walk (the `bpe_fixed_tokens` replay with the
    * trained table in place of the pinned VALUES list) — training AND
    * encoding replayed end-to-end from raw text, the \u0001-joined token
    * stream md5-gated (boundaries included). Round-trip + compression +
    * determinism stay pinned in BpeSpec. */
  val bpeTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val v = Bpe.train(docs, numMerges = 200, maxWordTypes = 50000)
    Bpe.encode(docs, v)
      .select(col("doc_id"), col("n_tokens"),
        md5(concat_ws("\u0001", col("tokens"))).as("tokens_md5"))
      .orderBy(col("doc_id"))
  }
  val bpeTokensSql: String = {
    val D = "\u001f"
    s"""
    WITH RECURSIVE
    ${bpeMergeLoopCte(bpeCharWords0)},
    m AS (SELECT (it - 1)::INT AS rank, l, r FROM st WHERE kind = 'm'),
    nm AS (SELECT count(*)::INT AS n FROM m),
    w AS (SELECT doc_id,
            unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS word,
            generate_subscripts(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), 1) AS pos
          FROM documents),
    wt AS (SELECT DISTINCT word FROM w),
    init AS (
      SELECT word,
        '$D' || array_to_string(list_transform(range(1, len(word)+1),
          i -> substr(word, CAST(i AS INT), 1) ||
               CASE WHEN i = len(word) THEN '</w>' ELSE '' END), '$D') || '$D' AS seq
      FROM wt),
    walk(word, seq, rk) AS (
      SELECT word, seq, 0 FROM init
      UNION ALL
      SELECT w.word,
        replace(w.seq, '$D' || m.l || '$D' || m.r || '$D',
                       '$D' || m.l || m.r || '$D'),
        CASE WHEN replace(w.seq, '$D' || m.l || '$D' || m.r || '$D',
                          '$D' || m.l || m.r || '$D') <> w.seq
             THEN w.rk ELSE w.rk + 1 END
      FROM walk w JOIN m ON m.rank = w.rk
      WHERE w.rk < (SELECT n FROM nm)),
    enc AS (
      SELECT word,
        len(seq) - len(replace(seq, '$D', '')) - 1 AS n_toks,
        replace(trim(seq, '$D'), '$D', chr(1)) AS toks
      FROM walk WHERE rk = (SELECT n FROM nm)),
    agg AS (
      SELECT w.doc_id, sum(e.n_toks) AS n_tokens,
             md5(string_agg(e.toks, chr(1) ORDER BY w.pos)) AS tokens_md5
      FROM w JOIN enc e ON e.word = w.word GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
           COALESCE(a.tokens_md5, md5('')) AS tokens_md5
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""
  }

  /** BPE encoding plumbing under an oracle: with ZERO merges every
    * pre-token encodes to its code points, so the token count per doc is
    * exactly its non-whitespace character count — which DuckDB computes
    * independently of the tokenizer. */
  val bpeCharTokens: QueryFn = (s, dir) =>
    Bpe.encode(Tables.ensure(s, dir).documents, Bpe.BpeVocab(Vector.empty))
      .select(col("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id"))
  val bpeCharTokensSql: String = """
    SELECT doc_id,
           CAST(length(regexp_replace(text, '\s', '', 'g')) AS INT) AS n_tokens
    FROM documents ORDER BY doc_id"""

  /** Pinned merge table for the FULL BPE encode oracle. A VALID merge
    * sequence (each side is a single symbol — possibly marker-carrying —
    * or the output of an EARLIER merge), which is the invariant every
    * trained table satisfies and the one that makes the DuckDB replay
    * below exact: applying merges in ascending rank to a fixed point can
    * then never re-enable an earlier rank (merging only ever creates
    * tokens whose own pairs rank LATER, and never makes two preexisting
    * symbols adjacent), so rank-ordered replay ≡ the encoder's
    * min-rank-first greedy loop. MUST stay in lockstep with
    * `bpeFixedTokensSql`'s `m` VALUES list. */
  private val BpeFixedMerges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e</w>"), ("a", "n"), ("i", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("an", "d</w>"), ("in", "g</w>"), ("e", "d</w>"),
    ("e", "n"), ("o", "r"), ("e", "s</w>"), ("t", "o</w>"), ("o", "f</w>"),
    ("i", "s</w>"), ("a", "t</w>"), ("e", "r</w>"), ("s", "t"), ("a", "r"),
    ("o", "u"), ("l", "e"), ("c", "h"), ("t", "i"), ("w", "h"), ("wh", "i"),
    ("th", "i"), ("1", "0</w>"), ("2", "0</w>"), ("c", "o"), ("co", "m"),
    ("p", "a"), ("s", "e"), ("m", "a"), ("d", "e"), ("l", "l"), ("u", "r"),
    ("ou", "r</w>"))

  /** BPE greedy encoding under a FULL oracle: with a PINNED merge table
    * the encoder is deterministic and DuckDB replays it exactly — per
    * distinct word type, a recursive CTE walks the merge table in rank
    * order, applying each merge to a fixed point via `replace` over the
    * separator-joined symbol string (see [[BpeFixedMerges]] for why
    * rank-ordered replay equals the min-rank greedy loop). Output hashes
    * the FULL per-doc token sequence, so merge boundaries, `</w>`
    * placement, and cross-word ordering are all hash-gated. */
  val bpeFixedTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    Bpe.encode(docs, Bpe.BpeVocab(BpeFixedMerges))
      .select(col("doc_id"), col("n_tokens"),
        md5(array_join(col("tokens"), "|")).as("tokens_md5"))
      .orderBy(col("doc_id"))
  }
  val bpeFixedTokensSql: String = {
    val merges = BpeFixedMerges.zipWithIndex
      .map { case ((l, r), i) => s"($i,'$l','$r')" }.mkString(",")
    s"""
    WITH RECURSIVE
    docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
    m(rank, l, r) AS (SELECT * FROM (VALUES $merges) v(rank, l, r)),
    w AS (SELECT doc_id,
            unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS word,
            generate_subscripts(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), 1) AS pos
          FROM docs),
    wt AS (SELECT DISTINCT word FROM w),
    init AS (
      SELECT word,
        chr(31) || array_to_string(list_transform(range(1, len(word)+1),
          i -> substr(word, CAST(i AS INT), 1) ||
               CASE WHEN i = len(word) THEN '</w>' ELSE '' END), chr(31)) || chr(31) AS seq
      FROM wt),
    walk(word, seq, rk) AS (
      SELECT word, seq, 0 FROM init
      UNION ALL
      SELECT w.word,
        replace(w.seq, chr(31) || m.l || chr(31) || m.r || chr(31),
                       chr(31) || m.l || m.r || chr(31)),
        CASE WHEN replace(w.seq, chr(31) || m.l || chr(31) || m.r || chr(31),
                          chr(31) || m.l || m.r || chr(31)) <> w.seq
             THEN w.rk ELSE w.rk + 1 END
      FROM walk w
      JOIN m ON m.rank = w.rk
      WHERE w.rk < ${BpeFixedMerges.length}),
    enc AS (
      SELECT word,
        len(seq) - len(replace(seq, chr(31), '')) - 1 AS n_toks,
        replace(trim(seq, chr(31)), chr(31), '|') AS toks
      FROM walk WHERE rk = ${BpeFixedMerges.length}),
    agg AS (
      SELECT w.doc_id, sum(e.n_toks) AS n_tokens,
             md5(string_agg(e.toks, '|' ORDER BY w.pos)) AS tokens_md5
      FROM w JOIN enc e ON e.word = w.word GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
           COALESCE(a.tokens_md5, md5('')) AS tokens_md5
    FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""
  }

  /** Byte-level BPE plumbing under an oracle: GPT-2's pre-tokens jointly
    * PARTITION the text, and with zero merges every pre-token encodes to
    * one remapped char per UTF-8 byte — so the token count per document
    * is exactly its UTF-8 byte length, which DuckDB computes with
    * octet_length, independent of the tokenizer. */
  val bpeByteTokens: QueryFn = (s, dir) =>
    ByteBpe.encode(Tables.ensure(s, dir).documents,
        ByteBpe.ByteBpeVocab(Vector.empty))
      .select(col("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id"))
  val bpeByteTokensSql: String = """
    SELECT doc_id, CAST(strlen(text) AS INT) AS n_tokens
    FROM documents ORDER BY doc_id"""

  /** Trained byte-level merge table, via a PERSISTED lake round trip
    * (train → save → load); FULL oracle since r16 through the
    * degenerate-shape argument: GPT-2's pre-tokenizer carries a lookahead
    * RE2 cannot run, but EVERY fixture document matches the
    * no-consecutive/leading/trailing-whitespace pure-printable-ASCII
    * shape (the oracle re-filters on it, dropping zero rows — so the
    * training input is the FULL corpus on both sides) under which the
    * pattern provably degenerates to the lookahead-free
    * contractions | ` ?letters` | ` ?digits` | ` ?punct` form and the
    * byte remap degenerates to space→Ġ. The merge loop is the shared
    * [[bpeMergeLoopCte]] replay. Byte-remap pins, emoji round trip and
    * compression stay in ByteBpeSpec. */
  val bpeByteTrainMerges: QueryFn = (s, dir) => {
    import s.implicits._
    val docs = Tables.ensure(s, dir).documents
    val v = ByteBpe.train(docs, numMerges = 200, maxWordTypes = 50000)
    val store = graft.queries.Lake.scratchDir("graft_tok_bpe_byte")
    TokenizerStore.saveByteBpe(s, store, v)
    val loaded = TokenizerStore.loadByteBpe(s, store)
    require(loaded.merges == v.merges, "byte-BPE vocabulary round trip")
    v.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left_sym", "right_sym")
      .orderBy(col("rank"))
  }

  val bpeByteTrainMergesSql: String = {
    val pretok = "''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"
    val D = "\u001f"
    val words0 = s"""
      SELECT
        list_reduce(
          list_transform(generate_series(1, length(rw)),
            i -> '$D' || substr(rw, i, 1) || '$D'),
          (a, b) -> a || b) AS s,
        count(*)::BIGINT AS freq
      FROM (
        SELECT replace(unnest(regexp_extract_all(text, '$pretok')),
                       ' ', chr(288)) AS rw
        FROM documents
        WHERE NOT regexp_matches(text, '[^ -~]|  |^ | $$'))
      GROUP BY 1"""
    s"""
    WITH RECURSIVE
    ${bpeMergeLoopCte(words0)}
    SELECT (it - 1)::INT AS rank, l AS left_sym, r AS right_sym
    FROM st WHERE kind = 'm' ORDER BY rank"""
  }

  /** Whole-document next-fit packing under a FULL oracle: DuckDB replays
    * the sequential next-fit fold per language as a recursive CTE carrying
    * (bin, remaining) — bins, offsets and fragmentation all hash-gated. */
  val packNextFit: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 500)
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
    Packing.packNextFit(docs, "n_tokens", "doc_id", budget = 64, Seq("lang"))
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("bin"),
        col("bin_offset"))
      .orderBy(col("lang"), col("doc_id"))
  }
  val packNextFitSql: String = """
    WITH RECURSIVE
    toks AS (SELECT doc_id, lang,
      len(list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0)) AS n_tokens
      FROM documents WHERE doc_id < 500),
    o AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
          FROM toks),
    st(lang, rn, doc_id, n_tokens, bin, off, rem) AS (
      SELECT lang, rn, doc_id, n_tokens, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             64 - n_tokens
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.lang, o.rn, o.doc_id, o.n_tokens,
        CASE WHEN o.n_tokens <= st.rem OR st.rem = 64
             THEN st.bin ELSE st.bin + 1 END,
        CASE WHEN o.n_tokens <= st.rem OR st.rem = 64
             THEN 64 - st.rem ELSE CAST(0 AS BIGINT) END,
        CASE WHEN o.n_tokens <= st.rem OR st.rem = 64
             THEN st.rem - o.n_tokens ELSE 64 - o.n_tokens END
      FROM st JOIN o ON o.lang = st.lang AND o.rn = st.rn + 1)
    SELECT lang, doc_id, CAST(n_tokens AS INT) AS n_tokens, bin,
           off AS bin_offset
    FROM st ORDER BY lang, doc_id"""

  /** Streaming near-dup admission ([[graft.streaming.StreamingDedup]])
    * replayed as two micro-batches under a FULL oracle: in `exactVerify`
    * mode at threshold 0.999, exact set Jaccard over the ≤40-element
    * shingle sets can only fire at J = 1 — identical lowercased-3-gram
    * shingle SETS — so DuckDB reproduces admission as first-occurrence
    * per shingle set in (batch, doc_id) order, with zero estimator
    * variance. Batch 2 plants 50 exact re-crawls of batch-1 docs (new
    * ids, old text): all must drop against the lake state. */
  val dedupStreamingAdmit: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.select(col("doc_id"), col("text"))
    val state = graft.queries.Lake.scratchDir("llm_sdd_state")
    val out = graft.queries.Lake.scratchDir("llm_sdd_out")
    val b1 = docs.filter(col("doc_id") < 300)
    val b2 = docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 300).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") >= 350 && col("doc_id") < 500))
    graft.streaming.StreamingDedup.admitBatch(s, b1, state, out, "q:1",
      jaccardThreshold = 0.999, exactVerify = true)
    graft.streaming.StreamingDedup.admitBatch(s, b2, state, out, "q:2",
      jaccardThreshold = 0.999, exactVerify = true)
    graft.sources.SnapshotTable.forPath(s, out).read()
      .select(col("doc_id")).orderBy(col("doc_id"))
  }
  val dedupStreamingAdmitSql: String = """
    WITH b1 AS (SELECT doc_id, text, 1 AS b FROM documents WHERE doc_id < 300),
    b2 AS (
      SELECT doc_id + 300 AS doc_id, text, 2 AS b FROM documents WHERE doc_id < 50
      UNION ALL
      SELECT doc_id, text, 2 AS b FROM documents
      WHERE doc_id >= 350 AND doc_id < 500),
    u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
    toks AS (SELECT doc_id, b,
      list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM u),
    g AS (SELECT doc_id, b, array_to_string(list_sort(list_distinct(
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        ELSE list_transform(generate_series(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)), chr(10)) AS gk
      FROM toks),
    r AS (SELECT doc_id, b,
            row_number() OVER (PARTITION BY gk ORDER BY b, doc_id) AS rn
          FROM g)
    SELECT doc_id FROM r WHERE rn = 1 ORDER BY doc_id"""

  /** Corpus-trained unigram-LM vocabulary (Kudo 2018 / SentencePiece; no
    * oracle: the EM fixed point is not SQL-expressible — forward-backward,
    * Viterbi tie-breaks and the training loop are pinned in UnigramSpec).
    * Deterministic given the corpus. */
  val unigramTrainPieces: QueryFn = (s, dir) => {
    import s.implicits._
    val v = Unigram.train(Tables.ensure(s, dir).documents, vocabSize = 300,
      maxPieceLen = 8, seedSize = 1000, emSubIters = 1, shrink = 0.5)
    v.pieces.zipWithIndex
      .map { case ((p, lp), i) =>
        (i, p, BigDecimal(lp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("rank", "piece", "logp").orderBy(col("rank"))
  }

  /** Corpus tokenized by its own trained unigram vocabulary (rows-only;
    * Viterbi semantics pinned in UnigramSpec). */
  val unigramTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val v = Unigram.train(docs, vocabSize = 300, maxPieceLen = 8,
      seedSize = 1000, emSubIters = 1, shrink = 0.5)
    Unigram.encode(docs, v)
      .select(col("doc_id"), size(col("tokens")).as("n_tokens"),
        md5(concat_ws("", col("tokens"))).as("tokens_md5"))
      .orderBy(col("doc_id"))
  }

  /** Unigram ENCODING plumbing under an oracle: with an empty vocabulary
    * every pre-token Viterbi-decodes through the per-char fallback, so
    * the token count per doc is exactly its non-whitespace character
    * count — which DuckDB computes independently of the tokenizer. */
  val unigramCharTokens: QueryFn = (s, dir) =>
    Unigram.encode(Tables.ensure(s, dir).documents,
        Unigram.UnigramVocab(Vector.empty))
      .select(col("doc_id"), size(col("tokens")).as("n_tokens"))
      .orderBy(col("doc_id"))
  val unigramCharTokensSql: String = """
    SELECT doc_id,
           CAST(length(regexp_replace(text, '\s', '', 'g')) AS INT) AS n_tokens
    FROM documents ORDER BY doc_id"""

  /** Pinned vocabulary for the FULL Viterbi oracle. Log-probs are EXACT
    * binary fractions (multiples of 1/8) so Spark's and DuckDB's double
    * sums are bit-identical and score comparisons can never drift; `ab`
    * is pinned at exactly lp(a)+lp(b) to hash-gate the longer-piece
    * tie-break. Letters/digits cover every alphanumeric char; `,` and
    * the other punctuation are deliberately ABSENT so the single-char
    * floor fallback (`n_oov`) is exercised. MUST stay in lockstep with
    * `unigramFixedTokensSql`'s `voc` VALUES list. */
  private val UniFixedVocab: Vector[(String, Double)] = {
    val singles =
      (('a' to 'z') ++ ('A' to 'Z')).map(_.toString -> -2.5) ++
        ('0' to '9').map(_.toString -> -2.0) ++ Seq("." -> -3.0)
    val multi = Vector(
      "th" -> -1.5, "in" -> -1.5, "er" -> -1.5, "an" -> -1.5,
      "on" -> -1.625, "re" -> -1.625, "at" -> -1.75, "en" -> -1.75,
      "ed" -> -1.75, "es" -> -1.75, "or" -> -1.75, "the" -> -1.75,
      "ti" -> -1.875, "st" -> -1.875, "ar" -> -1.875, "ou" -> -1.875,
      "and" -> -2.0, "ing" -> -2.25, "ion" -> -2.25, "tion" -> -2.5,
      "ab" -> -5.0)
    (singles ++ multi).toVector
  }

  /** Unigram-LM Viterbi encoding under a FULL oracle: with a PINNED
    * vocabulary the max-likelihood segmentation is deterministic, and
    * DuckDB replays the DP exactly — a recursive CTE advances one
    * position per step carrying the whole best/back arrays as LISTS,
    * candidate pieces join against the vocab, and a window `row_number`
    * (score DESC, length DESC — the encoder's longer-piece tie-break)
    * picks each cell's winner; a second recursion backtraces the split.
    * Covers: DP scoring, exact tie-breaks, the single-char floor
    * fallback (`n_oov`), and the full token sequence via md5. */
  val unigramFixedTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    val pieces = UniFixedVocab.map(_._1)
    Unigram.encode(docs, Unigram.UnigramVocab(UniFixedVocab))
      .select(col("doc_id"), size(col("tokens")).as("n_tokens"),
        size(filter(col("tokens"),
          t => !array_contains(typedLit(pieces), t))).as("n_oov"),
        md5(array_join(col("tokens"), "|")).as("tokens_md5"))
      .orderBy(col("doc_id"))
  }
  val unigramFixedTokensSql: String = {
    val vocab = UniFixedVocab
      .map { case (p, lp) => s"('${p.replace("'", "''")}',CAST($lp AS DOUBLE))" }
      .mkString(",")
    val maxLen = UniFixedVocab.map(_._1.length).max
    s"""
    WITH RECURSIVE
    docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
    voc(piece, lp) AS (SELECT * FROM (VALUES $vocab) v(piece, lp)),
    lens(l) AS (SELECT CAST(unnest(range(1, $maxLen + 1)) AS INT)),
    w AS (SELECT doc_id,
            unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS word,
            generate_subscripts(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), 1) AS pos
          FROM docs),
    wt AS (SELECT DISTINCT word FROM w),
    dp(word, i, bests, backs) AS (
      SELECT word, 1, [CAST(0.0 AS DOUBLE)], CAST([] AS INT[]) FROM wt
      UNION ALL
      SELECT word, i + 1,
             list_append(bests, bests[i - l + 1] + plp),
             list_append(backs, l)
      FROM (
        SELECT d.word, d.i, d.bests, d.backs, ln.l,
               COALESCE(v.lp, CASE WHEN ln.l = 1 THEN -1e9 END) AS plp
        FROM dp d
        JOIN lens ln ON ln.l <= least($maxLen, d.i)
        LEFT JOIN voc v ON v.piece = substr(d.word, d.i - ln.l + 1, ln.l)
        WHERE d.i <= len(d.word)
      )
      WHERE plp IS NOT NULL
      QUALIFY row_number() OVER (
        PARTITION BY word
        ORDER BY bests[i - l + 1] + plp DESC, l DESC) = 1),
    bt(word, at, n, oov, toks) AS (
      SELECT word, len(word), 0, 0, '' FROM dp WHERE i = len(word) + 1
      UNION ALL
      SELECT b.word, b.at - d.backs[b.at], b.n + 1,
             b.oov + CASE WHEN v.piece IS NULL THEN 1 ELSE 0 END,
             substr(b.word, b.at - d.backs[b.at] + 1, d.backs[b.at]) ||
               CASE WHEN b.toks = '' THEN '' ELSE '|' END || b.toks
      FROM bt b
      JOIN dp d ON d.word = b.word AND d.i = len(b.word) + 1
      LEFT JOIN voc v ON v.piece = substr(b.word, b.at - d.backs[b.at] + 1, d.backs[b.at])
      WHERE b.at > 0),
    enc AS (SELECT word, n AS n_toks, oov, toks FROM bt WHERE at = 0),
    agg AS (
      SELECT w.doc_id, sum(e.n_toks) AS n_tokens, sum(e.oov) AS n_oov,
             md5(string_agg(e.toks, '|' ORDER BY w.pos)) AS tokens_md5
      FROM w JOIN enc e ON e.word = w.word GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
           CAST(COALESCE(a.n_oov, 0) AS INT) AS n_oov,
           COALESCE(a.tokens_md5, md5('')) AS tokens_md5
    FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""
  }

  /** SFT chat-template rendering + loss-mask spans under a FULL oracle
    * ([[SftFormat.renderChatMl]]): conversations are derived
    * deterministically from documents (sentence-split alternating
    * user/assistant turns under a fixed system prompt), rendered to
    * ChatML, and every assistant span is emitted with its character
    * range plus md5 of BOTH the rendered conversation and the substring
    * the span addresses — DuckDB re-renders and re-slices independently,
    * so template chrome, offset arithmetic, and span/content agreement
    * are all hash-gated. */
  val sftChatmlSpans: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
      .filter(col("doc_id") < 300 && length(trim(col("text"))) > 0)
    // turns = consecutive 12-word chunks (the fixture has no sentence
    // punctuation), odd chunks user / even chunks assistant
    val numbered = docs
      .select(col("doc_id"),
        expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)").as("words"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(words) / 12.0) as int) - 1), " +
          "i -> array_join(slice(words, i * 12 + 1, 12), ' '))")))
      .select(col("doc_id").as("conv_id"), (col("pos") + 1).as("turn_idx"),
        col("col").as("content"))
      .select(col("conv_id"), col("turn_idx"),
        when(col("turn_idx") % 2 === 1, "user").otherwise("assistant").as("role"),
        col("content"))
    val turns = docs
      .select(col("doc_id").as("conv_id"), lit(0).as("turn_idx"),
        lit("system").as("role"),
        lit("You are a helpful assistant.").as("content"))
      .unionByName(numbered)
    SftFormat.renderChatMl(turns)
      .select(col("conv_id"), col("n_turns"), col("n_mask_chars"),
        col("text"), explode(col("mask_spans")).as("sp"))
      .select(col("conv_id"), col("n_turns"), col("n_mask_chars"),
        md5(col("text")).as("text_md5"), col("sp.turn_idx").as("turn_idx"),
        col("sp.start").as("span_start"), col("sp.end").as("span_end"),
        md5(expr("substring(text, cast(sp.start + 1 as int), " +
          "cast(sp.end - sp.start as int))")).as("span_md5"))
      .orderBy(col("conv_id"), col("turn_idx"))
  }
  /** DPO preference pairs under a FULL oracle: DuckDB re-renders BOTH
    * sides from the raw fixture, re-derives the shared prefix (prompt +
    * assistant header) and each side's loss span, and hash-gates the
    * texts, the prefix bytes and the span substrings. Every 7th pair has
    * an EMPTY rejected response (the degenerate shape a pipeline must
    * carry, not crash on). */
  val dpoPairsSpans: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
      .filter(col("doc_id") < 300 && length(trim(col("text"))) > 0)
    val parts = docs
      .select(col("doc_id"),
        expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)").as("words"))
      .select(col("doc_id"),
        expr("array_join(slice(words, 1, 12), ' ')").as("user_c"),
        expr("array_join(slice(words, 13, 12), ' ')").as("chosen"),
        expr("CASE WHEN doc_id % 7 = 0 THEN '' " +
          "ELSE array_join(slice(words, 25, 12), ' ') END").as("rejected"))
    val promptTurns = parts
      .select(col("doc_id").as("pair_id"), lit(0).as("turn_idx"),
        lit("system").as("role"),
        lit("You are a helpful assistant.").as("content"))
      .unionByName(parts.select(col("doc_id").as("pair_id"),
        lit(1).as("turn_idx"), lit("user").as("role"),
        col("user_c").as("content")))
    val responses = parts.select(col("doc_id").as("pair_id"),
      col("chosen"), col("rejected"))
    SftFormat.renderDpoPairs(promptTurns, responses)
      .select(col("pair_id"), col("n_prompt_turns"), col("prefix_len"),
        md5(col("chosen_text")).as("chosen_md5"),
        md5(col("rejected_text")).as("rejected_md5"),
        md5(expr("substring(chosen_text, 1, cast(prefix_len as int))"))
          .as("prefix_md5"),
        (expr("substring(chosen_text, 1, cast(prefix_len as int))") ===
          expr("substring(rejected_text, 1, cast(prefix_len as int))"))
          .as("prefix_shared"),
        col("chosen_start"), col("chosen_end"),
        col("rejected_start"), col("rejected_end"),
        md5(expr("substring(chosen_text, cast(chosen_start + 1 as int), " +
          "cast(chosen_end - chosen_start as int))")).as("chosen_span_md5"),
        md5(expr("substring(rejected_text, cast(rejected_start + 1 as int), " +
          "cast(rejected_end - rejected_start as int))")).as("rejected_span_md5"))
      .orderBy(col("pair_id"))
  }
  val dpoPairsSpansSql: String = """
    WITH docs AS (SELECT doc_id, text FROM documents
                  WHERE doc_id < 300 AND len(trim(text)) > 0),
    p AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS words
          FROM docs),
    parts AS (SELECT doc_id,
            COALESCE(array_to_string(list_slice(words, 1, 12), ' '), '') AS user_c,
            COALESCE(array_to_string(list_slice(words, 13, 24), ' '), '') AS chosen,
            CASE WHEN doc_id % 7 = 0 THEN ''
                 ELSE COALESCE(array_to_string(list_slice(words, 25, 36), ' '), '')
            END AS rejected
          FROM p),
    r AS (SELECT doc_id AS pair_id,
            '<|im_start|>system' || chr(10) || 'You are a helpful assistant.'
              || '<|im_end|>' || chr(10)
              || '<|im_start|>user' || chr(10) || user_c || '<|im_end|>' || chr(10)
              || '<|im_start|>assistant' || chr(10) AS prefix,
            chosen, rejected
          FROM parts),
    t AS (SELECT pair_id, prefix,
            CAST(length(prefix) AS BIGINT) AS prefix_len,
            prefix || chosen || '<|im_end|>' || chr(10) AS chosen_text,
            prefix || rejected || '<|im_end|>' || chr(10) AS rejected_text,
            CAST(length(chosen) AS BIGINT) AS c_len,
            CAST(length(rejected) AS BIGINT) AS r_len
          FROM r)
    SELECT pair_id, CAST(2 AS BIGINT) AS n_prompt_turns, prefix_len,
           md5(chosen_text) AS chosen_md5,
           md5(rejected_text) AS rejected_md5,
           md5(substr(chosen_text, 1, CAST(prefix_len AS INT))) AS prefix_md5,
           substr(chosen_text, 1, CAST(prefix_len AS INT)) =
             substr(rejected_text, 1, CAST(prefix_len AS INT)) AS prefix_shared,
           prefix_len AS chosen_start, prefix_len + c_len AS chosen_end,
           prefix_len AS rejected_start, prefix_len + r_len AS rejected_end,
           md5(substr(chosen_text, CAST(prefix_len + 1 AS INT),
                      CAST(c_len AS INT))) AS chosen_span_md5,
           md5(substr(rejected_text, CAST(prefix_len + 1 AS INT),
                      CAST(r_len AS INT))) AS rejected_span_md5
    FROM t ORDER BY pair_id"""

  val sftChatmlSpansSql: String = """
    WITH docs AS (SELECT doc_id, text FROM documents
                  WHERE doc_id < 300 AND len(trim(text)) > 0),
    p AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS words
          FROM docs),
    numbered AS (SELECT doc_id,
        CAST(u.i + 1 AS INT) AS turn_idx, u.c AS content
      FROM (SELECT doc_id, unnest(list_transform(
              generate_series(0, CAST(ceil(len(words) / 12.0) AS INT) - 1),
              i -> {'i': i, 'c': array_to_string(
                      list_slice(words, i * 12 + 1, i * 12 + 12), ' ')})) AS u
            FROM p) q),
    turns AS (
      SELECT doc_id AS conv_id, 0 AS turn_idx, 'system' AS role,
             'You are a helpful assistant.' AS content FROM docs
      UNION ALL
      SELECT doc_id, turn_idx,
             CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END,
             content FROM numbered),
    r AS (SELECT conv_id, turn_idx, role, content,
            '<|im_start|>' || role || chr(10) || content || '<|im_end|>' || chr(10)
              AS rendered
          FROM turns),
    o AS (SELECT *,
            CAST(COALESCE(sum(length(rendered)) OVER (
              PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS turn_start
          FROM r),
    sp AS (SELECT conv_id, turn_idx, role,
            turn_start + 12 + length(role) + 1 AS span_start,
            turn_start + 12 + length(role) + 1 + length(content) AS span_end
          FROM o),
    conv AS (SELECT conv_id, string_agg(rendered, '' ORDER BY turn_idx) AS text,
                    count(*) AS n_turns
             FROM o GROUP BY conv_id),
    mask AS (SELECT conv_id, CAST(sum(span_end - span_start) AS BIGINT) AS n_mask_chars
             FROM sp WHERE role = 'assistant' GROUP BY conv_id)
    SELECT s.conv_id, c.n_turns, m.n_mask_chars, md5(c.text) AS text_md5,
           s.turn_idx, s.span_start, s.span_end,
           md5(substr(c.text, CAST(s.span_start + 1 AS INT),
                      CAST(s.span_end - s.span_start AS INT))) AS span_md5
    FROM sp s JOIN conv c USING (conv_id) JOIN mask m USING (conv_id)
    WHERE s.role = 'assistant'
    ORDER BY conv_id, turn_idx"""

  /** Train-once/encode-many round-trip under the SAME oracle as
    * `wordpiece_fixed_tokens`: the fixed vocabulary is PERSISTED as a
    * lake table ([[TokenizerStore]]), reloaded from disk, and only then
    * encoded — any loss of order, pieces, or dtype in the round trip
    * breaks the hash match. The production tokenizer deployment shape
    * (train corpus-side, ship the artifact, encode map-only anywhere). */
  val wordpiecePersistedTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    val store = graft.queries.Lake.scratchDir("llm_wp_vocab")
    TokenizerStore.saveWordPiece(s, store, WordPiece.WordPieceVocab(WpFixedVocab))
    val loaded = TokenizerStore.loadWordPiece(s, store)
    WordPiece.encode(docs, loaded)
      .select(col("doc_id"), col("n_tokens"),
        size(filter(col("tokens"), t => t === lit(WordPiece.Unk))).as("n_unk"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-trained WordPiece vocabulary (Schuster & Nakajima 2012 /
    * BERT), under a FULL oracle since r16: the likelihood-scored merge
    * loop replays as a recursive CTE ([[wordpieceLoopCte]] — per-round
    * symbol counts and pair counts recomputed from the working
    * segmentation, argmax by `cnt/(cnt_l·cnt_r)` with the engine's exact
    * tie-break; the ratio is one IEEE division of exact integer-valued
    * doubles, identical in both engines). Score semantics stay pinned
    * against hand-computed merges in WordPieceSpec. Fixture-verified
    * preconditions, like the BPE oracle's: trained merges are all
    * distinct strings (the engine's vocab LinkedHashSet never dedups on
    * the fixture) and the 300-piece cap binds identically (replayed as a
    * merge-count bound of 300 − |alphabet|). */
  val wordpieceTrainPieces: QueryFn = (s, dir) => {
    import s.implicits._
    val v = WordPiece.train(Tables.ensure(s, dir).documents, vocabSize = 300,
      maxWordTypes = 50000)
    v.pieces.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("rank", "piece").orderBy(col("rank"))
  }
  /** The shared recursive WordPiece-training CTE fragment (`words0`,
    * `alphabet`, `ncap`, `st`): BERT's likelihood-scored merge loop.
    * `wordpiece_train_pieces` and `wordpiece_tokens` both compose it. */
  private def wordpieceLoopCte: String = {
    val D = "\u001f"
    s"""
    words0 AS (
      SELECT list_reduce(list_transform(generate_series(1, length(w)),
            i -> '$D' || CASE WHEN i = 1 THEN '' ELSE '##' END ||
                 substr(w, i, 1) || '$D'),
          (a, b) -> a || b) AS s, count(*)::BIGINT AS freq
      FROM (SELECT unnest(regexp_extract_all(text,
          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS w FROM documents)
      GROUP BY 1),
    alphabet AS (
      SELECT sym, SUM(freq)::BIGINT AS cnt
      FROM (SELECT freq, unnest(string_split(trim(s, '$D'), '$D$D')) AS sym
            FROM words0)
      GROUP BY sym),
    ncap AS (SELECT (300 - count(*))::INT AS max_merges FROM alphabet),
    st AS (
      SELECT 0 AS it, 'w' AS kind, s, freq, NULL::VARCHAR AS piece FROM words0
      UNION ALL
      (WITH cur AS (SELECT * FROM st
                    WHERE kind = 'w' AND it < (SELECT max_merges FROM ncap)),
        syms AS (SELECT s, freq,
                   string_split(trim(s, '$D'), '$D$D') AS sl FROM cur),
        symcnt AS (
          SELECT sym, SUM(freq)::BIGINT AS cnt
          FROM (SELECT freq, unnest(sl) AS sym FROM syms) GROUP BY sym),
        pairs AS (SELECT p.l, p.r, SUM(freq)::BIGINT AS cnt
          FROM syms, LATERAL (SELECT unnest(list_transform(generate_series(1, len(sl) - 1),
              i -> struct_pack(l := sl[i], r := sl[i + 1])), recursive := true)) p
          GROUP BY p.l, p.r),
        best AS (
          -- the engine argmaxes over ALL pairs by score and THEN stops
          -- when the winner's count is < 2 (WordPiece.scala trainFromFreqs)
          -- — filtering to cnt >= 2 BEFORE the argmax would diverge when a
          -- count-1 pair of rare symbols outscores every frequent pair
          SELECT p.l, p.r, p.cnt,
            p.l || CASE WHEN starts_with(p.r, '##') THEN substr(p.r, 3)
                        ELSE p.r END AS joined
          FROM pairs p
          JOIN symcnt a ON a.sym = p.l
          JOIN symcnt b ON b.sym = p.r
          ORDER BY p.cnt::DOUBLE / (a.cnt::DOUBLE * b.cnt::DOUBLE) DESC,
                   p.cnt DESC, p.l, p.r
          LIMIT 1)
        SELECT c.it + 1, x.kind,
          CASE WHEN x.kind = 'w'
            THEN replace(c.s, '$D' || b.l || '$D$D' || b.r || '$D',
                              '$D' || b.joined || '$D') ELSE NULL END,
          CASE WHEN x.kind = 'w' THEN c.freq ELSE NULL END,
          CASE WHEN x.kind = 'p' THEN b.joined ELSE NULL END
        FROM cur c, best b, (SELECT 'w' AS kind UNION ALL SELECT 'p' AS kind) x
        WHERE b.cnt >= 2
          AND (x.kind = 'w' OR c.s = (SELECT min(s) FROM cur))))"""
  }
  val wordpieceTrainPiecesSql: String =
    s"""
    WITH RECURSIVE
    ${wordpieceLoopCte},
    ranked_alpha AS (
      SELECT row_number() OVER (ORDER BY cnt DESC, sym) - 1 AS rank,
             sym AS piece
      FROM alphabet),
    na AS (SELECT count(*) AS n FROM alphabet),
    merges AS (
      SELECT (SELECT n FROM na) + it - 1 AS rank, piece
      FROM st WHERE kind = 'p')
    SELECT CAST(rank AS INT) AS rank, piece FROM ranked_alpha
    UNION ALL
    SELECT CAST(rank AS INT) AS rank, piece FROM merges
    ORDER BY rank"""

  /** Corpus tokenized with its OWN trained WordPiece vocabulary, under a
    * FULL oracle since r16: the training CTE chains into the greedy
    * longest-match-first encode walk (the `wordpiece_fixed_tokens`
    * replay, now carrying the emitted piece strings so the whole token
    * stream — `##` continuations, `[UNK]` collapses, cross-word order —
    * is hash-gated; the engine's separator-free concat is replayed
    * verbatim, piece boundaries riding the `##` convention). */
  val wordpieceTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val v = WordPiece.train(docs, vocabSize = 300, maxWordTypes = 50000)
    WordPiece.encode(docs, v)
      .select(col("doc_id"), col("n_tokens"),
        md5(concat_ws("", col("tokens"))).as("tokens_md5"))
      .orderBy(col("doc_id"))
  }
  val wordpieceTokensSql: String =
    s"""
    WITH RECURSIVE
    ${wordpieceLoopCte},
    v AS (
      SELECT DISTINCT piece,
        CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS content,
        (piece LIKE '##%') AS cont
      FROM (SELECT sym AS piece FROM alphabet
            UNION ALL SELECT piece FROM st WHERE kind = 'p')),
    w AS (SELECT doc_id,
            unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS word,
            generate_subscripts(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), 1) AS pos
          FROM documents),
    wt AS (SELECT DISTINCT word FROM w),
    pcand AS (SELECT word, CAST(unnest(range(0, len(word))) AS INT) AS p FROM wt),
    mt AS (
      SELECT pcand.word, pcand.p, len(v.content) AS clen, v.piece,
        row_number() OVER (PARTITION BY pcand.word, pcand.p
                           ORDER BY len(v.content) DESC, v.piece) AS rk
      FROM pcand JOIN v ON v.cont = (pcand.p > 0)
        AND len(v.content) <= len(pcand.word) - pcand.p
        AND substr(pcand.word, pcand.p + 1, len(v.content)) = v.content),
    step AS (SELECT word, p, clen, piece FROM mt WHERE rk = 1),
    walk(word, p, n, unk, acc) AS (
      SELECT word, 0, 0, len(word) > 100, '' FROM wt
      UNION ALL
      SELECT wk.word,
        CAST(COALESCE(wk.p + st2.clen, len(wk.word)) AS INT),
        wk.n + 1,
        st2.p IS NULL,
        CASE WHEN st2.p IS NULL THEN wk.acc
             ELSE wk.acc || st2.piece END
      FROM walk wk LEFT JOIN step st2 ON st2.word = wk.word AND st2.p = wk.p
      WHERE wk.p < len(wk.word) AND NOT wk.unk),
    enc AS (
      SELECT word,
             CASE WHEN unk THEN 1 ELSE n END AS n_toks,
             CASE WHEN unk THEN '[UNK]' ELSE acc END AS toks
      FROM walk WHERE unk OR p >= len(word)),
    agg AS (
      SELECT w.doc_id, sum(e.n_toks) AS n_tokens,
             md5(string_agg(e.toks, '' ORDER BY w.pos)) AS tokens_md5
      FROM w JOIN enc e ON e.word = w.word GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
           COALESCE(a.tokens_md5, md5('')) AS tokens_md5
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""

  /** The fixed vocabulary for the oracle-gated WordPiece query: all ASCII
    * letters (plain + `##` continuation) plus a handful of multi-char
    * pieces. Digits and punctuation are deliberately ABSENT so the
    * whole-word `[UNK]` fallback fires on every digit-run/punctuation
    * pre-token — the oracle covers both paths. MUST stay in lockstep with
    * `wordpieceFixedTokensSql`'s `v` CTE. */
  private val WpFixedVocab: Vector[String] = {
    val letters = (('a' to 'z') ++ ('A' to 'Z')).map(_.toString)
    val multi = Vector("the", "in", "re", "an", "on", "at", "or", "en",
      "th", "er", "##ing", "##ed", "##er", "##s", "##th", "##e", "##t",
      "##d", "##ion", "##ly")
    (letters ++ letters.map("##" + _) ++ multi).distinct.toVector
  }

  /** Pinned byte-level merge table (GPT-2 family): symbols are remapped
    * UTF-8 bytes — `Ġ` is the remapped space ("Ġ", GPT-2's
    * bytes_to_unicode of 0x20). Same training-validity invariant as
    * [[BpeFixedMerges]]; MUST stay in lockstep with
    * `bpeByteFixedTokensSql`'s `m` VALUES list. */
  private val ByteBpeFixedMerges: Vector[(String, String)] = Vector(
    ("Ġ", "t"), ("Ġ", "a"), ("h", "e"), ("i", "n"),
    ("Ġt", "he"), ("e", "r"), ("Ġ", "s"), ("o", "n"),
    ("Ġa", "n"), ("r", "e"), ("Ġ", "w"), ("n", "d"),
    ("Ġan", "d"), ("e", "s"), ("Ġ", "o"), ("Ġ", "c"),
    ("in", "g"), ("o", "r"), ("Ġ", "b"), ("a", "t"), ("e", "n"),
    ("s", "t"), ("1", "0"), ("Ġ", "1"), ("a", "r"), ("o", "u"),
    ("Ġw", "h"), ("e", "d"), ("Ġs", "t"))

  /** Byte-level (GPT-2) BPE under a FULL oracle. GPT-2's pre-token regex
    * carries a lookahead (`\s+(?!\S)`) RE2 cannot run, but on text with
    * no consecutive/leading/trailing whitespace and no non-ASCII byte the
    * pattern provably degenerates to the lookahead-free
    * contractions | ` ?letters` | ` ?digits` | ` ?punct` form (every
    * space attaches to its following pre-token, no whitespace-run tokens
    * exist), and the byte remap degenerates to space→Ġ with all other
    * printable ASCII mapping to themselves. BOTH sides therefore filter
    * to exactly that doc shape with the same regex, and DuckDB replays
    * the remap + the rank-ordered merge walk precisely (same fixed-point
    * scheme as `bpe_fixed_tokens`). The full per-doc token stream is
    * md5-gated. */
  val bpeByteFixedTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
      .filter(col("doc_id") < 300)
      .filter(expr("NOT regexp_like(text, '[^ -~]|  |^ | $')"))
    ByteBpe.encode(docs, ByteBpe.ByteBpeVocab(ByteBpeFixedMerges))
      .select(col("doc_id"), col("n_tokens"),
        md5(array_join(col("tokens"), "|")).as("tokens_md5"))
      .orderBy(col("doc_id"))
  }
  val bpeByteFixedTokensSql: String = {
    val merges = ByteBpeFixedMerges.zipWithIndex
      .map { case ((l, r), i) =>
        s"($i,'${l.replace("Ġ", "' || chr(288) || '")}','$r')" }
      .mkString(",")
    val pretok = "''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"
    s"""
    WITH RECURSIVE
    docs AS (SELECT doc_id, text FROM documents
             WHERE doc_id < 300 AND NOT regexp_matches(text, '[^ -~]|  |^ | ${"$"}')),
    m(rank, l, r) AS (SELECT * FROM (VALUES $merges) v(rank, l, r)),
    w AS (SELECT doc_id,
            unnest(regexp_extract_all(text, '$pretok')) AS word,
            generate_subscripts(regexp_extract_all(text, '$pretok'), 1) AS pos
          FROM docs),
    wt AS (SELECT DISTINCT replace(word, ' ', chr(288)) AS word FROM w),
    init AS (
      SELECT word,
        chr(31) || array_to_string(list_transform(range(1, len(word)+1),
          i -> substr(word, CAST(i AS INT), 1)), chr(31)) || chr(31) AS seq
      FROM wt),
    walk(word, seq, rk) AS (
      SELECT word, seq, 0 FROM init
      UNION ALL
      SELECT w.word,
        replace(w.seq, chr(31) || m.l || chr(31) || m.r || chr(31),
                       chr(31) || m.l || m.r || chr(31)),
        CASE WHEN replace(w.seq, chr(31) || m.l || chr(31) || m.r || chr(31),
                          chr(31) || m.l || m.r || chr(31)) <> w.seq
             THEN w.rk ELSE w.rk + 1 END
      FROM walk w JOIN m ON m.rank = w.rk
      WHERE w.rk < ${ByteBpeFixedMerges.length}),
    enc AS (
      SELECT word,
        len(seq) - len(replace(seq, chr(31), '')) - 1 AS n_toks,
        replace(trim(seq, chr(31)), chr(31), '|') AS toks
      FROM walk WHERE rk = ${ByteBpeFixedMerges.length}),
    agg AS (
      SELECT w.doc_id, sum(e.n_toks) AS n_tokens,
             md5(string_agg(e.toks, '|' ORDER BY w.pos)) AS tokens_md5
      FROM w JOIN enc e ON e.word = replace(w.word, ' ', chr(288)) GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
           COALESCE(a.tokens_md5, md5('')) AS tokens_md5
    FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""
  }

  /** WordPiece greedy longest-match encoding under a FULL oracle: with a
    * FIXED vocabulary the greedy walk is deterministic, and DuckDB replays
    * it exactly — per distinct word type, a non-recursive join computes
    * the longest piece matching at every cursor position, then a
    * recursive CTE follows that `next` table (greedy = a chain, so the
    * recursion is pure joins — no aggregates in the recursive term).
    * Per-doc token and `[UNK]` counts are then frequency-weighted sums
    * over word types. Covers: longest-match-wins, `##` continuation
    * positioning, whole-word [UNK] on uncovered chars (digits/punct). */
  val wordpieceFixedTokens: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 300)
    WordPiece.encode(docs, WordPiece.WordPieceVocab(WpFixedVocab))
      .select(col("doc_id"), col("n_tokens"),
        size(filter(col("tokens"), t => t === lit(WordPiece.Unk))).as("n_unk"))
      .orderBy(col("doc_id"))
  }
  val wordpieceFixedTokensSql: String = """
    WITH RECURSIVE
    letters AS (
      SELECT chr(CAST(x AS INT)) AS c FROM generate_series(97, 122) t(x)
      UNION ALL SELECT chr(CAST(x AS INT)) FROM generate_series(65, 90) t(x)),
    multi(piece) AS (SELECT * FROM (VALUES ('the'),('in'),('re'),('an'),
      ('on'),('at'),('or'),('en'),('th'),('er'),('##ing'),('##ed'),('##er'),
      ('##s'),('##th'),('##e'),('##t'),('##d'),('##ion'),('##ly')) vv(piece)),
    v AS (
      SELECT DISTINCT piece,
        CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS content,
        (piece LIKE '##%') AS cont
      FROM (SELECT c AS piece FROM letters
            UNION ALL SELECT '##' || c FROM letters
            UNION ALL SELECT piece FROM multi)),
    docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
    w AS (SELECT doc_id,
            unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS word
          FROM docs),
    wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1, 2),
    wt AS (SELECT DISTINCT word FROM wc),
    pos AS (SELECT word, CAST(unnest(range(0, len(word))) AS INT) AS p FROM wt),
    m AS (
      SELECT pos.word, pos.p, len(v.content) AS clen,
        row_number() OVER (PARTITION BY pos.word, pos.p
                           ORDER BY len(v.content) DESC, v.piece) AS rk
      FROM pos JOIN v ON v.cont = (pos.p > 0)
        AND len(v.content) <= len(pos.word) - pos.p
        AND substr(pos.word, pos.p + 1, len(v.content)) = v.content),
    step AS (SELECT word, p, clen FROM m WHERE rk = 1),
    walk(word, p, n, unk) AS (
      SELECT word, 0, 0, len(word) > 100 FROM wt
      UNION ALL
      SELECT wk.word,
        CAST(COALESCE(wk.p + s.clen, len(wk.word)) AS INT),
        wk.n + 1,
        s.p IS NULL
      FROM walk wk LEFT JOIN step s ON s.word = wk.word AND s.p = wk.p
      WHERE wk.p < len(wk.word) AND NOT wk.unk),
    enc AS (
      SELECT word, CASE WHEN unk THEN 1 ELSE n END AS n_toks,
             CASE WHEN unk THEN 1 ELSE 0 END AS n_unk
      FROM walk WHERE unk OR p >= len(word)),
    agg AS (
      SELECT wc.doc_id, sum(wc.cnt * enc.n_toks) AS n_tokens,
             sum(wc.cnt * enc.n_unk) AS n_unk
      FROM wc JOIN enc ON enc.word = wc.word GROUP BY 1)
    SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
           CAST(COALESCE(a.n_unk, 0) AS INT) AS n_unk
    FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""

  /** Character-class hygiene over text with synthesized mojibake (the
    * fixture is pure ASCII): bell control chars, accented chars, and
    * U+FFFD appended deterministically per doc_id, then measured. */
  val textCharclass: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 400)
    val aug = docs.select(col("doc_id"), expr(
      "concat(text, repeat(chr(7), cast(doc_id % 3 as int)), " +
        "repeat('é', cast(doc_id % 5 as int)), " +
        "case when doc_id % 7 = 0 then '�' else '' end)").as("text"))
    TextAnalysis.charClassSignals(aug).orderBy(col("doc_id"))
  }
  val textCharclassSql: String = """
    WITH aug AS (
      SELECT doc_id,
        text || repeat(chr(7), CAST(doc_id % 3 AS INT))
             || repeat(chr(233), CAST(doc_id % 5 AS INT))
             || CASE WHEN doc_id % 7 = 0 THEN chr(65533) ELSE '' END AS t
      FROM documents WHERE doc_id < 400)
    SELECT doc_id,
      CAST(length(t) AS INT) AS len_chars,
      CAST(len(regexp_extract_all(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]')) AS INT) AS n_control,
      CAST(len(regexp_extract_all(t, '[^\x00-\x7F]')) AS INT) AS n_non_ascii,
      CAST(len(regexp_extract_all(t, chr(65533))) AS INT) AS n_replacement,
      CAST(len(regexp_extract_all(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]')) AS DOUBLE)
        / length(t) AS control_ratio,
      CAST(len(regexp_extract_all(t, '[^\x00-\x7F]')) AS DOUBLE)
        / length(t) AS non_ascii_ratio
    FROM aug ORDER BY doc_id"""

  /** Trigram stupid-backoff LM (Brants 2007): train on docs < 400, score
    * docs 400-499 — unseen trigrams exercise the backoff chain, counted
    * per doc in `n_backoffs`. Means rounded 6dp in both engines. */
  val textTrigramLm: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    TextAnalysis.trigramLmScore(
        docs.filter(col("doc_id") < 400),
        docs.filter(col("doc_id") >= 400 && col("doc_id") < 500))
      .orderBy(col("doc_id"))
  }
  val textTrigramLmSql: String = """
    WITH tr AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 400),
    tri AS (
      SELECT g3, COUNT(*) AS c123 FROM (
        SELECT unnest(list_transform(generate_series(1, len(t) - 2),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g3 FROM tr WHERE len(t) >= 3)
      GROUP BY 1),
    big AS (
      SELECT g2, COUNT(*) AS c12 FROM (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
          i -> t[i] || ' ' || t[i+1])) AS g2 FROM tr WHERE len(t) >= 2)
      GROUP BY 1),
    uni AS (SELECT w, COUNT(*) AS c1 FROM (SELECT unnest(t) AS w FROM tr) GROUP BY 1),
    tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    sc AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id >= 400 AND doc_id < 500),
    grams AS (
      SELECT doc_id,
        t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g3,
        t[i] || ' ' || t[i+1] AS g12,
        t[i+1] || ' ' || t[i+2] AS g23,
        t[i+1] AS w2, t[i+2] AS w3
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
            FROM sc WHERE len(t) >= 3)),
    scored AS (
      SELECT g.doc_id,
        CASE WHEN tri.c123 IS NOT NULL AND b12.c12 IS NOT NULL
             THEN CAST(tri.c123 AS DOUBLE) / b12.c12
             ELSE 0.4 * (CASE WHEN b23.c12 IS NOT NULL AND u2.c1 IS NOT NULL
                              THEN CAST(b23.c12 AS DOUBLE) / u2.c1
                              ELSE 0.4 * (COALESCE(u3.c1, 0) + 0.5) /
                                   ((SELECT n FROM tot) + 0.5 * (SELECT v FROM tot))
                         END)
        END AS s,
        CASE WHEN tri.c123 IS NULL THEN 1 ELSE 0 END AS backed_off
      FROM grams g
      LEFT JOIN tri ON tri.g3 = g.g3
      LEFT JOIN big b12 ON b12.g2 = g.g12
      LEFT JOIN big b23 ON b23.g2 = g.g23
      LEFT JOIN uni u2 ON u2.w = g.w2
      LEFT JOIN uni u3 ON u3.w = g.w3)
    SELECT doc_id, COUNT(*) AS n_trigrams,
      CAST(SUM(backed_off) AS BIGINT) AS n_backoffs,
      round(avg(log2(s)), 6) AS mean_log2s
    FROM scored GROUP BY doc_id ORDER BY doc_id"""

  /** Corpus bigram-LM quality score (the CCNet/Gopher perplexity-filter
    * recipe with the corpus itself as the model). The mean of per-bigram
    * log2 P is rounded to 6dp in BOTH engines — libm log2 and summation
    * order differ at ~1e-15, nine orders below the rounding grain. */
  val textLmScore: QueryFn = (s, dir) =>
    TextAnalysis.lmScore(
      Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))
  val textLmScoreSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    elig AS (SELECT * FROM toks WHERE len(t) >= 2),
    grams AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        i -> t[i] || ' ' || t[i+1])) AS gram
      FROM elig),
    uni AS (
      SELECT w1, COUNT(*) AS c_uni
      FROM (SELECT unnest(t) AS w1 FROM elig) GROUP BY 1),
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    bi AS (SELECT gram, COUNT(*) AS c_bi FROM grams GROUP BY 1),
    scored AS (
      SELECT g.doc_id,
        log2((b.c_bi + 0.5) / (u.c_uni + 0.5 * (SELECT v FROM v))) AS logp
      FROM grams g
      JOIN bi b USING (gram)
      JOIN uni u ON u.w1 = string_split(g.gram, ' ')[1])
    SELECT doc_id, COUNT(*) AS n_bigrams, round(avg(logp), 6) AS mean_log2p
    FROM scored GROUP BY doc_id ORDER BY doc_id"""

  /** DSIR importance weights against a 3-source "target domain": which
    * raw documents look like the curated sources. The oracle recomputes
    * the hashed-ngram bucket distributions, the Laplace-smoothed
    * log-ratio lookup, and the per-doc sums — buckets come from an
    * md5-prefix both engines share, so the whole pipeline (not just the
    * output shape) is cross-checked. */
  val dsirWeights: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    TextAnalysis.dsirWeights(docs,
        col("source").isin("src1", "src2", "src3"), buckets = 1024)
      .orderBy(col("doc_id"))
  }
  val dsirWeightsSql: String = """
    WITH toks AS (
      SELECT doc_id, source,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents),
    f AS (
      SELECT doc_id, source IN ('src1','src2','src3') AS is_t,
        list_concat(t, list_transform(generate_series(1, len(t) - 1),
          i -> t[i] || ' ' || t[i+1])) AS fs
      FROM toks WHERE len(t) >= 1),
    e AS (
      SELECT doc_id, is_t,
        CAST(concat('0x', substr(md5(tok), 1, 6)) AS BIGINT) % 1024 AS bk
      FROM (SELECT doc_id, is_t, unnest(fs) AS tok FROM f)),
    dist AS (
      SELECT bk, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct, COUNT(*) AS cr
      FROM e GROUP BY bk),
    tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt, CAST(SUM(cr) AS DOUBLE) AS tr FROM dist),
    lut AS (
      SELECT bk, ln((ct + 1.0) / (tt + 1024)) - ln((cr + 1.0) / (tr + 1024)) AS w
      FROM dist, tot),
    scored AS (
      SELECT doc_id, round(SUM(w), 6) AS dsir_lw
      FROM e JOIN lut USING (bk) GROUP BY doc_id)
    SELECT f.doc_id, CAST(len(f.fs) AS INT) AS n_feats, s.dsir_lw
    FROM f JOIN scored s USING (doc_id) ORDER BY doc_id"""

  /** Naive-Bayes target-vs-rest classifier log-odds (the CCNet/GPT-3
    * fastText-style quality filter shape): src0 is the "curated" domain,
    * everything else the raw pool. The oracle retrains the whole model —
    * token counts, smoothed likelihoods, prior — in SQL, so training and
    * scoring are both hash-gated, not just the output shape. */
  val textNbClassifier: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    TextAnalysis.nbDomainLogOdds(docs, col("source") === "src0")
      .orderBy(col("doc_id"))
  }
  val textNbClassifierSql: String = """
    WITH d AS (
      SELECT doc_id, source = 'src0' AS is_t,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents),
    tok AS (SELECT doc_id, is_t, unnest(t) AS w FROM d),
    counts AS (
      SELECT w, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t, COUNT(*) AS c_all
      FROM tok GROUP BY w),
    totals AS (
      SELECT CAST(SUM(c_t) AS DOUBLE) AS n_t,
             CAST(SUM(c_all - c_t) AS DOUBLE) AS n_o,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM counts),
    prior AS (
      SELECT ln(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) * 1.0 /
                SUM(CASE WHEN is_t THEN 0 ELSE 1 END)) AS lp
      FROM d),
    s AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
        SUM(ln((c_t + 0.5) / (n_t + 0.5 * v)) -
            ln((c_all - c_t + 0.5) / (n_o + 0.5 * v))) AS s
      FROM tok JOIN counts USING (w), totals GROUP BY doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      round(s.s + prior.lp, 6) AS nb_logodds
    FROM s, prior ORDER BY doc_id"""

  /** Trained quality classifier ([[QualityClassifier]]): logistic
    * regression over the qualitySignals features, weak-labeled by the
    * Gopher rule gate — filter DISTILLATION (train a smooth scorer to
    * mimic a hard rule set, the standard move for turning threshold
    * filters into calibrated keep-probabilities that can be traded off
    * against token budget). Output is the model itself (coefficients at
    * 6dp + train accuracy), rows-only with a digest pin: the fixed-point
    * long-sum gradient makes the trajectory bit-deterministic under any
    * partitioning. */
  val lrQualityTrain: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    // distillation target: the Gopher gate parameterized for this corpus
    // (the synthetic vocabulary has no English stopwords, so the
    // stopword rule is disabled and the length/word-size thresholds sit
    // inside the fixture's distribution — two rules genuinely bind)
    val labels = TextAnalysis.gopherRules(docs,
      minWords = 55, maxMeanWordLen = 4.55, minStopwords = 0)
      .select(col("doc_id"), col("pass").cast("int").as("label"))
    val feats = QualityClassifier.featurize(docs).join(labels, "doc_id")
    val m = QualityClassifier.train(feats, QualityClassifier.defaultFeatures.map(_._1))
    QualityClassifier.modelRows(s, m)
  }

  /** The same classifier SERVING with pinned coefficients (the
    * sf0.01-trained model): logit + keep verdict per document, under a
    * FULL oracle — the logit is a fixed-order chain of IEEE-exact +,×,÷
    * (no transcendentals reach the output; thresholding the logit at 0 is
    * thresholding the probability at 0.5), so DuckDB replays it bit for
    * bit from the raw text. */
  val lrQualityScore: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 500)
    QualityClassifier.score(docs, LrPinnedWeights, LrPinnedIntercept)
      .orderBy(col("doc_id"))
  }

  /** The persisted-model serve path (TRAIN → SAVE → restart → score):
    * the pinned model round-trips through the on-disk ModelStore lake
    * table and must score bit-identically — same oracle as
    * lr_quality_score, proving the store preserves full binary64
    * coefficients, not a lossy display form. */
  val lrScorePersisted: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 500)
    val store = graft.queries.Lake.scratchDir("llm_lr_model")
    ModelStore.save(s, store, QualityClassifier.Model(
      LrPinnedWeights.map(_._1), LrPinnedWeights.map(_._2).toArray,
      LrPinnedIntercept, trainAccuracy = 1.0, n = 500L))
    ModelStore.scoreWith(s, store, docs).orderBy(col("doc_id"))
  }
  // pinned coefficients = lr_quality_train output on the sf0.01 fixture
  // (punct/digit ratios are constant 0 in the synthetic corpus, so their
  // coefficients are exactly 0 under the ridge)
  private val LrPinnedIntercept = 44.287077
  private val LrPinnedWeights: Seq[(String, Double)] = Seq(
    "tokens_per_100" -> 0.819094,
    "avg_token_span_per_10" -> -69.155524,
    "punct_ratio" -> 0.0,
    "digit_ratio" -> 0.0,
    "stopword_ratio" -> -1.999443,
    "distinct_token_ratio" -> -17.592736)
  /** Shared oracle fragments: the qualitySignals feature CTE and the
    * pinned linear form, interpolated from the ONE Scala constant so the
    * score and budget oracles can never drift from the pinned model. */
  private def lrFeatureCte(where: String): String = s"""
    WITH toks AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(lower(text), '\\s+'), w -> len(w) > 0) AS t
      FROM documents $where),
    f AS (SELECT doc_id,
      CAST(len(t) AS INT) AS n_tokens,
      CAST(len(t) AS DOUBLE) / 100.0 AS f1,
      (CAST(length(text) AS DOUBLE) / len(t)) / 10.0 AS f2,
      CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE) / length(text) AS f3,
      CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS f4,
      CAST(len(list_filter(t, w -> list_contains(['the','a','an','of','and','or','to','in','is','it','for','on','with','as','at','by','from','that','this'], w))) AS DOUBLE) / len(t) AS f5,
      CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS f6
      FROM toks)"""

  /** `w0 + w1*f1 + ... + w6*f6` rendered from the pinned constants —
    * plain toString keeps the exact decimal literals both engines parse
    * to the same doubles. */
  private def lrLinearSql: String =
    LrPinnedIntercept.toString + LrPinnedWeights.zipWithIndex.map {
      case ((_, w), i) => s" + $w * f${i + 1}"
    }.mkString

  val lrQualityScoreSql: String = s"""
    ${lrFeatureCte("WHERE doc_id < 500")},
    z AS (SELECT doc_id, $lrLinearSql AS z FROM f)
    SELECT doc_id, round(z, 6) AS lr_logit, z > 0 AS keep
    FROM z ORDER BY doc_id"""

  /** Token-budget corpus selection ([[Mixing.budgetSelect]]): fill a fixed
    * token budget with the highest-LR-scored documents. The engine runs
    * the threshold-bin plan (per-bin aggregate + driver prefix sum +
    * codegen'd keep filter; only the boundary bin sorts); the oracle
    * replays the NAIVE global prefix-sum window — the two must agree row
    * for row, which is exactly the scalability claim (the threshold scan
    * IS the global cumsum, without the single-partition sort). */
  /** Bitext mining under a FULL oracle: 50 planted "translations" (exact
    * copies of the first 50 source vectors under offset ids) hide among
    * 300 real distractor targets; the margin scorer must surface them.
    * Double-precision cosines + sorted-order neighborhood folds make ids,
    * cosines AND margins bit-replayable (see [[Bitext]]). */
  val bitextMine: QueryFn = (s, dir) => {
    val e = Tables.ensure(s, dir).embeddings.select(col("vec_id"), col("embedding"))
    val src = e.filter(col("vec_id") < 300)
    val tgt = e.filter(col("vec_id") >= 300 && col("vec_id") < 600)
      .unionByName(e.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
    Bitext.minePairs(src, tgt, k = 4, threshold = 1.05, doublePrec = true)
      .orderBy(col("src_id"))
  }
  val bitextMineSql: String = s"""
    WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    src AS (SELECT vec_id, v FROM ev WHERE vec_id < 300),
    tgt AS (SELECT vec_id, v FROM ev WHERE vec_id >= 300 AND vec_id < 600
            UNION ALL
            SELECT vec_id + 10000, v FROM ev WHERE vec_id < 50),
    fs AS (SELECT s.vec_id AS q_id, t.vec_id AS c_id,
             ${drCos("s.v", "t.v")} AS cos FROM src s CROSS JOIN tgt t),
    fwd AS (SELECT q_id, c_id, cos,
              row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
            FROM fs),
    avgf AS (SELECT q_id,
               list_reduce(list_prepend(0.0, list(cos ORDER BY cos DESC)),
                 (a, x) -> a + x) / count(*) AS avg_f
             FROM fwd WHERE rn <= 4 GROUP BY q_id),
    bs AS (SELECT t.vec_id AS q_id, s.vec_id AS c_id,
             ${drCos("t.v", "s.v")} AS cos FROM tgt t CROSS JOIN src s),
    bwd AS (SELECT q_id, c_id, cos,
              row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
            FROM bs),
    avgb AS (SELECT q_id AS c_id,
               list_reduce(list_prepend(0.0, list(cos ORDER BY cos DESC)),
                 (a, x) -> a + x) / count(*) AS avg_b
             FROM bwd WHERE rn <= 4 GROUP BY q_id),
    m AS (SELECT f.q_id, f.c_id, f.cos,
            f.cos / ((af.avg_f + ab.avg_b) / 2.0) AS margin
          FROM fwd f JOIN avgf af ON af.q_id = f.q_id
                     JOIN avgb ab ON ab.c_id = f.c_id
          WHERE f.rn <= 4),
    top1 AS (SELECT q_id, c_id, cos, margin,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY margin DESC, c_id) AS rn FROM m)
    SELECT q_id AS src_id, c_id AS tgt_id, cos, margin
    FROM top1 WHERE rn = 1 AND margin >= 1.05
    ORDER BY src_id"""

  val budgetSelect: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents
    val scored = QualityClassifier.score(docs, LrPinnedWeights, LrPinnedIntercept)
      .join(TextAnalysis.qualitySignals(docs).select(col("doc_id"), col("n_tokens")), "doc_id")
    Mixing.budgetSelect(scored, "lr_logit", "n_tokens", "doc_id", budget = 13000L)
      .select(col("doc_id"), col("n_tokens"), col("lr_logit"))
      .orderBy(col("doc_id"))
  }
  val budgetSelectSql: String = s"""
    ${lrFeatureCte("")},
    z AS (SELECT doc_id, n_tokens, round($lrLinearSql, 6) AS lr_logit FROM f),
    ord AS (SELECT *, sum(n_tokens) OVER (ORDER BY lr_logit DESC, doc_id) AS cum
      FROM z)
    SELECT doc_id, n_tokens, lr_logit FROM ord WHERE cum <= 13000
    ORDER BY doc_id"""

  /** Token-distribution entropy (boilerplate/spam signal). Entropies are
    * rounded to 6dp in BOTH engines — float accumulation order differs
    * across engines at ~1e-14, four orders below the rounding grain. */
  val textEntropy: QueryFn = (s, dir) =>
    TextAnalysis.tokenEntropy(
      Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))
  val textEntropySql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    u AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
    a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_distinct, SUM(cnt * ln(cnt)) AS s
          FROM c GROUP BY 1)
    SELECT doc_id, n_tokens, n_distinct,
      round(ln(n_tokens) - s / n_tokens, 6) AS token_entropy,
      CASE WHEN n_distinct = 1 THEN 0.0
           ELSE round((ln(n_tokens) - s / n_tokens) / ln(n_distinct), 6)
      END AS norm_entropy
    FROM a ORDER BY doc_id"""

  /** Power-of-two context-length histogram per language (batch shaping).
    * Bucket exponent via integer bit-length in both engines — no
    * floor(log2) float boundary risk. */
  val lengthBuckets: QueryFn = (s, dir) =>
    TextAnalysis.lengthBuckets(Tables.ensure(s, dir).documents)
      .orderBy(col("lang"), col("bucket_log2"))
  val lengthBucketsSql: String = """
    WITH toks AS (
      SELECT lang,
        len(list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS n
      FROM documents),
    b AS (
      SELECT lang, n,
        CASE WHEN n <= 0 THEN -1
             ELSE CAST(length(bin(CAST(n AS BIGINT))) - 1 AS INT) END AS bucket_log2
      FROM toks)
    SELECT lang, bucket_log2, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS sum_tokens,
           CAST(MIN(n) AS INT) AS min_tokens,
           CAST(MAX(n) AS INT) AS max_tokens,
           CASE WHEN bucket_log2 < 0 THEN 0
                ELSE CAST(pow(2, bucket_log2) AS BIGINT) END AS bucket_lo
    FROM b GROUP BY lang, bucket_log2 ORDER BY lang, bucket_log2"""

  /** Overlapping token-window chunking (retrieval/embedding prep): 64-token
    * windows, stride 48; chunk content gated by md5. */
  val chunkDocuments: QueryFn = (s, dir) =>
    Packing.chunkTokens(
      Tables.ensure(s, dir).documents.filter(col("doc_id") < 300),
      idCol = "doc_id", textCol = "text", chunkSize = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_idx"))
  val chunkDocumentsSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 300),
    p AS (
      SELECT doc_id, t,
        CASE WHEN len(t) <= 64 THEN 1
             ELSE CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1 END AS nc
      FROM toks),
    x AS (SELECT doc_id, t, unnest(generate_series(0, nc - 1)) AS chunk_idx FROM p),
    s AS (SELECT doc_id, chunk_idx,
            CAST(chunk_idx * 48 + 1 AS BIGINT) AS start_tok,
            t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64] AS ck
          FROM x)
    SELECT doc_id, chunk_idx, start_tok,
           CAST(len(ck) AS INT) AS n_chunk_tokens,
           md5(COALESCE(array_to_string(ck, ' '), '')) AS chunk_md5
    FROM s ORDER BY doc_id, chunk_idx"""

  val multimodalFeatures: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 200)
    Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .select(col("id"), col("format"), col("width"), col("height"),
        size(col("features")).as("n_features"))
      .orderBy(col("id"))
  }

  /** Repeated-segment boilerplate removal (the RefinedWeb/CCNet line-dedup
    * recipe): drop every 8-word segment occurring in ≥2 distinct docs and
    * rebuild each doc from its survivors — the oracle reproduces the
    * segmentation with 1-based list slicing and the rebuild with an
    * ordered string_agg. */
  val dedupSegments: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 400)
    Dedup.dedupSegments(docs, window = 8, minDocs = 2).orderBy(col("doc_id"))
  }
  val dedupSegmentsSql: String = """
    WITH ws AS (
      SELECT doc_id,
        list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
      FROM documents WHERE doc_id < 400),
    segs AS (
      SELECT doc_id, i - 1 AS idx,
        array_to_string(w[(i-1)*8+1 : i*8], ' ') AS seg
      FROM (SELECT doc_id, w,
              unnest(generate_series(1, CAST(ceil(len(w)/8.0) AS BIGINT))) AS i
            FROM ws WHERE len(w) > 0)),
    dup AS (SELECT seg FROM segs GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 2),
    kept AS (
      SELECT s.doc_id, s.idx, s.seg FROM segs s
      WHERE s.seg NOT IN (SELECT seg FROM dup)),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
        string_agg(seg, ' ' ORDER BY idx) AS text_dedup
      FROM kept GROUP BY doc_id)
    SELECT w.doc_id,
      CAST(ceil(len(w.w)/8.0) AS INT) AS n_segments,
      CAST(ceil(len(w.w)/8.0) AS BIGINT) - COALESCE(r.n_kept, 0) AS n_dropped,
      COALESCE(r.text_dedup, '') AS text_dedup
    FROM ws w LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY w.doc_id"""

  /** TF-IDF keyword extraction: top-3 distinctive terms per doc, scores
    * rounded 6dp, ties by term — bounded-heap TopKPerKey, not a
    * vocabulary sort. */
  val textTfidf: QueryFn = (s, dir) =>
    TextAnalysis.tfidfTopTerms(
      Tables.ensure(s, dir).documents.filter(col("doc_id") < 500), k = 3)
      .orderBy(col("doc_id"), col("rank"))
  val textTfidfSql: String = """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        w -> len(w) > 0)) AS term
      FROM documents WHERE doc_id < 500),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n
          FROM documents WHERE doc_id < 500),
    scored AS (
      SELECT tf.doc_id, tf.term,
        round(tf.tf * (ln((n.n + 1) / (dfq.df + 1)) + 1), 6) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN n),
    r AS (SELECT doc_id, term, tfidf,
            row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
          FROM scored)
    SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
    FROM r WHERE rank <= 3 ORDER BY doc_id, rank"""

  /** CCNet perplexity tiers: corpus-LM score cut at exact 1/3 and 2/3
    * percentiles → head/middle/tail. Both engines round the cuts to 6dp
    * before comparing so interpolation noise can't flip boundary docs. */
  val qualityPerplexityBuckets: QueryFn = (s, dir) =>
    TextAnalysis.perplexityBuckets(
      Tables.ensure(s, dir).documents.filter(col("doc_id") < 500))
      .orderBy(col("doc_id"))
  val qualityPerplexityBucketsSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 500),
    elig AS (SELECT * FROM toks WHERE len(t) >= 2),
    grams AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        i -> t[i] || ' ' || t[i+1])) AS gram
      FROM elig),
    uni AS (
      SELECT w1, COUNT(*) AS c_uni
      FROM (SELECT unnest(t) AS w1 FROM elig) GROUP BY 1),
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    bi AS (SELECT gram, COUNT(*) AS c_bi FROM grams GROUP BY 1),
    scored AS (
      SELECT g.doc_id,
        log2((b.c_bi + 0.5) / (u.c_uni + 0.5 * (SELECT v FROM v))) AS logp
      FROM grams g
      JOIN bi b USING (gram)
      JOIN uni u ON u.w1 = string_split(g.gram, ' ')[1]),
    per_doc AS (
      SELECT doc_id, round(avg(logp), 6) AS mean_log2p
      FROM scored GROUP BY doc_id),
    cuts AS (
      SELECT round(quantile_cont(mean_log2p, 1.0/3), 6) AS p33,
             round(quantile_cont(mean_log2p, 2.0/3), 6) AS p66
      FROM per_doc)
    SELECT d.doc_id, d.mean_log2p,
      CASE WHEN d.mean_log2p > c.p66 THEN 'head'
           WHEN d.mean_log2p > c.p33 THEN 'middle'
           ELSE 'tail' END AS bucket
    FROM per_doc d, cuts c
    ORDER BY d.doc_id"""

  /** Exact-substring duplication scores (Lee et al. 2022) over documents:
    * per-doc duplicated-gram counts plus the interval-merged token
    * coverage. The oracle reproduces the positional grams with a lateral
    * index scan and the interval union with gaps-and-islands windows. */
  val dedupSubstring: QueryFn = (s, dir) => {
    val docs = Tables.ensure(s, dir).documents.filter(col("doc_id") < 400)
    Dedup.substringDuplication(docs, n = 5).orderBy(col("doc_id"))
  }
  val dedupSubstringSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), w -> len(w) > 0) AS t
      FROM documents WHERE doc_id < 400),
    g AS (
      SELECT doc_id, i - 1 AS pos,
        COALESCE(array_to_string(t[i:least(i + 4, len(t))], ' '), '') AS gram
      FROM (
        SELECT doc_id, t,
          unnest(generate_series(1,
            CASE WHEN len(t) >= 5 THEN len(t) - 4 ELSE 1 END)) AS i
        FROM toks)),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
    dg AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, pos,
        CASE WHEN pos > COALESCE(MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS new_i
      FROM dg),
    isl2 AS (
      SELECT doc_id, pos,
        SUM(new_i) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl),
    spans AS (
      SELECT doc_id, island, MAX(pos) + 5 - MIN(pos) AS cov
      FROM isl2 GROUP BY doc_id, island),
    da AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_spans,
             CAST(SUM(cov) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id),
    dc AS (SELECT doc_id, COUNT(*) AS dup_grams FROM dg GROUP BY doc_id)
    SELECT p.doc_id, p.n_grams,
           COALESCE(dc.dup_grams, 0) AS dup_grams,
           COALESCE(da.dup_tokens, 0) AS dup_tokens,
           COALESCE(da.dup_spans, 0) AS dup_spans
    FROM per_doc p
    LEFT JOIN dc USING (doc_id)
    LEFT JOIN da USING (doc_id)
    ORDER BY doc_id"""

  val queries: Map[String, QueryFn] = Map(
    "dedup_substring" -> dedupSubstring,
    "dedup_segments" -> dedupSegments,
    "quality_perplexity_buckets" -> qualityPerplexityBuckets,
    "text_tfidf" -> textTfidf,
    "dedup_exact" -> dedupExact,
    "dedup_minhash_lsh" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding_cos" -> dedupEmbedding,
    "dedup_embedding_lsh" -> dedupEmbeddingLsh,
    "image_phash_dups" -> imagePhashDups,
    "embed_pca" -> embedPca,
    "embed_pca_persisted" -> embedPcaPersisted,
    "embed_pca_variance" -> embedPcaVariance,
    "embed_random_project" -> embedRandomProject,
    "cluster_documents" -> clusterDocuments,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_components" -> dedupComponents,
    "ann_brute_force" -> annBrute,
    "ann_topk_ids" -> annTopkIds,
    "ann_binary_hamming" -> annBinaryHamming,
    "dedup_embedding_ids" -> dedupEmbeddingIds,
    "ann_ivf_label" -> annIvf,
    "ann_ivf_ids" -> annIvfIds,
    "ann_pq" -> annPq,
    "text_quality" -> textQuality,
    "quality_expectations" -> qualityExpectations,
    "quality_expectations_quarantine" -> qualityExpectationsQuarantine,
    "quality_gopher" -> qualityGopher,
    "text_c4_rules" -> textC4Rules,
    "text_line_dedup" -> textLineDedup,
    "bm25_search" -> bm25Search,
    "bm25_index_search" -> bm25IndexSearch,
    "hybrid_rrf" -> hybridRrf,
    "retrieval_hard_negatives" -> retrievalHardNegatives,
    "retrieval_mmr" -> retrievalMmr,
    "text_tokens" -> textTokens,
    "text_fingerprint" -> textFingerprint,
    "text_winnow" -> textWinnow,
    "html_extract" -> htmlExtract,
    "text_normalize" -> textNormalize,
    "url_canonicalize" -> urlCanonicalize,
    "text_langid" -> textLangid,
    "sample_stratified" -> sampleStratified,
    "mix_temperature" -> mixTemperature,
    "corpus_curation" -> corpusCuration,
    "corpus_funnel" -> corpusFunnel,
    "decontaminate_by_url" -> decontaminateByUrl,
    "decontaminate_semantic" -> decontaminateSemantic,
    "decontaminate" -> decontaminate,
    "pack_sequences" -> packSequences,
    "pack_next_fit" -> packNextFit,
    "text_pii_redact" -> textPiiRedact,
    "text_repetition" -> textRepetition,
    "split_assign" -> splitAssign,
    "split_leakage_safe" -> splitLeakageSafe,
    "shuffle_deterministic" -> shuffleDeterministic,
    "embed_quantize" -> embedQuantize,
    "text_entropy" -> textEntropy,
    "text_lm_score" -> textLmScore,
    "dsir_weights" -> dsirWeights,
    "text_nb_classifier" -> textNbClassifier,
    "lr_quality_train" -> lrQualityTrain,
    "lr_quality_score" -> lrQualityScore,
    "lr_score_persisted" -> lrScorePersisted,
    "budget_select" -> budgetSelect,
    "bitext_mine" -> bitextMine,
    "text_trigram_lm" -> textTrigramLm,
    "length_buckets" -> lengthBuckets,
    "chunk_documents" -> chunkDocuments,
    "source_cap_topk" -> sourceCapTopk,
    "sample_per_source" -> samplePerSource,
    "dedup_incremental" -> dedupIncremental,
    "dedup_streaming_admit" -> dedupStreamingAdmit,
    "semdedup_keep" -> semdedupKeep,
    "ann_quantized_ids" -> annQuantizedIds,
    "ann_index_persisted" -> annIndexPersisted,
    "ann_index_pq_persisted" -> annIndexPqPersisted,
    "ann_ivf_pq" -> annIvfPq,
    "ann_ivf_pq_rerank" -> annIvfPqRerank,
    "text_charclass" -> textCharclass,
    "blocklist_phrases" -> blocklistPhrases,
    "url_filter" -> urlFilter,
    "lucene_contains" -> luceneContains,
    "bpe_train_merges" -> bpeTrainMerges,
    "bpe_tokens" -> bpeTokens,
    "bpe_char_tokens" -> bpeCharTokens,
    "bpe_fixed_tokens" -> bpeFixedTokens,
    "bpe_byte_fixed_tokens" -> bpeByteFixedTokens,
    "bpe_byte_tokens" -> bpeByteTokens,
    "bpe_byte_train_merges" -> bpeByteTrainMerges,
    "unigram_train_pieces" -> unigramTrainPieces,
    "unigram_tokens" -> unigramTokens,
    "unigram_char_tokens" -> unigramCharTokens,
    "unigram_fixed_tokens" -> unigramFixedTokens,
    "sft_chatml_spans" -> sftChatmlSpans,
    "dpo_pairs_spans" -> dpoPairsSpans,
    "wordpiece_train_pieces" -> wordpieceTrainPieces,
    "wordpiece_tokens" -> wordpieceTokens,
    "wordpiece_fixed_tokens" -> wordpieceFixedTokens,
    "wordpiece_persisted_tokens" -> wordpiecePersistedTokens,
    "multimodal_features" -> multimodalFeatures)

  val oracle: Map[String, String] = Map(
    "semdedup_keep" -> semdedupKeepSql,
    "dedup_substring" -> dedupSubstringSql,
    "dedup_segments" -> dedupSegmentsSql,
    "quality_perplexity_buckets" -> qualityPerplexityBucketsSql,
    "text_tfidf" -> textTfidfSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_minhash_lsh" -> dedupMinhashSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_components" -> dedupComponentsSql,
    "text_quality" -> textQualitySql,
    "quality_expectations" -> qualityExpectationsSql,
    "quality_expectations_quarantine" -> qualityExpectationsQuarantineSql,
    "quality_gopher" -> qualityGopherSql,
    "text_c4_rules" -> textC4RulesSql,
    "text_line_dedup" -> textLineDedupSql,
    "bm25_search" -> bm25SearchSql,
    "dedup_embedding_cos" -> dedupEmbeddingSql,
    "bm25_index_search" -> bm25IndexSearchSql,
    "hybrid_rrf" -> hybridRrfSql,
    "retrieval_hard_negatives" -> retrievalHardNegativesSql,
    "retrieval_mmr" -> retrievalMmrSql,
    "text_tokens" -> textTokensSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_winnow" -> textWinnowSql,
    "html_extract" -> htmlExtractSql,
    "text_normalize" -> textNormalizeSql,
    "url_canonicalize" -> urlCanonicalizeSql,
    "text_langid" -> textLangidSql,
    "sample_stratified" -> sampleStratifiedSql,
    "mix_temperature" -> mixTemperatureSql,
    "corpus_curation" -> corpusCurationSql,
    "corpus_funnel" -> corpusFunnelSql,
    "cluster_documents" -> clusterDocumentsSql,
    "ann_brute_force" -> annBruteSql,
    "decontaminate_by_url" -> decontaminateByUrlSql,
    "decontaminate_semantic" -> decontaminateSemanticSql,
    "ann_topk_ids" -> annTopkIdsSql,
    "ann_binary_hamming" -> annBinaryHammingSql,
    "ann_ivf_ids" -> annIvfIdsSql,
    "dedup_embedding_ids" -> dedupEmbeddingIdsSql,
    "dedup_embedding_lsh" -> dedupEmbeddingLshSql,
    "image_phash_dups" -> imagePhashDupsSql,
    "decontaminate" -> decontaminateSql,
    "pack_sequences" -> packSequencesSql,
    "pack_next_fit" -> packNextFitSql,
    "text_pii_redact" -> textPiiRedactSql,
    "text_repetition" -> textRepetitionSql,
    "split_assign" -> splitAssignSql,
    "split_leakage_safe" -> splitLeakageSafeSql,
    "shuffle_deterministic" -> shuffleDeterministicSql,
    "embed_quantize" -> embedQuantizeSql,
    "embed_pca_variance" -> embedPcaVarianceSql,
    "embed_pca_persisted" -> embedPcaPersistedSql,
    "embed_random_project" -> embedRandomProjectSql,
    "text_entropy" -> textEntropySql,
    "text_lm_score" -> textLmScoreSql,
    "dsir_weights" -> dsirWeightsSql,
    "text_nb_classifier" -> textNbClassifierSql,
    "lr_quality_score" -> lrQualityScoreSql,
    "lr_score_persisted" -> lrQualityScoreSql,
    "bpe_train_merges" -> bpeTrainMergesSql,
    "bpe_tokens" -> bpeTokensSql,
    "bpe_byte_train_merges" -> bpeByteTrainMergesSql,
    "wordpiece_train_pieces" -> wordpieceTrainPiecesSql,
    "wordpiece_tokens" -> wordpieceTokensSql,
    "budget_select" -> budgetSelectSql,
    "bitext_mine" -> bitextMineSql,
    "text_trigram_lm" -> textTrigramLmSql,
    "length_buckets" -> lengthBucketsSql,
    "chunk_documents" -> chunkDocumentsSql,
    "source_cap_topk" -> sourceCapTopkSql,
    "sample_per_source" -> samplePerSourceSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_streaming_admit" -> dedupStreamingAdmitSql,
    "ann_quantized_ids" -> annQuantizedIdsSql,
    "ann_index_persisted" -> annIndexPersistedSql,
    "ann_ivf_label" -> annIvfSql,
    "ann_pq" -> annPqSql,
    "ann_ivf_pq" -> annIvfPqSql,
    "ann_ivf_pq_rerank" -> annIvfPqRerankSql,
    "ann_index_pq_persisted" -> annIndexPqPersistedSql,
    "text_charclass" -> textCharclassSql,
    "blocklist_phrases" -> blocklistPhrasesSql,
    "url_filter" -> urlFilterSql,
    "lucene_contains" -> luceneContainsSql,
    "bpe_char_tokens" -> bpeCharTokensSql,
    "bpe_fixed_tokens" -> bpeFixedTokensSql,
    "bpe_byte_fixed_tokens" -> bpeByteFixedTokensSql,
    "bpe_byte_tokens" -> bpeByteTokensSql,
    "unigram_char_tokens" -> unigramCharTokensSql,
    "unigram_fixed_tokens" -> unigramFixedTokensSql,
    "wordpiece_fixed_tokens" -> wordpieceFixedTokensSql,
    "wordpiece_persisted_tokens" -> wordpieceFixedTokensSql,
    "sft_chatml_spans" -> sftChatmlSpansSql,
    "dpo_pairs_spans" -> dpoPairsSpansSql)
}
