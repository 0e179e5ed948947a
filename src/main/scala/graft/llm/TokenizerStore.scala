package graft.llm

import org.apache.spark.sql.SparkSession
import graft.sources.SnapshotTable

/** Persisted tokenizer vocabularies — the `tokenizer.json` of this engine,
  * stored as a graft-lake table so the usual machinery applies (time
  * travel pins the exact vocabulary a dataset was tokenized with,
  * privileges gate who can swap it, branches stage a retrain). Training
  * is expensive and corpus-wide; encoding is map-only and runs
  * everywhere — the split only works if the trained artifact round-trips
  * exactly, which the schema here guarantees for all four families:
  *
  *  - BPE / byte-level BPE: ordered merge pairs (rank, left, right)
  *  - Unigram-LM: (rank, piece, logp) in probability order
  *  - WordPiece: (rank, piece) in vocabulary order
  *
  * One table, one row per entry, `kind` column tagging the family; load
  * collects the bounded vocabulary (capped at training time) and rebuilds
  * the in-memory form the encode expressions take. */
object TokenizerStore {

  private val Kinds = Set("bpe", "bpe_byte", "unigram", "wordpiece")

  def saveBpe(spark: SparkSession, dir: String, v: Bpe.BpeVocab): Unit = {
    import spark.implicits._
    SnapshotTable.create(spark, dir,
      v.merges.zipWithIndex.map { case ((l, r), i) =>
        ("bpe", i, l, r, 0.0)
      }.toDF("kind", "rank", "piece", "right", "weight"))
  }

  def saveByteBpe(spark: SparkSession, dir: String,
                  v: ByteBpe.ByteBpeVocab): Unit = {
    import spark.implicits._
    SnapshotTable.create(spark, dir,
      v.merges.zipWithIndex.map { case ((l, r), i) =>
        ("bpe_byte", i, l, r, 0.0)
      }.toDF("kind", "rank", "piece", "right", "weight"))
  }

  def saveUnigram(spark: SparkSession, dir: String,
                  v: Unigram.UnigramVocab): Unit = {
    import spark.implicits._
    SnapshotTable.create(spark, dir,
      v.pieces.zipWithIndex.map { case ((p, lp), i) =>
        ("unigram", i, p, "", lp)
      }.toDF("kind", "rank", "piece", "right", "weight"))
  }

  def saveWordPiece(spark: SparkSession, dir: String,
                    v: WordPiece.WordPieceVocab): Unit = {
    import spark.implicits._
    SnapshotTable.create(spark, dir,
      v.pieces.zipWithIndex.map { case (p, i) =>
        ("wordpiece", i, p, "", 0.0)
      }.toDF("kind", "rank", "piece", "right", "weight"))
  }

  /** The stored family tag (refuses mixed/empty tables loudly). */
  def kindOf(spark: SparkSession, dir: String): String = {
    val kinds = SnapshotTable.forPath(spark, dir).read()
      .select("kind").distinct().collect().map(_.getString(0)).toSeq
    require(kinds.size == 1 && Kinds(kinds.head),
      s"not a tokenizer table at $dir (kinds: ${kinds.mkString(",")})")
    kinds.head
  }

  private def rows(spark: SparkSession, dir: String, kind: String)
      : Seq[(Int, String, String, Double)] = {
    val got = SnapshotTable.forPath(spark, dir).read()
      .selectExpr("kind", "rank", "piece", "right", "weight")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getDouble(4)))
    require(got.nonEmpty && got.forall(_._1 == kind),
      s"table at $dir does not hold a '$kind' vocabulary")
    got.map { case (_, i, p, rt, w) => (i, p, rt, w) }.sortBy(_._1).toSeq
  }

  def loadBpe(spark: SparkSession, dir: String): Bpe.BpeVocab =
    Bpe.BpeVocab(rows(spark, dir, "bpe")
      .map { case (_, l, r, _) => (l, r) }.toVector)

  def loadByteBpe(spark: SparkSession, dir: String): ByteBpe.ByteBpeVocab =
    ByteBpe.ByteBpeVocab(rows(spark, dir, "bpe_byte")
      .map { case (_, l, r, _) => (l, r) }.toVector)

  def loadUnigram(spark: SparkSession, dir: String): Unigram.UnigramVocab =
    Unigram.UnigramVocab(rows(spark, dir, "unigram")
      .map { case (_, p, _, w) => (p, w) }.toVector)

  def loadWordPiece(spark: SparkSession, dir: String): WordPiece.WordPieceVocab =
    WordPiece.WordPieceVocab(rows(spark, dir, "wordpiece")
      .map { case (_, p, _, _) => p }.toVector)
}
