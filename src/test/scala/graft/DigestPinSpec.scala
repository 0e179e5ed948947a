package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pinned output digests for the rows-only registered queries (VERDICT
  * r13 #5 — the `sample_bernoulli` tripwire pattern applied to the rest):
  * these outputs are engine-specific by contract (seeded hashing, trained
  * models, float folds) so DuckDB can't replay them, but they ARE
  * deterministic on the fixed sf0.001 fixture under the test session —
  * pinning md5-of-sorted-output catches silent drift (a Spark upgrade
  * changing hash seeds or fold order, an accidental algorithm change)
  * that the rows-only CORRECTNESS check would wave through.
  *
  * The pins are environment-pinned too: they hold for the shared test
  * session (local[4], fixed fixture partitioning). A legitimate algorithm
  * change re-pins by updating the map — the point is that the change is
  * SEEN, not silent.
  */
class DigestPinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** md5 over the sorted canonical row renderings + row count. */
  private def digest(name: String): (Long, String) = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    val rows = df.collect().map(_.toString).sorted
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (rows.length.toLong, md5)
  }

  private val pins: Map[String, (Long, String)] = Map(
    // dedup_simhash graduated to a FULL DuckDB oracle in r16 (md5-based
    // replayable signature) — its pin retired with the rows-only status
    // bpe_train_merges graduated to a FULL DuckDB oracle in r16 (recursive
    // CTE replays the merge loop) — pin retired with the rows-only status
    "dedup_minhash_lsh" -> ((28L, "b40e2d8404589da451db9fc3ca9386d4")),
    "unigram_train_pieces" -> ((262L, "cc655cae89920b71f726ac999ea1e8d1")),
    "embed_pca" -> ((500L, "fe16c9de31e33faf8a558dbb1a79ad3d")),
    "multimodal_features" -> ((200L, "d2ef9701a799e1dbaf731f45fd5edc2c")),
    // deterministic by construction (fixed-point IRLS), so this pin holds
    // under ANY partitioning, not just the session's
    "lr_quality_train" -> ((9L, "2d4ebe6dd37fb376854a6aba2ceb8cc5")),
    // r14 second sweep: every remaining rows-only output pinned. r16
    // retired the pins of bpe_tokens / bpe_byte_train_merges /
    // wordpiece_train_pieces / wordpiece_tokens — all graduated to FULL
    // recursive-CTE oracles. unigram_tokens' digest equalling the old
    // wordpiece_tokens pin was REAL convergence, not a copy bug: the
    // fixture's ~whole vocabulary fits both models, so both encode every
    // word as one whole-word piece.
    "unigram_tokens" -> ((500L, "9bffc539ba662c7d752b2faa125b2399")),
    "agg_hll_merge" -> ((1L, "08b84280663845e83bbf82d297013a53")),
    "agg_ndv_sketch" -> ((3L, "96d3106eadae72e76c4e14b841756268")),
    "agg_percentile_approx" -> ((3L, "8af68304ee035689d68666ec35a73027")))

  for ((name, expected) <- pins.toSeq.sortBy(_._1)) {
    test(s"$name: pinned rows-only output digest") {
      val got = digest(name)
      info(s"[digest-pin] $name ${got._1} ${got._2}")
      assert(got == digest(name), "same-session rerun must be identical")
      assert(got == expected,
        s"rows-only output drifted for $name: got $got, pinned $expected — " +
          "if the algorithm deliberately changed, re-pin and say so in the log")
    }
  }
}
