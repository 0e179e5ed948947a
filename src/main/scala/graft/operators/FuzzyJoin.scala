package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string self-join: all pairs within a bounded edit distance,
  * WITHOUT the all-pairs cross product.
  *
  * Candidate generation is the SymSpell deletion-neighborhood scheme
  * (Garbe's symmetric delete algorithm, public): every string emits all
  * variants reachable by deleting up to `maxEdits` characters; two
  * strings within Levenshtein distance k ALWAYS share at least one
  * deletion variant (substitution: delete the differing position on both
  * sides; insertion/deletion: the shorter string is a variant of the
  * longer; compositions for k=2). Candidates therefore come from an
  * equi-join on the variant hash — a plain shuffle join — and the exact
  * `levenshtein` builtin (codegen'd) verifies each candidate once.
  *
  * Scale shape (100 TB): variant fan-out is len+1 per row at k=1 and
  * O(len²/2) at k=2 — bounded by `keyPrefixLen`, which caps the keyed
  * prefix (pairs differing only beyond the prefix are then missed;
  * callers trade recall for fan-out explicitly). The equi-join shuffles
  * on the variant hash; `maxBucket` drops degenerate hot variants (a
  * variant shared by thousands of strings is a near-duplicate CLUSTER —
  * exact dedup territory, not pairwise fuzzy matching) the same way the
  * LSH paths cap their buckets, so no reducer sees a quadratic bucket.
  * Dedup via the min-variant trick would double the shuffle; a
  * `dropDuplicates` on the pair key keeps it one pass.
  *
  * The reference has no engine-side fuzzy join (its fuzzy matching lives
  * in Elasticsearch pushdown, `CONTAINS(f:term~2)` — see
  * [[graft.functions.Lucene]]); a training-data pipeline needs one for
  * entity resolution / near-key dedup, so it is first-class here.
  */
object FuzzyJoin {

  /** All (a, b) pairs with `levenshtein(a.str, b.str) <= maxEdits` and
    * `a.id < b.id`. Output columns: a_id, b_id, a_<str>, b_<str>, dist.
    *
    * @param maxEdits     1 or 2 (the deletion-neighborhood sizes beyond 2
    *                     explode combinatorially; use LSH shingles there)
    * @param maxBucket    drop variant buckets larger than this (hot-key cap)
    * @param keyPrefixLen variants are generated from the lowercased first
    *                     N chars; the exact verify still runs on the FULL
    *                     strings, so a long-tail difference past the
    *                     prefix widens distance but never creates a false
    *                     positive — only prefix-identical misses possible
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxEdits: Int = 1, maxBucket: Int = 1024,
               keyPrefixLen: Int = 64): DataFrame = {
    require(maxEdits == 1 || maxEdits == 2,
      s"fuzzy join supports maxEdits 1 or 2, got $maxEdits")
    require(maxBucket >= 1 && maxBucket < Int.MaxValue,
      s"maxBucket must be in [1, ${Int.MaxValue - 1}], got $maxBucket")
    // the variant expression evaluates on the (id, s)-projected frame below
    val key = s"lower(substring(s, 1, $keyPrefixLen))"
    // deletion variants of one string as a SQL higher-order expression —
    // pure builtins, no UDF, stays in codegen
    def dels(v: String): String =
      s"""transform(sequence(1, greatest(length($v), 1)), i ->
            concat(substring($v, 1, i - 1), substring($v, i + 1)))"""
    val variantsExpr =
      if (maxEdits == 1) s"array_distinct(array_union(array($key), ${dels(key)}))"
      else s"""array_distinct(array_union(
                 array_union(array($key), ${dels(key)}),
                 flatten(transform(${dels(key)}, v -> ${dels("v")}))))"""
    // spread: variant generation (len² string slices at k=2) is scan-fused
    // map work; all downstream selections are deterministic (heap ties,
    // whole-bucket drops, exact verify) so spreading is exact
    val exploded = graft.engine.Parallelism.spread(
        df.select(col(idCol).as("id"), col(strCol).as("s")))
      .select(col("id"), col("s"), explode(expr(variantsExpr)).as("variant"))
      .select(col("id"), col("s"), xxhash64(col("variant")).as("vh"))
    // Hot-variant cap + bucket-local pairing in ONE pass over the variant
    // table. TopKPerKey bounds every (vh) bucket to maxBucket+1 rows with
    // a bounded heap (never a window sort, never an unbounded
    // collect_list), the now-provably-bounded collect_list groups each
    // bucket, and `bn == maxBucket+1` detects overflow EXACTLY: a true
    // bucket of n ≤ maxBucket keeps all n rows (bn == n), a bucket past
    // the cap retains cap+1 rows and is dropped whole — the same
    // drop-the-cluster semantics as before (a variant shared by thousands
    // of strings is near-dup CLUSTER territory, not pairwise matching).
    // The retention order inside dropped buckets is irrelevant, so the
    // heap runs on constant score/tie. vs the previous aggregate +
    // broadcast-anti-join cap: `exploded` evaluated ONCE instead of three
    // times (count branch + both self-join sides), ONE vh shuffle instead
    // of three, and the groupBy rides the TopKPerKey exchange with no
    // re-shuffle. Pairs then explode bucket-locally (n ≤ maxBucket per
    // array — the same candidate enumeration the self-join produced,
    // streamed through two generators, never a giant in-row array).
    // The 500k-key scale tier pins the no-cartesian/no-window shape.
    val buckets = graft.plans.TopKPerKey(
        exploded, col("vh"), lit(0.0), lit(0L), maxBucket + 1)
      .groupBy(col("vh"))
      .agg(collect_list(struct(col("id"), col("s"))).as("members"),
        count(lit(1)).as("bn"))
      .where(col("bn") <= maxBucket && col("bn") >= 2)
    // Verify BEFORE the pair dedup: the bounded threshold levenshtein
    // (O(len·maxEdits) banded DP instead of the O(len²) full matrix,
    // returning -1 past the bound) kills the false candidates — the vast
    // majority — in the same codegen stage that enumerated them, so the
    // dropDuplicates exchange shuffles only TRUE pairs (with their
    // strings) instead of every candidate. `dist` is a pure function of
    // the pair, so dedup order cannot change the kept row.
    buckets
      .select(explode(col("members")).as("m1"), col("members"))
      .select(col("m1"), explode(col("members")).as("m2"))
      .where(col("m1.id") < col("m2.id"))
      .select(col("m1.id").as("a_id"), col("m2.id").as("b_id"),
        col("m1.s").as("a_s"), col("m2.s").as("b_s"))
      .withColumn("dist", levenshtein(col("a_s"), col("b_s"), maxEdits))
      .where(col("dist") >= 0)
      .dropDuplicates("a_id", "b_id")
      .withColumnRenamed("a_s", s"a_$strCol")
      .withColumnRenamed("b_s", s"b_$strCol")
  }

  /** Fuzzy LEFT-to-RIGHT lookup join: for every left row, all right rows
    * within `maxEdits` — the entity-resolution shape (dirty keys against
    * a reference list). Same candidate scheme; output keeps both ids and
    * the distance. */
  def lookupJoin(left: DataFrame, leftId: String, leftStr: String,
                 right: DataFrame, rightId: String, rightStr: String,
                 maxEdits: Int = 1, maxBucket: Int = 1024,
                 keyPrefixLen: Int = 64): DataFrame = {
    require(maxEdits == 1 || maxEdits == 2,
      s"fuzzy join supports maxEdits 1 or 2, got $maxEdits")
    require(maxBucket >= 1 && maxBucket < Int.MaxValue,
      s"maxBucket must be in [1, ${Int.MaxValue - 1}], got $maxBucket")
    def sideVariants(df: DataFrame, id: String, s: String, pre: String): DataFrame = {
      val key = s"lower(substring(${pre}_s, 1, $keyPrefixLen))"
      def dels(v: String): String =
        s"""transform(sequence(1, greatest(length($v), 1)), i ->
              concat(substring($v, 1, i - 1), substring($v, i + 1)))"""
      val ve =
        if (maxEdits == 1) s"array_distinct(array_union(array($key), ${dels(key)}))"
        else s"""array_distinct(array_union(
                   array_union(array($key), ${dels(key)}),
                   flatten(transform(${dels(key)}, v -> ${dels("v")}))))"""
      // spread before the variant explode (same rationale as selfJoin)
      graft.engine.Parallelism.spread(
          df.select(col(id).as(s"${pre}_id"), col(s).as(s"${pre}_s")))
        .select(col(s"${pre}_id"), col(s"${pre}_s"),
          explode(expr(ve)).as("variant"))
        .select(col(s"${pre}_id"), col(s"${pre}_s"),
          xxhash64(col("variant")).as("vh"))
    }
    val l = sideVariants(left, leftId, leftStr, "l")
    val rRaw = sideVariants(right, rightId, rightStr, "r")
    // same one-pass bounded-bucket cap as selfJoin: heap-bound each
    // reference bucket, group it, drop overflow buckets whole; the lookup
    // side then equi-joins on vh and explodes the (≤ maxBucket) members
    val rBuckets = graft.plans.TopKPerKey(
        rRaw, col("vh"), lit(0.0), lit(0L), maxBucket + 1)
      .groupBy(col("vh"))
      .agg(collect_list(struct(col("r_id"), col("r_s"))).as("members"),
        count(lit(1)).as("bn"))
      .where(col("bn") <= maxBucket)
    // verify before the pair dedup (see selfJoin): banded threshold
    // levenshtein drops false candidates pre-exchange
    l.join(rBuckets, "vh")
      .select(col("l_id"), col("l_s"), explode(col("members")).as("m"))
      .select(col("l_id"), col("m.r_id").as("r_id"), col("l_s"),
        col("m.r_s").as("r_s"))
      .withColumn("dist", levenshtein(col("l_s"), col("r_s"), maxEdits))
      .where(col("dist") >= 0)
      .dropDuplicates("l_id", "r_id")
  }
}
