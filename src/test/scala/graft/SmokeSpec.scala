package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke: every registered query runs at sf0.001 and the driver contract
  * invariants hold. */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("query names are stable snake_case identifiers") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z0-9_]+")))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("sample_bernoulli: pinned admitted-id digest (silent RNG-drift tripwire)") {
    // sample_bernoulli stays no_oracle (seeded RNG is engine-specific by
    // contract), but the seed and the sampler are OURS: pinning the exact
    // admitted-row digest makes a Spark upgrade that silently changes the
    // Bernoulli sampler (or the fixture scan's partitioning, which the
    // per-partition random stream keys on) fail HERE instead of surfacing
    // as an unexplained downstream data shift.
    import org.apache.spark.sql.functions._
    val t = graft.engine.Tables.ensure(spark, TestSpark.sf)
    def digest(): (Long, String) = {
      val ids = t.lineitem
        .sample(withReplacement = false, fraction = 0.01, seed = 42L)
        .select(concat_ws(":", col("l_orderkey"), col("l_linenumber")))
        .collect().map(_.getString(0)).sorted
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (ids.length.toLong, md5)
    }
    val first = digest()
    assert(first == digest(), "same-session rerun must be identical")
    assert(first == ((68L, "d6faba8d22d7671d6ed8401a3d14f392")),
      s"pinned Bernoulli sample drifted: got $first")
  }
}
