package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Data-quality expectations (Expectations): warn/drop/fail actions,
  * quarantine attribution, null-predicate hygiene, one-aggregate metrics,
  * and the same-pass `observe` path. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules = Seq(
    Expectations.Rule("min_len", length(col("text")) >= 10, "drop"),
    Expectations.Rule("has_digit", col("text").rlike("[0-9]"), "warn"),
    Expectations.Rule("id_nonneg", col("id") >= 0, "fail"))

  private def corpus = Seq(
    (0L, "a perfectly fine document 123"),
    (1L, "short"), // violates min_len (drop) and has_digit (warn)
    (2L, "long enough but no digits here"), // warn only -> kept
    (3L, null.asInstanceOf[String]) // null predicate -> violation
  ).toDF("id", "text")

  test("warn keeps, drop quarantines, attribution names every violated rule") {
    val r = Expectations.check(corpus, rules)
    val kept = r.kept.select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L), s"warn-only violators must stay kept: $kept")
    val q = r.quarantined
      .select(col("id"), array_join(col("violated_rules"), ",").as("v"))
      .as[(Long, String)].collect().toMap
    assert(q.keySet == Set(1L, 3L))
    assert(q(1L) == "min_len,has_digit",
      s"attribution must include warn violations for triage: ${q(1L)}")
    assert(q(3L) == "min_len,has_digit",
      "a NULL predicate result must count as a violation")
  }

  test("metrics: one aggregate, exact counts and pass rates") {
    val m = Expectations.check(corpus, rules).metrics
      .collect().map(r => r.getAs[String]("rule") ->
        ((r.getAs[String]("action"), r.getAs[Long]("violations"),
          r.getAs[Long]("rows"), r.getAs[Double]("pass_rate")))).toMap
    assert(m("min_len") == (("drop", 2L, 4L, 0.5)))
    assert(m("has_digit") == (("warn", 3L, 4L, 0.25)))
    assert(m("id_nonneg") == (("fail", 0L, 4L, 1.0)))
  }

  test("fail action: enforce throws naming the rule; clean batch passes") {
    // id_nonneg currently passes -> enforce is a no-op
    Expectations.checkEnforced(corpus, rules)
    val bad = corpus.union(Seq((-5L, "negative id document!")).toDF("id", "text"))
    val e = intercept[IllegalStateException] {
      Expectations.checkEnforced(bad, rules)
    }
    assert(e.getMessage.contains("id_nonneg") && e.getMessage.contains("1 violation"))
  }

  test("observed: per-rule metrics ride the SAME job via Dataset.observe") {
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(Expectations.ObservationName)
          .foreach(r => seen = Some(r))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = Expectations.observed(corpus, rules).count()
      assert(n == 4)
      val deadline = System.currentTimeMillis() + 15000
      while (seen.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val row = seen.getOrElse(fail("observed metrics never arrived"))
      assert(row.getAs[Long]("violations_min_len") == 2L)
      assert(row.getAs[Long]("violations_has_digit") == 3L)
      assert(row.getAs[Long]("violations_id_nonneg") == 0L)
      assert(row.getAs[Long]("rows") == 4L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("rule hygiene: duplicate names and unknown actions refuse") {
    intercept[IllegalArgumentException] {
      Expectations.check(corpus, Seq(
        Expectations.Rule("x", lit(true)), Expectations.Rule("x", lit(false))))
    }
    intercept[IllegalArgumentException] {
      Expectations.Rule("y", lit(true), "quarantine")
    }
  }
}
