package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (mirrors the reference's PlanTestBase.java:29
  * `testPlanMatchingPatterns`): the point is not that a query runs, but
  * that Catalyst picked the operator the query was designed to exercise —
  * broadcast where we hinted, pushdown where it should be free, TopN
  * lowering, Expand for grouping sets.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Final (post-AQE) physical plan: AdaptiveSparkPlan only reveals the
    * chosen join strategies and codegen stages after execution. */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.collect() // count() would plan a different query; collect finalizes THIS one
    df.queryExecution.executedPlan.toString
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_merge plans a SortMergeJoin") {
    assert(plan("join_merge").contains("SortMergeJoin"))
  }

  test("join_inner_hash plans a ShuffledHashJoin") {
    assert(plan("join_inner_hash").contains("ShuffledHashJoin"))
  }

  test("join_theta extracts the equi-conjunct and keeps < as extra condition") {
    // mixed predicate: Catalyst (like the reference's hash join "extra
    // condition" evaluator) plans a hash join on the equi part with the
    // range residual attached — not a nested loop over the full cross space
    val p = plan("join_theta")
    assert(p.contains("Join") && p.contains("<"))
  }

  test("join_nonequi_nlj plans a nested-loop join (pure theta)") {
    assert(plan("join_nonequi_nlj").contains("BroadcastNestedLoopJoin"))
  }

  test("tpch_q04 plans a left-semi join for EXISTS") {
    assert(plan("tpch_q04").toLowerCase.contains("leftsemi"))
  }

  test("tpch_q06 pushes filters into the parquet scan") {
    val p = plan("tpch_q06")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("tpch_q01 scan prunes to the referenced columns only") {
    val p = plan("tpch_q01")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
    assert(readSchema.contains("l_returnflag"))
  }

  test("topk_orders lowers to TakeOrderedAndProject") {
    assert(plan("topk_orders").contains("TakeOrderedAndProject"))
  }

  test("agg_rollup plans an Expand") {
    assert(plan("agg_rollup").contains("Expand"))
  }

  test("tpch_q01 uses two-phase hash aggregation") {
    val p = plan("tpch_q01")
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("whole-stage codegen covers the q01 pipeline") {
    // codegen stages print as "*(n) Operator" in the final-plan rendering
    assert(plan("tpch_q01").contains("*("))
  }

  test("q05 snowflake keeps region/nation on broadcast joins") {
    assert("BroadcastHashJoin".r.findAllIn(plan("tpch_q05")).length >= 2)
  }

  test("source_cap_topk runs through the TopKPerKey physical operator") {
    // a row_number window would sort whole partitions to keep 20 rows;
    // the custom operator keeps bounded per-key heaps
    val p = plan("source_cap_topk")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), "per-source cap must not fall back to a window sort")
  }

  test("chunk_documents is a map-only pass (no exchange before the sink sort)") {
    // sequence+slice chunking must not shuffle: the only Exchange allowed
    // is the final presentation orderBy's range partitioning. The AQE
    // rendering prints the initial plan after the final one — count only
    // the final section or the same Exchange is seen twice.
    val p = plan("chunk_documents")
    val finalSection = p.split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(finalSection).length <= 1, p)
  }

  test("dedup_incremental keeps the corpus join bucket-local and anti-joins novel docs") {
    val p = plan("dedup_incremental")
    assert(p.toLowerCase.contains("leftanti"), p)
  }

  test("retrieval_mmr: broadcast query batch, bounded-heap pool, greedy stays per-group") {
    // stage 1 must broadcast the tiny query side over the streamed corpus
    // and bound the pool with TopKPerKey heaps; the greedy itself is a
    // typed per-query mapGroups — ONE group exchange, never an all-pairs
    val p = plan("retrieval_mmr")
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query batch must broadcast over the corpus: " + p)
    assert(p.contains("MapGroups") || p.contains("FlatMapGroups"),
      "greedy selection must be a grouped operator: " + p)
  }

  test("pack_next_fit: one stratum shuffle + a map pass, no window materialization") {
    // next-fit is an O(1)-state iterator fold after the stratum
    // repartition+sort — a Window here would mean the fold fell back to
    // materializing per-stratum frames
    val p = plan("pack_next_fit")
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("Window"),
      "no window frames in the packing fold: " + p)
    assert(finalSection.contains("MapPartitions") ||
      finalSection.contains("SerializeFromObject"), p)
  }

  test("events_gap_fill shuffles once per user for rollup + spine + window") {
    // rollup agg, spine explode and the carry-forward window all hash on
    // user_id — AQE may reuse but never add a non-user_id exchange; the
    // presentation orderBy adds one range exchange
    val p = plan("events_gap_fill")
    assert(p.contains("Generate"), "hour spine must be an explode, not a driver loop")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }
}
