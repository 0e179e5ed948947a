package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Backward as-of join — for each left row, attach the payload of the single
  * right row with the greatest `rightTs <= leftTs` in the same key group
  * (the classic "latest quote at or before the trade" / "latest click at or
  * before the purchase" shape).
  *
  * The reference engine has no as-of operator (SURVEY §2.3 — range/as-of
  * joins absent); this is one of the beyond-the-reference operators a
  * training-data/eventstream pipeline needs, built per SURVEY §7 preference
  * (a): composed from existing Spark operators.
  *
  * Scale design: the naive formulations are a theta join (O(|L|·|R|)
  * nested-loop, then a per-left-row argmax) or a per-key
  * collect+binary-search. Instead we run the union trick: tag both sides,
  * union them, and take a running `last(payload, ignoreNulls)` over a
  * window partitioned by the keys and ordered by (ts, side). That is ONE
  * hash shuffle on the join keys and one per-partition sort — no join node
  * at all, no row explosion, and skew behaves exactly like any window
  * (a hot key sorts within its own partition). At 100 TB this is the same
  * cost shape as sessionization.
  *
  * Tie semantics: rights sort before lefts at equal ts (side 0 < 1), so a
  * right row at exactly `leftTs` IS visible (inclusive match, matching
  * DuckDB/pandas ASOF). Multiple rights at the same (key, ts) resolve to
  * the greatest payload struct (deterministic as long as the payload
  * columns are orderable — document types, ids, values all are).
  */
object AsOfJoin {

  /** @param keys       equality keys present in both sides
    * @param leftTs     left timestamp column (kept in the output)
    * @param rightTs    right timestamp column (dropped; carry a copy as a
    *                   payload column if the matched time is wanted)
    * @param tolerance  optional max age: a match older than
    *                   `leftTs - tolerance` is nulled out (e.g.
    *                   `expr("INTERVAL 1 HOUR")`)
    * @return all left columns plus the right payload columns
    *         (right columns minus keys minus rightTs), null when no match
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               tolerance: Option[Column] = None): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    require(payload.nonEmpty, "right side needs at least one payload column")
    val clash = payload.intersect(left.columns.toSeq)
    require(clash.isEmpty, s"right payload columns collide with left: $clash")

    val TS = "__graft_asof_ts"
    val SIDE = "__graft_asof_side"
    val PAY = "__graft_asof_pay"
    val RTS = "__rts" // matched right ts, kept inside the payload struct

    val payType = StructType(
      StructField(RTS, right.schema(rightTs).dataType) +:
        payload.map(c => right.schema(c)))
    val leftExtra = left.columns.toSeq.filterNot(keys.contains)

    val lPart = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as(TS), lit(1).as(SIDE)) ++
        leftExtra.map(col) ++
        Seq(lit(null).cast(payType).as(PAY)): _*)
    val rPart = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as(TS), lit(0).as(SIDE)) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(col(rightTs).as(RTS) +: payload.map(col): _*).as(PAY)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TS).asc, col(SIDE).asc, col(PAY).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col(PAY), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case Some(tol) =>
        when(col(TS) - matchedRaw.getField(RTS) <= tol, matchedRaw)
      case None => matchedRaw
    }

    lPart.unionByName(rPart)
      .withColumn("__m", matched)
      .filter(col(SIDE) === 1)
      .select(left.columns.toSeq.map(col) ++
        payload.map(p => col("__m").getField(p).as(p)): _*)
  }
}
