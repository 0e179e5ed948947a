package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.{Bridge, Rows}

/** Whole-operator custom plan: top-k rows per key without sorting whole
  * partitions.
  *
  * The composed alternative (`row_number().over(Window.partitionBy(key)
  * .orderBy(score))` + filter) materializes and SORTS every key group;
  * this operator keeps a bounded k-element heap per key — O(n log k) with
  * O(keys·k) memory, the shape that survives a 100 TB ANN sweep where n/k
  * is 10⁶.
  *
  * Mechanism demo for SURVEY §7 preference (c): LogicalPlan node →
  * SparkStrategy → SparkPlan with a required child distribution (Spark
  * inserts the hash exchange), registered through SparkSessionExtensions
  * (graft.sqlext.GraftExtensions).
  *
  * Reference analog: dremio-oss TopN (`sabot/op/sort/topn/TopNOperator
  * .java:58`, generated PriorityQueueTemplate) generalized per-key.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    score: Expression, // descending primary order
    tieBreak: Expression, // ascending secondary order (determinism)
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

object TopKPerKey {
  /** Column-API entry: top `k` rows per `key`, highest `score` first,
    * `tieBreak` ascending within equal scores. */
  def apply(df: DataFrame, key: Column, score: Column, tieBreak: Column, k: Int): DataFrame = {
    // Resolve the Columns against df by analyzing a throwaway projection —
    // a bare Column holds a lazily-converted (unresolved) node that only
    // standard Dataset operations resolve.
    val analyzedProj = df.select(key, score.cast("double"), tieBreak.cast("long"))
      .queryExecution.analyzed.asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val Seq(keyE, scoreE, tieE) = analyzedProj.projectList.map {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    Rows.ofRows(df.sparkSession,
      TopKPerKey(Seq(keyE), scoreE, tieE, k, analyzedProj.child))
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    score: Expression,
    tieBreak: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // Hash-cluster input by key so each key's rows meet in one partition;
  // AQE still coalesces/splits the injected exchange as usual.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val scoreExpr = score
    val tieExpr = tieBreak
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val scoreProj = UnsafeProjection.create(Seq(scoreExpr), childOutput)
      val tieProj = UnsafeProjection.create(Seq(tieExpr), childOutput)

      // (score asc, tie desc) min-heap: the root is the WORST kept row, so
      // a better candidate evicts it in O(log k).
      final case class Entry(score: Double, tie: Long, row: InternalRow)
      implicit val ord: Ordering[Entry] = Ordering.by(e => (-e.score, e.tie))

      val heaps = new java.util.HashMap[InternalRow, scala.collection.mutable.PriorityQueue[Entry]]()
      iter.foreach { row =>
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[Entry]
          heaps.put(key, heap)
        }
        val s = scoreProj(row).getDouble(0)
        val t = tieProj(row).getLong(0)
        if (heap.size < kk) heap.enqueue(Entry(s, t, row.copy()))
        else {
          val worst = heap.head
          if (s > worst.score || (s == worst.score && t < worst.tie)) {
            heap.dequeue()
            heap.enqueue(Entry(s, t, row.copy()))
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h =>
        // emit best-first per key
        val entries = h.dequeueAll.reverse
        entries.foreach(e => out += e.row)
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, score, tie, k, child) =>
      TopKPerKeyExec(keys, score, tie, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
