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
  /** A numeric tie-break for an arbitrary-typed id column: numeric/date/
    * timestamp pass through (preserving their real order); string/binary
    * ids map to `xxhash64` — a DETERMINISTIC pseudo-order, for callers
    * (bucket caps) where any stable bounded selection is acceptable. The
    * composed row_number window this operator replaces sorted string ids
    * lexicographically; use this to keep those call sites working. */
  def numericTie(df: DataFrame, c: Column): Column = {
    val dt = df.select(c).queryExecution.analyzed.output.head.dataType
    dt match {
      case _: org.apache.spark.sql.types.NumericType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType => c
      case _ => org.apache.spark.sql.functions.xxhash64(c)
    }
  }

  /** Column-API entry: top `k` rows per `key`, highest `score` first,
    * `tieBreak` ascending within equal scores. The tie column must be
    * NUMERIC (it rides the heap as a long): a string tie would cast to
    * null and silently collapse every tie — refuse at build time instead
    * (hash the string, or use a per-key window when partitions are
    * small). */
  def apply(df: DataFrame, key: Column, score: Column, tieBreak: Column, k: Int): DataFrame =
    apply(df, Seq(key), score, tieBreak, k)

  /** Compound-key entry: top `k` per distinct combination of `keys` —
    * the bucket-cap shape (e.g. LSH (band, bandHash) buckets) without
    * packing the keys into a struct on the caller side. */
  def apply(df: DataFrame, keys: Seq[Column], score: Column, tieBreak: Column,
            k: Int): DataFrame = {
    require(keys.nonEmpty, "TopKPerKey: at least one key column")
    // k <= 0 (e.g. a caller's cap+1 overflowing Int.MaxValue) would fail
    // deep inside executor heaps as an opaque NoSuchElementException —
    // refuse at build time instead
    require(k > 0, s"TopKPerKey: k must be positive, got $k")
    // Resolve the Columns against df by analyzing a throwaway projection —
    // a bare Column holds a lazily-converted (unresolved) node that only
    // standard Dataset operations resolve.
    val probe = df.select(tieBreak).queryExecution.analyzed.output.head.dataType
    require(probe.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        probe == org.apache.spark.sql.types.DateType ||
        probe == org.apache.spark.sql.types.TimestampType,
      s"TopKPerKey: tie-break column must be numeric/date/timestamp, got $probe " +
        "(a string tie casts to NULL and loses determinism)")
    val analyzedProj = df.select(keys :+ score.cast("double") :+ tieBreak.cast("long"): _*)
      .queryExecution.analyzed.asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val exprs = analyzedProj.projectList.map {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    val Seq(scoreE, tieE) = exprs.takeRight(2)
    Rows.ofRows(df.sparkSession,
      TopKPerKey(exprs.dropRight(2), scoreE, tieE, k, analyzedProj.child))
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    score: Expression,
    tieBreak: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override lazy val metrics = Map(
    "spilledRuns" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of spilled sorted runs"))

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
    val numFields = childOutput.size
    // Memory bound for the per-partition heap map. Crossing it flushes the
    // map as a key-sorted run on local disk; runs are streamed back through
    // a k-way merge holding ONE key's heap at a time — memory O(runs + k)
    // instead of O(distinct keys × k), so high-cardinality keys spill like
    // Spark's window+sort would instead of OOMing (VERDICT r1 item 4).
    val budgetBytes = java.lang.Long.parseLong(
      conf.getConfString("spark.graft.topKPerKey.memoryBytes", (64L * 1024 * 1024).toString))
    val spillMetric = longMetric("spilledRuns")
    child.execute().mapPartitions { iter =>
      new TopKPartitionIterator(iter, keyExprs, scoreExpr, tieExpr, kk,
        childOutput, numFields, budgetBytes, spillMetric)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

/** Per-partition top-k-per-key with a size-tracked heap map and a
  * sorted-run spill fallback (see TopKPerKeyExec.doExecute). */
private[plans] class TopKPartitionIterator(
    input: Iterator[InternalRow],
    keyExprs: Seq[Expression],
    scoreExpr: Expression,
    tieExpr: Expression,
    k: Int,
    childOutput: Seq[Attribute],
    numFields: Int,
    budgetBytes: Long,
    spillMetric: org.apache.spark.sql.execution.metric.SQLMetric)
    extends Iterator[InternalRow] {

  import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
  import org.apache.spark.sql.catalyst.expressions.UnsafeRow
  import scala.collection.mutable

  private val keyProj = UnsafeProjection.create(keyExprs, childOutput)
  private val scoreProj = UnsafeProjection.create(Seq(scoreExpr), childOutput)
  private val tieProj = UnsafeProjection.create(Seq(tieExpr), childOutput)
  // identity projection for non-UnsafeRow inputs, created ONCE per
  // partition (per-row creation would codegen-compile in the hot loop)
  private lazy val toUnsafe = UnsafeProjection.create(childOutput, childOutput)

  // (score asc, tie desc) min-heap: the root is the WORST kept row, so a
  // better candidate evicts it in O(log k).
  private case class Entry(score: Double, tie: Long, row: UnsafeRow)
  private implicit val ord: Ordering[Entry] = Ordering.by((e: Entry) => (-e.score, e.tie))

  /** One spilled record, comparable by (key bytes, score desc, tie asc). */
  private case class Rec(keyBytes: Array[Byte], score: Double, tie: Long, rowBytes: Array[Byte])
  private def recCompare(a: Rec, b: Rec): Int = {
    val c = java.util.Arrays.compare(a.keyBytes, b.keyBytes)
    if (c != 0) c
    else {
      val s = java.lang.Double.compare(b.score, a.score) // desc
      if (s != 0) s else java.lang.Long.compare(a.tie, b.tie)
    }
  }

  private val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[Entry]]()
  private var trackedBytes = 0L
  private val spillFiles = mutable.ArrayBuffer.empty[java.io.File]

  private def toRec(key: UnsafeRow, e: Entry): Rec =
    Rec(key.getBytes.clone(), e.score, e.tie, e.row.getBytes.clone())

  /** Flush the heap map as one key-sorted run (fits in budget by
    * construction: it IS the tracked memory being flushed). */
  private def spill(): Unit = {
    val recs = mutable.ArrayBuffer.empty[Rec]
    heaps.forEach((key, h) => h.foreach(e => recs += toRec(key, e)))
    val sorted = recs.sortWith(recCompare(_, _) < 0)
    // spill lands on the disks provisioned for shuffle (spark.local.dir via
    // DiskBlockManager), not java.io.tmpdir — ADVICE r2
    val f = Bridge.createLocalSpillFile()
    f.deleteOnExit() // backstop for a clean JVM exit mid-query; the
    // DiskBlockManager work dir covers the killed-executor case
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f)))
    try sorted.foreach { r =>
      out.writeInt(r.keyBytes.length); out.write(r.keyBytes)
      out.writeDouble(r.score); out.writeLong(r.tie)
      out.writeInt(r.rowBytes.length); out.write(r.rowBytes)
    } finally out.close()
    spillFiles += f
    spillMetric.add(1)
    heaps.clear()
    trackedBytes = 0L
  }

  private def insert(key: UnsafeRow, s: Double, t: Long, row: InternalRow): Unit = {
    var heap = heaps.get(key)
    if (heap == null) {
      heap = mutable.PriorityQueue.empty[Entry]
      heaps.put(key, heap)
      trackedBytes += key.getSizeInBytes + 64
    }
    val ur = row match { case u: UnsafeRow => u; case other => toUnsafe(other) }
    if (heap.size < k) {
      val copied = ur.copy()
      heap.enqueue(Entry(s, t, copied))
      trackedBytes += copied.getSizeInBytes + 48
    } else {
      val worst = heap.head
      if (s > worst.score || (s == worst.score && t < worst.tie)) {
        val evicted = heap.dequeue()
        trackedBytes -= evicted.row.getSizeInBytes + 48
        val copied = ur.copy()
        heap.enqueue(Entry(s, t, copied))
        trackedBytes += copied.getSizeInBytes + 48
      }
    }
  }

  // ---- accumulate phase ----
  input.foreach { row =>
    val key = keyProj(row).copy()
    insert(key, scoreProj(row).getDouble(0), tieProj(row).getLong(0), row)
    if (trackedBytes > budgetBytes) spill()
  }

  private val output: Iterator[InternalRow] =
    if (spillFiles.isEmpty) {
      // fast path: emit best-first per key straight from the map
      val buf = mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h =>
        h.dequeueAll.reverse.foreach((e: Entry) => buf += e.row)
      }
      buf.iterator
    } else {
      if (!heaps.isEmpty) spill() // final run so the merge sees everything
      mergeRuns()
    }

  /** Streaming k-way merge of sorted runs: rows arrive grouped by key and
    * score-desc within a key, so one bounded heap per key suffices. */
  private def mergeRuns(): Iterator[InternalRow] = {
    final class Run(f: java.io.File) {
      private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f)))
      var head: Rec = _
      advance()
      def advance(): Unit =
        head =
          try {
            val kl = in.readInt(); val kb = new Array[Byte](kl); in.readFully(kb)
            val sc = in.readDouble(); val ti = in.readLong()
            val rl = in.readInt(); val rb = new Array[Byte](rl); in.readFully(rb)
            Rec(kb, sc, ti, rb)
          } catch {
            case _: java.io.EOFException =>
              // eager cleanup: a long-lived executor would otherwise hold
              // every drained run until JVM exit (deleteOnExit is only the
              // crash backstop)
              in.close(); f.delete(); null
          }
    }
    val runs = spillFiles.map(new Run(_)).filter(_.head != null)
    implicit val runOrd: Ordering[Run] =
      Ordering.fromLessThan((a, b) => recCompare(a.head, b.head) > 0) // min-heap via max-PQ inversion
    val pq = mutable.PriorityQueue.empty[Run]
    runs.foreach(pq.enqueue(_))

    new Iterator[InternalRow] {
      private var curKey: Array[Byte] = null
      private var emitted = 0
      private var nextRow: InternalRow = null
      private def pull(): Unit = {
        nextRow = null
        while (nextRow == null && pq.nonEmpty) {
          val run = pq.dequeue()
          val rec = run.head
          run.advance()
          if (run.head != null) pq.enqueue(run)
          val newKey = curKey == null || !java.util.Arrays.equals(curKey, rec.keyBytes)
          if (newKey) { curKey = rec.keyBytes; emitted = 0 }
          if (emitted < k) {
            emitted += 1
            val ur = new UnsafeRow(numFields)
            ur.pointTo(rec.rowBytes, rec.rowBytes.length)
            nextRow = ur
          } // else: beyond k for this key — skip (dup of a worse candidate)
        }
      }
      pull()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = { val r = nextRow; pull(); r }
    }
  }

  override def hasNext: Boolean = output.hasNext
  override def next(): InternalRow = output.next()
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, score, tie, k, child) =>
      TopKPerKeyExec(keys, score, tie, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
