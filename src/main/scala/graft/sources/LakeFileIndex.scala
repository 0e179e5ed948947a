package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer-integrated manifest pruning for graft-lake scans: a custom
  * `FileIndex` whose `listFiles` drops data files whose per-file min/max
  * manifest stats cannot satisfy the query's pushed data filters — so a
  * plain SQL `WHERE c BETWEEN 100 AND 200` over a lake view prunes files
  * exactly like the explicit `scanRange` API, with no user opt-in. This is
  * the Spark-native seat of the reference's planner-side prune rule
  * (dremio-oss `exec/planner/logical/partition/PruneScanRuleBase.java:117`)
  * and the same integration point Delta's TahoeFileIndex uses.
  *
  * Two stat families participate:
  *  - plain column ranges (keyed by column name, from `appendWithStats`);
  *  - partition-transform values (keyed by the transform's `repr`, from
  *    partitioned commits): a predicate on the SOURCE column is mapped into
  *    partition space driver-side (`PartitionTransform.literal`) and
  *    compared against the file's recorded transform range — the Iceberg
  *    transform pruning of the reference's rule (bucket prunes equality/IN;
  *    order-preserving transforms also prune ranges, non-strictly).
  *
  * Pruning is strictly a superset: a file with no recorded stats, or a
  * predicate shape the evaluator doesn't understand, is always read; the
  * full predicate is still evaluated by Spark (and pushed to parquet
  * row-group stats), so results are exact regardless of stats quality.
  *
  * Scale: the file list and stats come from the commit log already parsed
  * on the driver — `listFiles` is pure in-memory filtering, O(files ·
  * conjuncts), with ZERO filesystem calls at plan time: per-file sizes
  * ride in the manifest (`SnapshotTable.BytesStatKey`, the Iceberg
  * `file_size_in_bytes` field) and FileStatus objects are built straight
  * from them. Only legacy commits written before sizes were recorded fall
  * back to one `getFileStatus` per such file (counted in
  * [[LakeFileIndex.fsStatusCalls]], cached for the life of the snapshot).
  */
final class LakeFileIndex(
    spark: SparkSession,
    tableDir: String,
    // absolute path -> column/transform-repr -> (min, max) as manifest strings
    filesWithStats: Seq[(String, Map[String, (String, String)])],
    dataSchema: StructType,
    transforms: Seq[PartitionTransform] = Nil,
    /** Lake version of the snapshot this scan pinned at construction (-1
      * when unknown, e.g. internal rewrite scans). Consumers that cache or
      * fingerprint results (accel.ResultCache) read THIS — the table's
      * current latestVersion may already be ahead of what this DataFrame
      * actually reads. */
    val snapshotVersion: Long = -1L) extends FileIndex {

  /** The stable table directory (also the single root path). */
  def tableDirPath: String = tableDir

  import LakeFileIndex._

  override def rootPaths: Seq[Path] = Seq(new Path(tableDir))
  override def partitionSchema: StructType = new StructType()

  // File list is pinned at construction (snapshot isolation): later commits
  // never mutate committed files, so refresh() has nothing to re-list.
  // Statuses come from manifest-carried sizes — the filesystem is touched
  // only for legacy files whose commit predates size recording.
  private lazy val statuses: Seq[(FileStatus, Map[String, (String, String)])] = {
    lazy val fs = new Path(tableDir).getFileSystem(
      org.apache.spark.sql.graft.Bridge.hadoopConf(spark))
    filesWithStats.map { case (p, st) =>
      val path = new Path(p)
      val fromManifest = st.get(SnapshotTable.BytesStatKey).flatMap {
        case (len, mtime) => scala.util.Try(
          new FileStatus(len.toLong, false, 1, DefaultBlockSize,
            mtime.toLong, path)).toOption
      }
      fromManifest.getOrElse {
        fsStatusCalls.incrementAndGet()
        fs.getFileStatus(path)
      } -> st
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val types: Map[String, DataType] =
      dataSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    // one probe cache per planning pass: IN-list literal sets sort ONCE
    // and every file's [min,max] range binary-searches them — O(files ·
    // log keys), not O(files · keys); at 10⁵ state files × 8k-key static
    // IN filters the naive walk is a hundred-million-comparison stall
    val cache = new java.util.IdentityHashMap[Expression, AnyRef]()
    val kept = statuses.collect {
      case (fst, stats) if dataFilters.forall(f =>
        mayMatch(stats, types, f, transforms, cache)) => fst
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] = filesWithStats.map(_._1).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum

  /** Snapshot row count from manifest `__rows` entries — defined only when
    * EVERY file recorded a parseable one (a single legacy file makes the
    * count unknowable without a scan, so the metadata-count rule must not
    * fire). Shared definition: [[SnapshotTable.rowsFromStats]]. */
  def manifestRowCount: Option[Long] =
    SnapshotTable.rowsFromStats(filesWithStats.map(_._2))

  /** Per-file manifest (min, max) stat strings for a COLUMN, defined only
    * when EVERY file in the snapshot either recorded one or provably holds
    * zero rows (`__rows` = 0 — the stats aggregation groups by
    * input_file_name, so an empty part file never gets a column entry, yet
    * contributes nothing to any extremum). One stats-less NON-empty file
    * makes a global extremum unknowable without a scan → None. The
    * internal `__rows`/`__bytes` keys are not columns. */
  def columnStats(name: String): Option[Seq[(String, String)]] = {
    val internal = Set(SnapshotTable.RowsStatKey, SnapshotTable.BytesStatKey,
      SnapshotTable.SortStatKey)
    val per: Seq[Option[Option[(String, String)]]] = filesWithStats.map { case (_, st) =>
      st.collectFirst {
        case (k, v) if !internal(k) && k.equalsIgnoreCase(name) => v
      } match {
        case Some(v) => Some(Some(v))
        case None if st.get(SnapshotTable.RowsStatKey).exists(_._1.toLong == 0L) =>
          Some(None)
        case None => None
      }
    }
    if (per.forall(_.isDefined)) Some(per.flatten.flatten) else None
  }
}

object LakeFileIndex {

  /** Nominal block size for manifest-built FileStatus objects. Spark's
    * split planning uses `spark.sql.files.maxPartitionBytes`, not the
    * block size, so any positive value works. */
  private val DefaultBlockSize: Long = 128L * 1024 * 1024

  /** Diagnostic: filesystem `getFileStatus` calls made at scan
    * construction (legacy-commit fallback only). Specs pin this at zero
    * for freshly written tables. */
  val fsStatusCalls = new java.util.concurrent.atomic.AtomicLong()

  /** Comparisons spent evaluating In/InSet prune checks (diagnostic;
    * specs pin that the sorted-probe fast path keeps this
    * O(files · log keys) where the naive per-key walk is O(files · keys)). */
  val inPruneComparisons = new java.util.concurrent.atomic.AtomicLong()

  /** Pre-sorted IN-list probe, built once per (planning pass, IN
    * expression) and binary-searched against each file's [min, max]. */
  private sealed trait InProbe
  /** Values not rangewise comparable (nulls, dates, mixed types) — keep
    * every file, exactly like the legacy per-key walk would. */
  private case object InKeepAll extends InProbe
  private final case class NumProbe(sorted: Array[BigDecimal]) extends InProbe
  private final case class StrProbe(sorted: Array[UTF8String]) extends InProbe

  /** Catalyst literal value → probe key, mirroring [[cmp]]'s comparability
    * rules; None for shapes cmp treats as incomparable (keeps files). */
  private def probeKey(v: Any, dt: DataType): Option[scala.util.Either[BigDecimal, UTF8String]] =
    v match {
      case null => None
      case s: UTF8String if dt == StringType => Some(scala.util.Right(s))
      case d: org.apache.spark.sql.types.Decimal => Some(scala.util.Left(d.toBigDecimal))
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long) =>
        Some(scala.util.Left(BigDecimal(n.asInstanceOf[java.lang.Number].longValue())))
      // NaN/Infinity have no BigDecimal form — BigDecimal.decimal throws,
      // and a planning-time throw would fail the QUERY; incomparable →
      // keep files, same as cmp's contract
      case f: java.lang.Float =>
        if (f.isNaN || f.isInfinite) None
        else Some(scala.util.Left(BigDecimal.decimal(f.floatValue())))
      case n: java.lang.Number =>
        val d = n.doubleValue()
        if (d.isNaN || d.isInfinite) None
        else Some(scala.util.Left(BigDecimal.decimal(d)))
      case _ => None
    }

  private def buildProbe(vals: Iterable[(Any, DataType)]): InProbe = {
    val keys = vals.map { case (v, dt) => probeKey(v, dt) }
    if (keys.exists(_.isEmpty)) InKeepAll
    else {
      val (nums, strs) = keys.flatten.partition(_.isLeft)
      if (strs.isEmpty) NumProbe(nums.collect { case scala.util.Left(b) => b }.toArray.sorted)
      else if (nums.isEmpty)
        StrProbe(strs.collect { case scala.util.Right(s) => s }.toArray.sortWith(_.compareTo(_) < 0))
      else InKeepAll // mixed numeric/string set — incomparable as a range
    }
  }

  /** Does any probe value fall in [lo, hi]? Lower-bound binary search,
    * counting comparisons into [[inPruneComparisons]]. */
  private def probeHits[T](sorted: Array[T], lo: T, hi: T,
                           compare: (T, T) => Int): Boolean = {
    var l = 0; var r = sorted.length; var steps = 0L
    while (l < r) {
      val m = (l + r) >>> 1
      steps += 1
      if (compare(sorted(m), lo) < 0) l = m + 1 else r = m
    }
    inPruneComparisons.addAndGet(steps + 1)
    l < sorted.length && compare(sorted(l), hi) <= 0
  }

  /** Can a file with these manifest stats contain a row matching `e`?
    * Returns true unless provably false — every unknown shape keeps the
    * file (pruning must be a superset of the true result). `probeCache`
    * (one per planning pass) memoizes sorted IN-list probes across the
    * per-file calls; without one, IN checks fall back to the per-key
    * walk. */
  private[sources] def mayMatch(
      stats: Map[String, (String, String)],
      types: Map[String, DataType],
      e: Expression,
      transforms: Seq[PartitionTransform] = Nil,
      probeCache: java.util.Map[Expression, AnyRef] = null): Boolean = {

    def colType(a: AttributeReference): Option[DataType] = types.get(a.name.toLowerCase)

    // direct-stat interval checks (keyed by column name) ---------------
    def statBound(a: AttributeReference): Option[(String, String)] =
      stats.collectFirst { case (k, v) if k.equalsIgnoreCase(a.name) => v }

    def maxAbove(a: AttributeReference, l: Literal, strict: Boolean): Boolean =
      statBound(a).forall { case (_, mx) =>
        cmp(mx, l, colType(a)).forall(c => if (strict) c > 0 else c >= 0)
      }

    def minBelow(a: AttributeReference, l: Literal, strict: Boolean): Boolean =
      statBound(a).forall { case (mn, _) =>
        cmp(mn, l, colType(a)).forall(c => if (strict) c < 0 else c <= 0)
      }

    def rangeHas(a: AttributeReference, lo: Literal, hi: Literal): Boolean =
      maxAbove(a, lo, strict = false) && minBelow(a, hi, strict = false)

    // transform-stat checks (keyed by transform repr) ------------------
    // a predicate `c op L` additionally prunes through every transform on c
    // whose stat this file recorded: bucket on equality, monotonic
    // transforms on ranges too (non-strict: transforms are many-to-one)
    def tOn(a: AttributeReference): Seq[(PartitionTransform, (String, String))] =
      transforms.filter(_.srcCol.equalsIgnoreCase(a.name)).flatMap(t =>
        stats.get(t.repr).map(t -> _))

    def tCmp(stat: String, tl: Literal): Option[Int] =
      cmp(stat, tl, Some(tl.dataType))

    def tEq(a: AttributeReference, l: Literal): Boolean = tOn(a).forall {
      case (t, (mn, mx)) => t.literal(l).forall(tl =>
        tCmp(mx, tl).forall(_ >= 0) && tCmp(mn, tl).forall(_ <= 0))
    }

    def tGe(a: AttributeReference, l: Literal): Boolean = tOn(a).forall {
      case (t, (_, mx)) if t.monotonic =>
        t.literal(l).forall(tl => tCmp(mx, tl).forall(_ >= 0))
      case _ => true
    }

    def tLe(a: AttributeReference, l: Literal): Boolean = tOn(a).forall {
      case (t, (mn, _)) if t.monotonic =>
        t.literal(l).forall(tl => tCmp(mn, tl).forall(_ <= 0))
      case _ => true
    }

    // combined leaf checks ---------------------------------------------
    def eqCheck(a: AttributeReference, l: Literal): Boolean =
      rangeHas(a, l, l) && tEq(a, l)
    def geCheck(a: AttributeReference, l: Literal, strict: Boolean): Boolean =
      maxAbove(a, l, strict) && tGe(a, l)
    def leCheck(a: AttributeReference, l: Literal, strict: Boolean): Boolean =
      minBelow(a, l, strict) && tLe(a, l)

    // sorted-probe IN check: engages only with a planning-pass cache and
    // no transform stats on the column (bucket pruning needs the per-key
    // transform mapping); falls back to the exact per-key walk otherwise
    def fastIn(a: AttributeReference, key: Expression,
               vals: => Iterable[(Any, DataType)]): Option[Boolean] = {
      if (probeCache == null ||
          transforms.exists(_.srcCol.equalsIgnoreCase(a.name))) None
      else probeCache.computeIfAbsent(key, _ => buildProbe(vals)) match {
        case InKeepAll => Some(true)
        case NumProbe(sorted) =>
          Some(statBound(a).forall { case (mn, mx) =>
            (try Some((BigDecimal(mn.trim), BigDecimal(mx.trim)))
             catch { case _: NumberFormatException => None }) match {
              case Some((lo, hi)) => probeHits[BigDecimal](sorted, lo, hi, _.compare(_))
              case None => true
            }
          })
        case StrProbe(sorted) if colType(a).contains(StringType) =>
          Some(statBound(a).forall { case (mn, mx) =>
            probeHits[UTF8String](sorted, UTF8String.fromString(mn),
              UTF8String.fromString(mx), _.compareTo(_))
          })
        case _ => Some(true) // string probe on a non-string column: keep
      }
    }

    e match {
      case And(l, r) => mayMatch(stats, types, l, transforms, probeCache) &&
        mayMatch(stats, types, r, transforms, probeCache)
      case Or(l, r) => mayMatch(stats, types, l, transforms, probeCache) ||
        mayMatch(stats, types, r, transforms, probeCache)
      case EqualTo(a: AttributeReference, l: Literal) => eqCheck(a, l)
      case EqualTo(l: Literal, a: AttributeReference) => eqCheck(a, l)
      case EqualNullSafe(a: AttributeReference, l: Literal) => eqCheck(a, l)
      case EqualNullSafe(l: Literal, a: AttributeReference) => eqCheck(a, l)
      case GreaterThan(a: AttributeReference, l: Literal) => geCheck(a, l, strict = true)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => geCheck(a, l, strict = false)
      case LessThan(a: AttributeReference, l: Literal) => leCheck(a, l, strict = true)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => leCheck(a, l, strict = false)
      // literal-on-left comparisons flip
      case GreaterThan(l: Literal, a: AttributeReference) => leCheck(a, l, strict = true)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => leCheck(a, l, strict = false)
      case LessThan(l: Literal, a: AttributeReference) => geCheck(a, l, strict = true)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => geCheck(a, l, strict = false)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        fastIn(a, e, vs.map(l0 => {
          val l = l0.asInstanceOf[Literal]; (l.value, l.dataType)
        })).getOrElse(vs.exists { v =>
          inPruneComparisons.incrementAndGet()
          eqCheck(a, v.asInstanceOf[Literal])
        })
      case InSet(a: AttributeReference, vs) =>
        fastIn(a, e, vs.toSeq.map(v => (v, a.dataType)))
          .getOrElse(vs.exists { v =>
            inPruneComparisons.incrementAndGet()
            eqCheck(a, Literal.create(v, a.dataType))
          })
      // LIKE 'p%' — strings with prefix p form the interval [p, succ(p)):
      // keep iff the file's max reaches p AND the min's own |p|-codepoint
      // prefix does not already exceed p
      case StartsWith(a: AttributeReference, Literal(p: UTF8String, StringType)) =>
        statBound(a).forall { case (mn, mx) =>
          val mnU = UTF8String.fromString(mn)
          UTF8String.fromString(mx).compareTo(p) >= 0 &&
            mnU.substring(0, p.numChars).compareTo(p) <= 0
        }
      // IsNull/IsNotNull/Not/functions/casts: no null counts in the manifest
      // and no interval algebra for arbitrary exprs — keep the file
      case _ => true
    }
  }

  /** Compare a manifest stat string against a literal. None → incomparable
    * (caller keeps the file). Numeric columns compare exactly as
    * BigDecimal — a double round-trip collides distinct longs >= 2^53
    * (e.g. snowflake ids), and a collision on a strict bound would prune a
    * file that still holds matches; since copyOnWrite reuses mayMatch to
    * pick DML rewrite files, that would silently skip rows permanently.
    * String columns compare in BINARY UTF-8 order — the ordering Spark's
    * min/max used to produce the stats (Java String.compareTo is UTF-16
    * order, which disagrees above the BMP and would mis-prune
    * emoji-bearing columns). Date/timestamp/etc literals carry internal
    * encodings that don't match the manifest's display strings, so they
    * are left incomparable ("NaN"/"Infinity" stats also fall out here and
    * keep the file). */
  private def cmp(stat: String, l: Literal, dt: Option[DataType]): Option[Int] = {
    def num(litVal: BigDecimal): Option[Int] =
      try Some(BigDecimal(stat.trim).compare(litVal))
      catch { case _: NumberFormatException => None }
    l.value match {
      case null => None
      case s: UTF8String if dt.contains(StringType) =>
        Some(UTF8String.fromString(stat).compareTo(s))
      case d: org.apache.spark.sql.types.Decimal => num(d.toBigDecimal)
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long) =>
        num(BigDecimal(n.asInstanceOf[java.lang.Number].longValue()))
      // a NaN/Infinity LITERAL has no BigDecimal form (decimal() throws,
      // which would fail query planning) — incomparable, keep the file
      case f: java.lang.Float =>
        if (f.isNaN || f.isInfinite) None else num(BigDecimal.decimal(f.floatValue()))
      case n: java.lang.Number =>
        val dv = n.doubleValue()
        if (dv.isNaN || dv.isInfinite) None else num(BigDecimal.decimal(dv))
      case _ => None
    }
  }
}
