package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.ObjectMapper

/** Persisted CBO statistics for lake tables — the bridge between
  * `ANALYZE LAKE ... COMPUTE STATISTICS` and Spark's cost-based optimizer
  * (reference: `services/statistics/StatisticsServiceImpl.java:465-502`
  * feeds t-digest histograms + NDV into the planner's selectivity; Spark's
  * native channel for the same information is `CatalogStatistics` with
  * equi-height `Histogram`s, consumed by `FilterEstimation`/`JoinEstimation`
  * when `spark.sql.cbo.enabled` is on).
  *
  * Storage: the stats ride the lake table's TBLPROPERTIES (a metadata-only
  * commit) under `graft.stats.*` keys — versioned, time-travelable and
  * branch-aware like every other table property, and snapshot resolution
  * already reads them for free. Scans of a full snapshot attach a synthetic
  * `CatalogTable` carrying the decoded `CatalogStatistics`, which is ALL
  * `LogicalRelation.computeStats` needs to hand CBO real row counts,
  * per-column NDV/null/min/max, and histograms. Stats are estimates by
  * contract: they go stale under DML until the next ANALYZE (exactly the
  * reference's model) and never affect results, only plan choice.
  *
  * min/max/histograms are injected for NUMERIC and DATE columns — the
  * external-string round trip through
  * `CatalogColumnStat.fromExternalString` is dialect-free for both
  * (numerics as plain numbers, dates as calendar-date strings, which is
  * exactly what the profile's cast-to-string yields and is
  * timezone-free); date HISTOGRAM bins are epoch-day doubles, the unit
  * FilterEstimation converts date literals to. Numeric and date range
  * predicates are where histogram selectivity pays (skewed ids, amounts,
  * event dates). Other columns still get NDV + null counts. */
object CboStats {

  val RowCountKey = "graft.stats.rowCount"
  val SizeKey = "graft.stats.sizeInBytes"
  val VersionKey = "graft.stats.analyzedVersion"
  val ColPrefix = "graft.stats.col."

  /** Max distinct values for a string column to be treated as
    * CATEGORICAL (frequent items computed and persisted). Above this a
    * top-k groupBy would scan-shuffle a near-key column for items no
    * equality predicate will ever hit. */
  val MaxCategoricalNdv = 4096L
  /** Frequent items kept per categorical column (the reference keeps an
    * ItemsSketch per column — `StatisticsServiceImpl.java:502`). */
  val FreqItemsK = 8

  private val mapper = new ObjectMapper()

  /** Encode a profile (+ optional histograms and per-string-column
    * frequent items) into TBLPROPERTIES pairs. `profileRows` are
    * [[Statistics.profile]] rows. */
  def encode(schema: StructType,
             profileRows: Seq[(String, Long, Long, Long, String, String)],
             hists: Map[String, (Double, Seq[(Double, Double, Long)])],
             sizeInBytes: Long, analyzedVersion: Long,
             minMaxOverride: Map[String, (String, String)] = Map.empty,
             freqItems: Map[String, Seq[(String, Long)]] = Map.empty)
      : Map[String, String] = {
    val eligible = schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] ||
        f.dataType == DateType || f.dataType == TimestampType => f.name
    }.toSet
    val typeOf = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val cols = profileRows.map { case (name, _, nulls, ndv, mn0, mx0) =>
      val (mn, mx) = minMaxOverride.getOrElse(name, (mn0, mx0))
      val node = mapper.createObjectNode()
      node.put("nulls", nulls)
      node.put("ndv", ndv)
      // the ANALYZE-time type rides along: min/max/hist are only valid
      // for the type they were computed under (a DROP+re-ADD of the same
      // NAME with a new type must not feed the old external strings to
      // the planner's decoder — that would fail every scan's planning)
      typeOf.get(name).foreach(t => node.put("t", t))
      if (eligible(name) && mn != null && mx != null) {
        node.put("min", mn)
        node.put("max", mx)
        hists.get(name).foreach { case (height, bins) =>
          val h = node.putObject("hist")
          h.put("height", height)
          val arr = h.putArray("bins")
          bins.foreach { case (lo, hi, bndv) =>
            val b = mapper.createArrayNode()
            b.add(lo); b.add(hi); b.add(bndv)
            arr.add(b); ()
          }
        }
      }
      // categorical frequent items ([item, count] pairs, top-k by count):
      // the string-column analog of the histogram — Spark CBO's string
      // contract is NDV-only, so these feed the categorical-equality
      // estimation hook (plans.CategoricalSelectivity) instead
      freqItems.get(name).foreach { items =>
        val arr = node.putArray("freq")
        items.foreach { case (item, cnt) =>
          val b = mapper.createArrayNode()
          b.add(item); b.add(cnt)
          arr.add(b); ()
        }
      }
      (ColPrefix + name) -> node.toString
    }
    val nRows = profileRows.headOption.map(_._2).getOrElse(0L)
    (cols :+ (RowCountKey -> nRows.toString)
      :+ (SizeKey -> sizeInBytes.toString)
      :+ (VersionKey -> analyzedVersion.toString)).toMap
  }

  /** Decoded frequent items for one column: (item, count) pairs, or
    * empty when none are stored or the column's analyzed type no longer
    * matches (same drop/re-ADD gate as min/max). */
  def frequentItemsFor(props: Map[String, String],
                       field: StructField): Seq[(String, Long)] =
    props.get(ColPrefix + field.name).toSeq.flatMap { js =>
      scala.util.Try {
        val n = mapper.readTree(js)
        val typeMatches = Option(n.get("t"))
          .forall(_.asText() == field.dataType.simpleString)
        if (!typeMatches) Seq.empty
        else Option(n.get("freq")).toSeq.flatMap { f =>
          val it = f.elements()
          val buf = Seq.newBuilder[(String, Long)]
          while (it.hasNext) {
            val e = it.next()
            buf += ((e.get(0).asText(), e.get(1).asLong()))
          }
          buf.result()
        }
      }.getOrElse(Seq.empty)
    }

  /** Decode stored properties into the synthetic CatalogTable a lake scan
    * attaches (None when the table was never ANALYZEd with persistence AND
    * carries no planner-relevant table flags). The CatalogTable is also
    * the in-memory carrier for per-table planner opt-ins — today the
    * APPROXIMATE STATS flag ([[graft.sources.SnapshotTable.ApproxStatsKey]],
    * read by [[graft.plans.ApproxCountDistinct]]) — so a flagged table
    * gets one even before its first ANALYZE (stats = None; size falls
    * back to the relation estimate). */
  def catalogTableFor(dir: String, schema: StructType,
                      props: Map[String, String]): Option[CatalogTable] = {
    val approxKey = graft.sources.SnapshotTable.ApproxStatsKey
    val stats: Option[CatalogStatistics] = props.get(RowCountKey).flatMap { rc =>
      scala.util.Try {
        val colStats: Map[String, CatalogColumnStat] =
          schema.fields.flatMap { f =>
            props.get(ColPrefix + f.name).map { js =>
              val n = mapper.readTree(js)
              // type gate: a column dropped and re-added under the same
              // name with a DIFFERENT type must not inherit the old
              // min/max/hist — the planner's external-string decode is
              // type-directed and would throw at planning time. NDV and
              // null counts are type-free and stay (stale, like any
              // pre-re-ANALYZE statistic).
              val typeMatches = Option(n.get("t"))
                .forall(_.asText() == f.dataType.simpleString)
              val hist = if (!typeMatches) None
                else Option(n.get("hist")).map { h =>
                  val bins = h.get("bins").elements()
                  val buf = Vector.newBuilder[HistogramBin]
                  while (bins.hasNext) {
                    val b = bins.next()
                    buf += HistogramBin(b.get(0).asDouble(), b.get(1).asDouble(),
                      b.get(2).asLong())
                  }
                  Histogram(h.get("height").asDouble(), buf.result().toArray)
                }
              f.name -> CatalogColumnStat(
                distinctCount = Some(BigInt(n.get("ndv").asLong())),
                min = if (typeMatches) Option(n.get("min")).map(_.asText()) else None,
                max = if (typeMatches) Option(n.get("max")).map(_.asText()) else None,
                nullCount = Some(BigInt(n.get("nulls").asLong())),
                histogram = hist)
            }
          }.toMap
        CatalogStatistics(
          sizeInBytes = BigInt(props.getOrElse(SizeKey, "0")),
          rowCount = Some(BigInt(rc)),
          colStats = colStats)
      }.toOption
    }
    if (stats.isEmpty && !props.get(approxKey).contains("true")) None
    else Some(CatalogTable(
      identifier = TableIdentifier(
        "graft_lake_" + Integer.toHexString(dir.hashCode)),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = schema,
      provider = Some("parquet"),
      // the raw graft.stats.* nodes (and the approx flag) ride along so
      // downstream consumers (plans.CategoricalSelectivity's frequent-item
      // lookup, plans.ApproxCountDistinct's opt-in check) read them
      // IN-MEMORY instead of re-listing the commit log per
      // optimizer-fixpoint iteration
      properties = props.filter { case (k, _) =>
        k.startsWith(ColPrefix) || k == approxKey },
      stats = stats))
  }

  /** Compute + persist stats for a lake table (the ANALYZE LAKE ...
    * COMPUTE STATISTICS body): one profile pass (+ two histogram passes
    * when requested), one metadata-only commit. Returns the profile.
    * `columns` scopes the pass (empty = all); a scoped run MERGES into
    * the stored map — other columns' stats survive untouched, so a wide
    * table can maintain stats per key group on different cadences. */
  def analyze(spark: SparkSession, dir: String, withHistogram: Boolean,
              buckets: Int = 16, columns: Seq[String] = Nil): DataFrame = {
    val t = graft.sources.SnapshotTable.forPath(spark, dir)
    val full = t.read()
    val df =
      if (columns.isEmpty) full
      else full.select(columns.map(org.apache.spark.sql.functions.col): _*)
    val prof = Statistics.profile(df)
    val rows = prof.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    val hists =
      if (withHistogram)
        Statistics.histograms(df, df.columns.toSeq, bins = buckets)
      else Map.empty[String, (Double, Seq[(Double, Double, Long)])]
    // TIMESTAMP min/max must carry the exact external form the planner's
    // v2 parser expects (fraction included; the profile's cast-to-string
    // drops a zero fraction and fails the decode). Compute epoch micros
    // numerically and render "yyyy-MM-dd HH:mm:ss.SSSSSS" in UTC — the
    // engine pins the session timezone to UTC, so encode and decode agree.
    val tsCols = df.schema.fields
      .filter(_.dataType == TimestampType).map(_.name).toSeq
    val tsMinMax: Map[String, (String, String)] =
      if (tsCols.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.{col, max, min, unix_micros}
        val aggs = tsCols.flatMap(c => Seq(
          min(unix_micros(col(c))).as(s"mn_$c"),
          max(unix_micros(col(c))).as(s"mx_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        def render(micros: Long): String = {
          val i = java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L)
          java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
            .withZone(java.time.ZoneOffset.UTC).format(i)
        }
        tsCols.flatMap { c =>
          val (mi, ma) = (r.getAs[Any](s"mn_$c"), r.getAs[Any](s"mx_$c"))
          if (mi == null || ma == null) None
          else Some(c -> (render(mi.asInstanceOf[Long]),
            render(ma.asInstanceOf[Long])))
        }.toMap
      }
    // categorical frequent items: STRING columns whose profiled NDV says
    // "genuinely categorical" get an exact top-k — ALL such columns in
    // ONE corpus pass (frequentItemsMulti; status/flag/code columns,
    // never free text, which the NDV gate excludes before any shuffle)
    val ndvOf = rows.map(r => (r._1, r._4)).toMap
    val catCols = df.schema.fields.collect {
      case f if f.dataType == StringType &&
          ndvOf.getOrElse(f.name, Long.MaxValue) <= MaxCategoricalNdv => f.name
    }.toSeq
    val freq: Map[String, Seq[(String, Long)]] =
      Statistics.frequentItemsMulti(df, catCols, FreqItemsK)
        .map { case (c, items) => c -> items.filter(_._1.length <= 1024) }
        .filter(_._2.nonEmpty)
    val size = t.snapshotSizeInBytes
    t.setProperties(encode(df.schema, rows, hists, size, t.latestVersion,
      tsMinMax, freq))
    noteAnalyzed(dir)
    prof
  }

  // ---------- sys.table_statistics enumeration ----------
  //
  // The statistics themselves live DURABLY in each lake table's
  // TBLPROPERTIES (analyze() above); lake tables are path-addressed with
  // no global catalog, so the sys view needs a path registry. ANALYZE and
  // the lake_stats TVF both register here — a restart forgets the listing
  // but never the stats (re-ANALYZE or lake_stats re-registers).

  private val analyzedDirs = scala.collection.concurrent.TrieMap.empty[String, Unit]
  def noteAnalyzed(dir: String): Unit = { analyzedDirs.put(dir, ()); () }
  def clearAnalyzedRegistry(): Unit = analyzedDirs.clear()

  /** Decoded per-column statistics for every registered table — the rows
    * behind sys_table_statistics (reference SystemTable TABLE_STATISTICS,
    * StatisticsService): one row per (table, column) with the table-level
    * row count / size / analyzed version denormalized on. Tables that
    * vanished or lost their stats drop out silently. */
  def statisticsRows(spark: SparkSession): Seq[org.apache.spark.sql.Row] =
    analyzedDirs.keys.toSeq.sorted.flatMap { dir =>
      try {
        val props = graft.sources.SnapshotTable.forPath(spark, dir).properties
        props.get(RowCountKey).map(_.toLong).toSeq.flatMap { rc =>
          val size = props.get(SizeKey).map(_.toLong).getOrElse(0L)
          val ver = props.get(VersionKey).map(_.toLong).getOrElse(0L)
          props.toSeq.collect { case (k, v) if k.startsWith(ColPrefix) =>
            val colName = k.stripPrefix(ColPrefix)
            val node = mapper.readTree(v)
            org.apache.spark.sql.Row(dir, colName,
              Option(node.get("t")).map(_.asText).orNull,
              node.path("ndv").asLong, node.path("nulls").asLong,
              Option(node.get("min")).map(_.asText).orNull,
              Option(node.get("max")).map(_.asText).orNull,
              node.path("hist").path("bins").size,
              node.path("freq").size,
              rc, size, ver)
          }.sortBy(_.getString(1))
        }
      } catch { case _: Exception => Seq.empty }
    }
}
