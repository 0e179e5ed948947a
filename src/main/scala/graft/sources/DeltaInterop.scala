package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delta Lake interop without delta jars: read any Delta table by replaying
  * its PUBLIC `_delta_log` (JSON commits + parquet checkpoints), and export
  * a graft-lake snapshot AS a Delta table other engines (Spark+delta,
  * delta-rs, DuckDB delta) can open. The reference ships the same
  * capability as a native format reader (`exec/store/deltalake/
  * DeltaLakeFormatPlugin.java`, log replay `DeltaLogReader.java`) — this is
  * the Spark-first equivalent, and the second leg of the EXPORT LAKE
  * interop bridge next to the Iceberg tree (`LakeExport`).
  *
  * Log replay, per the Delta protocol spec:
  *  - `_delta_log/_last_checkpoint` → `%020d.checkpoint.parquet` (read as
  *    parquet: one row per action with `add`/`remove`/`metaData` structs),
  *    then every `%020d.json` after it, each line one action.
  *  - state = latest `metaData` (its `schemaString` IS Spark schema JSON),
  *    live files = adds minus removes (later action wins per path).
  *  - time travel: replay stops at `VERSION AS OF` (checkpoint used only if
  *    at-or-before the target).
  *
  * Partition values live ONLY in the log (Delta data files omit partition
  * columns), serialized as strings — the scan restores them as typed
  * literal columns per partition group, exactly how delta readers do.
  *
  * Scale: checkpoint replay is a parquet read + driver fold over FILE
  * entries (same O as any delta client's snapshot construction); data reads
  * are ONE `spark.read.parquet` per partition group over explicit pruned
  * file lists. Deletion vectors (merge-on-read) and column mapping
  * ("name"/"id" — physical `col-<uuid>` file columns renamed back through
  * the schemaString's field metadata) are read natively; any OTHER
  * readerFeature is refused loudly.
  */
object DeltaInterop {

  final case class AddFile(path: String, partitionValues: Map[String, String],
                           size: Long, numRecords: Option[Long],
                           minValues: Map[String, JsonNode] = Map.empty,
                           maxValues: Map[String, JsonNode] = Map.empty,
                           dv: Option[DeltaDeletionVectors.Descriptor] = None,
                           // verbatim stats JSON — re-emitted when a commit
                           // replaces this entry (DV attach), so data
                           // skipping survives the rewrite
                           rawStats: Option[String] = None)
  final case class Protocol(minReader: Int, minWriter: Int,
                            readerFeatures: Seq[String] = Nil,
                            writerFeatures: Seq[String] = Nil)
  final case class DeltaState(version: Long, schema: StructType,
                              partitionCols: Seq[String], files: Seq[AddFile],
                              // "none" | "name" | "id" (delta.columnMapping.mode)
                              columnMapping: String = "none",
                              // last protocol action seen in replay — a
                              // checkpoint must re-emit it verbatim, or it
                              // would advertise a version below the
                              // features (DVs) the files still carry
                              protocol: Protocol = Protocol(1, 2))
  final case class ExportResult(version: Long, nFiles: Long, nRows: Long)

  private val mapper = new ObjectMapper()

  // ---- log replay ------------------------------------------------------

  private def logDir(dir: String) = Paths.get(dir, "_delta_log")

  private def commitVersion(name: String): Option[Long] =
    "^(\\d{20})\\.json$".r.findFirstMatchIn(name).map(_.group(1).toLong)
  private def checkpointVersion(name: String): Option[Long] =
    "^(\\d{20})\\.checkpoint\\.parquet$".r.findFirstMatchIn(name).map(_.group(1).toLong)

  /** Replay the log to `version` (default: latest). */
  def readState(spark: SparkSession, dir: String,
                version: Option[Long] = None): DeltaState = {
    val ld = logDir(dir)
    require(Files.isDirectory(ld), s"not a Delta table (no _delta_log/): $dir")
    val names = Files.list(ld).iterator.asScala.map(_.getFileName.toString).toVector
    val commits = names.flatMap(n => commitVersion(n).map(_ -> n)).sortBy(_._1)
    require(commits.nonEmpty, s"empty _delta_log in $dir")
    val target = version.getOrElse(commits.last._1)
    require(commits.exists(_._1 == target) ||
        names.flatMap(checkpointVersion).contains(target),
      s"delta read: no commit version $target in $dir (have ${commits.map(_._1).mkString(",")})")

    val cp = names.flatMap(checkpointVersion).filter(_ <= target).sorted.lastOption
    // replay completeness: without a classic checkpoint the JSON chain
    // must reach version 0, or adds recorded only in cleaned-up commits
    // (or in a v2/UUID checkpoint this reader does not parse) would be
    // silently missing from the state — refuse instead
    val firstNeeded = cp.map(_ + 1).getOrElse(0L)
    val covered = commits.map(_._1).filter(v => v >= firstNeeded && v <= target)
    val expected = (firstNeeded to target)
    require(covered == expected,
      s"delta read: incomplete log replay for version $target — commits " +
        s"${expected.diff(covered).mkString(",")} are missing and no classic " +
        "checkpoint covers them (v2/UUID checkpoints are not supported)")

    var schema: Option[StructType] = None
    var partCols: Seq[String] = Nil
    // later action per path wins; LinkedHashMap keeps add order deterministic
    val files = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]

    var mappingMode = "none"
    def applyMeta(schemaString: String, pc: Seq[String],
                  conf: Map[String, String]): Unit = {
      schema = Some(DataType.fromJson(schemaString).asInstanceOf[StructType])
      partCols = pc
      mappingMode = conf.getOrElse("delta.columnMapping.mode", "none")
    }
    def applyAdd(path: String, pv: Map[String, String], size: Long,
                 stats: Option[String],
                 dv: Option[DeltaDeletionVectors.Descriptor]): Unit = {
      val parsed = stats.map(mapper.readTree)
      val n = parsed.flatMap(s => Option(s.get("numRecords")).map(_.asLong()))
      def side(tag: String): Map[String, JsonNode] =
        parsed.flatMap(s => Option(s.get(tag))).map { node =>
          node.properties.asScala.map(e => e.getKey -> e.getValue).toMap
        }.getOrElse(Map.empty)
      files(path) = AddFile(path, pv, size, n, side("minValues"), side("maxValues"),
        dv, stats)
    }
    var proto = Protocol(1, 2)
    def checkProtocol(minReader: Int, minWriter: Int, readerFeatures: Seq[String],
                      writerFeatures: Seq[String]): Unit = {
      val unsupported = readerFeatures.filterNot(
        Set("timestampNtz", "v2Checkpoint", "deletionVectors", "columnMapping"))
      require(minReader <= 2 || unsupported.isEmpty,
        s"delta read: unsupported reader features ${unsupported.mkString(",")} " +
          s"(minReaderVersion=$minReader) — plain copy-on-write tables only")
      proto = Protocol(minReader, minWriter, readerFeatures, writerFeatures)
    }

    cp.foreach { cpv =>
      val cpDf = spark.read.parquet(ld.resolve(f"$cpv%020d.checkpoint.parquet").toString)
      val cols = cpDf.columns.toSet
      cpDf.collect().foreach { row =>
        if (cols("metaData")) Option(row.getAs[org.apache.spark.sql.Row]("metaData")).foreach { m =>
          applyMeta(m.getAs[String]("schemaString"),
            Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
              .map(_.toSeq).getOrElse(Nil),
            if (m.schema.fieldNames.contains("configuration"))
              Option(m.getAs[scala.collection.Map[String, String]]("configuration"))
                .map(_.toMap).getOrElse(Map.empty)
            else Map.empty)
        }
        if (cols("protocol")) Option(row.getAs[org.apache.spark.sql.Row]("protocol")).foreach { p =>
          def feats(fld: String): Seq[String] =
            if (p.schema.fieldNames.contains(fld))
              Option(p.getAs[scala.collection.Seq[String]](fld))
                .map(_.toSeq).getOrElse(Nil) else Nil
          checkProtocol(p.getAs[Int]("minReaderVersion"),
            p.getAs[Int]("minWriterVersion"),
            feats("readerFeatures"), feats("writerFeatures"))
        }
        if (cols("add")) Option(row.getAs[org.apache.spark.sql.Row]("add")).foreach { a =>
          val fn = a.schema.fieldNames.toSet
          val dv =
            if (!fn.contains("deletionVector")) None
            else Option(a.getAs[org.apache.spark.sql.Row]("deletionVector")).map { d =>
              DeltaDeletionVectors.Descriptor(
                d.getAs[String]("storageType"), d.getAs[String]("pathOrInlineDv"),
                Option(d.getAs[Any]("offset")).map(_.toString.toInt),
                d.getAs[Any]("sizeInBytes").toString.toInt,
                d.getAs[Any]("cardinality").toString.toLong)
            }
          applyAdd(a.getAs[String]("path"),
            Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
              .map(_.toMap).getOrElse(Map.empty),
            a.getAs[Long]("size"),
            if (fn.contains("stats")) Option(a.getAs[String]("stats")) else None,
            dv)
        }
        // checkpoint `remove` rows are IGNORED on purpose: per the Delta
        // protocol a checkpoint's live set is its add entries; remove
        // entries there are only vacuum tombstones, and action order in
        // the parquet is not guaranteed — treating them as state
        // mutations would let a tombstone remove(p, null) that happens to
        // serialize after add(p, dv) silently drop a live file
        // (delta-spark writes exactly that pair after DELETE-with-DV).
      }
    }

    commits.filter { case (v, _) => v > cp.getOrElse(-1L) && v <= target }
      .foreach { case (_, name) =>
        // JSON action order inside one commit is not guaranteed either:
        // reconcile PER VERSION with add winning over remove for the same
        // path (a DV update commits remove(p, old) + add(p, new) — net
        // state is p live with the new metadata). Removes are collected
        // during the line scan and applied after it, minus this
        // version's adds.
        val versionAdds = scala.collection.mutable.Set.empty[String]
        val versionRemoves = scala.collection.mutable.Set.empty[String]
        Files.readAllLines(ld.resolve(name), StandardCharsets.UTF_8).asScala
          .filter(_.trim.nonEmpty).foreach { line =>
            val a = mapper.readTree(line)
            Option(a.get("metaData")).foreach { m =>
              applyMeta(m.get("schemaString").asText(),
                Option(m.get("partitionColumns")).toSeq
                  .flatMap(_.elements.asScala.map(_.asText())),
                Option(m.get("configuration")).filterNot(_.isNull).map(c =>
                  c.properties.asScala.map(e =>
                    e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty))
            }
            Option(a.get("protocol")).foreach { p =>
              def feats(fld: String): Seq[String] = Option(p.get(fld)).toSeq
                .flatMap(_.elements.asScala.map(_.asText()))
              checkProtocol(p.get("minReaderVersion").asInt(),
                Option(p.get("minWriterVersion")).map(_.asInt()).getOrElse(2),
                feats("readerFeatures"), feats("writerFeatures"))
            }
            Option(a.get("add")).foreach { ad =>
              val dv = Option(ad.get("deletionVector")).filterNot(_.isNull).map { d =>
                DeltaDeletionVectors.Descriptor(
                  d.get("storageType").asText(), d.get("pathOrInlineDv").asText(),
                  Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
                  d.get("sizeInBytes").asInt(),
                  Option(d.get("cardinality")).map(_.asLong()).getOrElse(-1L))
              }
              versionAdds += ad.get("path").asText()
              applyAdd(ad.get("path").asText(),
                Option(ad.get("partitionValues")).map(pv =>
                  pv.properties.asScala.map(e =>
                    e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
                  .getOrElse(Map.empty),
                Option(ad.get("size")).map(_.asLong()).getOrElse(0L),
                Option(ad.get("stats")).filterNot(_.isNull).map(_.asText()),
                dv)
            }
            Option(a.get("remove")).foreach(r => versionRemoves += r.get("path").asText())
          }
        versionRemoves.diff(versionAdds).foreach(files.remove)
      }

    val logicalSchema = schema.getOrElse(throw new IllegalArgumentException(
      s"delta read: no metaData action found in $dir"))
    // column mapping: the LOG keys partitionValues/stats by PHYSICAL
    // column names — remap to logical once here so every downstream
    // consumer (partition restore, stats skipping) stays name-agnostic
    val remapped =
      if (mappingMode == "none") files.values.toVector
      else {
        val toLogical = logicalSchema.fields.map(f =>
          physicalFieldName(f) -> f.name).toMap
        def remapKeys[V](m: Map[String, V]): Map[String, V] =
          m.map { case (k, v) => toLogical.getOrElse(k, k) -> v }
        files.values.toVector.map(f => f.copy(
          partitionValues = remapKeys(f.partitionValues),
          minValues = remapKeys(f.minValues),
          maxValues = remapKeys(f.maxValues)))
      }
    DeltaState(target, logicalSchema, partCols, remapped, mappingMode, proto)
  }

  /** Physical name of a mapped field (protocol §"Column Mapping":
    * `delta.columnMapping.physicalName` in the field metadata; falls back
    * to the logical name for unmapped fields). */
  private def physicalFieldName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** The physical (on-disk) rendering of a logical type tree. */
  private def physicalType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(physicalFieldName(f), physicalType(f.dataType), f.nullable)))
    case a: ArrayType => a.copy(elementType = physicalType(a.elementType))
    case m: MapType =>
      m.copy(keyType = physicalType(m.keyType), valueType = physicalType(m.valueType))
    case other => other
  }

  /** DESCRIBE HISTORY for a Delta table (the reference's history surface
    * over `exec/store/deltalake/` tables): one row per JSON commit —
    * version, commitInfo timestamp/operation when recorded, and add/
    * remove action counts. Checkpoint-only versions (JSON cleaned up)
    * are absent, like delta-spark's own history after log retention. */
  final case class HistoryEntry(version: Long, timestampMs: Long,
                                operation: String, nAdds: Int, nRemoves: Int)
  def history(dir: String): Seq[HistoryEntry] = {
    val ld = logDir(dir)
    require(Files.isDirectory(ld), s"not a Delta table (no _delta_log/): $dir")
    val commits = Files.list(ld).iterator.asScala
      .map(_.getFileName.toString).flatMap(n => commitVersion(n).map(_ -> n))
      .toVector.sortBy(_._1)
    commits.map { case (v, name) =>
      var ts = 0L; var op = ""; var adds = 0; var removes = 0
      Files.readAllLines(ld.resolve(name), StandardCharsets.UTF_8).asScala
        .filter(_.trim.nonEmpty).foreach { line =>
          val a = mapper.readTree(line)
          Option(a.get("commitInfo")).foreach { ci =>
            ts = Option(ci.get("timestamp")).map(_.asLong()).getOrElse(ts)
            op = Option(ci.get("operation")).map(_.asText()).getOrElse(op)
          }
          if (a.has("add")) adds += 1
          if (a.has("remove")) removes += 1
        }
      HistoryEntry(v, ts, op, adds, removes)
    }
  }

  // ---- scan ------------------------------------------------------------

  /** Delta partition-value string → typed literal (protocol §"Partition
    * Value Serialization": canonical string forms; null/absent → null). */
  private def partitionLit(dt: DataType, s: String): Column =
    if (s == null) lit(null).cast(dt) else lit(s).cast(dt)

  def scan(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame =
    scanFiles(spark, dir, readState(spark, dir, version), None)

  /** File pruning from the log's per-file stats (add.stats minValues/
    * maxValues; partition columns compare against partitionValues) — the
    * delta-client data-skipping step, done BEFORE the scan so a bounded
    * predicate never opens non-overlapping files. Files without stats for
    * the column are kept (pruning must never drop a possible match).
    * Returns (df over kept files, kept count, live count). */
  def scanPruned(spark: SparkSession, dir: String, column: String,
                 lo: Option[Any], hi: Option[Any],
                 version: Option[Long] = None): (DataFrame, Int, Int) = {
    val st = readState(spark, dir, version)
    val dt = st.schema(column).dataType
    val isPart = st.partitionCols.contains(column)
    // the COLUMN TYPE — not value parseability — decides the comparison:
    // delta records string stats lexicographically, and a numeric-looking
    // string column (min="100", max="9") compared numerically would prune
    // files that hold matching rows. Numeric columns compare numerically
    // (their JSON stats are numbers or numeric strings); everything else
    // compares lexicographically (ISO dates/timestamps order correctly).
    val numericCol = dt match { case _: NumericType => true; case _ => false }
    def numeric(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue)
      case j: JsonNode if j.isNumber => Some(j.asDouble)
      case s: String => scala.util.Try(s.toDouble).toOption
      case j: JsonNode if j.isTextual => scala.util.Try(j.asText.toDouble).toOption
      case _ => None
    }
    def text(v: Any): String = v match {
      case j: JsonNode => j.asText
      case other => String.valueOf(other)
    }
    def cmp(a: Any, b: Any): Int =
      if (numericCol) (numeric(a), numeric(b)) match {
        case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
        case _ => text(a).compareTo(text(b)) // malformed stat — degrade
      }
      else text(a).compareTo(text(b))
    def fileBounds(f: AddFile): (Option[Any], Option[Any]) =
      if (isPart) {
        val pv = f.partitionValues.get(column).flatMap(Option(_))
        (pv, pv)
      } else (f.minValues.get(column), f.maxValues.get(column))
    val kept = st.files.filter { f =>
      val (fMin, fMax) = fileBounds(f)
      val aboveLo = (lo, fMax) match {
        case (Some(l), Some(mx)) => cmp(mx, l) >= 0
        case _ => true
      }
      val belowHi = (hi, fMin) match {
        case (Some(h), Some(mn)) => cmp(mn, h) <= 0
        case _ => true
      }
      aboveLo && belowHi
    }
    (scanFiles(spark, dir, st, Some(kept)), kept.size, st.files.size)
  }

  private def scanFiles(spark: SparkSession, dir: String, st0: DeltaState,
                        subset: Option[Seq[AddFile]]): DataFrame = {
    val st = subset.map(fs => st0.copy(files = fs)).getOrElse(st0)
    if (st.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st.schema)
    val dataSchema = StructType(
      st.schema.fields.filterNot(f => st.partitionCols.contains(f.name)))
    val partFields = st.partitionCols.map(c => st.schema(c))

    // merge-on-read deletion vectors: deleted (file, row_index) pairs come
    // from the descriptors, parsed once here (driver: ~8 bytes per deleted
    // row while building; at cluster scale a distributed parse over the
    // descriptor list is the same join), subtracted with ONE left_anti
    // join on _metadata.file_path/row_index — AQE broadcasts the deleted
    // set when it is small, the overwhelmingly common case.
    val dvFiles = st.files.filter(_.dv.isDefined)
    val normPath = (c: Column) => regexp_replace(c, "^(file:)?/+", "/")

    // column mapping ("name"/"id" modes): files carry PHYSICAL column
    // names (col-<uuid>), the log's schemaString carries the logical↔
    // physical mapping in field metadata. Read with the physical schema
    // tree, then rename back with one projection — nested structs rename
    // positionally via cast (physical and logical trees are congruent by
    // construction).
    val mapped = st.columnMapping != "none"
    val physDataSchema =
      if (!mapped) dataSchema
      else physicalType(dataSchema).asInstanceOf[StructType]

    val grouped = st.files.groupBy(f =>
      st.partitionCols.map(c => f.partitionValues.getOrElse(c, null)))
    val parts = grouped.toSeq.map { case (vals, fs) =>
      val paths = fs.map(f =>
        s"$dir/${java.net.URLDecoder.decode(f.path, "UTF-8")}")
      val dfP = spark.read.schema(physDataSchema).parquet(paths: _*)
      // ONE projection: logical rename + (when DVs exist) the _metadata
      // columns — _metadata resolves only directly on the file relation
      val dataCols: Seq[Column] =
        if (!mapped) dfP.columns.toIndexedSeq.map(col)
        else dataSchema.fields.toIndexedSeq.map(f =>
          col(s"`${physicalFieldName(f)}`").cast(f.dataType).as(f.name))
      val metaCols: Seq[Column] =
        if (dvFiles.isEmpty) Nil
        else Seq(normPath(col("_metadata.file_path")).as("__dv_fp"),
          col("_metadata.row_index").as("__dv_pos"))
      val df1 =
        if (!mapped && dvFiles.isEmpty) dfP
        else dfP.select((dataCols ++ metaCols): _*)
      partFields.zip(vals).foldLeft(df1) { case (df, (field, v)) =>
        df.withColumn(field.name, partitionLit(field.dataType, v))
      }
    }
    val all = parts.reduce(_ unionByName _)
    val undeleted =
      if (dvFiles.isEmpty) all
      else {
        import spark.implicits._
        val deleted: Seq[(String, Long)] = dvFiles.flatMap { f =>
          val abs = Paths.get(dir, java.net.URLDecoder.decode(f.path, "UTF-8"))
            .toAbsolutePath.toString
          DeltaDeletionVectors.positionsOf(dir, f.dv.get).map(abs -> _)
        }
        val dels = deleted.toDF("__dv_fp", "__dv_pos")
          .select(normPath(col("__dv_fp")).as("__dv_fp"), col("__dv_pos"))
        all.join(dels, Seq("__dv_fp", "__dv_pos"), "left_anti")
      }
    undeleted.select(st.schema.fieldNames.map(col).toSeq: _*)
  }

  // ---- export ----------------------------------------------------------

  private def deltaPartitionString(v: Any): String = v match {
    case null => null
    case d: java.sql.Date => d.toLocalDate.toString
    case t: java.sql.Timestamp => t.toLocalDateTime.toString.replace('T', ' ')
    case other => other.toString
  }

  private def statsJson(row: org.apache.spark.sql.Row, n: Long,
                        statCols: Seq[StructField]): String = {
    val o = mapper.createObjectNode()
    o.put("numRecords", n)
    def side(tag: String, pre: String): Unit = {
      val node = o.putObject(tag)
      statCols.foreach { f =>
        row.getAs[Any](s"$pre${f.name}") match {
          case null => ()
          case i: Int => node.put(f.name, i)
          case l: Long => node.put(f.name, l)
          case fl: Float => node.put(f.name, fl)
          case d: Double => node.put(f.name, d)
          case s: String => node.put(f.name, s)
          case d: java.sql.Date => node.put(f.name, d.toLocalDate.toString)
          case bd: java.math.BigDecimal => node.put(f.name, bd)
          case other => node.put(f.name, other.toString)
        }
      }
    }
    side("minValues", "__mn_"); side("maxValues", "__mx_")
    mapper.writeValueAsString(o)
  }

  /** Export `srcDir`'s lake snapshot (at `version`, default latest) as a
    * Delta table at `dstDir`: hive-partitioned parquet + a single commit 0
    * with protocol/metaData/add actions carrying per-file stats. */
  def exportTo(spark: SparkSession, srcDir: String, dstDir: String,
               version: Option[Long] = None,
               partitionBy: Seq[String] = Nil): ExportResult = {
    val t = SnapshotTable.forPath(spark, srcDir)
    val v = version.getOrElse(t.latestVersion)
    val df = t.read(version)
    require(!Files.exists(Paths.get(dstDir)) ||
        Files.list(Paths.get(dstDir)).iterator.asScala.isEmpty,
      s"EXPORT LAKE target '$dstDir' is not empty")

    // hash write-distribution, same rationale as LakeExport.writeSnapshot:
    // partition values write in parallel instead of sequentially from one
    // source-split task
    val src =
      if (partitionBy.nonEmpty) df.repartition(partitionBy.map(col): _*)
      else df
    val w = src.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dstDir)
    // Spark leaves a _SUCCESS marker; harmless to delta readers, drop anyway
    Files.deleteIfExists(Paths.get(dstDir, "_SUCCESS"))

    val written = spark.read.parquet(dstDir)
    val schema = written.schema
    val statCols = schema.fields.toSeq.filter { f =>
      !partitionBy.contains(f.name) && (f.dataType match {
        case IntegerType | LongType | FloatType | DoubleType | StringType |
             DateType | _: DecimalType => true
        case _ => false
      })
    }
    val aggs = count(lit(1)).as("__n") +:
      (statCols.flatMap(f => Seq(
        min(col(f.name)).as(s"__mn_${f.name}"), max(col(f.name)).as(s"__mx_${f.name}"))) ++
        partitionBy.map(c => first(col(c)).as(s"__pv_$c")))
    val perFile = written
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per data FILE

    val nowMs = System.currentTimeMillis()
    val ld = logDir(dstDir)
    Files.createDirectories(ld)
    val lines = Vector.newBuilder[String]

    val protocol = mapper.createObjectNode()
    protocol.putObject("protocol").put("minReaderVersion", 1).put("minWriterVersion", 2)
    lines += mapper.writeValueAsString(protocol)

    val meta = mapper.createObjectNode()
    val m = meta.putObject("metaData")
    m.put("id", java.util.UUID.nameUUIDFromBytes(
      s"graft-delta-export:$srcDir:$v".getBytes(StandardCharsets.UTF_8)).toString)
    m.putObject("format").put("provider", "parquet").putObject("options")
    m.put("schemaString", schema.json)
    val pcArr = m.putArray("partitionColumns")
    partitionBy.foreach(pcArr.add)
    m.putObject("configuration")
    m.put("createdTime", nowMs)
    lines += mapper.writeValueAsString(meta)

    var totalRows = 0L
    perFile.foreach { row =>
      val abs = row.getAs[String]("__file").stripPrefix("file:")
      val n = row.getAs[Long]("__n")
      totalRows += n
      val rel = Paths.get(dstDir).toAbsolutePath.relativize(
        Paths.get(abs).toAbsolutePath).toString
      val action = mapper.createObjectNode()
      val add = action.putObject("add")
      add.put("path", rel)
      val pv = add.putObject("partitionValues")
      partitionBy.foreach { c =>
        val s = deltaPartitionString(row.getAs[Any](s"__pv_$c"))
        if (s == null) pv.putNull(c) else pv.put(c, s)
      }
      add.put("size", try Files.size(Paths.get(abs)) catch { case _: Throwable => 0L })
      add.put("modificationTime", nowMs)
      add.put("dataChange", true)
      add.put("stats", statsJson(row, n, statCols))
      lines += mapper.writeValueAsString(action)
    }

    val commit = mapper.createObjectNode()
    val ci = commit.putObject("commitInfo")
    ci.put("timestamp", nowMs)
    ci.put("operation", "WRITE")
    ci.put("engineInfo", s"graft export of lake $srcDir@$v")
    lines += mapper.writeValueAsString(commit)

    Files.write(ld.resolve(f"${0L}%020d.json"),
      lines.result().mkString("\n").getBytes(StandardCharsets.UTF_8))
    ExportResult(v, perFile.length.toLong, totalRows)
  }

  /** Attach DELETION VECTORS to live files as one new commit — the
    * merge-on-read DELETE a DV-enabled delta writer produces (protocol
    * §"Deletion Vectors", "Writer Requirements for Deletion Vectors"):
    * for each file, merge any existing DV positions, write a
    * `deletion_vector_<uuid>.bin` ("u" storage, Z85 uuid), and commit
    * `remove` (old entry) + `add` (same path, new descriptor, verbatim
    * stats so data skipping survives) plus the protocol upgrade to
    * readerFeatures=[deletionVectors]. `deletes` maps RELATIVE data paths
    * (as the log records them) to 0-based row positions. Returns the new
    * log version. */
  def publishDeletionVectors(spark: SparkSession, dir: String,
                             deletes: Map[String, Seq[Long]]): Long = {
    require(deletes.nonEmpty && deletes.values.forall(_.nonEmpty),
      "publishDeletionVectors: empty delete set")
    val st = readState(spark, dir)
    val byPath = st.files.map(f => f.path -> f).toMap
    val unknown = deletes.keys.filterNot(byPath.contains)
    require(unknown.isEmpty,
      s"publishDeletionVectors: not live data files: ${unknown.mkString(", ")}")
    val nowMs = System.currentTimeMillis()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += mapper.writeValueAsString {
      val p = mapper.createObjectNode()
      val pr = p.putObject("protocol")
      pr.put("minReaderVersion", 3).put("minWriterVersion", 7)
      pr.putArray("readerFeatures").add("deletionVectors")
      pr.putArray("writerFeatures").add("deletionVectors")
      p
    }
    deletes.toSeq.sortBy(_._1).foreach { case (relPath, positions) =>
      val f = byPath(relPath)
      val merged = (positions ++ f.dv.toSeq.flatMap(d =>
        DeltaDeletionVectors.positionsOf(dir, d))).distinct.sorted.toArray
      val uuid = java.util.UUID.randomUUID()
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
      val (offset, size) = DeltaDeletionVectors.writeDvFile(
        Paths.get(dir, s"deletion_vector_$uuid.bin").toString, merged)
      val rm = mapper.createObjectNode()
      rm.putObject("remove").put("path", relPath)
        .put("deletionTimestamp", nowMs).put("dataChange", true)
      lines += mapper.writeValueAsString(rm)
      val addNode = mapper.createObjectNode()
      val add = addNode.putObject("add")
      add.put("path", relPath)
      val pv = add.putObject("partitionValues")
      f.partitionValues.foreach { case (k, v) =>
        if (v == null) pv.putNull(k) else pv.put(k, v) }
      add.put("size", f.size)
      add.put("modificationTime", nowMs)
      add.put("dataChange", true)
      f.rawStats.foreach(s => add.put("stats", s))
      add.putObject("deletionVector")
        .put("storageType", "u")
        .put("pathOrInlineDv", DeltaDeletionVectors.z85Encode(bb.array()))
        .put("offset", offset)
        .put("sizeInBytes", size)
        .put("cardinality", merged.length.toLong)
      lines += mapper.writeValueAsString(addNode)
    }
    val newV = st.version + 1
    // CREATE_NEW = the delta commit rule: one writer wins the version file
    Files.write(logDir(dir).resolve(f"$newV%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    newV
  }

  /** Write a parquet checkpoint for the state at `version` plus the
    * `_last_checkpoint` pointer — the compaction step real delta writers
    * take every N commits so replay cost stays bounded; also what lets the
    * reader spec prove checkpoint-based replay on a real file. */
  def writeCheckpoint(spark: SparkSession, dir: String, version: Long): Unit = {
    val st = readState(spark, dir, Some(version))
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val addType = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("partitionValues", MapType(StringType, StringType, true)),
      StructField("size", LongType, nullable = false),
      StructField("modificationTime", LongType, nullable = false),
      StructField("dataChange", BooleanType, nullable = false),
      // stats + deletionVector MUST survive checkpointing: replaying from
      // a checkpoint that dropped them would resurrect DV-deleted rows
      // and lose data skipping
      StructField("stats", StringType),
      StructField("deletionVector", dvType)))
    val metaType = StructType(Seq(
      StructField("id", StringType), StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("createdTime", LongType)))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType, nullable = false),
      StructField("minWriterVersion", IntegerType, nullable = false),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
    val cpSchema = StructType(Seq(
      StructField("protocol", protoType), StructField("metaData", metaType),
      StructField("add", addType)))
    import org.apache.spark.sql.Row
    // re-emit the protocol the replay saw (feature lists only when the
    // versions require them — a v1/v2 protocol with feature fields would
    // be malformed for strict readers)
    val protoRow = Row(st.protocol.minReader, st.protocol.minWriter,
      if (st.protocol.minReader >= 3) st.protocol.readerFeatures else null,
      if (st.protocol.minWriter >= 7) st.protocol.writerFeatures else null)
    val rows =
      Row(protoRow, null, null) +:
      Row(null, Row("graft-checkpoint", st.schema.json,
        st.partitionCols, System.currentTimeMillis()), null) +:
      st.files.map(f => Row(null, null,
        Row(f.path, f.partitionValues, f.size, 0L, true,
          f.rawStats.orNull,
          f.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
            d.offset.map(Int.box).orNull, d.sizeInBytes, d.cardinality)).orNull)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpSchema)
      .coalesce(1).write.mode("overwrite")
      .parquet(logDir(dir).resolve(f"$version%020d.checkpoint.tmp").toString)
    // single parquet part → canonical checkpoint name
    val tmp = logDir(dir).resolve(f"$version%020d.checkpoint.tmp")
    val part = Files.list(tmp).iterator.asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, logDir(dir).resolve(f"$version%020d.checkpoint.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.walk(tmp).iterator.asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    val lc = mapper.createObjectNode()
    lc.put("version", version).put("size", rows.size)
    Files.write(logDir(dir).resolve("_last_checkpoint"),
      mapper.writeValueAsString(lc).getBytes(StandardCharsets.UTF_8))
  }
}
