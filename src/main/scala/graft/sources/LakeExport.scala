package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Export a graft-lake snapshot as an interop tree other engines can read
  * (reference: Iceberg table layout served to external readers,
  * `exec/store/iceberg/IcebergScanPrel.java:96`, table metadata model
  * `exec/store/iceberg/model/IcebergTableProps.java`):
  *
  * ```
  * dst/
  *   data/                    plain (optionally hive-partitioned) parquet —
  *                            readable by ANY engine via spark.read.parquet
  *                            / DuckDB read_parquet, no graft code needed
  *   metadata/
  *     v1.metadata.json       Iceberg v2 table metadata (spec §"Table Metadata")
  *     snap-<id>-1-<uuid>.avro  manifest list (one manifest_file entry)
  *     <uuid>-m0.avro           manifest (one manifest_entry per data file,
  *                              record counts + value bounds)
  *   _graft_export.json       provenance tag: source table, version, schema
  * ```
  *
  * The metadata tree follows the PUBLIC Iceberg spec (format-version 2):
  * field-ids are assigned 1..N in schema order and a
  * `schema.name-mapping.default` property maps the parquet columns (written
  * without embedded field ids) by name — the published mechanism for
  * migrated/imported files. No Iceberg runtime exists in this environment,
  * so compliance evidence is structural: LakeExportSpec re-reads the avro
  * manifests with the Avro reader and checks paths/counts/bounds against
  * the data, and the plain-parquet round trip is oracle-gated
  * (`lake_export` in CORRECTNESS).
  *
  * Scale: the export is one distributed parquet write plus ONE aggregate
  * pass over the written files for per-file counts/bounds (grouped by
  * `input_file_name()`, two-phase partial agg). Manifest/metadata writes
  * are per-FILE driver work, same O as any Iceberg commit.
  */
object LakeExport {

  final case class ExportResult(version: Long, nFiles: Long, nRows: Long,
                                metadataJson: String)

  /** Bounds-capable leaf types: Iceberg single-value binary serialization
    * (spec §"Binary single-value serialization"). */
  private def boundBytes(dt: DataType, v: Any): Option[Array[Byte]] =
    boundBytes(dt, v, lower = true)

  /** Iceberg single-value bound bytes. Strings longer than 16 chars are
    * TRUNCATED; a truncated LOWER bound only loosens, but a truncated
    * UPPER bound must round UP (increment the last kept code point — spec
    * `UnicodeUtil.truncateStringMax`) or it would claim a maximum BELOW
    * real data and third-party engines (and our own pruneByBounds) would
    * silently skip files holding matching rows. If every kept code point
    * is already at the maximum, no valid upper exists — omit the bound
    * (never prunes, always safe). Truncation cuts at CODE POINTS, not
    * bytes, so a bound can never end mid-UTF-8-sequence. */
  private def boundBytes(dt: DataType, v: Any, lower: Boolean): Option[Array[Byte]] = {
    def le(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); fill(b); b.array()
    }
    (dt, v) match {
      case (_, null)                 => None
      case (IntegerType, i: Int)     => Some(le(4)(_.putInt(i)))
      case (LongType, l: Long)       => Some(le(8)(_.putLong(l)))
      case (FloatType, f: Float)     => Some(le(4)(_.putFloat(f)))
      case (DoubleType, d: Double)   => Some(le(8)(_.putDouble(d)))
      case (StringType, s: String)   =>
        val MaxChars = 16
        if (s.codePointCount(0, s.length) <= MaxChars)
          Some(s.getBytes(StandardCharsets.UTF_8))
        else {
          val cut = s.offsetByCodePoints(0, MaxChars)
          val prefix = s.substring(0, cut)
          if (lower) Some(prefix.getBytes(StandardCharsets.UTF_8))
          else {
            // round the truncated prefix UP: bump the last code point that
            // can be bumped, dropping everything after it
            // +1 must skip U+D800..U+DFFF: an unpaired surrogate is not a
            // Unicode scalar, and String.getBytes(UTF_8) encodes it as
            // '?' (0x3F) — an upper bound BELOW the real data, so engines
            // would prune files that hold matching rows (spec
            // UnicodeUtil.truncateStringMax skips to U+E000)
            def bump(cp: Int): Int = {
              val n = cp + 1
              if (n >= Character.MIN_SURROGATE.toInt &&
                  n <= Character.MAX_SURROGATE.toInt) 0xE000 else n
            }
            val cps = prefix.codePoints().toArray
            val i = cps.lastIndexWhere(_ < Character.MAX_CODE_POINT)
            if (i < 0) None // unboundable — omit rather than lie
            else {
              val bumped = new String(cps.take(i), 0, i) +
                new String(Character.toChars(bump(cps(i))))
              Some(bumped.getBytes(StandardCharsets.UTF_8))
            }
          }
        }
      case (DateType, d: java.sql.Date) =>
        Some(le(4)(_.putInt(d.toLocalDate.toEpochDay.toInt)))
      case (TimestampType, t: java.sql.Timestamp) =>
        Some(le(8)(_.putLong(t.getTime * 1000L + (t.getNanos / 1000) % 1000)))
      case (_: DecimalType, d: java.math.BigDecimal) =>
        Some(d.unscaledValue.toByteArray) // minimal big-endian, per spec
      case _ => None
    }
  }

  private def boundable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | StringType |
         DateType | TimestampType | _: DecimalType => true
    case _ => false
  }

  /** Iceberg type string for a Spark leaf type (spec §"Schemas and Data
    * Types"); nested types handled structurally in schemaField. */
  private def icebergPrimitive(dt: DataType): String = dt match {
    case BooleanType      => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType         => "long"
    case FloatType        => "float"
    case DoubleType       => "double"
    case StringType       => "string"
    case BinaryType       => "binary"
    case DateType         => "date"
    case TimestampType    => "timestamptz" // Spark TIMESTAMP = UTC-adjusted
    case TimestampNTZType => "timestamp"
    case d: DecimalType   => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"lake export: no Iceberg mapping for type $other")
  }

  /** One schema field (or nested type) as Iceberg JSON, minting nested ids
    * from `nextId`. Returns the JSON value for the field's type. */
  private def icebergType(dt: DataType, nextId: () => Int): Any = dt match {
    case s: StructType =>
      Map("type" -> "struct", "fields" -> s.fields.toSeq.map { f =>
        val id = nextId()
        Map("id" -> id, "name" -> f.name, "required" -> !f.nullable,
          "type" -> icebergType(f.dataType, nextId))
      })
    case a: ArrayType =>
      Map("type" -> "list", "element-id" -> nextId(),
        "element" -> icebergType(a.elementType, nextId),
        "element-required" -> !a.containsNull)
    case m: MapType =>
      Map("type" -> "map", "key-id" -> nextId(), "value-id" -> nextId(),
        "key" -> icebergType(m.keyType, nextId),
        "value" -> icebergType(m.valueType, nextId),
        "value-required" -> !m.valueContainsNull)
    case p => icebergPrimitive(p)
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def toJson(v: Any): String = {
    import com.fasterxml.jackson.databind.JsonNode
    def conv(x: Any): Object = x match {
      case m: Map[_, _] =>
        val o = mapper.createObjectNode()
        m.foreach { case (k, v) =>
          o.set[JsonNode](k.toString, mapper.readTree(toJson(v)))
        }
        o
      case s: Seq[_] =>
        val a = mapper.createArrayNode()
        s.foreach(e => a.add(mapper.readTree(toJson(e))))
        a
      case other => other.asInstanceOf[Object]
    }
    mapper.writeValueAsString(conv(v))
  }

  // ---- Avro schemas for the two Iceberg metadata file kinds (spec
  // §"Manifests" / §"Snapshots"): field-id props are what make these the
  // Iceberg schemas rather than arbitrary avro.

  private def boundsMapSchema(keyId: Int, valId: Int, rec: String): String =
    s"""{"type":"array","logicalType":"map","items":{"type":"record","name":"$rec","fields":[
       |{"name":"key","type":"int","field-id":$keyId},
       |{"name":"value","type":"bytes","field-id":$valId}]}}""".stripMargin

  /** manifest_entry with an identity-partition record for `partCols`
    * ((name, icebergType, fieldId) triples; empty for unpartitioned).
    * `withEqualityIds` adds the spec's field 135 for equality-delete
    * manifests. */
  private[sources] def manifestEntrySchema(partCols: Seq[(String, String, Int)],
                                  withEqualityIds: Boolean = false): Schema = {
    val partFields = partCols.map { case (n, t, id) =>
      s"""{"name":"$n","type":["null","$t"],"default":null,"field-id":$id}"""
    }.mkString(",")
    val eqField =
      if (!withEqualityIds) ""
      else """,{"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135}"""
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partFields]}},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104},
         |{"name":"lower_bounds","type":["null",${boundsMapSchema(126, 127, "k126_v127")}],"default":null,"field-id":125},
         |{"name":"upper_bounds","type":["null",${boundsMapSchema(129, 130, "k129_v130")}],"default":null,"field-id":128}
         |$eqField
         |]}}]}""".stripMargin)
  }

  private[sources] val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin)

  /** Iceberg schema JSON with field ids minted 1..N in schema order (files
    * are freshly written → name mapping, not embedded ids, is the read
    * path). Deterministic, so the APPEND pre-check can predict the post-
    * write schema without writing a byte. */
  private def schemaFieldsJson(schema: StructType)
      : (Seq[Map[String, Any]], Map[String, Int], Int) = {
    var idCounter = 0
    def nextId(): Int = { idCounter += 1; idCounter }
    val topIds = schema.fields.toSeq.map { f => (f.name, nextId()) }.toMap
    val fieldsJson = schema.fields.toSeq.map { f =>
      Map("id" -> topIds(f.name), "name" -> f.name, "required" -> !f.nullable,
        "type" -> icebergType(f.dataType, () => nextId()))
    }
    (fieldsJson, topIds, idCounter)
  }

  /** The schema the export tree will declare for `df` written with
    * `partitionBy`: hive layout moves partition columns to the END, and a
    * parquet re-read surfaces every column nullable. */
  private def writtenSchema(df: DataFrame, partitionBy: Seq[String]): StructType =
    org.apache.spark.sql.graft.Bridge.asNullable(StructType(
      df.schema.fields.filterNot(f => partitionBy.contains(f.name)) ++
        partitionBy.map(c => df.schema(c))))

  /** Everything one published snapshot needs: data files + stats pass +
    * avro manifest + manifest list. Shared by the fresh export and APPEND. */
  private final case class SnapshotArtifacts(
      uuid: String, snapshotId: Long, idCounter: Int,
      fieldsJson: Seq[Map[String, Any]], nameMapping: Seq[Map[String, Any]],
      partColTriples: Seq[(String, String, Int)], topIds: Map[String, Int],
      listPath: java.nio.file.Path, metaDir: java.nio.file.Path,
      nFiles: Int, totalRows: Long)

  private def writeSnapshot(spark: SparkSession, df: DataFrame, srcDir: String,
                            dstDir: String, dataDir: String, v: Long,
                            sequenceNumber: Long,
                            partitionBy: Seq[String]): SnapshotArtifacts = {
    // hash write-distribution (guide §6 / Iceberg write.distribution-mode
    // =hash): cluster rows by partition tuple so each value is written by
    // ITS OWN task in parallel — an unrepartitioned partitionBy write from
    // a single-split source wrote every partition's file sequentially in
    // one task (0.65 s of the iceberg_read bench body). One file per
    // partition value either way.
    val src =
      if (partitionBy.nonEmpty) df.repartition(partitionBy.map(col): _*)
      else df
    val w = src.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dataDir)

    // Re-read what was written (hive partitioning moves partition columns
    // to path segments; this read restores them as columns) and take ONE
    // distributed stats pass: per-file row count + bounds per leaf column.
    val written = spark.read.parquet(dataDir)
    val schema = written.schema // export-tree column order (partition cols last)
    val statCols = schema.fields.toSeq.filter(f => boundable(f.dataType))
    val aggs = count(lit(1)).as("__n") +:
      statCols.flatMap(f => Seq(
        min(col(f.name)).as(s"__mn_${f.name}"), max(col(f.name)).as(s"__mx_${f.name}")))
    val partVals = partitionBy.map(c => first(col(c)).as(s"__pv_$c"))
    val perFile = written
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, (aggs.tail ++ partVals): _*)
      .collect() // one row per data FILE — driver-small by construction

    val (fieldsJson, topIds, idCounter) = schemaFieldsJson(schema)
    val nameMapping = schema.fields.toSeq.map(f =>
      Map("field-id" -> topIds(f.name), "names" -> Seq(f.name)))

    val snapshotId = v // deterministic: snapshot id == source lake version
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft-export:$srcDir:$v".getBytes(StandardCharsets.UTF_8)).toString
    val metaDir = Paths.get(dstDir, "metadata")
    Files.createDirectories(metaDir)

    // ---- manifest (one entry per data file)
    val partColTriples = partitionBy.zipWithIndex.map { case (c, i) =>
      val dt = schema(c).dataType
      (c, icebergPrimitive(dt), 1000 + i)
    }
    val entrySchema = manifestEntrySchema(partColTriples)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    val manifestPath = metaDir.resolve(s"$uuid-m0.avro")
    var totalRows = 0L
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    writer.setMeta("schema", toJson(Map("type" -> "struct", "schema-id" -> 0,
      "fields" -> fieldsJson)))
    writer.setMeta("partition-spec", toJson(partColTriples.map { case (c, _, id) =>
      Map("name" -> c, "transform" -> "identity",
        "source-id" -> topIds(c), "field-id" -> id)
    }))
    writer.setMeta("partition-spec-id", "0")
    writer.setMeta("format-version", "2")
    writer.setMeta("content", "data")
    writer.create(entrySchema, manifestPath.toFile)
    try perFile.foreach { row =>
      val filePath = row.getAs[String]("__file")
      val n = row.getAs[Long]("__n")
      totalRows += n
      val localPath = filePath.stripPrefix("file:")
      val sizeBytes = try Files.size(Paths.get(localPath)) catch { case _: Throwable => 0L }
      def boundsArray(lower: Boolean): java.util.List[GenericRecord] = {
        val mapItem = entrySchema.getField("data_file").schema()
          .getField(if (lower) "lower_bounds" else "upper_bounds")
          .schema().getTypes.get(1).getElementType
        statCols.flatMap { f =>
          val raw = row.getAs[Any](s"__${if (lower) "mn" else "mx"}_${f.name}")
          boundBytes(f.dataType, raw, lower).map { bytes =>
            val r = new GenericData.Record(mapItem)
            r.put("key", topIds(f.name))
            r.put("value", ByteBuffer.wrap(bytes))
            r: GenericRecord
          }
        }.asJava
      }
      val part = new GenericData.Record(partSchema)
      partitionBy.foreach { c =>
        val raw = row.getAs[Any](s"__pv_$c")
        part.put(c, raw match {
          case s: String => s
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          case other => other
        })
      }
      val dataFile = new GenericData.Record(dataFileSchema)
      dataFile.put("content", 0)
      dataFile.put("file_path", localPath)
      dataFile.put("file_format", "PARQUET")
      dataFile.put("partition", part)
      dataFile.put("record_count", n)
      dataFile.put("file_size_in_bytes", sizeBytes)
      dataFile.put("lower_bounds", boundsArray(lower = true))
      dataFile.put("upper_bounds", boundsArray(lower = false))
      val entry = new GenericData.Record(entrySchema)
      entry.put("status", 1) // ADDED
      entry.put("snapshot_id", snapshotId)
      entry.put("sequence_number", sequenceNumber)
      entry.put("file_sequence_number", sequenceNumber)
      entry.put("data_file", dataFile)
      writer.append(entry)
    } finally writer.close()

    // ---- manifest list (one manifest: the snapshot's complete file set)
    val listPath = metaDir.resolve(s"snap-$snapshotId-$sequenceNumber-$uuid.avro")
    val listWriter = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestFileSchema))
    listWriter.setMeta("format-version", "2")
    listWriter.create(manifestFileSchema, listPath.toFile)
    try {
      val mf = new GenericData.Record(manifestFileSchema)
      mf.put("manifest_path", manifestPath.toString)
      mf.put("manifest_length", Files.size(manifestPath))
      mf.put("partition_spec_id", 0)
      mf.put("content", 0)
      mf.put("sequence_number", sequenceNumber)
      mf.put("min_sequence_number", sequenceNumber)
      mf.put("added_snapshot_id", snapshotId)
      mf.put("added_files_count", perFile.length)
      mf.put("existing_files_count", 0)
      mf.put("deleted_files_count", 0)
      mf.put("added_rows_count", totalRows)
      mf.put("existing_rows_count", 0L)
      mf.put("deleted_rows_count", 0L)
      listWriter.append(mf)
    } finally listWriter.close()

    SnapshotArtifacts(uuid, snapshotId, idCounter, fieldsJson, nameMapping,
      partColTriples, topIds, listPath, metaDir, perFile.length, totalRows)
  }

  /** Export `srcDir`'s snapshot (at `version`, default latest) to `dstDir`.
    * `partitionBy` hive-partitions the plain-parquet layout and becomes the
    * Iceberg identity partition spec. */
  def exportTo(spark: SparkSession, srcDir: String, dstDir: String,
               version: Option[Long] = None,
               partitionBy: Seq[String] = Nil): ExportResult = {
    val t = SnapshotTable.forPath(spark, srcDir)
    val v = version.getOrElse(t.latestVersion)
    val df = t.read(version)
    val dataDir = s"$dstDir/data"
    require(!Files.exists(Paths.get(dstDir)) ||
        Files.list(Paths.get(dstDir)).iterator.asScala.isEmpty,
      s"EXPORT LAKE target '$dstDir' is not empty (EXPORT ... APPEND publishes a new snapshot)")

    val art = writeSnapshot(spark, df, srcDir, dstDir, dataDir, v,
      sequenceNumber = 1L, partitionBy)
    import art._

    // ---- table metadata
    val nowMs = System.currentTimeMillis()
    val metadata = Map(
      "format-version" -> 2,
      "table-uuid" -> uuid,
      "location" -> dstDir,
      "last-sequence-number" -> 1,
      "last-updated-ms" -> nowMs,
      "last-column-id" -> idCounter,
      "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0, "fields" -> fieldsJson)),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0,
        "fields" -> partColTriples.map { case (c, _, id) =>
          Map("name" -> c, "transform" -> "identity",
            "source-id" -> topIds(c), "field-id" -> id)
        })),
      "last-partition-id" -> (999 + partColTriples.size),
      "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Seq.empty[Any])),
      "properties" -> Map(
        "schema.name-mapping.default" -> toJson(nameMapping),
        "write.format.default" -> "parquet"),
      "current-snapshot-id" -> snapshotId,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> snapshotId, "sequence-number" -> 1,
        "timestamp-ms" -> nowMs, "manifest-list" -> listPath.toString,
        "summary" -> Map("operation" -> "append",
          "added-data-files" -> nFiles.toString,
          "added-records" -> totalRows.toString),
        "schema-id" -> 0)),
      "snapshot-log" -> Seq(Map("timestamp-ms" -> nowMs, "snapshot-id" -> snapshotId)),
      "metadata-log" -> Seq.empty[Any])
    val metadataJson = toJson(metadata)
    Files.write(metaDir.resolve("v1.metadata.json"),
      metadataJson.getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))

    Files.write(Paths.get(dstDir, "_graft_export.json"),
      toJson(Map("source" -> srcDir, "version" -> v,
        "exported_ms" -> nowMs, "schema_ddl" -> df.schema.toDDL,
        "partition_by" -> partitionBy,
        "n_files" -> nFiles, "n_rows" -> totalRows))
        .getBytes(StandardCharsets.UTF_8))

    ExportResult(v, nFiles.toLong, totalRows, metadataJson)
  }

  /** Publish another lake version into an EXISTING exported tree as a new
    * Iceberg snapshot (the incremental-publish leg of the interop bridge —
    * what the reference's periodic Iceberg materializations do). The new
    * snapshot's manifest list carries its COMPLETE file set (operation
    * `overwrite`), data files land under `data_v<version>/` so earlier
    * snapshots' files stay untouched, and the metadata file rolls
    * v<N>.metadata.json → v<N+1> with the snapshot appended to
    * `snapshots` + `snapshot-log` — so `iceberg_scan('<dir>', <snap>)`
    * and timestamp travel work across every published version. */
  def appendTo(spark: SparkSession, srcDir: String, dstDir: String,
               version: Option[Long] = None,
               partitionBy: Seq[String] = Nil): ExportResult = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val t = SnapshotTable.forPath(spark, srcDir)
    val v = version.getOrElse(t.latestVersion)
    val df = t.read(version)
    val metaDir = Paths.get(dstDir, "metadata")
    require(Files.isDirectory(metaDir),
      s"EXPORT LAKE ... APPEND: '$dstDir' is not an exported Iceberg tree")
    val hint = new String(Files.readAllBytes(metaDir.resolve("version-hint.text")),
      StandardCharsets.UTF_8).trim.toInt
    val root = mapper.readTree(
      Files.readAllBytes(metaDir.resolve(s"v$hint.metadata.json"))).asInstanceOf[ObjectNode]
    // schema + partition spec must match what the tree already declares —
    // Iceberg schema evolution is out of scope for the bridge, and a
    // silent mismatch would corrupt every reader. Checked BEFORE any file
    // writes (predicted from df's schema), so a refused APPEND leaves the
    // tree untouched.
    val (expFields, expIds, _) = schemaFieldsJson(writtenSchema(df, partitionBy))
    val curSchemaId = Option(root.get("current-schema-id")).map(_.asInt()).getOrElse(0)
    val curFields = root.get("schemas").elements.asScala
      .find(s => s.get("schema-id").asInt() == curSchemaId)
      .getOrElse(root.get("schemas").elements.asScala.toSeq.head).get("fields")
    require(curFields == mapper.readTree(toJson(expFields)),
      "EXPORT LAKE ... APPEND: schema differs from the exported table's schema")
    val curSpec = root.get("partition-specs").elements.asScala.toSeq.head.get("fields")
    val newSpec = mapper.readTree(toJson(partitionBy.zipWithIndex.map { case (c, i) =>
      Map("name" -> c, "transform" -> "identity",
        "source-id" -> expIds(c), "field-id" -> (1000 + i))
    }))
    require(curSpec == newSpec,
      "EXPORT LAKE ... APPEND: PARTITION BY differs from the exported table's spec")
    require(!root.get("snapshots").elements.asScala
        .exists(_.get("snapshot-id").asLong() == v),
      s"EXPORT LAKE ... APPEND: snapshot $v is already published in '$dstDir'")
    val lastSeq = root.get("last-sequence-number").asLong()

    val dataDir = s"$dstDir/data_v$v"
    val art = writeSnapshot(spark, df, srcDir, dstDir, dataDir, v,
      sequenceNumber = lastSeq + 1, partitionBy)

    val nowMs = System.currentTimeMillis()
    root.put("last-sequence-number", lastSeq + 1)
    root.put("last-updated-ms", nowMs)
    root.put("current-snapshot-id", v)
    val snap = mapper.createObjectNode()
    snap.put("snapshot-id", v)
    snap.put("sequence-number", lastSeq + 1)
    snap.put("timestamp-ms", nowMs)
    snap.put("manifest-list", art.listPath.toString)
    snap.putObject("summary")
      .put("operation", "overwrite")
      .put("added-data-files", art.nFiles.toString)
      .put("added-records", art.totalRows.toString)
    snap.put("schema-id", curSchemaId)
    root.get("snapshots").asInstanceOf[ArrayNode].add(snap)
    root.get("snapshot-log").asInstanceOf[ArrayNode].add(
      mapper.createObjectNode().put("timestamp-ms", nowMs).put("snapshot-id", v))
    root.get("metadata-log").asInstanceOf[ArrayNode].add(
      mapper.createObjectNode().put("timestamp-ms", nowMs)
        .put("metadata-file", metaDir.resolve(s"v$hint.metadata.json").toString))

    val newJson = mapper.writeValueAsString(root)
    // CREATE_NEW = the Iceberg commit rule (exactly one writer claims
    // v<N+1>.metadata.json): a racing APPEND that read the same base
    // version fails here instead of silently clobbering the other commit
    Files.write(metaDir.resolve(s"v${hint + 1}.metadata.json"),
      newJson.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    Files.write(metaDir.resolve("version-hint.text"),
      (hint + 1).toString.getBytes(StandardCharsets.UTF_8))
    ExportResult(v, art.nFiles.toLong, art.totalRows, newJson)
  }

  /** Publish POSITION DELETES against an exported tree's current snapshot
    * (Iceberg v2 merge-on-read — spec §"Position Delete Files",
    * §"Delete Manifests"): writes ONE delete parquet of sorted
    * `(file_path, pos)` rows, a delete manifest (list entry content=1,
    * data_file content=1), and a new snapshot whose manifest list is the
    * current snapshot's manifests PLUS the delete manifest — data files
    * untouched, so earlier snapshots time-travel cleanly past the delete.
    * `deletes` maps data-file paths (exactly as the tree's manifests
    * record them) to 0-based row positions. The metadata commit follows
    * the same CREATE_NEW single-winner rule as APPEND. Returns the new
    * snapshot id. */
  def publishPositionDeletes(spark: SparkSession, dstDir: String,
                             deletes: Map[String, Seq[Long]]): Long = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    require(deletes.nonEmpty && deletes.values.forall(_.nonEmpty),
      "publishPositionDeletes: empty delete set")
    val metaDir = Paths.get(dstDir, "metadata")
    require(Files.isDirectory(metaDir),
      s"'$dstDir' is not an exported Iceberg tree")
    val hint = new String(Files.readAllBytes(metaDir.resolve("version-hint.text")),
      StandardCharsets.UTF_8).trim.toInt
    val root = mapper.readTree(
      Files.readAllBytes(metaDir.resolve(s"v$hint.metadata.json"))).asInstanceOf[ObjectNode]
    val curSnapId = root.get("current-snapshot-id").asLong()
    val lastSeq = root.get("last-sequence-number").asLong()
    val newSeq = lastSeq + 1
    val newSnapId = root.get("snapshots").elements.asScala
      .map(_.get("snapshot-id").asLong()).max + 1
    val curList = root.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong() == curSnapId)
      .getOrElse(throw new IllegalStateException("current snapshot missing"))
      .get("manifest-list").asText()

    // ---- delete parquet: (file_path, pos) sorted, one file
    import spark.implicits._
    val rows = deletes.toSeq.flatMap { case (f, ps) => ps.map(p => (f, p)) }.sorted
    val delDataDir = Paths.get(dstDir, s"data_del_$newSeq")
    rows.toDF("file_path", "pos").coalesce(1)
      .sortWithinPartitions("file_path", "pos")
      .write.parquet(delDataDir.toString)
    val s0 = Files.list(delDataDir)
    val delFile =
      try s0.iterator.asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
      finally s0.close()

    writeDeleteArtifacts(metaDir, delFile, rows.size.toLong, fileContent = 1,
      equalityIds = Nil, newSnapId, newSeq, curList, root, hint,
      opName = "delete", posDeleteCount = rows.size.toLong)
    newSnapId
  }

  /** Publish EQUALITY DELETES against an exported tree's current snapshot
    * (spec §"Equality Delete Files"): the rows of `values` (exactly the
    * named `cols`) are deleted wherever a data row matches on all columns
    * (null matches null) AND the data file's sequence number is strictly
    * below this delete's — so data published AFTER the delete survives
    * it, the spec's ordering rule. Returns the new snapshot id. */
  /** `scope`: optional identity-partition tuple (column → value) the
    * delete is scoped to — written as the delete manifest's partition
    * record + spec, so spec-compliant readers (ours included) apply the
    * delete only inside that partition (the Flink CDC write shape). */
  def publishEqualityDeletes(spark: SparkSession, dstDir: String,
                             cols: Seq[String], values: DataFrame,
                             scope: Seq[(String, Any)] = Nil): Long = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    require(cols.nonEmpty, "publishEqualityDeletes: no equality columns")
    val metaDir = Paths.get(dstDir, "metadata")
    require(Files.isDirectory(metaDir), s"'$dstDir' is not an exported Iceberg tree")
    val hint = new String(Files.readAllBytes(metaDir.resolve("version-hint.text")),
      StandardCharsets.UTF_8).trim.toInt
    val root = mapper.readTree(
      Files.readAllBytes(metaDir.resolve(s"v$hint.metadata.json"))).asInstanceOf[ObjectNode]
    val curSnapId = root.get("current-snapshot-id").asLong()
    val lastSeq = root.get("last-sequence-number").asLong()
    val newSeq = lastSeq + 1
    val newSnapId = root.get("snapshots").elements.asScala
      .map(_.get("snapshot-id").asLong()).max + 1
    val curList = root.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong() == curSnapId).get
      .get("manifest-list").asText()
    // field ids from the tree's declared schema
    val schemaNode = root.get("schemas").elements.asScala.toSeq.head
    val idOf = schemaNode.get("fields").elements.asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    val ids = cols.map(c => idOf.getOrElse(c,
      throw new IllegalArgumentException(s"equality column '$c' not in exported schema")))

    val delDataDir = Paths.get(dstDir, s"data_del_$newSeq")
    val n = values.count()
    require(n > 0, "publishEqualityDeletes: empty delete set")
    values.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .coalesce(1).write.parquet(delDataDir.toString)
    val s0 = Files.list(delDataDir)
    val delFile =
      try s0.iterator.asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
      finally s0.close()

    val schemaFields = schemaNode.get("fields").elements.asScala.toSeq
    val typeOf = schemaFields.map(f =>
      f.get("name").asText() -> f.get("type").asText()).toMap
    val scopeTriples = scope.map { case (c, v) =>
      (c, typeOf.getOrElse(c, throw new IllegalArgumentException(
        s"scope column '$c' not in exported schema")),
        idOf(c), v)
    }
    writeDeleteArtifacts(metaDir, delFile, n, fileContent = 2,
      equalityIds = ids, newSnapId, newSeq, curList, root, hint,
      opName = "delete", posDeleteCount = 0L, scope = scopeTriples)
    newSnapId
  }

  /** Shared delete-snapshot publication: delete manifest + new manifest
    * list (current manifests carried + the delete one) + metadata roll. */
  private def writeDeleteArtifacts(metaDir: java.nio.file.Path, delFile: String,
      nRows: Long, fileContent: Int, equalityIds: Seq[Int], newSnapId: Long,
      newSeq: Long, curList: String,
      root: com.fasterxml.jackson.databind.node.ObjectNode, hint: Int,
      opName: String, posDeleteCount: Long,
      // (column, iceberg type, source field id, value) — identity scope
      scope: Seq[(String, String, Int, Any)] = Nil): Unit = {
    import com.fasterxml.jackson.databind.node.ArrayNode
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft-del:$metaDir:$newSeq".getBytes(StandardCharsets.UTF_8)).toString
    val scopeTriples = scope.zipWithIndex.map { case ((c, t, _, _), i) =>
      (c, t, 1000 + i) }
    val entrySchema = manifestEntrySchema(scopeTriples,
      withEqualityIds = equalityIds.nonEmpty)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val manifestPath = metaDir.resolve(s"$uuid-del-m0.avro")
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    writer.setMeta("format-version", "2")
    writer.setMeta("content", "deletes")
    if (scope.nonEmpty)
      writer.setMeta("partition-spec", toJson(scope.zipWithIndex.map {
        case ((c, _, srcId, _), i) =>
          Map("name" -> c, "transform" -> "identity",
            "source-id" -> srcId, "field-id" -> (1000 + i))
      }))
    writer.setMeta("partition-spec-id", "0")
    writer.create(entrySchema, manifestPath.toFile)
    try {
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", fileContent) // 1=POSITION_DELETES, 2=EQUALITY_DELETES
      df.put("file_path", delFile)
      df.put("file_format", "PARQUET")
      val partRec = new GenericData.Record(
        dataFileSchema.getField("partition").schema())
      scope.foreach { case (c, _, _, v) => partRec.put(c, v) }
      df.put("partition", partRec)
      df.put("record_count", nRows)
      df.put("file_size_in_bytes", Files.size(Paths.get(delFile)))
      if (equalityIds.nonEmpty)
        df.put("equality_ids", equalityIds.map(Int.box).asJava)
      val entry = new GenericData.Record(entrySchema)
      entry.put("status", 1)
      entry.put("snapshot_id", newSnapId)
      entry.put("sequence_number", newSeq)
      entry.put("file_sequence_number", newSeq)
      entry.put("data_file", df)
      writer.append(entry)
    } finally writer.close()

    // ---- new manifest list: current snapshot's manifests + the delete one
    val listPath = metaDir.resolve(s"snap-$newSnapId-$newSeq-$uuid.avro")
    val listWriter = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestFileSchema))
    listWriter.setMeta("format-version", "2")
    listWriter.create(manifestFileSchema, listPath.toFile)
    try {
      val prior = new DataFileReader[GenericRecord](
        new java.io.File(curList), new GenericDatumReader[GenericRecord]())
      try prior.iterator.asScala.foreach { m =>
        val copy = new GenericData.Record(manifestFileSchema)
        manifestFileSchema.getFields.asScala.foreach(f =>
          copy.put(f.name(), m.get(f.name())))
        listWriter.append(copy)
      } finally prior.close()
      val mf = new GenericData.Record(manifestFileSchema)
      mf.put("manifest_path", manifestPath.toString)
      mf.put("manifest_length", Files.size(manifestPath))
      mf.put("partition_spec_id", 0)
      mf.put("content", 1) // DELETES manifest
      mf.put("sequence_number", newSeq)
      mf.put("min_sequence_number", newSeq)
      mf.put("added_snapshot_id", newSnapId)
      mf.put("added_files_count", 1)
      mf.put("existing_files_count", 0)
      mf.put("deleted_files_count", 0)
      mf.put("added_rows_count", nRows)
      mf.put("existing_rows_count", 0L)
      mf.put("deleted_rows_count", 0L)
      listWriter.append(mf)
    } finally listWriter.close()

    // ---- metadata roll (same commit rule as APPEND)
    val nowMs = System.currentTimeMillis()
    root.put("last-sequence-number", newSeq)
    root.put("last-updated-ms", nowMs)
    root.put("current-snapshot-id", newSnapId)
    val snap = mapper.createObjectNode()
    snap.put("snapshot-id", newSnapId)
    snap.put("sequence-number", newSeq)
    snap.put("timestamp-ms", nowMs)
    snap.put("manifest-list", listPath.toString)
    val summary = snap.putObject("summary")
    summary.put("operation", opName).put("added-delete-files", "1")
    if (fileContent == 1) summary.put("added-position-deletes", posDeleteCount.toString)
    else summary.put("added-equality-deletes", nRows.toString)
    snap.put("schema-id",
      Option(root.get("current-schema-id")).map(_.asInt()).getOrElse(0))
    root.get("snapshots").asInstanceOf[ArrayNode].add(snap)
    root.get("snapshot-log").asInstanceOf[ArrayNode].add(
      mapper.createObjectNode().put("timestamp-ms", nowMs).put("snapshot-id", newSnapId))
    Files.write(metaDir.resolve(s"v${hint + 1}.metadata.json"),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    Files.write(metaDir.resolve("version-hint.text"),
      (hint + 1).toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Parse back an exported tree's manifests (spec evidence + tooling):
    * (file path, record count, lower bounds, upper bounds) per data file,
    * bounds keyed by field id. */
  def readManifests(dstDir: String): Seq[(String, Long, Map[Int, Array[Byte]], Map[Int, Array[Byte]])] = {
    val metaDir = Paths.get(dstDir, "metadata")
    val hint = new String(Files.readAllBytes(metaDir.resolve("version-hint.text")),
      StandardCharsets.UTF_8).trim.toInt
    val metaJson = mapper.readTree(Files.readAllBytes(metaDir.resolve(s"v$hint.metadata.json")))
    val current = metaJson.get("current-snapshot-id").asLong()
    val listPath = metaJson.get("snapshots").elements.asScala
      .find(_.get("snapshot-id").asLong() == current).get
      .get("manifest-list").asText()
    val listReader = new DataFileReader[GenericRecord](
      new java.io.File(listPath), new GenericDatumReader[GenericRecord]())
    val manifestPaths =
      try listReader.iterator.asScala.map(_.get("manifest_path").toString).toVector
      finally listReader.close()
    manifestPaths.flatMap { mp =>
      val r = new DataFileReader[GenericRecord](
        new java.io.File(mp), new GenericDatumReader[GenericRecord]())
      try r.iterator.asScala.map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        def bounds(field: String): Map[Int, Array[Byte]] =
          Option(df.get(field)) match {
            case Some(arr: java.util.Collection[_]) =>
              arr.asScala.map { kv =>
                val rec = kv.asInstanceOf[GenericRecord]
                val buf = rec.get("value").asInstanceOf[ByteBuffer]
                val bytes = new Array[Byte](buf.remaining()); buf.duplicate().get(bytes)
                rec.get("key").asInstanceOf[Int] -> bytes
              }.toMap
            case _ => Map.empty[Int, Array[Byte]]
          }
        (df.get("file_path").toString,
          df.get("record_count").asInstanceOf[Long],
          bounds("lower_bounds"), bounds("upper_bounds"))
      }.toVector
      finally r.close()
    }
  }
}
