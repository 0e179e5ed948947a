package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read an Iceberg v1/v2 table from its PUBLIC metadata tree — no Iceberg
  * runtime jars needed (reference reads Iceberg natively through its own
  * metadata reader the same way: `exec/store/iceberg/model/IcebergBaseModel.java`,
  * scan planning `exec/store/iceberg/IcebergScanPrel.java:96`). This closes
  * the interop loop that `LakeExport` opens: tables written by OTHER engines
  * (or by EXPORT LAKE) are queryable by path.
  *
  * What is parsed, per the Iceberg spec:
  *  - `metadata/version-hint.text` → `v<N>.metadata.json` (file-system
  *    tables); falls back to the highest `*.metadata.json` present.
  *  - table metadata: current schema (id-addressed), identity partition
  *    spec, snapshots + snapshot-log (time travel by snapshot id OR
  *    timestamp).
  *  - manifest list (avro) → data manifests → `manifest_entry` rows:
  *    live files (status != DELETED), record counts, identity partition
  *    values, and per-field lower/upper bounds (single-value binary
  *    serialization) for scan pruning.
  *
  * Scan shape: ONE `spark.read.parquet` over the live file list (grouped by
  * identity-partition value when the files physically omit the source
  * column — the hive-migrated layout `schema.name-mapping.default` exists
  * for). File pruning happens BEFORE the scan from manifest bounds, so a
  * bounded predicate never touches non-overlapping files — at 100 TB the
  * manifests (KBs per thousands of files) are the only metadata read, the
  * same plan-time I/O profile as the native readers.
  *
  * Unsupported (loud errors, not wrong answers): merge-on-read delete
  * files (manifest content=DELETES) — the COW subset every engine writes
  * by default round-trips.
  */
object IcebergRead {

  final case class Snapshot(id: Long, timestampMs: Long, manifestList: String)
  /** One field of the table's default partition spec: partition-record
    * field name, transform string (`identity`, `bucket[16]`,
    * `truncate[4]`, `year|month|day|hour`, `void`), and the source
    * column's name in the current schema. */
  final case class SpecField(name: String, transform: String, srcCol: Option[String])
  final case class TableMeta(location: String,
                             schema: StructType,
                             fieldIdOf: Map[String, Int],
                             identityPartitionCols: Seq[String],
                             snapshots: Seq[Snapshot],
                             snapshotLog: Seq[(Long, Long)], // (timestampMs, snapshotId)
                             currentSnapshotId: Option[Long],
                             properties: Map[String, String],
                             refs: Map[String, Long] = Map.empty, // branch/tag → snapshot
                             specFields: Seq[SpecField] = Nil)
  final case class DataFile(path: String,
                            recordCount: Long,
                            partition: Map[String, Any],
                            lower: Map[Int, Array[Byte]],
                            upper: Map[Int, Array[Byte]],
                            // data sequence number (entry's, inherited from
                            // the manifest when absent) — what equality
                            // deletes compare against
                            seq: Long = 0L)
  /** `scope`: the delete file's partition tuple as (source column →
    * avro value) pairs — a partition-scoped equality delete (spec
    * §"Scan Planning": "applied to data files in the same partition")
    * must only subtract rows IN that partition; empty = unpartitioned
    * spec = table-global. */
  final case class EqualityDelete(path: String, seq: Long, fieldIds: Seq[Int],
                                  scope: Seq[(String, Any)] = Nil)

  private val mapper = new ObjectMapper()

  // ---- metadata location ----------------------------------------------

  /** Resolve the current metadata JSON of a file-system table directory
    * (`<dir>/metadata/v<N>.metadata.json` + `version-hint.text`, the
    * HadoopTables layout every engine writes for path-based tables). */
  private def metadataFile(dir: String): java.nio.file.Path = {
    val metaDir = Paths.get(dir, "metadata")
    require(Files.isDirectory(metaDir), s"not an Iceberg table (no metadata/): $dir")
    val hint = metaDir.resolve("version-hint.text")
    val hinted =
      if (Files.exists(hint))
        Some(metaDir.resolve(s"v${new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim}.metadata.json"))
          .filter(Files.exists(_))
      else None
    hinted.getOrElse {
      val cands = Files.list(metaDir).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".metadata.json")).toVector
      require(cands.nonEmpty, s"no *.metadata.json under $metaDir")
      // v12 > v9: numeric-aware ordering on the leading v<N> when present,
      // lexicographic otherwise (UUID-named metadata from catalogs)
      cands.maxBy { p =>
        val n = p.getFileName.toString
        "^v(\\d+)\\.".r.findFirstMatchIn(n).map(_.group(1).toLong).getOrElse(-1L) -> n
      }
    }
  }

  // ---- schema ----------------------------------------------------------

  /** Iceberg JSON type → Spark DataType (inverse of LakeExport.icebergType;
    * spec §"Schemas and Data Types"). */
  private[sources] def sparkType(t: JsonNode): DataType =
    if (t.isTextual) {
      val s = t.asText()
      val dec = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      s match {
        case "boolean"      => BooleanType
        case "int"          => IntegerType
        case "long"         => LongType
        case "float"        => FloatType
        case "double"       => DoubleType
        case "string"       => StringType
        case "binary"       => BinaryType
        case "date"         => DateType
        case "timestamptz"  => TimestampType
        case "timestamp"    => TimestampNTZType
        case "uuid"         => StringType
        case dec(p, sc)     => DecimalType(p.toInt, sc.toInt)
        case other if other.startsWith("fixed") => BinaryType
        case other => throw new IllegalArgumentException(
          s"iceberg read: unsupported type '$other'")
      }
    } else t.get("type").asText() match {
      case "struct" =>
        StructType(t.get("fields").elements.asScala.map { f =>
          StructField(f.get("name").asText(), sparkType(f.get("type")),
            nullable = !f.get("required").asBoolean(false))
        }.toSeq)
      case "list" =>
        ArrayType(sparkType(t.get("element")),
          containsNull = !t.get("element-required").asBoolean(false))
      case "map" =>
        MapType(sparkType(t.get("key")), sparkType(t.get("value")),
          valueContainsNull = !t.get("value-required").asBoolean(false))
      case other => throw new IllegalArgumentException(
        s"iceberg read: unsupported nested type '$other'")
    }

  def loadMetadata(dir: String): TableMeta = {
    val root = mapper.readTree(Files.readAllBytes(metadataFile(dir)))
    val schemaJson: JsonNode = Option(root.get("schemas")) match {
      case Some(schemas) =>
        val cur = Option(root.get("current-schema-id")).map(_.asInt()).getOrElse(0)
        schemas.elements.asScala
          .find(s => Option(s.get("schema-id")).forall(_.asInt() == cur))
          .getOrElse(schemas.elements.asScala.toSeq.head)
      case None => root.get("schema") // format v1 single-schema form
    }
    val fields = schemaJson.get("fields").elements.asScala.toVector
    val schema = StructType(fields.map { f =>
      StructField(f.get("name").asText(), sparkType(f.get("type")),
        nullable = !f.get("required").asBoolean(false))
    })
    val fieldIdOf = fields.map(f => f.get("name").asText() -> f.get("id").asInt()).toMap

    val specJson: Option[JsonNode] = Option(root.get("partition-specs")).map { specs =>
      val cur = Option(root.get("default-spec-id")).map(_.asInt()).getOrElse(0)
      specs.elements.asScala
        .find(s => Option(s.get("spec-id")).forall(_.asInt() == cur))
        .getOrElse(specs.elements.asScala.toSeq.head)
    }.orElse(Option(root.get("partition-spec")).map { flds => // v1 flat form
      val o = mapper.createObjectNode(); o.set[JsonNode]("fields", flds); o
    })
    val idToName = fieldIdOf.map(_.swap)
    val specFields = specJson.toSeq.flatMap(_.get("fields").elements.asScala)
      .map(f => SpecField(f.get("name").asText(), f.get("transform").asText(),
        idToName.get(f.get("source-id").asInt())))
    val identityCols = specFields.filter(_.transform == "identity").flatMap(_.srcCol)

    val snapshots = Option(root.get("snapshots")).toSeq
      .flatMap(_.elements.asScala).map { s =>
        Snapshot(s.get("snapshot-id").asLong(), s.get("timestamp-ms").asLong(),
          Option(s.get("manifest-list")).map(_.asText()).getOrElse(
            throw new IllegalArgumentException(
              "iceberg read: v1 inline-manifests snapshots unsupported (no manifest-list)")))
      }.toVector
    val snapLog = Option(root.get("snapshot-log")).toSeq
      .flatMap(_.elements.asScala)
      .map(e => (e.get("timestamp-ms").asLong(), e.get("snapshot-id").asLong())).toVector
    val props = Option(root.get("properties")).map(p =>
      p.properties.asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)
    // spec §"Refs": named branches/tags → snapshot ids (catalog-written
    // trees carry these; our exports don't — map stays empty)
    val refs = Option(root.get("refs")).map(r =>
      r.properties.asScala.map(e =>
        e.getKey -> e.getValue.get("snapshot-id").asLong()).toMap)
      .getOrElse(Map.empty)
    TableMeta(dir, schema, fieldIdOf, identityCols, snapshots, snapLog,
      Option(root.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L),
      props, refs, specFields)
  }

  // ---- manifests -------------------------------------------------------

  /** Pick the snapshot: explicit id, else last snapshot-log entry at or
    * before `asOfMs`, else the current snapshot. */
  private def pickSnapshot(meta: TableMeta, snapshotId: Option[Long],
                           asOfMs: Option[Long]): Snapshot = {
    val id = (snapshotId, asOfMs) match {
      case (Some(s), _) => s
      case (None, Some(ts)) =>
        val log = if (meta.snapshotLog.nonEmpty) meta.snapshotLog
                  else meta.snapshots.map(s => (s.timestampMs, s.id))
        log.filter(_._1 <= ts).lastOption.map(_._2).getOrElse(
          throw new IllegalArgumentException(
            s"iceberg read: no snapshot at or before $ts"))
      case (None, None) => meta.currentSnapshotId.getOrElse(
        throw new IllegalArgumentException("iceberg read: table has no current snapshot"))
    }
    meta.snapshots.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"iceberg read: unknown snapshot id $id"))
  }

  /** Paths in metadata may be absolute or table-location-relative. */
  private def resolvePath(dir: String, p: String): String = {
    val clean = p.stripPrefix("file:")
    if (Paths.get(clean).isAbsolute) clean else s"$dir/$clean"
  }

  /** One row per manifest-list entry of a snapshot (the reference's
    * `table_manifests(..)` metadata function,
    * `MetadataFunctionsMacro.java:37`): path, length, content kind
    * (0=data, 1=deletes), sequence number, and the added/existing/deleted
    * file counts the list carries. Metadata-only — no manifest bodies
    * are opened. */
  final case class ManifestInfo(path: String, length: Long, content: Int,
                                sequenceNumber: Long, addedFiles: Int,
                                existingFiles: Int, deletedFiles: Int,
                                addedRows: Long)
  def manifests(meta: TableMeta, snapshotId: Option[Long] = None): Seq[ManifestInfo] = {
    val snap = pickSnapshot(meta, snapshotId, None)
    val r = new DataFileReader[GenericRecord](
      new java.io.File(resolvePath(meta.location, snap.manifestList)),
      new GenericDatumReader[GenericRecord]())
    def int(rec: GenericRecord, f: String): Int =
      Option(rec.get(f)).map(_.asInstanceOf[Number].intValue()).getOrElse(0)
    def long(rec: GenericRecord, f: String): Long =
      Option(rec.get(f)).map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
    try r.iterator.asScala.map { m =>
      ManifestInfo(m.get("manifest_path").toString,
        long(m, "manifest_length"), int(m, "content"),
        long(m, "sequence_number"),
        int(m, "added_files_count"), int(m, "existing_files_count"),
        int(m, "deleted_files_count"), long(m, "added_rows_count"))
    }.toVector
    finally r.close()
  }

  /** Live data files of a snapshot straight from the avro manifests. */
  def dataFiles(meta: TableMeta, snapshotId: Option[Long] = None,
                asOfMs: Option[Long] = None): Seq[DataFile] = {
    val snap = pickSnapshot(meta, snapshotId, asOfMs)
    val listReader = new DataFileReader[GenericRecord](
      new java.io.File(resolvePath(meta.location, snap.manifestList)),
      new GenericDatumReader[GenericRecord]())
    val manifests =
      try listReader.iterator.asScala.map { m =>
        val content = Option(m.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
        val seq = Option(m.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(0L)
        (m.get("manifest_path").toString, content, seq)
      }.toVector
      finally listReader.close()

    manifests.filter(_._2 == 0).flatMap { case (mp, _, mSeq) =>
      val r = new DataFileReader[GenericRecord](
        new java.io.File(resolvePath(meta.location, mp)),
        new GenericDatumReader[GenericRecord]())
      try r.iterator.asScala.flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED entry
        else {
          val entrySeq = Option(e.get("sequence_number"))
            .map(_.asInstanceOf[Long]).getOrElse(mSeq) // inherit (spec rule)
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fileContent = Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
          require(fileContent == 0,
            "iceberg read: non-data file in a data manifest")
          val part = Option(df.get("partition")) match {
            case Some(p: GenericRecord) =>
              p.getSchema.getFields.asScala.map { f =>
                f.name() -> (p.get(f.name()) match {
                  case u: org.apache.avro.util.Utf8 => u.toString
                  case other => other
                })
              }.toMap
            case _ => Map.empty[String, Any]
          }
          def bounds(field: String): Map[Int, Array[Byte]] =
            Option(df.get(field)) match {
              case Some(arr: java.util.Collection[_]) => // array-encoded map
                arr.asScala.map { kv =>
                  val rec = kv.asInstanceOf[GenericRecord]
                  val buf = rec.get("value").asInstanceOf[ByteBuffer]
                  val bytes = new Array[Byte](buf.remaining()); buf.duplicate().get(bytes)
                  rec.get("key").asInstanceOf[Int] -> bytes
                }.toMap
              case Some(m: java.util.Map[_, _]) => // true-map encoding
                m.asScala.map { case (k, v) =>
                  val buf = v.asInstanceOf[ByteBuffer]
                  val bytes = new Array[Byte](buf.remaining()); buf.duplicate().get(bytes)
                  k.toString.toInt -> bytes
                }.toMap
              case _ => Map.empty
            }
          Some(DataFile(df.get("file_path").toString,
            df.get("record_count").asInstanceOf[Long],
            part, bounds("lower_bounds"), bounds("upper_bounds"), entrySeq))
        }
      }.toVector
      finally r.close()
    }
  }

  /** Delete files of a snapshot (v2 merge-on-read): POSITION deletes
    * (spec §"Position Delete Files" — parquet of `(file_path, pos)` rows)
    * and EQUALITY deletes (spec §"Equality Delete Files" — parquet rows
    * whose `equality_ids` columns name deleted value tuples, applying to
    * data files with data sequence number STRICTLY LESS than the
    * delete's). Position deletes need no sequence comparison: they
    * reference exact `(file_path, pos)` pairs and data-file paths are
    * never reused; equality deletes carry their sequence for the scan's
    * `data.seq < delete.seq` predicate. */
  def deleteFiles(meta: TableMeta, snapshotId: Option[Long] = None,
                  asOfMs: Option[Long] = None): (Seq[String], Seq[EqualityDelete]) = {
    val snap = pickSnapshot(meta, snapshotId, asOfMs)
    val listReader = new DataFileReader[GenericRecord](
      new java.io.File(resolvePath(meta.location, snap.manifestList)),
      new GenericDatumReader[GenericRecord]())
    val deleteManifests =
      try listReader.iterator.asScala.flatMap { m =>
        val content = Option(m.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
        val seq = Option(m.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(0L)
        if (content == 1) Some((m.get("manifest_path").toString, seq)) else None
      }.toVector
      finally listReader.close()
    val pos = Vector.newBuilder[String]
    val eq = Vector.newBuilder[EqualityDelete]
    val idToName = meta.fieldIdOf.map(_.swap)
    deleteManifests.foreach { case (mp, mSeq) =>
      val r = new DataFileReader[GenericRecord](
        new java.io.File(resolvePath(meta.location, mp)),
        new GenericDatumReader[GenericRecord]())
      // partition-field name → (transform, source column) from the
      // manifest header's own spec (delete manifests may be written under
      // an older spec than the table default)
      val specFields: Map[String, (String, Option[String])] =
        Option(r.getMetaString("partition-spec")).map { js =>
          mapper.readTree(js).elements.asScala.map { f =>
            f.get("name").asText() -> (f.get("transform").asText(),
              idToName.get(f.get("source-id").asInt()))
          }.toMap
        }.getOrElse(Map.empty)
      try r.iterator.asScala.foreach { e =>
        if (e.get("status").asInstanceOf[Int] != 2) {
          val entrySeq = Option(e.get("sequence_number"))
            .map(_.asInstanceOf[Long]).getOrElse(mSeq)
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val c = Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
          c match {
            case 1 => pos += df.get("file_path").toString
            case 2 =>
              val ids =
                if (df.getSchema.getField("equality_ids") == null) Seq.empty
                else Option(df.get("equality_ids")) match {
                  case Some(arr: java.util.Collection[_]) =>
                    arr.asScala.map(_.asInstanceOf[Int]).toSeq
                  case _ => Seq.empty
                }
              require(ids.nonEmpty,
                "iceberg read: equality delete file without equality_ids")
              // partition scope: identity fields become data-side equality
              // predicates; a non-identity-partitioned delete (Flink CDC
              // bucket spec, say) can't be scoped without evaluating the
              // transform — refuse loudly rather than over-delete
              val scope: Seq[(String, Any)] = Option(df.get("partition")) match {
                case Some(p: GenericRecord) =>
                  p.getSchema.getFields.asScala.toSeq.map { f =>
                    val v = p.get(f.name()) match {
                      case u: org.apache.avro.util.Utf8 => u.toString
                      case other => other
                    }
                    val (transform, srcCol) = specFields.getOrElse(f.name(),
                      ("identity", Some(f.name())))
                    if (transform == "identity")
                      srcCol.getOrElse(throw new IllegalArgumentException(
                        s"iceberg read: partition field ${f.name()} has no " +
                          "source column in the current schema")) -> v
                    else if (transform == "void" || v == null) null
                    else throw new IllegalArgumentException(
                      s"iceberg read: partition-scoped equality delete with " +
                        s"non-identity transform '$transform' on field " +
                        s"${f.name()} is not supported — refusing rather " +
                        "than applying the delete table-wide")
                  }.filter(_ != null)
                case _ => Nil
              }
              eq += EqualityDelete(df.get("file_path").toString, entrySeq, ids, scope)
            case other => throw new IllegalArgumentException(
              s"iceberg read: unknown delete file content $other")
          }
        }
      } finally r.close()
    }
    (pos.result(), eq.result())
  }

  /** Back-compat alias: position-delete paths only. */
  def positionDeleteFiles(meta: TableMeta, snapshotId: Option[Long] = None,
                          asOfMs: Option[Long] = None): Seq[String] =
    deleteFiles(meta, snapshotId, asOfMs)._1

  // ---- bounds decode + pruning ----------------------------------------

  /** Iceberg single-value binary → comparable value (inverse of
    * LakeExport.boundBytes). Strings may be TRUNCATED bounds — correct for
    * pruning (lower truncation only loosens), surfaced as-is. */
  private[sources] def decodeBound(dt: DataType, bytes: Array[Byte]): Any = {
    def le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType => le.getInt
      case LongType    => le.getLong
      case FloatType   => le.getFloat
      case DoubleType  => le.getDouble
      case DateType    => le.getInt // epoch days
      case TimestampType | TimestampNTZType => le.getLong // epoch micros
      case StringType  => new String(bytes, StandardCharsets.UTF_8)
      case d: DecimalType =>
        BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case other => throw new IllegalArgumentException(
        s"iceberg read: no bound decoding for $other")
    }
  }

  private def cmp(dt: DataType, a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int)       => java.lang.Integer.compare(x, y)
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Float, y: Float)   => java.lang.Float.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    case _ => throw new IllegalArgumentException(s"iceberg read: cannot compare $dt bounds")
  }

  /** Files whose [lower, upper] range can overlap [lo, hi] (inclusive;
    * either side open). Files without bounds for the column are kept —
    * pruning must never drop a possible match. */
  /** Iceberg's bucket-transform hash (spec Appendix B "32-bit Murmur3,
    * x86 variant, seed 0" over the value's canonical bytes) — NOT Spark's
    * `hash()` (different seed and int widening), so it is implemented
    * from the public spec and pinned against the spec's own test vectors
    * in IcebergReadSpec. int/long/date/timestamp hash as the 8-byte
    * little-endian long; strings as UTF-8 bytes. */
  object IcebergBucket {
    private def murmur3(data: Array[Byte], seed: Int): Int = {
      val c1 = 0xcc9e2d51; val c2 = 0x1b873593
      var h = seed
      val nBlocks = data.length / 4
      var i = 0
      while (i < nBlocks) {
        val o = i * 4
        var k = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
          ((data(o + 2) & 0xff) << 16) | ((data(o + 3) & 0xff) << 24)
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
        h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
        i += 1
      }
      var k1 = 0
      val tail = nBlocks * 4
      (data.length & 3) match {
        case 3 =>
          k1 ^= (data(tail + 2) & 0xff) << 16
          k1 ^= (data(tail + 1) & 0xff) << 8
          k1 ^= data(tail) & 0xff
        case 2 =>
          k1 ^= (data(tail + 1) & 0xff) << 8
          k1 ^= data(tail) & 0xff
        case 1 => k1 ^= data(tail) & 0xff
        case _ => ()
      }
      if ((data.length & 3) != 0) {
        k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h ^= k1
      }
      h ^= data.length
      h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
      h
    }
    private def longBytes(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    def hash(v: Any): Int = v match {
      case i: Int => murmur3(longBytes(i.toLong), 0)
      case l: Long => murmur3(longBytes(l), 0)
      case s: String => murmur3(s.getBytes(StandardCharsets.UTF_8), 0)
      case d: java.sql.Date => murmur3(longBytes(d.toLocalDate.toEpochDay), 0)
      case d: java.time.LocalDate => murmur3(longBytes(d.toEpochDay), 0)
      case other => throw new IllegalArgumentException(
        s"iceberg bucket: unsupported value type ${other.getClass.getName}")
    }
    def bucket(v: Any, n: Int): Int = (hash(v) & Integer.MAX_VALUE) % n
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Driver-side ordinal of a time transform for a predicate literal. */
  private def timeOrdinal(transform: String, v: Any): Option[Long] = {
    def epochDay: Option[Long] = v match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case t: java.sql.Timestamp =>
        Some(Math.floorDiv(t.getTime, 86400000L))
      case t: java.time.Instant => Some(Math.floorDiv(t.toEpochMilli, 86400000L))
      case _ => None
    }
    def epochHour: Option[Long] = v match {
      case t: java.sql.Timestamp => Some(Math.floorDiv(t.getTime, 3600000L))
      case t: java.time.Instant => Some(Math.floorDiv(t.toEpochMilli, 3600000L))
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay * 24L)
      case _ => None
    }
    transform match {
      case "day" => epochDay
      case "year" => epochDay.map(d =>
        (java.time.LocalDate.ofEpochDay(d).getYear - 1970).toLong)
      case "month" => epochDay.map { d =>
        val ld = java.time.LocalDate.ofEpochDay(d)
        ((ld.getYear - 1970) * 12 + ld.getMonthValue - 1).toLong
      }
      case "hour" => epochHour
      case _ => None
    }
  }

  private def cmpPart(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Number, y: Number)
        if !x.isInstanceOf[java.lang.Double] && !x.isInstanceOf[java.lang.Float] &&
           !y.isInstanceOf[java.lang.Double] && !y.isInstanceOf[java.lang.Float] =>
      Some(java.lang.Long.compare(x.longValue(), y.longValue()))
    case _ => None // unknown comparison → caller keeps the file
  }

  /** Partition-tuple pruning through NON-identity transforms (spec
    * §"Partition Transforms") — the file-skipping a foreign
    * `bucket(n, col)` / `day(col)` / `truncate[w]` layout entitles a
    * reader to, on top of manifest column bounds:
    *  - bucket[n]: an equality predicate keeps only files whose partition
    *    value equals `IcebergBucket.bucket(lit, n)`;
    *  - truncate/year/month/day/hour are order-preserving: range
    *    predicates compare the transformed bounds;
    *  - identity compares directly; unknown transforms never prune.
    * Conservative on every unknown: a file is only dropped when a
    * recorded partition value PROVABLY excludes the range. */
  def pruneByPartition(meta: TableMeta, files: Seq[DataFile], column: String,
                       lo: Option[Any], hi: Option[Any]): Seq[DataFile] = {
    val fields = meta.specFields.filter(_.srcCol.contains(column))
    if (fields.isEmpty) files
    else files.filter { f =>
      fields.forall { sf =>
        f.partition.get(sf.name) match {
          case None | Some(null) => true // nothing recorded → cannot prune
          case Some(pv) =>
            sf.transform match {
              case "identity" =>
                val aboveLo = lo.flatMap(l => cmpPart(pv, l)).forall(_ >= 0)
                val belowHi = hi.flatMap(h => cmpPart(pv, h)).forall(_ <= 0)
                aboveLo && belowHi
              case BucketRe(n) =>
                (lo, hi) match {
                  case (Some(l), Some(h)) if l == h =>
                    cmpPart(pv, Int.box(IcebergBucket.bucket(l, n.toInt)))
                      .forall(_ == 0)
                  case _ => true // bucket prunes equality only
                }
              case TruncateRe(w) =>
                def trunc(v: Any): Option[Any] = v match {
                  case s: String =>
                    val cut = s.offsetByCodePoints(0,
                      math.min(w.toInt, s.codePointCount(0, s.length)))
                    Some(s.substring(0, cut))
                  case nvar: Number if cmpPart(nvar, Long.box(0L)).isDefined =>
                    Some(Long.box(Math.floorDiv(nvar.longValue(), w.toLong) * w.toLong))
                  case _ => None
                }
                val aboveLo = lo.flatMap(trunc).flatMap(l => cmpPart(pv, l)).forall(_ >= 0)
                val belowHi = hi.flatMap(trunc).flatMap(h => cmpPart(pv, h)).forall(_ <= 0)
                aboveLo && belowHi
              case t @ ("year" | "month" | "day" | "hour") =>
                val aboveLo = lo.flatMap(timeOrdinal(t, _))
                  .flatMap(l => cmpPart(pv, Long.box(l))).forall(_ >= 0)
                val belowHi = hi.flatMap(timeOrdinal(t, _))
                  .flatMap(h => cmpPart(pv, Long.box(h))).forall(_ <= 0)
                aboveLo && belowHi
              case _ => true // void / unknown transform
            }
        }
      }
    }
  }

  def pruneByBounds(meta: TableMeta, files: Seq[DataFile], column: String,
                    lo: Option[Any], hi: Option[Any]): Seq[DataFile] = {
    val fid = meta.fieldIdOf.getOrElse(column,
      throw new IllegalArgumentException(s"iceberg read: no column '$column'"))
    val dt = meta.schema(column).dataType
    files.filter { f =>
      val fLo = f.lower.get(fid).map(decodeBound(dt, _))
      val fHi = f.upper.get(fid).map(decodeBound(dt, _))
      val aboveLo = (lo, fHi) match {
        case (Some(l), Some(u)) => cmp(dt, u, l) >= 0
        case _ => true
      }
      val belowHi = (hi, fLo) match {
        // string lower bounds may be truncated DOWN → still conservative
        case (Some(h), Some(l)) => cmp(dt, l, h) <= 0
        case _ => true
      }
      aboveLo && belowHi
    }
  }

  // ---- scan ------------------------------------------------------------

  /** Avro-decoded identity partition value → Spark literal of the table
    * column's type (dates ride as epoch-day ints per spec). */
  private def partitionLit(dt: DataType, v: Any): Column = (dt, v) match {
    case (_, null)          => lit(null).cast(dt)
    case (DateType, i: Int) => lit(java.time.LocalDate.ofEpochDay(i.toLong))
    case (TimestampType, l: Long) =>
      lit(java.time.Instant.EPOCH.plus(l, java.time.temporal.ChronoUnit.MICROS))
    case (d: DecimalType, b: java.nio.ByteBuffer) =>
      val bytes = new Array[Byte](b.remaining()); b.duplicate().get(bytes)
      lit(BigDecimal(new java.math.BigInteger(bytes), d.scale)).cast(d)
    case _ => lit(v).cast(dt)
  }

  /** [[partitionLit]]'s value mapping as an EXTERNAL row value (for the
    * broadcast file→partition-values relation in [[scan]]) — same
    * conversions, Row-encoded instead of literal-encoded. */
  private def partitionExternal(dt: DataType, v: Any): Any = (dt, v) match {
    case (_, null)          => null
    case (DateType, i: Int) => java.time.LocalDate.ofEpochDay(i.toLong)
    case (TimestampType, l: Long) =>
      java.time.Instant.EPOCH.plus(l, java.time.temporal.ChronoUnit.MICROS)
    case (d: DecimalType, b: java.nio.ByteBuffer) =>
      val bytes = new Array[Byte](b.remaining()); b.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    case (LongType, i: Int)    => i.toLong
    case (DoubleType, f: Float) => f.toDouble
    case _ => v
  }

  /** Resolve a named branch/tag to its snapshot id. */
  def refSnapshot(meta: TableMeta, ref: String): Long =
    meta.refs.getOrElse(ref, throw new IllegalArgumentException(
      s"iceberg read: no branch or tag '$ref' " +
        s"(have: ${meta.refs.keys.toSeq.sorted.mkString(", ")})"))

  /** DataFrame over the chosen snapshot's live files. `files` overrides the
    * manifest listing (pass `pruneByBounds` output to skip files before the
    * scan); `ref` reads AT BRANCH|TAG. */
  def scan(spark: SparkSession, dir: String,
           snapshotId: Option[Long] = None, asOfMs: Option[Long] = None,
           files: Option[Seq[DataFile]] = None,
           ref: Option[String] = None): DataFrame = {
    val meta = loadMetadata(dir)
    val snapId = ref.map(r => refSnapshot(meta, r)).orElse(snapshotId)
    val live = files.getOrElse(dataFiles(meta, snapId, asOfMs))
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)

    // Which table columns are physically in the files? (identity-partition
    // source columns may live only in the manifest partition record —
    // hive-migrated / EXPORT LAKE layouts)
    val firstPath = resolvePath(dir, live.head.path)
    val physicalCols =
      spark.read.parquet(firstPath).schema.fieldNames.toSet
    val missing = meta.schema.fields.toSeq
      .filter(f => !physicalCols.contains(f.name) &&
        meta.identityPartitionCols.contains(f.name))
    val unreadable = meta.schema.fieldNames.toSet -- physicalCols -- missing.map(_.name)
    require(unreadable.isEmpty,
      s"iceberg read: columns ${unreadable.mkString(", ")} absent from data files " +
        "and not identity-partitioned")
    val physicalSchema = StructType(meta.schema.fields.filter(f => physicalCols(f.name)))

    // v2 merge-on-read: position deletes subtract exact (file, row) pairs;
    // equality deletes subtract value tuples from data files with data
    // sequence number < the delete's. Spark's file metadata columns
    // supply the data side (_metadata.file_path/row_index — no custom
    // reader needed); delete sides are plain parquet reads; each
    // subtraction is ONE left_anti join that AQE broadcasts when the
    // delete set is small (the overwhelmingly common case).
    // writers disagree on URI spelling ("file:///p", "file:/p", "///p",
    // "/p" all name the same local file) — collapse scheme + slash runs
    val (posDels, eqDels) = deleteFiles(meta, snapId, asOfMs)
    val needMeta = posDels.nonEmpty || eqDels.nonEmpty
    val normPath = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, "^(file:)?/+", "/")
    def normStr(p: String): String = p.replaceFirst("^(file:)?/+", "/")

    // ONE relation over every live file. The previous shape built one
    // spark.read.parquet relation PER identity-partition group and
    // union'd them so each group could carry its partition literals —
    // G relations' worth of driver-side analysis/listing per read (~0.8 s
    // of driver gap on a 25-partition export at bench scale, unbounded as
    // partitions grow). The missing identity-partition columns instead
    // attach through ONE broadcast (file -> partition values) join —
    // manifest-sized by construction (guide §3.1/§5).
    val df0 = spark.read.schema(physicalSchema)
      .parquet(live.map(f => resolvePath(dir, f.path)): _*)
    val needFp = needMeta || missing.nonEmpty
    val withMeta =
      if (!needFp) df0
      else df0.select((df0.columns.map(col) :+
        normPath(col("_metadata.file_path")).as("__ice_fp") :+
        col("_metadata.row_index").as("__ice_pos")).toIndexedSeq: _*)
    val all =
      if (missing.isEmpty) withMeta
      else {
        import scala.jdk.CollectionConverters._
        val mapSchema = StructType(
          StructField("__ice_fp", org.apache.spark.sql.types.StringType,
            nullable = false) +:
            missing.map(f => StructField(s"__ice_pv_${f.name}", f.dataType)))
        val mapRows = live.map { f =>
          org.apache.spark.sql.Row.fromSeq(normStr(resolvePath(dir, f.path)) +:
            missing.map(m =>
              partitionExternal(m.dataType, f.partition.getOrElse(m.name, null))))
        }
        val mapDf = broadcast(spark.createDataFrame(mapRows.asJava, mapSchema))
        val joined = withMeta.join(mapDf, Seq("__ice_fp"), "left")
        missing.foldLeft(joined) { case (df, m) =>
          df.withColumn(m.name, col(s"__ice_pv_${m.name}"))
        }.drop(missing.map(m => s"__ice_pv_${m.name}"): _*)
      }
    val afterPos =
      if (posDels.isEmpty) all
      else {
        val dels = spark.read.parquet(posDels.map(p => resolvePath(dir, p)): _*)
          .select(normPath(col("file_path")).as("__ice_fp"),
            col("pos").cast("long").as("__ice_pos"))
        all.join(dels, Seq("__ice_fp", "__ice_pos"), "left_anti")
      }
    val afterEq =
      if (eqDels.isEmpty) afterPos
      else {
        val nameOf = meta.fieldIdOf.map(_.swap)
        // per-file data sequence numbers ride in on a tiny broadcast map
        import spark.implicits._
        val seqDf = broadcast(live
          .map(f => normStr(resolvePath(dir, f.path)) -> f.seq)
          .toDF("__ice_fp", "__ice_seq"))
        val withSeq = afterPos.join(seqDf, Seq("__ice_fp"), "left")
        // group delete files by (equality column set, partition scope):
        // one anti-join per distinct group, delete rows tagged with their
        // sequence; a partition-scoped delete only subtracts data rows IN
        // its partition (matching tuples elsewhere stay live, spec §"Scan
        // Planning")
        eqDels.groupBy(d => (d.fieldIds, d.scope)).toSeq.foldLeft(withSeq) {
          case (acc, ((ids, scope), dels)) =>
            val cols = ids.map(id => nameOf.getOrElse(id,
              throw new IllegalArgumentException(
                s"iceberg read: equality_ids field $id not in schema")))
            val delDf = dels.map { d =>
              spark.read.parquet(resolvePath(dir, d.path))
                .select(cols.map(col): _*)
                .withColumn("__del_seq", lit(d.seq))
            }.reduce(_ unionByName _)
            // null-safe value match (spec: null equals null here) AND the
            // strict sequence rule — newer data files survive the delete
            val valueCond = cols.map(c => acc(c) <=> delDf(c))
              .reduce(_ && _) && acc("__ice_seq") < delDf("__del_seq")
            val cond = scope.foldLeft(valueCond) { case (cnd, (srcCol, v)) =>
              val dt = meta.schema(srcCol).dataType
              cnd && (acc(srcCol) <=> partitionLit(dt, v))
            }
            acc.join(delDf, cond, "left_anti")
        }
      }
    afterEq.select(meta.schema.fieldNames.map(col).toSeq: _*)
  }

  /** Bounds-pruned scan: keep only files whose manifest [min,max] for
    * `column` overlaps [lo, hi], then scan those. Returns the pruned
    * DataFrame and how many of the live files survived (spec evidence). */
  def scanPruned(spark: SparkSession, dir: String, column: String,
                 lo: Option[Any], hi: Option[Any],
                 snapshotId: Option[Long] = None): (DataFrame, Int, Int) = {
    val meta = loadMetadata(dir)
    val live = dataFiles(meta, snapshotId)
    val kept = pruneByPartition(meta,
      pruneByBounds(meta, live, column, lo, hi), column, lo, hi)
    (scan(spark, dir, snapshotId, None, Some(kept)), kept.size, live.size)
  }
}
