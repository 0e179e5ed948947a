package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Delta Lake interop (DeltaInterop): log replay (JSON commits +
  * checkpoint parquet), partition-value restoration, version time travel,
  * deletion-vector refusal — plus the EXPORT LAKE FORMAT DELTA writer the
  * reader round-trips against. Multi-commit logs are hand-written per the
  * public protocol spec, exactly what another engine would produce. */
class DeltaInteropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def exportedDelta(partitionBy: Seq[String] = Nil): (String, SnapshotTable) = {
    val src = fresh("dl_src")
    val df = (1 to 120).map(i => (i.toLong, s"name_$i", i % 3, i * 2.5))
      .toDF("id", "name", "grp", "score")
    val t = SnapshotTable.create(spark, src, df)
    t.deleteWhere(col("id") > 100)
    val dst = fresh("dl_dst") + "/tbl"
    DeltaInterop.exportTo(spark, src, dst, partitionBy = partitionBy)
    (dst, t)
  }

  test("export → replay round trip (unpartitioned)") {
    val (dst, t) = exportedDelta()
    val back = DeltaInterop.scan(spark, dst)
      .select("id", "name", "grp", "score").orderBy("id").collect().toSeq
    val want = t.read().select("id", "name", "grp", "score").orderBy("id").collect().toSeq
    assert(back == want)
    val st = DeltaInterop.readState(spark, dst)
    assert(st.files.map(_.numRecords.getOrElse(0L)).sum == 100L) // stats ride the log
  }

  test("partition columns restored from the log, typed (files omit them)") {
    val (dst, t) = exportedDelta(partitionBy = Seq("grp"))
    val st = DeltaInterop.readState(spark, dst)
    assert(st.partitionCols == Seq("grp"))
    // physical files omit grp
    val f0 = s"$dst/${st.files.head.path}"
    assert(!spark.read.parquet(f0).schema.fieldNames.contains("grp"))
    val back = DeltaInterop.scan(spark, dst)
    assert(back.schema("grp").dataType == IntegerType)
    assert(back.select("id", "grp").orderBy("id").collect().toSeq ==
      t.read().select("id", "grp").orderBy("id").collect().toSeq)
  }

  /** Append commit 1 to an exported table: remove one file, add a fresh
    * parquet file — the multi-writer history shape. */
  private def appendCommit1(dst: String): (String, String) = {
    val st = DeltaInterop.readState(spark, dst)
    val removed = st.files.head.path
    // new data file with ids 1000..1009
    val extra = (1000 to 1009).map(i => (i.toLong, s"x_$i", 9, 0.0))
      .toDF("id", "name", "grp", "score").coalesce(1)
    val tmp = fresh("dl_extra") + "/out"
    extra.write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    val src = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val newName = "part-extra-0001.parquet"
    Files.copy(src, Paths.get(dst, newName))
    val lines = Seq(
      s"""{"remove":{"path":"$removed","deletionTimestamp":1,"dataChange":true}}""",
      s"""{"add":{"path":"$newName","partitionValues":{},"size":${Files.size(Paths.get(dst, newName))},"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":10}"}}""")
    Files.write(Paths.get(dst, "_delta_log", f"${1L}%020d.json"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    (removed, newName)
  }

  test("multi-commit replay: remove + add in commit 1, version time travel") {
    val (dst, t) = exportedDelta()
    val n0 = DeltaInterop.scan(spark, dst).count()
    val (removed, added) = appendCommit1(dst)
    val st1 = DeltaInterop.readState(spark, dst)
    assert(st1.version == 1L)
    assert(!st1.files.exists(_.path == removed))
    assert(st1.files.exists(_.path == added))
    val ids1 = DeltaInterop.scan(spark, dst).select("id")
      .collect().map(_.getLong(0)).toSet
    assert((1000L to 1009L).forall(ids1.contains))
    // VERSION AS OF 0 reproduces the original snapshot
    assert(DeltaInterop.scan(spark, dst, version = Some(0L)).count() == n0)
    assert(DeltaInterop.scan(spark, dst).count() ==
      n0 - DeltaInterop.readState(spark, dst, Some(0L))
        .files.find(_.path == removed).get.numRecords.get + 10)
  }

  test("checkpoint replay: state from checkpoint parquet + later commits only") {
    val (dst, _) = exportedDelta()
    appendCommit1(dst)
    DeltaInterop.writeCheckpoint(spark, dst, 1L)
    val before = DeltaInterop.scan(spark, dst).select("id")
      .collect().map(_.getLong(0)).toSet
    // delete the JSON commits the checkpoint covers — replay must not need them
    Files.delete(Paths.get(dst, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(dst, "_delta_log", f"${1L}%020d.json"))
    // commit 2: add nothing, remove the extra file
    Files.write(Paths.get(dst, "_delta_log", f"${2L}%020d.json"),
      s"""{"remove":{"path":"part-extra-0001.parquet","deletionTimestamp":2,"dataChange":true}}"""
        .getBytes(StandardCharsets.UTF_8))
    val after = DeltaInterop.scan(spark, dst).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(after == before -- (1000L to 1009L))
    // time travel TO the checkpoint version still works with its json gone
    assert(DeltaInterop.scan(spark, dst, version = Some(1L)).select("id")
      .collect().map(_.getLong(0)).toSet == before)
  }

  test("unknown reader features are refused loudly; deletionVectors is supported") {
    val (dst, _) = exportedDelta()
    Files.write(Paths.get(dst, "_delta_log", f"${1L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["someFutureFeature"]}}"""
        .getBytes(StandardCharsets.UTF_8))
    val e2 = intercept[IllegalArgumentException](DeltaInterop.readState(spark, dst))
    assert(e2.getMessage.contains("unsupported reader features"))
    Files.write(Paths.get(dst, "_delta_log", f"${1L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}"""
        .getBytes(StandardCharsets.UTF_8))
    DeltaInterop.readState(spark, dst) // no throw
  }

  test("column mapping (name mode): col-uuid files read back logically; nested, partition, skipping") {
    val dir = fresh("dl_cmap")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    // physical data files: col-pa (logical id), col-pb{col-pc} (rec.v);
    // partition column col-pd (grp) lives only in the log
    def writeFile(name: String, rows: Seq[(Long, String)]): Long = {
      val tmp = fresh("dl_cmap_w") + "/out"
      rows.toDF("a", "b")
        .select(col("a").as("col-pa"), struct(col("b").as("col-pc")).as("col-pb"))
        .coalesce(1).write.parquet(tmp)
      val part = {
        import scala.jdk.CollectionConverters._
        Files.list(Paths.get(tmp)).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
      }
      Files.copy(part, Paths.get(dir, name))
      Files.size(Paths.get(dir, name))
    }
    val s1 = writeFile("d1.parquet", Seq((1L, "x1"), (2L, "x2")))
    val s2 = writeFile("d2.parquet", Seq((10L, "y1"), (20L, "y2"), (30L, "y3")))

    val schemaString =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":1,\"delta.columnMapping.physicalName\":\"col-pa\"}},""" +
        """{\"name\":\"rec\",\"type\":{\"type\":\"struct\",\"fields\":[{\"name\":\"v\",\"type\":\"string\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":3,\"delta.columnMapping.physicalName\":\"col-pc\"}}]},\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":2,\"delta.columnMapping.physicalName\":\"col-pb\"}},""" +
        """{\"name\":\"grp\",\"type\":\"integer\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":4,\"delta.columnMapping.physicalName\":\"col-pd\"}}]}"""
    val lines = Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"cmap-test","format":{"provider":"parquet","options":{}},"schemaString":"$schemaString","partitionColumns":["grp"],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"4"},"createdTime":1}}""",
      s"""{"add":{"path":"d1.parquet","partitionValues":{"col-pd":"1"},"size":$s1,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":2,\\"minValues\\":{\\"col-pa\\":1},\\"maxValues\\":{\\"col-pa\\":2}}"}}""",
      s"""{"add":{"path":"d2.parquet","partitionValues":{"col-pd":"2"},"size":$s2,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":3,\\"minValues\\":{\\"col-pa\\":10},\\"maxValues\\":{\\"col-pa\\":30}}"}}""")
    Files.write(Paths.get(dir, "_delta_log", f"${0L}%020d.json"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val st = DeltaInterop.readState(spark, dir)
    assert(st.columnMapping == "name")
    assert(st.schema.fieldNames.toSeq == Seq("id", "rec", "grp"))
    assert(st.files.forall(f => f.partitionValues.keySet == Set("grp")),
      "physical partition keys must remap to logical")

    val back = DeltaInterop.scan(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "rec", "grp"))
    val got = back.selectExpr("id", "rec.v", "grp").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "x1", 1), (2L, "x2", 1),
      (10L, "y1", 2), (20L, "y2", 2), (30L, "y3", 2)),
      s"logical values wrong: $got")

    // stats-based skipping works through the logical remap
    val (pruned, kept, total) = DeltaInterop.scanPruned(spark, dir, "id",
      Some(15L), Some(25L))
    assert(kept == 1 && total == 2, s"kept $kept of $total")
    assert(pruned.filter(col("id").between(15, 25)).count() == 1L)
  }

  test("RoaringBitmapArray codec: round trip across container kinds and key buckets") {
    import DeltaDeletionVectors._
    // array container, bitmap container (>4096 dense), multi-bucket highs
    val positions: Array[Long] =
      (Array(0L, 1L, 5L, 65535L, 65536L, 70000L) ++          // array containers, 2 keys
        (100000L until 105000L).toArray ++                    // bitmap container (5000 dense)
        Array((1L << 32) + 7L, (1L << 32) + 8L, (5L << 32))) // high-key buckets
    val got = deserialize(serialize(positions))
    assert(got.toSeq == positions.distinct.sorted.toSeq)
    // z85 round trip (16-byte uuid shape)
    val bytes = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    assert(z85Decode(z85Encode(bytes)).toSeq == bytes.toSeq)
  }

  test("deletion vectors end-to-end: published rows vanish, stats survive, corrupt DV refused") {
    val (dst, _) = exportedDelta()
    assert(DeltaInterop.scan(spark, dst).count() == 100L)

    // delete ids 1..10: find their (file, row_index) from the data files
    val st = DeltaInterop.readState(spark, dst)
    val victims = spark.read.parquet(
        st.files.map(f => s"$dst/${f.path}"): _*)
      .selectExpr("id", "_metadata.file_path AS fp", "_metadata.row_index AS pos")
      .filter(col("id") <= 10).collect()
    val byFile: Map[String, Seq[Long]] = victims
      .groupBy(r => st.files.map(_.path)
        .find(p => r.getString(1).endsWith(p)).get)
      .map { case (p, rs) => p -> rs.map(_.getLong(2)).toSeq }
    val v1 = DeltaInterop.publishDeletionVectors(spark, dst, byFile)

    val after = DeltaInterop.scan(spark, dst)
    assert(after.count() == 90L, s"10 rows DV-deleted: ${after.count()}")
    assert(after.filter(col("id") <= 10).count() == 0L)
    // time travel to the pre-DV version still sees all rows
    assert(DeltaInterop.scan(spark, dst, Some(v1 - 1)).count() == 100L)
    // stats survived the DV attach: skipping still prunes
    val reSt = DeltaInterop.readState(spark, dst)
    assert(reSt.files.forall(_.rawStats.isDefined), "stats dropped by DV commit")
    // incremental DVs merge: delete 5 more rows from one of the same files
    val more = spark.read.parquet(st.files.map(f => s"$dst/${f.path}"): _*)
      .selectExpr("id", "_metadata.file_path AS fp", "_metadata.row_index AS pos")
      .filter(col("id").between(11, 15)).collect()
    val byFile2 = more.groupBy(r => st.files.map(_.path)
        .find(p => r.getString(1).endsWith(p)).get)
      .map { case (p, rs) => p -> rs.map(_.getLong(2)).toSeq }
    DeltaInterop.publishDeletionVectors(spark, dst, byFile2)
    assert(DeltaInterop.scan(spark, dst).count() == 85L, "merged DVs")
    // TVF serves the DV snapshot
    assert(spark.sql(s"SELECT count(*) FROM delta_scan('$dst')")
      .collect().head.getLong(0) == 85L)

    // corrupt every DV file (only the latest generation is referenced;
    // listing order must not decide which one we hit) → checksum refusal
    val dvFiles = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(dst)).iterator.asScala
        .filter(_.getFileName.toString.startsWith("deletion_vector_")).toVector
    }
    assert(dvFiles.nonEmpty)
    dvFiles.foreach { f =>
      val raw = Files.readAllBytes(f)
      raw(raw.length / 2) = (raw(raw.length / 2) ^ 0x7f).toByte
      Files.write(f, raw)
    }
    val e = intercept[Exception](DeltaInterop.scan(spark, dst).count())
    assert(e.getMessage.contains("checksum") || e.getMessage.contains("magic"),
      e.getMessage)
  }

  test("null partition value becomes a typed null column") {
    val dst = fresh("dl_null") + "/tbl"
    val data = Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)
    Files.createDirectories(Paths.get(dst))
    data.write.parquet(s"$dst/files")
    val part = Files.list(Paths.get(dst, "files")).iterator()
    val pf = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(pf, Paths.get(dst, "d1.parquet"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("day", DateType)))
    Files.createDirectories(Paths.get(dst, "_delta_log"))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder.build.writeValueAsString(schema.json)},"partitionColumns":["day"],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"d1.parquet","partitionValues":{"day":null},"size":${Files.size(Paths.get(dst, "d1.parquet"))},"modificationTime":1,"dataChange":true}}""")
    Files.write(Paths.get(dst, "_delta_log", f"${0L}%020d.json"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val back = DeltaInterop.scan(spark, dst)
    assert(back.schema("day").dataType == DateType)
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(2)))
  }

  test("EXPORT LAKE ... FORMAT DELTA + delta_scan TVF from SQL") {
    val src = fresh("dl_sql_src")
    val df = (1 to 50).map(i => (i.toLong, i % 5)).toDF("id", "grp")
    SnapshotTable.create(spark, src, df)
    val dst = fresh("dl_sql_dst") + "/tbl"
    spark.sql(s"EXPORT LAKE '$src' TO '$dst' PARTITION BY (grp) FORMAT DELTA")
    val n = spark.sql(s"SELECT COUNT(*) AS n FROM delta_scan('$dst')")
      .collect().head.getLong(0)
    assert(n == 50)
    val v0 = spark.sql(s"SELECT COUNT(*) AS n FROM delta_scan('$dst', 0)")
      .collect().head.getLong(0)
    assert(v0 == 50)
  }

  test("scanPruned skips files via add.stats bounds and partitionValues") {
    val src = fresh("dl_pr_src")
    // band = (id-1)/40 is monotone in id → per-band files carry DISJOINT
    // id ranges in their stats
    val df = (1 to 120).map(i => (i.toLong, (i - 1) / 40, s"n_$i"))
      .toDF("id", "band", "name")
    SnapshotTable.create(spark, src, df)
    val dst = fresh("dl_pr_dst") + "/tbl"
    DeltaInterop.exportTo(spark, src, dst, partitionBy = Seq("band"))

    // stats path: ids 50..70 live only in band 1's file
    val (pruned, kept, total) = DeltaInterop.scanPruned(spark, dst, "id",
      Some(50L), Some(70L))
    assert(total >= 3 && kept < total, s"kept $kept of $total")
    val ids = pruned.filter(col("id").between(50, 70))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (50L to 70L))

    // partition-value path: exactly band 2's files survive
    val (pruned2, kept2, total2) = DeltaInterop.scanPruned(spark, dst, "band",
      Some(2), Some(2))
    val band2Files = DeltaInterop.readState(spark, dst).files
      .count(_.partitionValues.get("band").contains("2"))
    assert(kept2 == band2Files && kept2 < total2, s"kept2 = $kept2 of $total2")
    assert(pruned2.filter(col("band") === 2).count() == 40)
  }

  test("same-version remove after add: add wins regardless of line order (DV-attach shape)") {
    val (dst, _) = exportedDelta()
    val st = DeltaInterop.readState(spark, dst)
    val p = st.files.head.path
    val n0 = DeltaInterop.scan(spark, dst).count()
    // a real DV/RESTORE commit carries remove(p, old) + add(p, new); the
    // protocol keys state by path — line order must NOT decide liveness
    val lines = Seq(
      s"""{"add":{"path":"$p","partitionValues":{},"size":${st.files.head.size},"modificationTime":9,"dataChange":true,"stats":${new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(st.files.head.rawStats.get)}}}""",
      s"""{"remove":{"path":"$p","deletionTimestamp":9,"dataChange":true}}""")
    Files.write(Paths.get(dst, "_delta_log", f"${1L}%020d.json"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val st1 = DeltaInterop.readState(spark, dst)
    assert(st1.files.exists(_.path == p), "add must win over same-version remove")
    assert(DeltaInterop.scan(spark, dst).count() == n0)
  }

  test("checkpoint remove rows are vacuum tombstones, not state mutations") {
    val dst = fresh("dl_cp_tomb") + "/tbl"
    Files.createDirectories(Paths.get(dst, "_delta_log"))
    val data = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1)
    val tmp = fresh("dl_cp_w") + "/out"
    data.write.parquet(tmp)
    val pf = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(tmp)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }
    Files.copy(pf, Paths.get(dst, "d1.parquet"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    // commit 0 exists (replay requires a commit chain) …
    Files.write(Paths.get(dst, "_delta_log", f"${0L}%020d.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder.build.writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1}}""" + "\n" +
        s"""{"add":{"path":"d1.parquet","partitionValues":{},"size":${Files.size(Paths.get(dst, "d1.parquet"))},"modificationTime":1,"dataChange":true}}""")
        .getBytes(StandardCharsets.UTF_8))
    // … and a checkpoint at 0 whose parquet carries add(d1) THEN a vacuum
    // tombstone remove(d1, null) — the order a real writer is free to emit
    import org.apache.spark.sql.Row
    val addType = StructType(Seq(
      StructField("path", StringType), StructField("partitionValues",
        MapType(StringType, StringType, true)),
      StructField("size", LongType), StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType), StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", addType),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType))))))
    val rows = Seq(
      Row(Row(1, 2), null, null, null),
      Row(null, Row("t", schema.json, Seq.empty[String], 1L), null, null),
      Row(null, null, Row("d1.parquet", Map.empty[String, String],
        Files.size(Paths.get(dst, "d1.parquet")), 1L, true), null),
      Row(null, null, null, Row("d1.parquet", 1L)))
    val cpTmp = fresh("dl_cp_p") + "/out"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cpSchema)
      .coalesce(1).write.parquet(cpTmp)
    val cpPart = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(cpTmp)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }
    Files.copy(cpPart,
      Paths.get(dst, "_delta_log", f"${0L}%020d.checkpoint.parquet"))
    val st = DeltaInterop.readState(spark, dst)
    assert(st.files.exists(_.path == "d1.parquet"),
      "checkpoint tombstone must not drop the live file")
    assert(DeltaInterop.scan(spark, dst).count() == 3L)
  }

  test("checkpoint after DV publish: DVs+stats+protocol survive replay-from-checkpoint") {
    val (dst, _) = exportedDelta()
    val st = DeltaInterop.readState(spark, dst)
    val victims = spark.read.parquet(st.files.map(f => s"$dst/${f.path}"): _*)
      .selectExpr("id", "_metadata.file_path AS fp", "_metadata.row_index AS pos")
      .filter(col("id") <= 10).collect()
    val byFile: Map[String, Seq[Long]] = victims
      .groupBy(r => st.files.map(_.path).find(p => r.getString(1).endsWith(p)).get)
      .map { case (p, rs) => p -> rs.map(_.getLong(2)).toSeq }
    val v1 = DeltaInterop.publishDeletionVectors(spark, dst, byFile)
    DeltaInterop.writeCheckpoint(spark, dst, v1)
    // drop every JSON commit the checkpoint covers: state must come from
    // the checkpoint parquet alone (one empty commitInfo-only commit after
    // it keeps the log non-empty, like a real vacuumed table)
    (0L to v1).foreach(v =>
      Files.deleteIfExists(Paths.get(dst, "_delta_log", f"$v%020d.json")))
    Files.write(Paths.get(dst, "_delta_log", f"${v1 + 1}%020d.json"),
      """{"commitInfo":{"operation":"VACUUM"}}""".getBytes(StandardCharsets.UTF_8))
    val re = DeltaInterop.readState(spark, dst)
    assert(re.protocol.minReader == 3 && re.protocol.minWriter == 7,
      s"protocol downgraded by checkpoint: ${re.protocol}")
    assert(re.protocol.readerFeatures.contains("deletionVectors"))
    assert(re.files.exists(_.dv.isDefined), "DV descriptors lost in checkpoint")
    assert(re.files.forall(_.rawStats.isDefined), "stats lost in checkpoint")
    val back = DeltaInterop.scan(spark, dst)
    assert(back.count() == 90L, s"DV-deleted rows resurrected: ${back.count()}")
    assert(back.filter(col("id") <= 10).count() == 0L)
  }
}
