package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Iceberg metadata-tree READER (IcebergRead): the interop loop closed —
  * EXPORT LAKE writes a spec-conformant tree, IcebergRead consumes any
  * such tree back through metadata.json → manifest-list → manifests, with
  * identity-partition restoration, manifest-bounds file pruning, and
  * snapshot selection. No Iceberg runtime jars anywhere. */
class IcebergReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Lake with a delete, exported. `band` = (id-1)/50 is monotone in id, so
    * PARTITION BY (band) yields multiple files with DISJOINT id ranges —
    * the bounds-pruning fixture. */
  private def exported(partitionBy: Seq[String] = Nil): (String, SnapshotTable) = {
    val src = fresh("ib_src")
    val df = (1 to 200).map(i =>
        (i.toLong, s"name_$i", i % 4, (i - 1) / 50, i * 1.5))
      .toDF("id", "name", "grp", "band", "score")
    val t = SnapshotTable.create(spark, src, df)
    t.deleteWhere(col("id") > 180)
    val dst = fresh("ib_dst") + "/tree"
    LakeExport.exportTo(spark, src, dst, partitionBy = partitionBy)
    (dst, t)
  }

  test("unpartitioned round trip: scan ≡ snapshot") {
    val (dst, t) = exported()
    val back = IcebergRead.scan(spark, dst)
      .select("id", "name", "grp", "score").orderBy("id").collect().toSeq
    val want = t.read().select("id", "name", "grp", "score").orderBy("id").collect().toSeq
    assert(back == want)
  }

  test("identity-partitioned round trip restores the partition column from manifests") {
    val (dst, t) = exported(partitionBy = Seq("grp"))
    // the physical files omit grp (hive layout) — prove the reader fills it
    val meta = IcebergRead.loadMetadata(dst)
    assert(meta.identityPartitionCols == Seq("grp"))
    val firstFile = IcebergRead.dataFiles(meta).head.path
    assert(!spark.read.parquet(firstFile).schema.fieldNames.contains("grp"))

    val back = IcebergRead.scan(spark, dst)
    assert(back.schema("grp").dataType == IntegerType)
    val got = back.select("id", "grp").orderBy("id").collect().toSeq
    val want = t.read().select("id", "grp").orderBy("id").collect().toSeq
    assert(got == want)
  }

  test("manifest-bounds pruning skips non-overlapping files, result stays exact") {
    val (dst, _) = exported(partitionBy = Seq("band")) // disjoint id ranges per file
    val meta = IcebergRead.loadMetadata(dst)
    val live = IcebergRead.dataFiles(meta)
    assert(live.size >= 3, "fixture must span multiple data files")
    // ids 60..90 live only in band 1's file(s)
    val (df, kept, total) = IcebergRead.scanPruned(spark, dst, "id",
      Some(60L), Some(90L))
    assert(kept < total, s"expected pruning, kept $kept of $total")
    val got = df.filter(col("id").between(60, 90))
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == (60L to 90L))
  }

  test("snapshot selection: explicit id, as-of timestamp, unknown id errors") {
    val (dst, _) = exported()
    val meta = IcebergRead.loadMetadata(dst)
    val snap = meta.snapshots.head
    assert(meta.currentSnapshotId.contains(snap.id))
    // explicit id and as-of-now both resolve to the only snapshot
    assert(IcebergRead.scan(spark, dst, snapshotId = Some(snap.id)).count() == 180)
    assert(IcebergRead.scan(spark, dst,
      asOfMs = Some(System.currentTimeMillis() + 1000)).count() == 180)
    val e = intercept[IllegalArgumentException](
      IcebergRead.dataFiles(meta, snapshotId = Some(999999L)))
    assert(e.getMessage.contains("unknown snapshot"))
    val e2 = intercept[IllegalArgumentException](
      IcebergRead.dataFiles(meta, asOfMs = Some(snap.timestampMs - 1000000)))
    assert(e2.getMessage.contains("no snapshot at or before"))
  }

  test("metadata resolves without version-hint.text (highest v*.metadata.json wins)") {
    val (dst, t) = exported()
    Files.delete(Paths.get(dst, "metadata", "version-hint.text"))
    assert(IcebergRead.scan(spark, dst).count() == t.read().count())
  }

  test("record counts in manifests match the data") {
    val (dst, _) = exported()
    val meta = IcebergRead.loadMetadata(dst)
    val live = IcebergRead.dataFiles(meta)
    assert(live.map(_.recordCount).sum == 180L)
    live.foreach { f =>
      assert(spark.read.parquet(f.path).count() == f.recordCount)
    }
  }

  test("iceberg_scan TVF serves the tree from SQL, with time travel arg") {
    val (dst, _) = exported(partitionBy = Seq("grp"))
    val n = spark.sql(s"SELECT COUNT(*) AS n FROM iceberg_scan('$dst')")
      .collect().head.getLong(0)
    assert(n == 180)
    val meta = IcebergRead.loadMetadata(dst)
    val bySnap = spark.sql(
      s"SELECT COUNT(*) AS n FROM iceberg_scan('$dst', ${meta.snapshots.head.id})")
      .collect().head.getLong(0)
    assert(bySnap == 180)
  }

  test("EXPORT APPEND publishes new snapshots: time travel across versions, metadata TVFs") {
    val src = fresh("ib_app_src")
    val df = (1 to 200).map(i => (i.toLong, s"n_$i", i % 4)).toDF("id", "name", "grp")
    val t = SnapshotTable.create(spark, src, df)
    val dst = fresh("ib_app_dst") + "/tree"
    val v1 = t.latestVersion
    LakeExport.exportTo(spark, src, dst)

    t.deleteWhere(col("id") > 150)
    val v2 = t.latestVersion
    spark.sql(s"EXPORT LAKE '$src' TO '$dst' APPEND")

    t.deleteWhere(col("id") > 100)
    val v3 = t.latestVersion
    LakeExport.appendTo(spark, src, dst)

    // current scan = latest snapshot; explicit ids travel back
    assert(IcebergRead.scan(spark, dst).count() == 100)
    assert(IcebergRead.scan(spark, dst, snapshotId = Some(v2)).count() == 150)
    assert(IcebergRead.scan(spark, dst, snapshotId = Some(v1)).count() == 200)
    // rolled metadata: version-hint advanced, all snapshots listed
    assert(new String(Files.readAllBytes(
      Paths.get(dst, "metadata", "version-hint.text"))).trim == "3")
    val snaps = spark.sql(s"SELECT * FROM iceberg_snapshots('$dst') ORDER BY snapshot_id")
      .collect()
    assert(snaps.map(_.getLong(0)).toSeq == Seq(v1, v2, v3))
    assert(snaps.filter(_.getBoolean(2)).map(_.getLong(0)).toSeq == Seq(v3))
    // files TVF: per-snapshot file sets from the manifests alone
    val filesNow = spark.sql(s"SELECT SUM(record_count) FROM iceberg_files('$dst')")
      .collect().head.getLong(0)
    assert(filesNow == 100)
    val filesV1 = spark.sql(
      s"SELECT SUM(record_count) FROM iceberg_files('$dst', $v1)")
      .collect().head.getLong(0)
    assert(filesV1 == 200)
    // timestamp travel: as-of between the first and second publish
    val meta = IcebergRead.loadMetadata(dst)
    val tsBetween = meta.snapshots.find(_.id == v2).get.timestampMs
    assert(IcebergRead.scan(spark, dst, asOfMs = Some(tsBetween)).count() == 150)
  }

  test("EXPORT APPEND refuses schema drift and double publish") {
    val src = fresh("ib_ref_src")
    val t = SnapshotTable.create(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val dst = fresh("ib_ref_dst") + "/tree"
    LakeExport.exportTo(spark, src, dst)
    val e1 = intercept[IllegalArgumentException](LakeExport.appendTo(spark, src, dst))
    assert(e1.getMessage.contains("already published"))

    val src2 = fresh("ib_ref_src2")
    SnapshotTable.create(spark, src2,
      Seq((1L, "a", 1.0)).toDF("id", "name", "extra"))
    val e2 = intercept[IllegalArgumentException](
      LakeExport.appendTo(spark, src2, dst))
    assert(e2.getMessage.contains("schema differs"))
  }

  test("predicates and projection push through the interop scan to the parquet readers") {
    val (dst, _) = exported(partitionBy = Seq("grp"))
    val df = IcebergRead.scan(spark, dst)
      .filter(col("id") > 100).select("id", "score")
    val plan = df.queryExecution.executedPlan.toString
    // filter reaches the scan (PushedFilters) and only needed columns read
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,100)]"), plan)
    assert("ReadSchema:[^\n]*score".r.findFirstIn(plan).isDefined, plan)
    assert(!"ReadSchema:[^\n]*name".r.findFirstIn(plan).isDefined,
      "projection must prune unused columns\n" + plan)
  }

  test("branch/tag refs resolve (catalog-written trees): iceberg_scan('<dir>', '<ref>')") {
    val src = fresh("ib_ref2_src")
    val df = (1 to 100).map(i => (i.toLong, i % 3)).toDF("id", "grp")
    val t = SnapshotTable.create(spark, src, df)
    val dst = fresh("ib_ref2_dst") + "/tree"
    val v1 = t.latestVersion
    LakeExport.exportTo(spark, src, dst)
    t.deleteWhere(col("id") > 50)
    val v2 = t.latestVersion
    LakeExport.appendTo(spark, src, dst)
    // add a refs node the way a catalog writer would (spec §Refs)
    val metaDir = Paths.get(dst, "metadata")
    val hint = new String(Files.readAllBytes(metaDir.resolve("version-hint.text"))).trim
    val p = metaDir.resolve(s"v$hint.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readAllBytes(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val refs = root.putObject("refs")
    refs.putObject("main").put("snapshot-id", v2).put("type", "branch")
    refs.putObject("audit").put("snapshot-id", v1).put("type", "tag")
    Files.write(p, mapper.writeValueAsString(root).getBytes("UTF-8"))

    val meta = IcebergRead.loadMetadata(dst)
    assert(meta.refs == Map("main" -> v2, "audit" -> v1))
    assert(spark.sql(s"SELECT COUNT(*) FROM iceberg_scan('$dst', 'audit')")
      .collect().head.getLong(0) == 100)
    assert(spark.sql(s"SELECT COUNT(*) FROM iceberg_scan('$dst', 'main')")
      .collect().head.getLong(0) == 50)
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM iceberg_scan('$dst', 'nope')").collect())
    assert(e.getMessage.contains("no branch or tag"))
  }

  test("v2 position deletes: published rows vanish, earlier snapshots time-travel intact") {
    val (dst, _) = exported()
    val before = IcebergRead.scan(spark, dst)
    assert(before.count() == 180L)
    val beforeSnap = IcebergRead.loadMetadata(dst).currentSnapshotId.get

    // delete rows at positions 0,1,2 of one file and 5 of another —
    // by exact (file_path, pos), the merge-on-read contract
    val meta = IcebergRead.loadMetadata(dst)
    val files = IcebergRead.dataFiles(meta).map(_.path).sorted
    assert(files.nonEmpty)
    val victim = files.head
    val deletes: Map[String, Seq[Long]] =
      if (files.size > 1) Map(victim -> Seq(0L, 1L, 2L), files(1) -> Seq(5L))
      else Map(victim -> Seq(0L, 1L, 2L, 5L))
    val delSnap = LakeExport.publishPositionDeletes(spark, dst, deletes)

    val after = IcebergRead.scan(spark, dst)
    assert(after.count() == 176L, s"4 positions deleted: ${after.count()}")
    // the EXACT rows at those positions are the ones gone
    val victimRows = spark.read.parquet(victim)
      .selectExpr("id", "_metadata.row_index AS pos").collect()
      .filter(r => deletes(victim).contains(r.getLong(1))).map(_.getLong(0)).toSet
    val afterIds = after.select("id").collect().map(_.getLong(0)).toSet
    assert(victimRows.nonEmpty && victimRows.forall(!afterIds.contains(_)),
      s"deleted positions still visible: ${victimRows & afterIds}")
    // time travel to the pre-delete snapshot still sees all 180
    assert(IcebergRead.scan(spark, dst, snapshotId = Some(beforeSnap)).count() == 180L)
    // the TVF serves the merge-on-read snapshot too
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$dst', $delSnap)")
      .collect().head.getLong(0) == 176L)

    // equality deletes refuse loudly (doctor the delete manifest's content)
    val metaDir = Paths.get(dst, "metadata")
    val s2 = Files.list(metaDir)
    val dm =
      try {
        import scala.jdk.CollectionConverters._
        s2.iterator().asScala.find(_.getFileName.toString.contains("-del-m0")).get
      } finally s2.close()
    // rewrite the avro with content=2 via the generic API
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      dm.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val entries = try { import scala.jdk.CollectionConverters._; reader.iterator().asScala.toVector } finally reader.close()
    val schema = entries.head.getSchema
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, dm.toFile)
    try entries.foreach { e =>
      e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        .asInstanceOf[org.apache.avro.generic.GenericData.Record].put("content", 2)
      w.append(e)
    } finally w.close()
    val eq = intercept[Exception](IcebergRead.scan(spark, dst).collect())
    assert(eq.getMessage.contains("equality delete"), eq.getMessage)
  }

  test("v2 equality deletes: tuples vanish under the strict sequence rule") {
    val (dst, _) = exported() // 180 rows, grp = id % 4
    assert(IcebergRead.scan(spark, dst).count() == 180L)
    val v = LakeExport.publishEqualityDeletes(spark, dst,
      Seq("grp"), Seq(1).toDF("grp"))
    val after = IcebergRead.scan(spark, dst)
    assert(after.filter(col("grp") === 1).count() == 0L,
      "every grp=1 tuple must be equality-deleted")
    assert(after.count() == 135L, s"180 - 45 grp=1 rows: ${after.count()}")
    // the TVF serves it, and snapshot time travel to pre-delete is intact
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$dst', $v)")
      .collect().head.getLong(0) == 135L)
    val firstSnap = IcebergRead.loadMetadata(dst).snapshots.head.id
    assert(IcebergRead.scan(spark, dst, snapshotId = Some(firstSnap)).count() == 180L)

    // the STRICT ordering rule: a delete whose sequence is NOT above the
    // data's (doctored 2 → 1, equal to the data files' sequence) deletes
    // NOTHING — data at-or-after the delete survives
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(dst, "metadata"))
    val dm =
      try s.iterator().asScala.find(_.getFileName.toString.contains("-del-m0")).get
      finally s.close()
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      dm.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val entries = try reader.iterator().asScala.toVector finally reader.close()
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](
        entries.head.getSchema))
    w.create(entries.head.getSchema, dm.toFile)
    try entries.foreach { e => e.put("sequence_number", 1L); w.append(e) }
    finally w.close()
    assert(IcebergRead.scan(spark, dst).count() == 180L,
      "an equal-sequence equality delete must not apply (strict less-than)")
  }

  test("partition-scoped equality delete applies ONLY inside its partition") {
    // grp = id % 4 → grp 1 holds ids 1,5,9,…; band = (id-1)/50 repeats the
    // SAME grp values across bands. Delete tuple grp-scoped: matching
    // values in other partitions must stay live (the Flink CDC shape the
    // spec's "same partition" rule exists for).
    val (dst, _) = exported(partitionBy = Seq("grp"))
    assert(IcebergRead.scan(spark, dst).count() == 180L)
    import spark.implicits._
    // equality columns (band): band=0 rows exist in EVERY grp partition
    val v = LakeExport.publishEqualityDeletes(spark, dst,
      Seq("band"), Seq(0).toDF("band"), scope = Seq("grp" -> Int.box(1)))
    val after = IcebergRead.scan(spark, dst)
    // in-scope: grp=1 ∧ band=0 rows gone
    assert(after.filter(col("grp") === 1 && col("band") === 0).count() == 0L,
      "scoped delete must clear the tuple inside its partition")
    // out-of-scope: band=0 rows in every OTHER grp survive untouched
    val outOfScope = after.filter(col("grp") =!= 1 && col("band") === 0).count()
    val expectedOut = (1 to 180).count(i => i % 4 != 1 && (i - 1) / 50 == 0)
    assert(outOfScope == expectedOut.toLong,
      s"out-of-partition tuples wrongly deleted: $outOfScope != $expectedOut")
    val inScope = (1 to 180).count(i => i % 4 == 1 && (i - 1) / 50 == 0)
    assert(after.count() == (180 - inScope).toLong)
    // the TVF serves the scoped snapshot too
    assert(spark.sql(s"SELECT count(*) FROM iceberg_scan('$dst', $v)")
      .collect().head.getLong(0) == (180 - inScope).toLong)
  }

  test("IcebergBucket matches the spec's published test vectors (Appendix B)") {
    import IcebergRead.IcebergBucket
    // the Iceberg spec's own hash examples — an oracle INDEPENDENT of this
    // implementation: int/long 34 → 2017239379, string "iceberg" →
    // 1210000089, date 2017-11-16 (epoch day 17486) → -653330422
    assert(IcebergBucket.hash(34) == 2017239379)
    assert(IcebergBucket.hash(34L) == 2017239379)
    assert(IcebergBucket.hash("iceberg") == 1210000089)
    assert(IcebergBucket.hash(java.time.LocalDate.ofEpochDay(17486L)) == -653330422)
    assert(IcebergBucket.bucket(34, 16) == 2017239379 % 16)
  }

  test("foreign bucket-partitioned table: equality predicate prunes to the matching files") {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import IcebergRead.IcebergBucket
    val dir = fresh("ib_bucket") + "/tbl"
    val metaDir = Paths.get(dir, "metadata")
    Files.createDirectories(metaDir)
    // four data files, one per bucket of bucket(4, id) — the layout a
    // foreign Flink/Spark-Iceberg writer produces
    import spark.implicits._
    val byBucket = (1L to 40L).groupBy(id => IcebergBucket.bucket(id, 4))
    assert(byBucket.size == 4, s"fixture must cover all 4 buckets: ${byBucket.keys}")
    val fileOf = byBucket.toSeq.sortBy(_._1).map { case (b, ids) =>
      val tmp = fresh("ib_bucket_w") + "/out"
      ids.map(i => (i, s"n_$i")).toDF("id", "name").coalesce(1).write.parquet(tmp)
      val part = {
        import scala.jdk.CollectionConverters._
        Files.list(Paths.get(tmp)).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
      }
      val name = s"b$b.parquet"
      Files.copy(part, Paths.get(dir, name))
      (b, name, ids.size.toLong)
    }
    // manifest: partition record {id_bucket: b} per entry
    val entrySchema = LakeExport.manifestEntrySchema(Seq(("id_bucket", "int", 1000)))
    val dfSchema = entrySchema.getField("data_file").schema()
    val manifestPath = metaDir.resolve("m0.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("format-version", "2")
    w.setMeta("content", "data")
    w.setMeta("partition-spec-id", "0")
    w.create(entrySchema, manifestPath.toFile)
    try fileOf.foreach { case (b, name, n) =>
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", s"$dir/$name")
      df.put("file_format", "PARQUET")
      val part = new GenericData.Record(dfSchema.getField("partition").schema())
      part.put("id_bucket", b)
      df.put("partition", part)
      df.put("record_count", n)
      df.put("file_size_in_bytes", Files.size(Paths.get(dir, name)))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("snapshot_id", 99L)
      e.put("sequence_number", 1L); e.put("file_sequence_number", 1L)
      e.put("data_file", df)
      w.append(e)
    } finally w.close()
    // manifest list + metadata json
    val listPath = metaDir.resolve("snap-99.avro")
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](LakeExport.manifestFileSchema))
    lw.setMeta("format-version", "2")
    lw.create(LakeExport.manifestFileSchema, listPath.toFile)
    try {
      val mf = new GenericData.Record(LakeExport.manifestFileSchema)
      mf.put("manifest_path", manifestPath.toString)
      mf.put("manifest_length", Files.size(manifestPath))
      mf.put("partition_spec_id", 0); mf.put("content", 0)
      mf.put("sequence_number", 1L); mf.put("min_sequence_number", 1L)
      mf.put("added_snapshot_id", 99L)
      mf.put("added_files_count", 4); mf.put("existing_files_count", 0)
      mf.put("deleted_files_count", 0)
      mf.put("added_rows_count", 40L); mf.put("existing_rows_count", 0L)
      mf.put("deleted_rows_count", 0L)
      lw.append(mf)
    } finally lw.close()
    val metadata =
      s"""{"format-version":2,"table-uuid":"t","location":"$dir",
         |"last-sequence-number":1,"last-updated-ms":1,"last-column-id":2,
         |"current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"name","required":false,"type":"string"}]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[
         |{"name":"id_bucket","transform":"bucket[4]","source-id":1,"field-id":1000}]}],
         |"current-snapshot-id":99,
         |"snapshots":[{"snapshot-id":99,"timestamp-ms":1,"sequence-number":1,
         |"manifest-list":"$listPath","summary":{"operation":"append"}}],
         |"snapshot-log":[{"timestamp-ms":1,"snapshot-id":99}]}""".stripMargin
    Files.write(metaDir.resolve("v1.metadata.json"),
      metadata.getBytes("UTF-8"))
    Files.write(metaDir.resolve("version-hint.text"), "1".getBytes("UTF-8"))

    // the table reads whole
    assert(IcebergRead.scan(spark, dir).count() == 40L)
    // equality on the bucketed source column prunes to ONE file via the
    // ICEBERG hash (Spark's own hash() would pick the wrong bucket)
    val (pruned, kept, total) = IcebergRead.scanPruned(spark, dir, "id",
      Some(34L), Some(34L))
    assert(total == 4 && kept == 1, s"kept $kept of $total")
    val rows = pruned.filter(col("id") === 34L).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "n_34")
    // a range predicate cannot prune through bucket (non-monotonic): all
    // files survive, values unchanged
    val (allF, keptR, totalR) = IcebergRead.scanPruned(spark, dir, "id",
      Some(10L), Some(20L))
    assert(keptR == totalR)
    assert(allF.filter(col("id").between(10, 20)).count() == 11L)
  }

  test("non-identity partition-scoped equality delete is refused, not applied table-wide") {
    val (dst, _) = exported(partitionBy = Seq("grp"))
    import spark.implicits._
    LakeExport.publishEqualityDeletes(spark, dst,
      Seq("band"), Seq(0).toDF("band"), scope = Seq("grp" -> Int.box(1)))
    // doctor the delete manifest's spec metadata: identity → bucket[4]
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(dst, "metadata"))
    val dm =
      try s.iterator().asScala.find(_.getFileName.toString.contains("-del-m0")).get
      finally s.close()
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      dm.toFile, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val (entries, specMeta) =
      try (reader.iterator().asScala.toVector, reader.getMetaString("partition-spec"))
      finally reader.close()
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](
        entries.head.getSchema))
    w.setMeta("format-version", "2")
    w.setMeta("content", "deletes")
    w.setMeta("partition-spec", specMeta.replace("\"identity\"", "\"bucket[4]\""))
    w.setMeta("partition-spec-id", "0")
    w.create(entries.head.getSchema, dm.toFile)
    try entries.foreach(w.append) finally w.close()
    val e = intercept[Exception](IcebergRead.scan(spark, dst).collect())
    assert(e.getMessage.contains("non-identity transform"), e.getMessage)
  }
}
