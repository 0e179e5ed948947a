package graft.sources

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** EXPORT LAKE interop tree: plain-parquet round trip, Iceberg v2 metadata
  * self-consistency (no Iceberg runtime exists in this sandbox, so the
  * avro manifests are re-read with the Avro reader and checked against
  * the data — paths, record counts, value bounds, field-id props). */
class LakeExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def buildSource(): (String, SnapshotTable) = {
    val dir = fresh("lake_exp_src")
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i % 5, i * 1.5)).toDF("id", "name", "grp", "score")
    val t = SnapshotTable.create(spark, dir, df)
    t.deleteWhere(col("id") > 90) // snapshot ≠ naive write
    (dir, t)
  }

  test("plain spark.read round trip equals the snapshot (unpartitioned)") {
    val (src, t) = buildSource()
    val dst = fresh("lake_exp_dst") + "/tree"
    val res = LakeExport.exportTo(spark, src, dst)
    assert(res.nRows == 90L)
    val back = spark.read.parquet(s"$dst/data")
      .select("id", "name", "grp", "score").orderBy("id").collect().toSeq
    val want = t.read().select("id", "name", "grp", "score").orderBy("id").collect().toSeq
    assert(back == want)
    assert(Files.exists(Paths.get(dst, "_graft_export.json")))
  }

  test("partitioned export: hive layout readable + identity spec recorded") {
    val (src, t) = buildSource()
    val dst = fresh("lake_exp_dst") + "/tree"
    spark.sql(s"EXPORT LAKE '$src' TO '$dst' PARTITION BY (grp)")
    val sub = Files.list(Paths.get(dst, "data")).iterator.asScala
      .map(_.getFileName.toString).filter(_.startsWith("grp=")).toSeq
    assert(sub.sorted == (0 to 4).map(i => s"grp=$i"))
    val back = spark.read.parquet(s"$dst/data")
      .select("id", "name", "grp", "score").orderBy("id")
      .as[(Long, String, Int, Double)].collect().toSeq
    val want = t.read().select("id", "name", "grp", "score").orderBy("id")
      .as[(Long, String, Int, Double)].collect().toSeq
    assert(back == want)
    val meta = new String(Files.readAllBytes(
      Paths.get(dst, "metadata", "v1.metadata.json")), "UTF-8")
    assert(meta.contains("\"transform\":\"identity\""))
    assert(meta.contains("\"name\":\"grp\""))
  }

  test("manifests: record counts, file paths, and long bounds match the data") {
    val (src, t) = buildSource()
    val dst = fresh("lake_exp_dst") + "/tree"
    val res = LakeExport.exportTo(spark, src, dst)
    val entries = LakeExport.readManifests(dst)
    assert(entries.map(_._2).sum == res.nRows)
    entries.foreach { case (p, _, _, _) => assert(Files.exists(Paths.get(p)), p) }
    // field id 1 == `id` (first column): global min/max across files from
    // the 8-byte little-endian long bounds must equal the snapshot's
    def longOf(b: Array[Byte]): Long =
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
    val lows = entries.flatMap(_._3.get(1)).map(longOf)
    val highs = entries.flatMap(_._4.get(1)).map(longOf)
    assert(lows.nonEmpty && highs.nonEmpty)
    assert(lows.min == 1L && highs.max == 90L)
  }

  test("metadata.json: v2 shape, name mapping, snapshot resolves to manifest list") {
    val (src, _) = buildSource()
    val dst = fresh("lake_exp_dst") + "/tree"
    LakeExport.exportTo(spark, src, dst)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = om.readTree(Files.readAllBytes(Paths.get(dst, "metadata", "v1.metadata.json")))
    assert(m.get("format-version").asInt == 2)
    assert(m.get("schemas").get(0).get("fields").size == 4)
    assert(m.get("current-snapshot-id").asLong ==
      m.get("snapshots").get(0).get("snapshot-id").asLong)
    val listPath = m.get("snapshots").get(0).get("manifest-list").asText
    assert(Files.exists(Paths.get(listPath)))
    val nm = om.readTree(
      m.get("properties").get("schema.name-mapping.default").asText)
    assert(nm.size == 4 && nm.get(0).get("names").get(0).asText == "id")
    // avro schema carries Iceberg field-id props
    val manifest = LakeExport.readManifests(dst)
    assert(manifest.nonEmpty)
  }

  test("export refuses a non-empty target and time-travels with VERSION AS OF") {
    val (src, t) = buildSource()
    val dst = fresh("lake_exp_dst") + "/tree"
    LakeExport.exportTo(spark, src, dst)
    intercept[IllegalArgumentException] {
      LakeExport.exportTo(spark, src, dst)
    }
    // version 1 = pre-DELETE snapshot (100 rows)
    val dst2 = fresh("lake_exp_dst") + "/tree"
    val r = spark.sql(s"EXPORT LAKE '$src' TO '$dst2' VERSION AS OF 1").collect()
    assert(r.head.getString(2) == "100")
    assert(spark.read.parquet(s"$dst2/data").count() == 100L)
  }

  test("long-string bounds: truncated upper rounds UP, pruning never loses rows") {
    import spark.implicits._
    val src = fresh("lake_exp_strb")
    // 20-char strings: the 16-char truncation point sits INSIDE the value,
    // so a naive prefix upper ("aaaaaaaaaaaaaaaa") would sort BELOW the
    // data and bounds pruning would drop the file
    val df = (1 to 40).map(i => (i.toLong, f"aaaaaaaaaaaaaaaaz$i%03d"))
      .toDF("id", "s")
    SnapshotTable.create(spark, src, df)
    val dst = fresh("lake_exp_strb_dst") + "/tree"
    LakeExport.exportTo(spark, src, dst)
    // the exported upper bound for s must be STRICTLY ABOVE every value
    val meta = IcebergRead.loadMetadata(dst)
    val sId = meta.fieldIdOf("s")
    IcebergRead.dataFiles(meta).foreach { f =>
      val upper = new String(f.upper(sId), "UTF-8")
      assert(upper > "aaaaaaaaaaaaaaaaz999",
        s"upper bound '$upper' must round UP past the data")
      val lower = new String(f.lower(sId), "UTF-8")
      assert(lower <= "aaaaaaaaaaaaaaaaz001", s"lower '$lower' must not exceed data")
    }
    // and a bounds-pruned scan over the truncation region keeps the rows
    val (pruned, kept, total) = IcebergRead.scanPruned(spark, dst, "s",
      Some("aaaaaaaaaaaaaaaaz005"), Some("aaaaaaaaaaaaaaaaz010"))
    assert(kept == total, "files holding matching rows must survive pruning")
    assert(pruned.filter(col("s").between("aaaaaaaaaaaaaaaaz005", "aaaaaaaaaaaaaaaaz010"))
      .count() == 6L)
  }

  test("truncated upper bound at U+D7FF skips the surrogate range (U+E000, never '?')") {
    import spark.implicits._
    val src = fresh("lake_exp_surr")
    // 16th code point is U+D7FF: a naive +1 lands on the unpaired
    // surrogate U+D800, which UTF-8-encodes as '?' (0x3F) — an upper
    // bound BELOW the data. The spec rounding jumps to U+E000.
    val base = "a" * 15 + "\uD7FF"
    val df = (1 to 20).map(i => (i.toLong, base + f"z$i%03d")).toDF("id", "s")
    SnapshotTable.create(spark, src, df)
    val dst = fresh("lake_exp_surr_dst") + "/tree"
    LakeExport.exportTo(spark, src, dst)
    val meta = IcebergRead.loadMetadata(dst)
    val sId = meta.fieldIdOf("s")
    IcebergRead.dataFiles(meta).foreach { f =>
      val upper = new String(f.upper(sId), "UTF-8")
      assert(upper == "a" * 15 + "\uE000",
        s"expected U+E000 bump, got ${upper.map(c => f"U+${c.toInt}%04X").mkString(",")}")
      assert(upper > base + "z999", "bound must sort above every value")
    }
    val (pruned, kept, total) = IcebergRead.scanPruned(spark, dst, "s",
      Some(base + "z005"), Some(base + "z010"))
    assert(kept == total, "files holding matching rows must survive pruning")
    assert(pruned.filter(col("s").between(base + "z005", base + "z010"))
      .count() == 6L)
  }
}
