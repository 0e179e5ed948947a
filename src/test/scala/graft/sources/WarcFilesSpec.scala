package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WARC/WET web-archive source: round trip through the distributed writer
  * and streaming reader (ISO 28500 container; gzip member per record —
  * the Common-Crawl layout), HTTP response parsing, header folding,
  * loud truncation, and file-level parallelism. */
class WarcFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("WET round trip: fields, unicode, CRLFs in text, empty text, deterministic ids") {
    import spark.implicits._
    val dir = tmpDir("warc_rt")
    val docs = Seq(
      ("https://a.example/1", "plain ascii text"),
      ("https://a.example/2", "uni é中文 😀 code"),
      ("https://a.example/3", "body with\r\n\r\nblank lines\nand LFs"),
      ("https://a.example/4", "")).toDF("target_uri", "text")
    WarcFiles.write(docs.repartition(1), dir)
    val back = WarcFiles.read(spark, dir).orderBy("target_uri")
    val rows = back.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("warc_type") == "conversion"))
    assert(rows.forall(_.getAs[String]("warc_date") == "2024-01-01T00:00:00Z"))
    assert(rows.forall(_.getAs[String]("content_type") == "text/plain"))
    // content_length is the UTF-8 byte length, not the char count
    val uni = rows(1)
    assert(uni.getAs[Long]("content_length") ==
      "uni é中文 😀 code".getBytes("UTF-8").length.toLong)
    val text = WarcFiles.readText(spark, dir).orderBy("target_uri")
      .select("target_uri", "text").as[(String, String)].collect()
    assert(text.toSeq == Seq(
      ("https://a.example/1", "plain ascii text"),
      ("https://a.example/2", "uni é中文 😀 code"),
      ("https://a.example/3", "body with\r\n\r\nblank lines\nand LFs"),
      ("https://a.example/4", "")))
    // deterministic record ids: a second export is byte-identical content
    val ids1 = rows.map(_.getAs[String]("record_id")).toSeq
    val dir2 = tmpDir("warc_rt2")
    WarcFiles.write(docs.repartition(1), dir2)
    val ids2 = WarcFiles.read(spark, dir2).orderBy("target_uri")
      .collect().map(_.getAs[String]("record_id")).toSeq
    assert(ids1 == ids2)
    assert(ids1.distinct.length == 4)
  }

  test("one gzip member per record (Common-Crawl layout)") {
    import spark.implicits._
    val dir = tmpDir("warc_members")
    val docs = Seq(
      ("https://m.example/1", "first record"),
      ("https://m.example/2", "second record"),
      ("https://m.example/3", "third record")).toDF("target_uri", "text")
    WarcFiles.write(docs.repartition(1), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 1)
    val bytes = Files.readAllBytes(files(0).toPath)
    // java's GZIPOutputStream member header is the fixed 10 bytes
    // 1f 8b 08 00 00 00 00 00 00 ff (no flags/mtime, OS=unknown) —
    // count member starts
    val magic = Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08, 0, 0, 0, 0, 0, 0, 0xff.toByte)
    val members = bytes.indices.count(i =>
      i + magic.length <= bytes.length && magic.indices.forall(j => bytes(i + j) == magic(j)))
    assert(members == 3, s"expected 3 gzip members, found $members")
  }

  test("HTTP view: status, reason-less parse, case-insensitive content-type, body split") {
    import spark.implicits._
    val dir = tmpDir("warc_http")
    val mk = (uri: String, msg: String) => (uri, msg.getBytes("UTF-8"))
    val docs = Seq(
      mk("https://h.example/ok",
        "HTTP/1.1 200 OK\r\ncontent-TYPE: text/html; charset=UTF-8\r\nServer: x\r\n\r\n<html>body</html>"),
      mk("https://h.example/nf",
        "HTTP/1.0 404 Not Found\r\nContent-Type: text/plain\r\n\r\nmissing"),
      // LF-only message, body containing a blank line
      mk("https://h.example/lf",
        "HTTP/1.1 200 OK\nContent-Type: a/b\n\nline1\n\nline2"),
      // headers only, no body separator
      mk("https://h.example/nobody", "HTTP/1.1 204 No Content\r\nContent-Type: a/c"))
      .toDF("target_uri", "payload")
    WarcFiles.write(docs.repartition(1), dir, warcType = "response")
    val back = WarcFiles.readHttp(spark, dir)
      .select(col("target_uri"), col("http_status"), col("http_content_type"),
        decode(col("body"), "UTF-8").as("body_text"))
      .as[(String, Integer, String, String)].collect().sortBy(_._1)
    assert(back.toSeq == Seq(
      ("https://h.example/lf", Integer.valueOf(200), "a/b", "line1\n\nline2"),
      ("https://h.example/nf", Integer.valueOf(404), "text/plain", "missing"),
      ("https://h.example/nobody", Integer.valueOf(204), "a/c", ""),
      ("https://h.example/ok", Integer.valueOf(200), "text/html; charset=UTF-8",
        "<html>body</html>")))
  }

  test("non-HTTP response payload parses to null status with payload as body") {
    val (status, ctype, body) = WarcFiles.parseHttp("not http at all".getBytes("UTF-8"))
    assert(status == null && ctype == null)
    assert(new String(body, "UTF-8") == "not http at all")
  }

  test("uncompressed .warc with folded header and LF-only line endings") {
    val dir = tmpDir("warc_raw")
    val payload = "hello folded world"
    val raw = "WARC/1.1\n" +
      "WARC-Type: conversion\n" +
      "WARC-Record-ID: <urn:uuid:0>\n" +
      "WARC-Target-URI: https://f.example/\n" +
      " continued-uri-part\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\n" +
      "\n" + payload + "\n\n"
    Files.write(Paths.get(dir, "one.warc"), raw.getBytes("UTF-8"))
    val rows = WarcFiles.read(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("target_uri") == "https://f.example/ continued-uri-part")
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), "UTF-8") == payload)
  }

  private def chainMentions(e: Throwable, needle: String): Boolean = {
    var t: Throwable = e
    while (t != null) {
      if (t.getMessage != null && t.getMessage.contains(needle)) return true
      t = t.getCause
    }
    false
  }

  test("truncated payload fails loudly, garbage leader fails loudly") {
    val dir = tmpDir("warc_bad")
    Files.write(Paths.get(dir, "trunc.warc"),
      "WARC/1.0\nWARC-Type: conversion\nContent-Length: 100\n\nshort".getBytes("UTF-8"))
    val e1 = intercept[Exception] { WarcFiles.read(spark, dir).count() }
    assert(chainMentions(e1, "truncated"), s"unexpected: $e1")
    val dir2 = tmpDir("warc_bad2")
    Files.write(Paths.get(dir2, "junk.warc"), "this is not a warc\n".getBytes("UTF-8"))
    val e2 = intercept[Exception] { WarcFiles.read(spark, dir2).count() }
    assert(chainMentions(e2, "WARC/1.x"), s"unexpected: $e2")
  }

  test("malformed Content-Length fails with file context; record cap enforced") {
    // negative / non-numeric lengths must raise the reader's descriptive
    // error (naming the file), not a bare NumberFormat/NegativeArraySize
    val dir = tmpDir("warc_len")
    Files.write(Paths.get(dir, "neg.warc"),
      "WARC/1.0\nWARC-Type: conversion\nContent-Length: -7\n\n".getBytes("UTF-8"))
    val e1 = intercept[Exception] { WarcFiles.read(spark, dir).count() }
    assert(chainMentions(e1, "negative Content-Length") &&
      chainMentions(e1, "neg.warc"), s"unexpected: $e1")
    val dir2 = tmpDir("warc_len2")
    Files.write(Paths.get(dir2, "nan.warc"),
      "WARC/1.0\nWARC-Type: conversion\nContent-Length: lots\n\n".getBytes("UTF-8"))
    val e2 = intercept[Exception] { WarcFiles.read(spark, dir2).count() }
    assert(chainMentions(e2, "malformed Content-Length") &&
      chainMentions(e2, "nan.warc"), s"unexpected: $e2")
    // configurable per-record allocation cap
    val dir3 = tmpDir("warc_len3")
    Files.write(Paths.get(dir3, "big.warc"),
      "WARC/1.0\nWARC-Type: conversion\nContent-Length: 1000\n\n".getBytes("UTF-8"))
    spark.conf.set("spark.graft.warc.maxRecordBytes", "100")
    try {
      val e3 = intercept[Exception] { WarcFiles.read(spark, dir3).count() }
      assert(chainMentions(e3, "maxRecordBytes"), s"unexpected: $e3")
    } finally spark.conf.unset("spark.graft.warc.maxRecordBytes")
  }

  test("warc_scan type filter and warc_http_text charset-aware decode") {
    import spark.implicits._
    val dir = tmpDir("warc_types")
    // mixed record types in one directory: a WET conversion archive plus
    // a raw response archive (one page deliberately ISO-8859-1)
    WarcFiles.write(Seq(("https://t.example/wet", "extracted text"))
      .toDF("target_uri", "text").repartition(1), dir)
    val latin = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n"
      .getBytes("UTF-8") ++ "<p>café</p>".getBytes("ISO-8859-1")
    val utf8 = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
      .getBytes("UTF-8") ++ "<p>中文</p>".getBytes("UTF-8")
    WarcFiles.write(Seq(
      ("https://t.example/l1", latin), ("https://t.example/u8", utf8))
      .toDF("target_uri", "payload").repartition(1), dir, warcType = "response")
    // optional second arg filters by WARC record type
    assert(spark.sql(s"SELECT count(*) AS n FROM warc_scan('$dir', 'response')")
      .head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) AS n FROM warc_scan('$dir', 'conversion')")
      .head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM warc_scan('$dir', 'warcinfo')")
      .head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) AS n FROM warc_scan('$dir')")
      .head().getLong(0) == 3L)
    // charset-aware body decode: the DECLARED charset drives it; absent
    // charset falls back to UTF-8
    val decoded = spark.sql(
        s"SELECT target_uri, html FROM warc_http_text('$dir')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(decoded("https://t.example/l1") == "<p>café</p>")
    assert(decoded("https://t.example/u8") == "<p>中文</p>")
  }

  test("SQL surface: warc_scan / warc_text / warc_http table functions") {
    import spark.implicits._
    val dir = tmpDir("warc_tvf")
    WarcFiles.write(Seq(
      ("https://t.example/1", "tvf one"),
      ("https://t.example/2", "tvf two")).toDF("target_uri", "text").repartition(1), dir)
    val httpDir = tmpDir("warc_tvf_http")
    WarcFiles.write(Seq(
      ("https://t.example/h", "HTTP/1.1 200 OK\r\nContent-Type: a/b\r\n\r\nbody".getBytes("UTF-8")))
      .toDF("target_uri", "payload").repartition(1), httpDir, warcType = "response")
    assert(spark.sql(s"SELECT count(*) FROM warc_scan('$dir')").head().getLong(0) == 2)
    val texts = spark.sql(
      s"SELECT text FROM warc_text('$dir') ORDER BY target_uri")
      .collect().map(_.getString(0)).toSeq
    assert(texts == Seq("tvf one", "tvf two"))
    val http = spark.sql(
      s"SELECT http_status, http_content_type FROM warc_http('$httpDir')").collect()
    assert(http.length == 1 && http(0).getInt(0) == 200 && http(0).getString(1) == "a/b")
    val e = intercept[Exception] { spark.sql("SELECT * FROM warc_scan(42)").collect() }
    assert(e.getMessage.contains("warc_scan") || chainMentions(e, "warc_scan"))
  }

  test("scale tier: 60k records / 8 files stream through with bounded memory shape") {
    assume(sys.props.get("graft.scale").contains("1"), "opt-in: run with -Dgraft.scale=1")
    import spark.implicits._
    val dir = tmpDir("warc_scale")
    val n = 60000
    // deterministic ~200-char docs; one task per file on write and read
    val docs = spark.range(n)
      .select(concat(lit("https://s.example/"), col("id")).as("target_uri"),
        concat(lit("document body "),
          expr("repeat(substring(md5(cast(id AS string)), 1, 16), 12)")).as("text"))
    WarcFiles.write(docs.repartition(8), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.gz")) == 8)
    val back = WarcFiles.read(spark, dir)
    // the scan is 8 file-tasks; records stream record-by-record (payload
    // buffer per record, never per file)
    assert(back.rdd.getNumPartitions == math.min(8, spark.sparkContext.defaultParallelism))
    assert(back.count() == n)
    // selective projection composes; content lengths match the generator
    val lens = WarcFiles.readText(spark, dir)
      .select(length(col("text")).as("l")).distinct().as[Int].collect()
    assert(lens.toSeq == Seq("document body ".length + 16 * 12))
  }

  test("files are the parallelism unit; multi-file read unions all records") {
    import spark.implicits._
    val dir = tmpDir("warc_par")
    val docs = (0 until 40)
      .map(i => (s"https://p.example/$i", s"doc $i")).toDF("target_uri", "text")
    WarcFiles.write(docs.repartition(4), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.gz")) == 4)
    val back = WarcFiles.read(spark, dir)
    assert(back.count() == 40)
    assert(back.rdd.getNumPartitions == math.min(4, spark.sparkContext.defaultParallelism))
    // filter composes above the scan
    assert(WarcFiles.readText(spark, dir)
      .filter(col("text").endsWith("7")).count() == 4)
  }
}
