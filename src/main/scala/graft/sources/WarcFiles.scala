package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC / WET web-archive source — the ingestion head of a web-scale
  * training-data pipeline. Common Crawl (the dominant public corpus for
  * LLM pretraining) ships as WARC (ISO 28500: raw HTTP captures) and WET
  * (the same container with `WARC-Type: conversion` records holding
  * extracted plain text); this reader turns either into a DataFrame that
  * feeds the rest of the pipeline (html_to_text, quality scoring, dedup).
  * The reference engine has no web-archive plugin — this is one of the
  * beyond-the-reference LLM-pipeline sources the build mandates.
  *
  * Spark-first shape, same contract as the easy-format readers
  * ([[ArrowFiles]], [[ExcelFiles]]): the driver lists file NAMES once, the
  * path list is distributed, and each task streams its files record by
  * record. Unlike the Arrow reader (whole-file buffer — IPC needs a
  * seekable footer), WARC is a strictly sequential format, so the task
  * reads through a bounded 64 KiB buffer and holds ONE record's payload at
  * a time: task memory is O(largest record), never O(file), which is what
  * lets a 1 GiB Common-Crawl segment file stream through a 4 GiB executor.
  * Files are the parallelism unit — `.warc.gz` members are back-to-back
  * gzip streams with no external index, so a single file is unsplittable
  * (exactly how Common Crawl is consumed: thousands of ~1 GiB segment
  * files, one task each). No pushdown into the container; Spark
  * prunes/filters the produced rows in the plan above.
  *
  * Format notes (ISO 28500 / WARC 1.1):
  *  - record = version line `WARC/1.x`, named headers, blank line,
  *    `Content-Length` bytes of payload, two blank lines;
  *  - header lines fold: a continuation line starts with SP or HT;
  *  - `.gz` files hold one gzip MEMBER per record, concatenated —
  *    `java.util.zip.GZIPInputStream` walks concatenated members natively;
  *  - `response` payloads are full HTTP messages (status line + headers +
  *    CRLFCRLF + body); `conversion` (WET) payloads are plain UTF-8 text.
  */
object WarcFiles {

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** HTTP view of `response` records: status/content-type parsed out of the
    * payload's HTTP envelope, `body` the bytes after the header block. */
  val httpSchema: StructType = StructType(schema.fields.toSeq ++ Seq(
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))

  private def listWarcFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stat = fs.getFileStatus(path)
    val files =
      if (stat.isDirectory) fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(path)
    files.map(_.toString)
      .filter { p =>
        val n = p.substring(p.lastIndexOf('/') + 1)
        !n.startsWith(".") && !n.startsWith("_") &&
          (n.endsWith(".warc") || n.endsWith(".wet") ||
            n.endsWith(".warc.gz") || n.endsWith(".wet.gz"))
      }.sorted
  }

  /** The WET text view's schema — the fixed shape `readText` produces
    * (and the one a FORMAT WARC pipe must declare). */
  val textSchema: StructType = StructType(Seq(
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Per-record allocation cap (`spark.graft.warc.maxRecordBytes`): a
    * malformed or hostile Content-Length must not be able to demand a
    * multi-GiB byte[] in one task. Default = the row-limit bound. */
  private def maxRecordBytes(spark: SparkSession): Long =
    spark.conf.get("spark.graft.warc.maxRecordBytes",
      (Int.MaxValue - 8).toString).toLong

  /** All records of the given WARC/WET files (one task per file). */
  def readFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "no warc/wet files to read")
    import spark.implicits._
    val parallelism = math.min(math.max(files.size, 1),
      spark.sparkContext.defaultParallelism)
    // ship the SESSION Hadoop conf into the tasks: an executor-side bare
    // Configuration() would drop spark.hadoop.* (object-store creds,
    // defaultFS) and open the wrong FileSystem on any non-local scheme
    val hconf = org.apache.spark.sql.graft.Bridge.serializableHadoopConf(spark)
    val maxLen = maxRecordBytes(spark)
    spark.createDataset(files).repartition(parallelism)
      .mapPartitions(paths => paths.flatMap(p =>
        fileRecords(p, hconf.value, maxLen)))(Encoders.row(schema))
  }

  /** All records of all WARC/WET files under `dir`. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = listWarcFiles(spark, dir)
    require(files.nonEmpty, s"no warc/wet files under $dir")
    readFiles(spark, files)
  }

  private def textView(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    records
      .filter(col("warc_type").isin("conversion", "resource"))
      .select(col("target_uri"), col("warc_date"),
        decode(col("payload"), "UTF-8").as("text"))
  }

  /** WET text view: `conversion`/`resource` records with their payload
    * decoded as UTF-8 — (target_uri, warc_date, text). */
  def readText(spark: SparkSession, dir: String): DataFrame =
    textView(read(spark, dir))

  /** WET text view over an explicit file list (the notified-pipe path:
    * load exactly the event-named archives, no directory listing). */
  def readTextFiles(spark: SparkSession, files: Seq[String]): DataFrame =
    textView(readFiles(spark, files))

  /** The HTTP TEXT view's schema: `response` records with the body decoded
    * under its DECLARED charset — the raw-crawl input shape for
    * `html_to_text` (the WET path, [[textSchema]], is what Common Crawl
    * pre-extracts; real raw archives carry HTTP responses). */
  val httpTextSchema: StructType = StructType(Seq(
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("html", StringType, nullable = true)))

  /** Which fixed WARC view a declared pipe schema selects — Some("wet")
    * (pre-extracted text, [[textSchema]]) or Some("http") (charset-decoded
    * responses, [[httpTextSchema]]) by (name, type) shape; None otherwise.
    * The CREATE PIPE gate and the trigger-time reader BOTH resolve through
    * here, so the two sites can never drift. */
  def viewFor(s: StructType): Option[String] = {
    def shape(t: StructType) = t.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq
    if (shape(s) == shape(textSchema)) Some("wet")
    else if (shape(s) == shape(httpTextSchema)) Some("http")
    else None
  }

  /** Charset from a Content-Type header ("text/html; charset=ISO-8859-1");
    * absent or unknown names fall back to UTF-8 — real crawls lie. */
  private[sources] def charsetOf(contentType: String): java.nio.charset.Charset = {
    val fallback = java.nio.charset.StandardCharsets.UTF_8
    if (contentType == null) fallback
    else "(?i)charset=\"?([A-Za-z0-9_\\-:.]+)\"?".r.findFirstMatchIn(contentType)
      .map(_.group(1))
      .flatMap(n => try Some(java.nio.charset.Charset.forName(n))
                    catch { case _: Exception => None })
      .getOrElse(fallback)
  }

  /** Decode an HTTP body under its declared charset. Malformed or
    * unmappable bytes become U+FFFD, never a throw — a single mislabeled
    * page must not kill a corpus-wide task. */
  private[sources] def decodeBody(body: Array[Byte], contentType: String): String =
    if (body == null) null
    else charsetOf(contentType).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      .decode(java.nio.ByteBuffer.wrap(body)).toString

  /** Charset-decoded HTTP text view over an explicit file list (the
    * notified-pipe path for RAW crawl archives — land HTML, extract with
    * html_to_text downstream). Decode rides the same streaming pass. */
  def readHttpTextFiles(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "no warc files to read")
    import spark.implicits._
    val parallelism = math.min(math.max(files.size, 1),
      spark.sparkContext.defaultParallelism)
    val hconf = org.apache.spark.sql.graft.Bridge.serializableHadoopConf(spark)
    val maxLen = maxRecordBytes(spark)
    spark.createDataset(files).repartition(parallelism)
      .mapPartitions(paths => paths.flatMap(p =>
        fileRecords(p, hconf.value, maxLen)
          .filter(_.getString(1) == "response").map { r =>
            val payload = r.get(7).asInstanceOf[Array[Byte]]
            val (status, ctype, body) = parseHttp(payload)
            Row(r.getString(3), r.getString(4), status, ctype,
              decodeBody(body, ctype))
          }))(Encoders.row(httpTextSchema))
  }

  /** Charset-decoded HTTP text view of all archives under `dir`. */
  def readHttpText(spark: SparkSession, dir: String): DataFrame = {
    val files = listWarcFiles(spark, dir)
    require(files.nonEmpty, s"no warc/wet files under $dir")
    readHttpTextFiles(spark, files)
  }

  /** HTTP view of `response` records (see [[httpSchema]]). Parsing happens
    * task-side inside the same streaming pass — no second read. */
  def readHttp(spark: SparkSession, dir: String): DataFrame = {
    val files = listWarcFiles(spark, dir)
    require(files.nonEmpty, s"no warc/wet files under $dir")
    import spark.implicits._
    val parallelism = math.min(math.max(files.size, 1),
      spark.sparkContext.defaultParallelism)
    val hconf = org.apache.spark.sql.graft.Bridge.serializableHadoopConf(spark)
    val maxLen = maxRecordBytes(spark)
    spark.createDataset(files).repartition(parallelism)
      .mapPartitions(paths => paths.flatMap(p =>
        fileRecords(p, hconf.value, maxLen).filter(_.getString(1) == "response").map { r =>
          val payload = r.get(7).asInstanceOf[Array[Byte]]
          val (status, ctype, body) = parseHttp(payload)
          Row.fromSeq(r.toSeq ++ Seq(status, ctype, body))
        }))(Encoders.row(httpSchema))
  }

  // ---------- streaming record parser ----------

  /** Lazy record iterator over one file; the stream closes at EOF, on any
    * parse error, and — via a task completion listener — when the task
    * abandons the iterator early (LIMIT/CollectLimit stops pulling), so
    * neither the file handle nor the gzip Inflater can outlive the task. */
  private def fileRecords(file: String,
                          conf: org.apache.hadoop.conf.Configuration,
                          maxLen: Long): Iterator[Row] = {
    val path = new org.apache.hadoop.fs.Path(file)
    val fs = path.getFileSystem(conf)
    val raw = fs.open(path)
    val in: InputStream =
      if (file.endsWith(".gz")) new GZIPInputStream(new BufferedInputStream(raw, 1 << 16), 1 << 16)
      else new BufferedInputStream(raw, 1 << 16)

    new Iterator[Row] {
      private var nextRow: Row = null
      private var done = false

      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ => closeQuietly() })

      private def closeQuietly(): Unit =
        if (!done) {
          done = true
          try in.close() catch { case _: Exception => () }
        }

      private def advance(): Unit = try advanceImpl() catch {
        case e: Throwable => closeQuietly(); throw e
      }

      private def advanceImpl(): Unit = {
        while (nextRow == null && !done) {
          // skip record separators / stray blank lines, find a version line
          var line = readLine(in)
          while (line != null && line.isEmpty) line = readLine(in)
          if (line == null) { done = true; in.close() }
          else if (!line.startsWith("WARC/")) {
            in.close()
            throw new IllegalArgumentException(
              s"$file: expected WARC/1.x version line, got '${line.take(40)}'")
          } else {
            // headers with ISO 28500 folding (SP/HT continuation lines)
            val headers = scala.collection.mutable.LinkedHashMap[String, String]()
            var lastKey: String = null
            var h = readLine(in)
            while (h != null && h.nonEmpty) {
              if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && lastKey != null) {
                headers(lastKey) = headers(lastKey) + " " + h.trim
              } else {
                val i = h.indexOf(':')
                require(i > 0, s"$file: malformed WARC header line '${h.take(40)}'")
                lastKey = h.substring(0, i).trim.toLowerCase
                headers(lastKey) = h.substring(i + 1).trim
              }
              h = readLine(in)
            }
            val lenStr = headers.getOrElse("content-length",
              throw new IllegalArgumentException(s"$file: record missing Content-Length"))
            val len =
              try lenStr.toLong
              catch { case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"$file: malformed Content-Length '${lenStr.take(40)}'")
              }
            require(len >= 0, s"$file: negative Content-Length $len")
            require(len <= Int.MaxValue - 8, s"$file: record of $len bytes exceeds the 2 GiB row limit")
            require(len <= maxLen,
              s"$file: record of $len bytes exceeds spark.graft.warc.maxRecordBytes=$maxLen")
            val payload = new Array[Byte](len.toInt)
            readFully(in, payload)
            nextRow = Row(file,
              headers.getOrElse("warc-type", null),
              headers.getOrElse("warc-record-id", null),
              headers.getOrElse("warc-target-uri", null),
              headers.getOrElse("warc-date", null),
              headers.getOrElse("content-type", null),
              len, payload)
          }
        }
      }

      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): Row = {
        advance()
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** One header line: bytes to LF, CR stripped, UTF-8 decode (WARC named
    * headers are ASCII; a URI carrying invalid UTF-8 high bytes decodes
    * those bytes to U+FFFD — headers are metadata, payload bytes are
    * untouched). Returns null at EOF. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
    new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) throw new EOFException(
        s"WARC payload truncated: got $off of ${buf.length} bytes")
      off += n
    }
  }

  /** (status, content-type, body) out of an HTTP response payload; nulls if
    * the payload is not an HTTP message. Tolerates LF-only messages. */
  private[sources] def parseHttp(payload: Array[Byte]): (Integer, String, Array[Byte]) = {
    if (payload == null) return (null, null, null)
    // header block = up to the first CRLFCRLF (or LFLF)
    var split = -1; var sepLen = 0
    var i = 0
    while (split < 0 && i < payload.length - 1) {
      if (payload(i) == '\n' &&
          (payload(i + 1) == '\n' ||
            (payload(i + 1) == '\r' && i + 2 < payload.length && payload(i + 2) == '\n'))) {
        split = i + 1; sepLen = if (payload(i + 1) == '\n') 1 else 2
      }
      i += 1
    }
    val headerEnd = if (split < 0) payload.length else split
    val head = new String(payload, 0, headerEnd, java.nio.charset.StandardCharsets.UTF_8)
    val lines = head.split("\r?\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return (null, null, payload)
    // tokenize on runs of spaces: real crawls carry double/trailing spaces
    // in status lines, and an empty token must yield null, not a throw
    val statusTok = lines(0).trim.split(" +", 3)
    val status: Integer =
      if (statusTok.length >= 2 && statusTok(1).nonEmpty &&
        statusTok(1).forall(_.isDigit)) Integer.valueOf(statusTok(1))
      else null
    val ctype = lines.drop(1)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim).orNull
    val body =
      if (split < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, headerEnd + sepLen, payload.length)
    (status, ctype, body)
  }

  // ---------- writer ----------

  /** Write `df` as WET-style WARC files: one `.warc.gz` per partition, each
    * record its own gzip member (the Common-Crawl layout — a downstream
    * member-aware reader can fan out records without decompressing
    * neighbors). Input columns: `target_uri` (string) plus either `text`
    * (string → UTF-8 payload) or `payload` (binary); optional `warc_date`
    * and `content_type` override the defaults. Record IDs are
    * deterministic (name-UUID of uri+date+length) so re-exports are
    * byte-identical — which is also what keeps the round-trip oracle and
    * digest pins meaningful.
    *
    * For `warcType="response"` the payload must already be a full HTTP
    * message; this writer never fabricates HTTP envelopes. */
  def write(df: DataFrame, dir: String, warcType: String = "conversion",
            defaultDate: String = "2024-01-01T00:00:00Z"): Unit = {
    val cols = df.columns.toSet
    require(cols.contains("target_uri"), "WARC writer needs a target_uri column")
    require(cols.contains("text") || cols.contains("payload"),
      "WARC writer needs a text (string) or payload (binary) column")
    val hasText = cols.contains("text")
    val hasDate = cols.contains("warc_date")
    val hasCtype = cols.contains("content_type")
    val defaultCtype = if (warcType == "response") "application/http; msgtype=response"
      else "text/plain"
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(dir))
    val schema = df.schema
    val uriIdx = schema.fieldIndex("target_uri")
    val bodyIdx = schema.fieldIndex(if (hasText) "text" else "payload")
    val dateIdx = if (hasDate) schema.fieldIndex("warc_date") else -1
    val ctypeIdx = if (hasCtype) schema.fieldIndex("content_type") else -1
    // session Hadoop conf shipped into the write tasks (see readFiles)
    val hconf = org.apache.spark.sql.graft.Bridge
      .serializableHadoopConf(df.sparkSession)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val path = new org.apache.hadoop.fs.Path(
          dir, s"part-${java.util.UUID.randomUUID()}.warc.gz")
        val fs = path.getFileSystem(hconf.value)
        val out = fs.create(path)
        try {
          while (rows.hasNext) {
            val r = rows.next()
            val uri = r.getString(uriIdx)
            val date = if (dateIdx >= 0 && !r.isNullAt(dateIdx)) r.getString(dateIdx)
              else defaultDate
            val ctype = if (ctypeIdx >= 0 && !r.isNullAt(ctypeIdx)) r.getString(ctypeIdx)
              else defaultCtype
            val payload: Array[Byte] =
              if (r.isNullAt(bodyIdx)) Array.emptyByteArray
              else if (hasText) r.getString(bodyIdx).getBytes(java.nio.charset.StandardCharsets.UTF_8)
              else r.get(bodyIdx).asInstanceOf[Array[Byte]]
            // content hash, not length: equal-length recaptures of the same
            // uri must not collide (ISO 28500 wants globally-unique ids)
            val payloadMd5 = java.security.MessageDigest.getInstance("MD5")
              .digest(payload).map("%02x".format(_)).mkString
            val rid = java.util.UUID.nameUUIDFromBytes(
              (s"$uri|$date|$payloadMd5").getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val header = new StringBuilder(192)
            header.append("WARC/1.0\r\n")
            header.append("WARC-Type: ").append(warcType).append("\r\n")
            header.append("WARC-Record-ID: <urn:uuid:").append(rid).append(">\r\n")
            header.append("WARC-Date: ").append(date).append("\r\n")
            if (uri != null) header.append("WARC-Target-URI: ").append(uri).append("\r\n")
            header.append("Content-Type: ").append(ctype).append("\r\n")
            header.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
            // one gzip member per record: finish() flushes the member
            // trailer without closing the file stream; end() releases the
            // native Deflater now instead of at GC (one per record)
            val gz = new GZIPOutputStream(out, 1 << 16) {
              override def close(): Unit = { finish(); `def`.end() }
            }
            gz.write(header.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            gz.write(payload)
            gz.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            gz.close()
          }
        } finally out.close()
      }
    }
  }
}
