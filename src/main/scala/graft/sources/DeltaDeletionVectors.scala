package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Delta Lake DELETION VECTORS (protocol §"Deletion Vectors" — the
  * merge-on-read row-removal mechanism delta-spark 2.4+/Databricks write):
  * an `add` action carries a descriptor `{storageType, pathOrInlineDv,
  * offset, sizeInBytes, cardinality}` naming a serialized
  * RoaringBitmapArray of deleted 0-based row indexes for that file.
  *
  * Everything here is the PUBLIC on-disk format, reimplemented without
  * delta or RoaringBitmap jars:
  *  - Z85 codec (ZeroMQ spec 32, referenced by the Delta protocol) for
  *    the UUID path encoding and inline vectors;
  *  - the "portable" RoaringBitmapArray layout: 4-byte LE magic
  *    1681511377, 8-byte LE bitmap count, then per 32-bit key bucket a
  *    4-byte LE key + a standard-format 32-bit RoaringBitmap
  *    (RoaringFormatSpec: cookies 12346/12347, array/bitmap/run
  *    containers);
  *  - the DV file framing: 1-byte format version, then per vector
  *    `<4-byte BE size><bitmap blob><4-byte BE CRC32-of-blob>`.
  *
  * The writer side ([[serialize]]/[[writeDvFile]]) emits array/bitmap
  * containers only (no run containers — always spec-valid), which is
  * what lets the interop specs build REAL DV tables with zero format
  * jars and round-trip them.
  */
object DeltaDeletionVectors {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Int], sizeInBytes: Int,
                              cardinality: Long)

  // ---- Z85 (ZeroMQ spec 32) -------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85: length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = Z85Decode(s.charAt(i + j).toInt)
        require(d >= 0, s"z85: invalid character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85: byte length not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = Z85Alphabet(((v % 85).toInt)); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  // ---- RoaringBitmapArray portable serialization -----------------------

  private val Magic = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Parse a portable RoaringBitmapArray blob into sorted row indexes. */
  def deserialize(blob: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"deletion vector: bad magic $magic (want $Magic)")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"deletion vector: bitmap count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var b = 0L
    while (b < nBitmaps) {
      val highKey = buf.getInt.toLong & 0xffffffffL
      readRoaring32(buf, v => out += (highKey << 32) | v)
      b += 1
    }
    out.toArray
  }

  /** One standard-format 32-bit RoaringBitmap, values emitted via `f`
    * as unsigned ints in a long. */
  private def readRoaring32(buf: ByteBuffer, f: Long => Unit): Unit = {
    val cookie = buf.getInt
    val hasRun = (cookie & 0xffff) == SerialCookie
    require(hasRun || cookie == SerialCookieNoRun,
      s"deletion vector: bad roaring cookie $cookie")
    val nContainers = if (hasRun) (cookie >>> 16) + 1 else buf.getInt
    val runFlags: Array[Byte] =
      if (hasRun) { val a = new Array[Byte]((nContainers + 7) / 8); buf.get(a); a }
      else Array.empty
    def isRun(i: Int): Boolean =
      hasRun && ((runFlags(i / 8) & (1 << (i % 8))) != 0)
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    // offsets header present when no-run format, or many containers
    if (!hasRun || nContainers >= NoOffsetThreshold) {
      var j = 0
      while (j < nContainers) { buf.getInt; j += 1 } // sequential parse — skip
    }
    i = 0
    while (i < nContainers) {
      val base = (keys(i).toLong << 16)
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xffff
          val len = buf.getShort & 0xffff // ADDITIONAL values after start
          var v = start
          while (v <= start + len) { f(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { f(base | (buf.getShort & 0xffff)); c += 1 }
      } else {
        // bitmap container: 1024 longs
        var w = 0
        while (w < 1024) {
          var word = buf.getLong
          while (word != 0) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            f(base | (w * 64 + bit))
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Serialize sorted distinct row indexes as a portable
    * RoaringBitmapArray blob (array/bitmap containers only). */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    require(sorted.forall(_ >= 0), "deletion vector: negative row index")
    val byHigh = sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def le64(v: Long): Unit = { le32((v & 0xffffffffL).toInt); le32((v >>> 32).toInt) }
    le32(Magic)
    le64(byHigh.size.toLong)
    byHigh.foreach { case (high, vals) =>
      le32(high.toInt)
      val containers = vals.map(v => (v & 0xffffffffL).toInt)
        .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      le32(SerialCookieNoRun)
      le32(containers.size)
      containers.foreach { case (k, vs) => le16(k); le16(vs.length - 1) }
      // offsets (always present in no-run format): from the start of this
      // bitmap's serialization (the cookie)
      var off = 4 + 4 + containers.size * 4 + containers.size * 4
      containers.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.length <= 4096) vs.length * 2 else 8192)
      }
      containers.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.foreach(v => le16(v & 0xffff))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xffff
            words(low / 64) |= (1L << (low % 64))
          }
          words.foreach(le64)
        }
      }
    }
    bos.toByteArray
  }

  // ---- DV file framing + descriptor resolution -------------------------

  /** Write a single-vector DV file; returns (descriptor-ready relative
    * path handling left to the caller, offset, sizeInBytes). */
  def writeDvFile(path: String, positions: Array[Long]): (Int, Int) = {
    val blob = serialize(positions)
    val crc = new java.util.zip.CRC32()
    crc.update(blob)
    val buf = ByteBuffer.allocate(1 + 4 + blob.length + 4).order(ByteOrder.BIG_ENDIAN)
    buf.put(1.toByte) // format version
    buf.putInt(blob.length)
    buf.put(blob)
    buf.putInt(crc.getValue.toInt)
    Files.write(Paths.get(path), buf.array())
    (1, blob.length) // offset of the size field, blob size
  }

  /** Deleted row indexes named by a descriptor. `tableDir` resolves
    * relative ("u") storage. */
  def positionsOf(tableDir: String, d: Descriptor): Array[Long] = {
    val blob: Array[Byte] = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv)
      case "u" | "p" =>
        val file =
          if (d.storageType == "p") d.pathOrInlineDv
          else {
            // "u": <optional random prefix><z85 of 16-byte uuid>; the file
            // is <table>/<prefix>/deletion_vector_<uuid>.bin
            val enc = d.pathOrInlineDv
            val z = enc.takeRight(20)
            val prefix = enc.dropRight(20)
            val bb = ByteBuffer.wrap(z85Decode(z))
            val uuid = new java.util.UUID(bb.getLong, bb.getLong)
            val name = s"deletion_vector_$uuid.bin"
            (if (prefix.nonEmpty) Paths.get(tableDir, prefix, name)
             else Paths.get(tableDir, name)).toString
          }
        val all = Files.readAllBytes(Paths.get(file))
        val off = d.offset.getOrElse(0)
        val bb = ByteBuffer.wrap(all, off, all.length - off).order(ByteOrder.BIG_ENDIAN)
        val size = bb.getInt
        require(size == d.sizeInBytes,
          s"deletion vector: size $size at offset $off != descriptor ${d.sizeInBytes}")
        val blob = new Array[Byte](size)
        bb.get(blob)
        val stored = bb.getInt
        val crc = new java.util.zip.CRC32(); crc.update(blob)
        require(stored == crc.getValue.toInt,
          "deletion vector: checksum mismatch — corrupt DV file")
        blob
      case other =>
        throw new IllegalArgumentException(s"deletion vector: unknown storageType '$other'")
    }
    val got = deserialize(blob)
    require(d.cardinality < 0 || got.length.toLong == d.cardinality,
      s"deletion vector: cardinality ${got.length} != descriptor ${d.cardinality}")
    got
  }
}
