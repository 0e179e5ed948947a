package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

/** Legacy .xls (BIFF8) parsing — the reference's second Excel dialect
  * (`exec/store/easy/excel/xls/`, `ExcelFormatPluginConfig.java:43`
  * `xls=true`) with ZERO dependencies: a .xls is an OLE2/CFB compound
  * file whose "Workbook" stream holds BIFF8 records. Both layers are
  * simple enough to read directly — CFB is a FAT of 512-byte sectors
  * (plus a mini-FAT for small streams), BIFF is [id:2][len:2][payload]
  * records. Only the record types that carry cell data are decoded
  * (SST/LABELSST/NUMBER/RK/MULRK/BOOLERR/LABEL/FORMULA-numeric,
  * MERGEDCELLS); everything else is skipped by length.
  *
  * Produces the same ragged `Seq[Array[String]]` rows as the xlsx path,
  * so [[ExcelFiles.read]] serves both dialects behind one format sniff. */
object XlsFiles {

  private val CfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(8).sameElements(CfbMagic)

  // ------------------------------------------------------------------- CFB

  /** Extract a named stream ("Workbook"/"Book") from a CFB container. */
  private[sources] def cfbStream(bytes: Array[Byte], names: Seq[String]): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(isCfb(bytes), "not an OLE2 compound file")
    val sectorSize = 1 << buf.getShort(30)
    val miniSectorSize = 1 << buf.getShort(32)
    val firstDirSector = buf.getInt(48)
    val miniCutoff = buf.getInt(56)
    val firstMiniFatSector = buf.getInt(60)
    val numMiniFat = buf.getInt(64)
    val firstDifatSector = buf.getInt(68)
    val numDifat = buf.getInt(72)

    def sectorAt(id: Int): Int = 512 + id * sectorSize

    // DIFAT: first 109 FAT sector ids in the header, rest in DIFAT sectors
    val fatSectors = mutable.ArrayBuffer[Int]()
    for (i <- 0 until 109) {
      val v = buf.getInt(76 + i * 4)
      if (v >= 0) fatSectors += v
    }
    var difat = firstDifatSector
    var difatLeft = numDifat
    while (difat >= 0 && difatLeft > 0) {
      val base = sectorAt(difat)
      for (i <- 0 until sectorSize / 4 - 1) {
        val v = buf.getInt(base + i * 4)
        if (v >= 0) fatSectors += v
      }
      difat = buf.getInt(base + sectorSize - 4)
      difatLeft -= 1
    }

    def fatNext(sector: Int): Int = {
      val perSector = sectorSize / 4
      val fs = fatSectors(sector / perSector)
      buf.getInt(sectorAt(fs) + (sector % perSector) * 4)
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      while (s >= 0 && out.size() < size) {
        val n = math.min(sectorSize.toLong, size - out.size()).toInt
        out.write(bytes, sectorAt(s), n)
        s = fatNext(s)
      }
      out.toByteArray
    }

    // directory entries (128 bytes each) across the directory chain
    val dirBytes = {
      val out = new java.io.ByteArrayOutputStream()
      var s = firstDirSector
      while (s >= 0) { out.write(bytes, sectorAt(s), sectorSize); s = fatNext(s) }
      out.toByteArray
    }
    val db = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
    final case class Entry(name: String, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val off = i * 128
      val nameLen = db.getShort(off + 64)
      val name =
        if (nameLen <= 2) ""
        else new String(dirBytes, off, nameLen - 2, "UTF-16LE")
      Entry(name, db.getInt(off + 116),
        db.getInt(off + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.headOption.getOrElse(
      throw new IllegalArgumentException("empty CFB directory"))
    val target = entries.find(e => names.contains(e.name)).getOrElse(
      throw new IllegalArgumentException(
        s"no ${names.mkString("/")} stream; have: " +
          entries.map(_.name).filter(_.nonEmpty).mkString(", ")))

    if (target.size >= miniCutoff || numMiniFat == 0 || firstMiniFatSector < 0)
      readChain(target.start, target.size)
    else {
      // mini stream: root entry's chain sliced by 64-byte mini sectors
      val mini = readChain(root.start, root.size)
      val miniFat = readChain(firstMiniFatSector, numMiniFat.toLong * sectorSize)
      val mf = ByteBuffer.wrap(miniFat).order(ByteOrder.LITTLE_ENDIAN)
      val out = new java.io.ByteArrayOutputStream()
      var s = target.start
      while (s >= 0 && out.size() < target.size) {
        val n = math.min(miniSectorSize.toLong, target.size - out.size()).toInt
        out.write(mini, s * miniSectorSize, n)
        s = mf.getInt(s * 4)
      }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------------ BIFF

  /** A cursor over a BIFF record run that transparently crosses CONTINUE
    * (0x003C) boundaries. SST strings need the special rule: when the
    * CHARACTER data of a string crosses into a CONTINUE record, the
    * continuation starts with a fresh flags byte (the encoding may
    * switch width mid-string). */
  private final class RecordCursor(data: Array[Byte], spans: Seq[(Int, Int)]) {
    // spans: (offset, length) of each record payload in `data`
    private var span = 0
    private var pos = 0
    def hasMore: Boolean =
      span < spans.length && (pos < spans(span)._2 || span + 1 < spans.length)
    private def ensure(): Unit =
      while (span < spans.length && pos >= spans(span)._2) { span += 1; pos = 0 }
    def atBoundary: Boolean = { ensure(); pos == 0 && span > 0 }
    def u8(): Int = { ensure(); val v = data(spans(span)._1 + pos) & 0xFF; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def f64(): Double = {
      val bs = Array.fill(8)(u8().toByte)
      ByteBuffer.wrap(bs).order(ByteOrder.LITTLE_ENDIAN).getDouble
    }
    def bytes(n: Int): Array[Byte] = Array.fill(n)(u8().toByte)
    /** Read `cch` characters honoring per-continuation flag bytes: when
      * the character run crosses into a CONTINUE record, the continuation
      * opens with a fresh option-flags byte and the width may switch. */
    def xlString(cch: Int, firstFlags: Int): String = {
      val sb = new StringBuilder
      var wide = (firstFlags & 1) == 1
      var left = cch
      ensure()
      var charSpan = span // span the current character run lives in
      while (left > 0) {
        ensure()
        if (span != charSpan) { // crossed a CONTINUE mid-string
          wide = (u8() & 1) == 1
          charSpan = span
        } else {
          val avail = spans(span)._2 - pos
          val chars = math.min(left, if (wide) avail / 2 else avail)
          if (chars == 0) { span += 1; pos = 0 } // half-char tail: defer
          else {
            if (wide) sb.append(new String(bytes(chars * 2), "UTF-16LE"))
            else bytes(chars).foreach(b => sb.append((b & 0xFF).toChar))
            left -= chars
          }
        }
      }
      sb.toString
    }
    def skip(n: Int): Unit = { var left = n; while (left > 0) { u8(); left -= 1 } }
  }

  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 1) == 1
    val isInt = (rk & 2) == 2
    val v =
      if (isInt) (rk >> 2).toDouble
      else ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(0, 0).putInt(4, rk & 0xFFFFFFFC).getDouble(0)
    if (div100) v / 100 else v
  }

  private def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Parse the Workbook stream: per sheet (name, rows, merge regions). */
  private[sources] def parseBiff(wb: Array[Byte])
      : Seq[(String, Seq[Array[String]], Seq[(Int, Int, Int, Int)])] = {
    val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)

    // index all records once: (id, offset, len)
    val records = mutable.ArrayBuffer[(Int, Int, Int)]()
    var off = 0
    while (off + 4 <= wb.length) {
      val id = buf.getShort(off) & 0xFFFF
      val len = buf.getShort(off + 2) & 0xFFFF
      records += ((id, off + 4, len))
      off += 4 + len
    }

    // globals: SST (with CONTINUEs) + BOUNDSHEETs
    val sst = mutable.ArrayBuffer[String]()
    val sheets = mutable.ArrayBuffer[(String, Int)]() // (name, BOF stream offset)
    var i = 0
    while (i < records.length) {
      val (id, o, len) = records(i)
      id match {
        case 0xFC => // SST + following CONTINUE records
          var j = i + 1
          val spans = mutable.ArrayBuffer((o, len))
          while (j < records.length && records(j)._1 == 0x3C) {
            spans += ((records(j)._2, records(j)._3)); j += 1
          }
          val cur = new RecordCursor(wb, spans.toSeq)
          cur.i32() // total refs
          val unique = cur.i32()
          var k = 0
          while (k < unique) {
            val cch = cur.u16()
            val flags = cur.u8()
            val cRun = if ((flags & 8) == 8) cur.u16() else 0
            val cbExt = if ((flags & 4) == 4) cur.i32() else 0
            sst += cur.xlString(cch, flags)
            cur.skip(cRun * 4 + cbExt)
            k += 1
          }
          i = j - 1
        case 0x85 => // BOUNDSHEET
          val pos = buf.getInt(o)
          val cch = wb(o + 6) & 0xFF
          val wide = (wb(o + 7) & 1) == 1
          val name =
            if (wide) new String(wb, o + 8, cch * 2, "UTF-16LE")
            else new String(wb, o + 8, cch, "ISO-8859-1")
          sheets += ((name, pos))
        case _ =>
      }
      i += 1
    }

    // per-sheet substreams
    sheets.map { case (name, bof) =>
      val rows = mutable.ArrayBuffer[mutable.ArrayBuffer[String]]()
      val merges = mutable.ArrayBuffer[(Int, Int, Int, Int)]()
      def cell(row: Int, col: Int, value: String): Unit = {
        while (rows.size <= row) rows += mutable.ArrayBuffer[String]()
        val r = rows(row)
        while (r.size <= col) r += null
        r(col) = value
      }
      var j = records.indexWhere { case (_, o, _) => o - 4 == bof }
      require(j >= 0, s"sheet '$name' BOF not found at $bof")
      var depth = 0
      var done = false
      while (j < records.length && !done) {
        val (id, o, len) = records(j)
        id match {
          case 0x809 => depth += 1
          case 0x0A => depth -= 1; if (depth <= 0) done = true
          case 0xFD => // LABELSST
            cell(buf.getShort(o) & 0xFFFF, buf.getShort(o + 2) & 0xFFFF,
              sst(buf.getInt(o + 6)))
          case 0x203 => // NUMBER
            cell(buf.getShort(o) & 0xFFFF, buf.getShort(o + 2) & 0xFFFF,
              renderNum(buf.getDouble(o + 6)))
          case 0x27E => // RK
            cell(buf.getShort(o) & 0xFFFF, buf.getShort(o + 2) & 0xFFFF,
              renderNum(rkValue(buf.getInt(o + 6))))
          case 0xBD => // MULRK: row, colFirst, (ixfe+rk)*, colLast
            val row = buf.getShort(o) & 0xFFFF
            val colFirst = buf.getShort(o + 2) & 0xFFFF
            val n = (len - 6) / 6
            for (k <- 0 until n)
              cell(row, colFirst + k, renderNum(rkValue(buf.getInt(o + 4 + k * 6 + 2))))
          case 0x205 => // BOOLERR
            if ((wb(o + 7) & 0xFF) == 0) // boolean, not error
              cell(buf.getShort(o) & 0xFFFF, buf.getShort(o + 2) & 0xFFFF,
                if (wb(o + 6) == 1) "true" else "false")
          case 0x204 => // LABEL (inline string)
            val cch = buf.getShort(o + 6) & 0xFFFF
            val wide = (wb(o + 8) & 1) == 1
            val s =
              if (wide) new String(wb, o + 9, cch * 2, "UTF-16LE")
              else new String(wb, o + 9, cch, "ISO-8859-1")
            cell(buf.getShort(o) & 0xFFFF, buf.getShort(o + 2) & 0xFFFF, s)
          case 0x06 => // FORMULA with cached numeric result
            val resHi = buf.getShort(o + 12) & 0xFFFF
            if (resHi != 0xFFFF) // 0xFFFF marks string/bool/err results
              cell(buf.getShort(o) & 0xFFFF, buf.getShort(o + 2) & 0xFFFF,
                renderNum(buf.getDouble(o + 6)))
          case 0xE5 => // MERGEDCELLS
            val n = buf.getShort(o) & 0xFFFF
            for (k <- 0 until n) {
              val b = o + 2 + k * 8
              merges += ((buf.getShort(b) & 0xFFFF, buf.getShort(b + 2) & 0xFFFF,
                buf.getShort(b + 4) & 0xFFFF, buf.getShort(b + 6) & 0xFFFF))
            }
          case _ =>
        }
        j += 1
      }
      (name, rows.map(_.toArray).toSeq, merges.toSeq)
    }.toSeq
  }

  /** Full read: pick the sheet, expand merges — mirror of the xlsx path. */
  private[sources] def parseWorkbook(bytes: Array[Byte], sheet: Option[String],
                                     expandMerged: Boolean): Seq[Array[String]] = {
    val wb = cfbStream(bytes, Seq("Workbook", "Book"))
    val sheets = parseBiff(wb)
    val (rowsRaw, merges) = (sheet match {
      case Some(s) => sheets.find(_._1 == s).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$s' not found; have: ${sheets.map(_._1).mkString(", ")}"))
      case None => sheets.headOption.getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
    }) match { case (_, r, m) => (r, m) }
    val rows = rowsRaw.map(a => mutable.ArrayBuffer(a.toSeq: _*)).to(mutable.ArrayBuffer)
    if (expandMerged) {
      merges.foreach { case (r1, r2, c1, c2) =>
        val top = if (r1 < rows.size && c1 < rows(r1).size) rows(r1)(c1) else null
        for (ri <- r1 to math.min(r2, rows.size - 1); ci <- c1 to c2) {
          while (rows(ri).size <= ci) rows(ri) += null
          rows(ri)(ci) = top
        }
      }
    }
    rows.map(_.toArray).toSeq
  }
}
