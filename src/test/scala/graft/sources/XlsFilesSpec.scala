package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Legacy .xls (CFB + BIFF8) reading against containers synthesized
  * in-test byte-by-byte — covering the record types the reader decodes
  * (SST with CONTINUE splits, LABELSST, NUMBER, RK, MULRK, BOOLERR,
  * MERGEDCELLS), wide/compressed strings, sheet selection, and mixed
  * xls+xlsx directories through the sniffing read path. */
class XlsFilesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------- BIFF writing

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xFFFF) ++ le16((v >> 16) & 0xFFFF)
  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(payload.length) ++ payload

  private def bof(dt: Int): Array[Byte] =
    rec(0x809, le16(0x600) ++ le16(dt) ++ Array.fill(12)(0.toByte))

  private def sstRecords(strings: Seq[String], continueSplit: Option[Int]): Array[Byte] = {
    // all strings compressed ASCII except any with a non-latin char (wide)
    def one(s: String): Array[Byte] = {
      val wide = s.exists(_ > 0xFF)
      le16(s.length) ++ Array((if (wide) 1 else 0).toByte) ++
        (if (wide) s.getBytes("UTF-16LE") else s.map(_.toByte).toArray)
    }
    val body = le32(strings.size) ++ le32(strings.size) ++
      strings.flatMap(one).toArray
    continueSplit match {
      case None => rec(0xFC, body)
      case Some(at) =>
        // split mid-characters: the continuation re-states the flags byte.
        // `at` must fall inside a compressed string's character run.
        val head = body.take(at)
        val tail = Array(0.toByte) ++ body.drop(at)
        rec(0xFC, head) ++ rec(0x3C, tail)
    }
  }

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0xFD, le16(row) ++ le16(col) ++ le16(0) ++ le32(isst))
  private def number(row: Int, col: Int, v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    rec(0x203, le16(row) ++ le16(col) ++ le16(0) ++ b)
  }
  private def rkInt(row: Int, col: Int, v: Int): Array[Byte] =
    rec(0x27E, le16(row) ++ le16(col) ++ le16(0) ++ le32((v << 2) | 2))
  private def mulRkInts(row: Int, colFirst: Int, vs: Seq[Int]): Array[Byte] =
    rec(0xBD, le16(row) ++ le16(colFirst) ++
      vs.flatMap(v => le16(0) ++ le32((v << 2) | 2)).toArray ++
      le16(colFirst + vs.size - 1))
  private def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x205, le16(row) ++ le16(col) ++ le16(0) ++
      Array((if (v) 1 else 0).toByte, 0.toByte))
  private def mergedCells(regions: Seq[(Int, Int, Int, Int)]): Array[Byte] =
    rec(0xE5, le16(regions.size) ++ regions.flatMap { case (r1, r2, c1, c2) =>
      le16(r1) ++ le16(r2) ++ le16(c1) ++ le16(c2) }.toArray)
  private def eof: Array[Byte] = rec(0x0A, Array.empty)

  private def boundsheet(pos: Int, name: String): Array[Byte] =
    rec(0x85, le32(pos) ++ Array(0.toByte, 0.toByte, name.length.toByte, 0.toByte) ++
      name.map(_.toByte).toArray)

  /** Assemble globals + sheets into one BIFF stream (two-pass for
    * BOUNDSHEET positions). */
  private def biff(strings: Seq[String], continueSplit: Option[Int],
                   sheets: Seq[(String, Array[Byte])]): Array[Byte] = {
    def globals(positions: Seq[Int]): Array[Byte] =
      bof(0x5) ++
        sheets.zip(positions).flatMap { case ((n, _), p) => boundsheet(p, n) }.toArray ++
        sstRecords(strings, continueSplit) ++ eof
    val g0 = globals(Seq.fill(sheets.size)(0))
    val positions = sheets.scanLeft(g0.length) { case (acc, (_, body)) =>
      acc + bof(0x10).length + body.length + eof.length
    }.dropRight(1)
    globals(positions) ++ sheets.flatMap { case (_, body) => bof(0x10) ++ body ++ eof }
  }

  // ----------------------------------------------------------- CFB writing

  private def cfb(stream: Array[Byte]): Array[Byte] = {
    val nStream = (stream.length + 511) / 512
    val total = 512 * (2 + nStream) // FAT, directory, stream sectors
    val out = ByteBuffer.allocate(512 + total).order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.putShort(24, 0x3E.toShort); out.putShort(26, 3.toShort)
    out.putShort(28, 0xFFFE.toShort)
    out.putShort(30, 9.toShort); out.putShort(32, 6.toShort)
    out.putInt(44, 1) // one FAT sector
    out.putInt(48, 1) // directory at sector 1
    out.putInt(56, 4096)
    out.putInt(60, -2); out.putInt(64, 0) // no mini FAT
    out.putInt(68, -2); out.putInt(72, 0) // no DIFAT sectors
    out.putInt(76, 0) // DIFAT[0] -> FAT in sector 0
    for (i <- 1 until 109) out.putInt(76 + i * 4, -1)
    // FAT (sector 0)
    val fat = 512
    out.putInt(fat, -3) // FATSECT
    out.putInt(fat + 4, -2) // directory chain ends
    for (i <- 0 until nStream)
      out.putInt(fat + 8 + i * 4, if (i == nStream - 1) -2 else 3 + i)
    for (i <- nStream + 2 until 128) out.putInt(fat + i * 4, -1)
    // directory (sector 1)
    def dirEntry(idx: Int, name: String, typ: Int, start: Int, size: Int): Unit = {
      val off = 512 + 512 + idx * 128
      val nm = name.getBytes("UTF-16LE")
      out.position(off); out.put(nm)
      out.putShort(off + 64, ((name.length + 1) * 2).toShort)
      out.put(off + 66, typ.toByte)
      out.putInt(off + 68, -1); out.putInt(off + 72, -1); out.putInt(off + 76, -1)
      out.putInt(off + 116, start)
      out.putInt(off + 120, size)
    }
    dirEntry(0, "Root Entry", 5, -2, 0)
    dirEntry(1, "Workbook", 2, 2, stream.length)
    // stream sectors
    out.position(512 * 3); out.put(stream)
    out.array()
  }

  private def writeXls(path: String, bytes: Array[Byte]): Unit =
    Files.write(Paths.get(path), bytes)

  // ----------------------------------------------------------------- tests

  test("CFB + BIFF8: strings (incl. wide + CONTINUE split), numerics, booleans") {
    val dir = Files.createTempDirectory("graft_xls").toString
    val strings = Seq("city", "pop", "ok", "oslo", "bergen", "tromsø") // ø forces wide
    // CONTINUE split inside "bergen"'s character run: body offset of its chars
    // = 8 (counts) + 3+4 ("city") + 3+3 ("pop") + 3+2 ("ok") + 3+4 ("oslo") + 3
    val split = 8 + 7 + 6 + 5 + 7 + 3 + 2 // two chars into "bergen"
    val sheet =
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
        labelSst(1, 0, 3) ++ number(1, 1, 634293.0) ++ boolErr(1, 2, true) ++
        labelSst(2, 0, 4) ++ rkInt(2, 1, 271949) ++ boolErr(2, 2, false) ++
        labelSst(3, 0, 5) ++ mulRkInts(3, 1, Seq(77000, 1))
    writeXls(s"$dir/t.xls", cfb(biff(strings, Some(split), Seq("Sheet1" -> sheet))))

    val df = ExcelFiles.read(spark, s"$dir/t.xls")
    df.columns.toSeq shouldBe Seq("city", "pop", "ok")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows shouldBe Set(
      ("oslo", "634293", "true"),
      ("bergen", "271949", "false"),
      ("tromsø", "77000", "1"))
  }

  test("sheet selection and merged-cell expansion in BIFF") {
    val dir = Files.createTempDirectory("graft_xls2").toString
    val strings = Seq("grp", "v", "north", "south", "alt")
    val s1 =
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
        labelSst(1, 0, 2) ++ rkInt(1, 1, 1) ++
        rkInt(2, 1, 2) ++
        labelSst(3, 0, 3) ++ rkInt(3, 1, 3) ++
        mergedCells(Seq((1, 2, 0, 0)))
    val s2 = labelSst(0, 0, 4) ++ rkInt(1, 0, 9)
    writeXls(s"$dir/t.xls",
      cfb(biff(strings, None, Seq("main" -> s1, "extra" -> s2))))

    val plain = ExcelFiles.read(spark, s"$dir/t.xls")
    plain.where("grp IS NULL").count() shouldBe 1
    val expanded = ExcelFiles.read(spark, s"$dir/t.xls", expandMergedCells = true)
    expanded.where("grp = 'north'").count() shouldBe 2

    val extra = ExcelFiles.read(spark, s"$dir/t.xls", sheet = Some("extra"))
    extra.columns.toSeq shouldBe Seq("alt")
    extra.collect().map(_.getString(0)).toSeq shouldBe Seq("9")

    val err = intercept[Exception](
      ExcelFiles.read(spark, s"$dir/t.xls", sheet = Some("nope")).count())
    err.getMessage should include("not found")
  }

  test("a directory can mix .xls and .xlsx — the reader sniffs per file") {
    val dir = Files.createTempDirectory("graft_xls3").toString
    val strings = Seq("k", "src", "xls")
    writeXls(s"$dir/legacy.xls", cfb(biff(strings, None, Seq("s" ->
      (labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ rkInt(1, 0, 1) ++ labelSst(1, 1, 2))))))
    // the modern sibling, via the xlsx writer from ExcelFilesSpec's format
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(s"$dir/new.xlsx"))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>k</t></si><si><t>src</t></si><si><t>xlsx</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2"><v>2</v></c><c r="B2" t="s"><v>2</v></c></row>""" +
        """</sheetData></worksheet>""")
    z.close()

    val df = ExcelFiles.read(spark, dir)
    df.columns.toSeq shouldBe Seq("k", "src")
    df.select("src").collect().map(_.getString(0)).toSet shouldBe Set("xls", "xlsx")
  }
}
