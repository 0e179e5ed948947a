package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** XLSX easy-format reader (`ExcelFormatPlugin.java` semantics: sheet
  * selection, extractHeader, merged-cell expansion, column letters and
  * header dedup) against workbooks synthesized in-test with nothing but
  * `java.util.zip` — the same dependency budget as the reader itself. */
class ExcelFilesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Minimal valid xlsx: one or two sheets, a shared-strings table, and
    * optional merge regions. Cells: Left(str) → shared string, Right(sql)
    * → raw (numeric) value text, null → omitted cell. */
  private def writeXlsx(path: String,
                        sheets: Seq[(String, Seq[Seq[Either[String, String]]])],
                        merges: Seq[String] = Nil): Unit = {
    val strings = mutable.LinkedHashSet[String]()
    sheets.foreach(_._2.foreach(_.foreach {
      case Left(s) if s != null => strings += s
      case _ =>
    }))
    val sIdx = strings.zipWithIndex.toMap

    def sheetXml(rows: Seq[Seq[Either[String, String]]], withMerges: Boolean): String = {
      val data = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.collect {
          case (Left(s), ci) if s != null =>
            s"""<c r="${ExcelFiles.colLetters(ci)}${ri + 1}" t="s"><v>${sIdx(s)}</v></c>"""
          case (Right(n), ci) if n != null =>
            s"""<c r="${ExcelFiles.colLetters(ci)}${ri + 1}"><v>$n</v></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      val mergeXml =
        if (withMerges && merges.nonEmpty)
          s"""<mergeCells count="${merges.size}">""" +
            merges.map(m => s"""<mergeCell ref="$m"/>""").mkString + "</mergeCells>"
        else ""
      s"""<?xml version="1.0"?><worksheet><sheetData>$data</sheetData>$mergeXml</worksheet>"""
    }

    val workbook = """<?xml version="1.0"?><workbook><sheets>""" +
      sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>"
    val rels = """<?xml version="1.0"?><Relationships>""" +
      sheets.indices.map(i =>
        s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
      "</Relationships>"
    val sst = """<?xml version="1.0"?><sst>""" +
      strings.map(s => s"<si><t>$s</t></si>").mkString + "</sst>"

    val z = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", rels)
    put("xl/sharedStrings.xml", sst)
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows, withMerges = i == 0))
    }
    z.close()
  }

  private def s(v: String): Either[String, String] = Left(v)
  private def n(v: String): Either[String, String] = Right(v)

  test("header extraction, shared strings, numerics, and cell gaps") {
    val dir = Files.createTempDirectory("graft_xlsx").toString
    writeXlsx(s"$dir/t.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("city"), s("pop"), s("note")),
      Seq(s("oslo"), n("634293"), s("fjord")),
      Seq(s("bergen"), n("271949"), null),
      Seq(s("trondheim"), null, s("nidelva")))))
    val df = ExcelFiles.read(spark, s"$dir/t.xlsx")
    df.columns.toSeq shouldBe Seq("city", "pop", "note")
    df.count() shouldBe 3
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows should contain("oslo", "634293", "fjord")
    rows should contain("bergen", "271949", null)
    rows should contain("trondheim", null, "nidelva")
  }

  test("duplicate headers dedup like the reference; no-header mode uses column letters") {
    val dir = Files.createTempDirectory("graft_xlsx2").toString
    writeXlsx(s"$dir/t.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("x"), s("x"), s("x")),
      Seq(n("1"), n("2"), n("3")))))
    ExcelFiles.read(spark, s"$dir/t.xlsx").columns.toSeq shouldBe Seq("x", "x0", "x1")

    val noHeader = ExcelFiles.read(spark, s"$dir/t.xlsx", extractHeader = false)
    noHeader.columns.toSeq shouldBe Seq("A", "B", "C")
    noHeader.count() shouldBe 2

    ExcelFiles.colLetters(25) shouldBe "Z"
    ExcelFiles.colLetters(26) shouldBe "AA"
    ExcelFiles.colLetters(701) shouldBe "ZZ"
    ExcelFiles.colLetters(702) shouldBe "AAA"
  }

  test("sheet selection by name; unknown sheet fails loud") {
    val dir = Files.createTempDirectory("graft_xlsx3").toString
    writeXlsx(s"$dir/t.xlsx", Seq(
      "first" -> Seq(Seq(s("a")), Seq(n("1"))),
      "second" -> Seq(Seq(s("b")), Seq(n("2")), Seq(n("3")))))
    ExcelFiles.read(spark, s"$dir/t.xlsx").columns.toSeq shouldBe Seq("a")
    val second = ExcelFiles.read(spark, s"$dir/t.xlsx", sheet = Some("second"))
    second.columns.toSeq shouldBe Seq("b")
    second.count() shouldBe 2
    val err = intercept[Exception](
      ExcelFiles.read(spark, s"$dir/t.xlsx", sheet = Some("nope")).count())
    err.getMessage should include("not found")
  }

  test("merged-cell expansion fills the region from its top-left value") {
    val dir = Files.createTempDirectory("graft_xlsx4").toString
    writeXlsx(s"$dir/t.xlsx", Seq("Sheet1" -> Seq(
      Seq(s("grp"), s("v")),
      Seq(s("north"), n("1")),
      Seq(null, n("2")),
      Seq(s("south"), n("3")))),
      merges = Seq("A2:A3"))
    val plain = ExcelFiles.read(spark, s"$dir/t.xlsx")
    plain.where("grp IS NULL").count() shouldBe 1
    val expanded = ExcelFiles.read(spark, s"$dir/t.xlsx", expandMergedCells = true)
    expanded.where("grp IS NULL").count() shouldBe 0
    expanded.where("grp = 'north'").count() shouldBe 2
  }

  test("excel_scan('<path>'[, sheet]) reads workbooks from a FROM clause") {
    val dir = Files.createTempDirectory("graft_xlsx_tvf").toString
    writeXlsx(s"$dir/t.xlsx", Seq(
      "main" -> Seq(Seq(s("k"), s("v")), Seq(n("1"), s("one")), Seq(n("2"), s("two"))),
      "other" -> Seq(Seq(s("z")), Seq(n("9")))))
    val rows = spark.sql(
      s"SELECT k, v FROM excel_scan('$dir/t.xlsx') WHERE k = '2'").collect()
    rows.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe Seq(("2", "two"))
    spark.sql(s"SELECT z FROM excel_scan('$dir/t.xlsx', 'other')")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("9")
  }

  test("a directory of workbooks parses distributed, one file per task") {
    val dir = Files.createTempDirectory("graft_xlsx5").toString
    (1 to 3).foreach { i =>
      writeXlsx(s"$dir/f$i.xlsx", Seq("Sheet1" -> Seq(
        Seq(s("k"), s("file")),
        Seq(n(i.toString), n(i.toString)),
        Seq(n((10 * i).toString), n(i.toString)))))
    }
    val df = ExcelFiles.read(spark, dir)
    df.count() shouldBe 6
    df.select("file").distinct().count() shouldBe 3
    // tiny files PACK into few partitions (no task-per-small-file storm);
    // the schema comes from one driver-side parse of the first file only
    df.rdd.getNumPartitions should be >= 1
  }
}
