package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Distributed XLSX reader — the reference's Excel easy format
  * (`exec/store/easy/excel/ExcelFormatPlugin.java`, StAX parser
  * `StAXBasedParser.java`, options `ExcelFormatPluginConfig.java:37-43`:
  * sheet, extractHeader, hasMergedCells) rebuilt with ZERO third-party
  * dependencies: an .xlsx is a zip of XML parts, and the JDK ships both
  * `java.util.zip` and StAX (`javax.xml.stream`).
  *
  * Spark-first layout: like the reference, an .xlsx is not splittable, so
  * the unit of parallelism is the FILE — `binaryFiles` distributes one
  * workbook per task and a directory of workbooks parses fully in
  * parallel; schema (header names, width) comes from the first file, like
  * every easy-format reader here. Cells render as strings (Excel's
  * underlying value text — numerics stay as stored, dates stay serials);
  * column names follow the reference's `ColumnNameHandler`: header row
  * when extracted (duplicates suffixed name, name0, name1, …), Excel
  * column letters (A, B, …, Z, AA, …) otherwise.
  */
object ExcelFiles {

  /** 0-based column index → Excel letters (A..Z, AA..). */
  private[sources] def colLetters(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** One parsed sheet: rows of (possibly null) cell strings, ragged.
    * Dispatches on the container magic — PK zip ⇒ xlsx, D0CF11E0 OLE2 ⇒
    * legacy BIFF8 .xls ([[XlsFiles]]) — so a directory may mix dialects. */
  private[sources] def parseWorkbook(in: InputStream, sheet: Option[String],
                                     expandMerged: Boolean): Seq[Array[String]] = {
    val bytes = in.readAllBytes(); in.close()
    if (XlsFiles.isCfb(bytes)) XlsFiles.parseWorkbook(bytes, sheet, expandMerged)
    else parseXlsx(new ByteArrayInputStream(bytes), sheet, expandMerged)
  }

  private def parseXlsx(in: InputStream, sheet: Option[String],
                        expandMerged: Boolean): Seq[Array[String]] = {
    // buffer the parts we need (an xlsx zip's entry order is arbitrary)
    val parts = mutable.Map[String, Array[Byte]]()
    val zin = new ZipInputStream(in)
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName.startsWith("xl/")) parts(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()

    val xif = javax.xml.stream.XMLInputFactory.newInstance()
    xif.setProperty(javax.xml.stream.XMLInputFactory.IS_NAMESPACE_AWARE, false)
    xif.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)

    def events(name: String) =
      xif.createXMLStreamReader(new ByteArrayInputStream(parts(name)))

    // shared strings table (t="s" cells hold an index into it)
    val shared: IndexedSeq[String] =
      if (!parts.contains("xl/sharedStrings.xml")) IndexedSeq.empty
      else {
        val r = events("xl/sharedStrings.xml")
        val out = mutable.ArrayBuffer[String]()
        var cur: StringBuilder = null
        var inT = false
        while (r.hasNext) {
          r.next() match {
            case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => cur = new StringBuilder
                case "t" => inT = true
                case _ =>
              }
            case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
              cur.append(r.getText)
            case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "t" => inT = false
                case "si" => out += cur.toString
                case _ =>
              }
            case _ =>
          }
        }
        out.toIndexedSeq
      }

    // workbook.xml: sheet name -> r:id; rels: r:id -> worksheet part
    val sheetPart: String = {
      val r = events("xl/workbook.xml")
      var byName = Vector.empty[(String, String)] // (name, rid)
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          val attrs = (0 until r.getAttributeCount)
            .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
          val rid = attrs.collectFirst {
            case (k, value) if k == "id" || k.endsWith(":id") => value
          }.getOrElse("")
          byName :+= (attrs.getOrElse("name", "") -> rid)
        }
      }
      val rid = sheet match {
        case Some(s) => byName.find(_._1 == s).map(_._2).getOrElse(
          throw new IllegalArgumentException(
            s"sheet '$s' not found; have: ${byName.map(_._1).mkString(", ")}"))
        case None => byName.headOption.map(_._2).getOrElse(
          throw new IllegalArgumentException("workbook has no sheets"))
      }
      val rels = events("xl/_rels/workbook.xml.rels")
      var target: Option[String] = None
      while (rels.hasNext) {
        if (rels.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            rels.getLocalName == "Relationship") {
          val attrs = (0 until rels.getAttributeCount)
            .map(i => rels.getAttributeLocalName(i) -> rels.getAttributeValue(i)).toMap
          if (attrs.get("Id").contains(rid))
            target = attrs.get("Target").map(t =>
              if (t.startsWith("/")) t.stripPrefix("/") else "xl/" + t)
        }
      }
      target.getOrElse(throw new IllegalArgumentException(s"no part for sheet rel $rid"))
    }

    // the worksheet: rows of cells + merge regions
    val rows = mutable.ArrayBuffer[mutable.ArrayBuffer[String]]()
    val merges = mutable.ArrayBuffer[String]()
    val r = events(sheetPart)
    var curRow: mutable.ArrayBuffer[String] = null
    var curRowNum = 0 // 1-based row number from the r attribute (sparse sheets)
    var cellRef = ""
    var cellType = ""
    var inV = false
    var inIsT = false
    val v = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              curRow = mutable.ArrayBuffer[String]()
              curRowNum = (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == "r")
                .map(i => r.getAttributeValue(i).toInt).getOrElse(rows.size + 1)
            case "c" =>
              val attrs = (0 until r.getAttributeCount)
                .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
              cellRef = attrs.getOrElse("r", "")
              cellType = attrs.getOrElse("t", "n")
            case "v" => inV = true; v.clear()
            case "t" => inIsT = true; v.clear() // inlineStr
            case "mergeCell" =>
              (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == "ref")
                .foreach(i => merges += r.getAttributeValue(i))
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inIsT =>
          v.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" if inV || inIsT =>
              val value = cellType match {
                case "s" => shared(v.toString.trim.toInt)
                case "b" => if (v.toString.trim == "1") "true" else "false"
                case _ => v.toString
              }
              val idx = colIndex(cellRef)
              if (curRow != null && idx >= 0) {
                while (curRow.size <= idx) curRow += null
                curRow(idx) = value
              }
              inV = false; inIsT = false
            case "row" =>
              while (rows.size < curRowNum - 1) rows += mutable.ArrayBuffer[String]()
              rows += curRow; curRow = null
            case _ =>
          }
        case _ =>
      }
    }

    if (expandMerged && merges.nonEmpty) {
      // value of the region's top-left fills every covered cell
      // (reference MergeCellRegion.java)
      merges.foreach { ref =>
        val Array(a, b) = ref.split(':')
        val (c1, r1) = (colIndex(a), a.dropWhile(_.isLetter).toInt - 1)
        val (c2, r2) = (colIndex(b), b.dropWhile(_.isLetter).toInt - 1)
        val top = if (r1 < rows.size && c1 < rows(r1).size) rows(r1)(c1) else null
        for (ri <- r1 to math.min(r2, rows.size - 1); ci <- c1 to c2) {
          while (rows(ri).size <= ci) rows(ri) += null
          rows(ri)(ci) = top
        }
      }
    }
    rows.map(_.toArray).toSeq
  }

  /** Header-name dedup, reference `ColumnNameHandler.setColumnName`:
    * duplicates get the running count appended (x, x0, x1, …). */
  private[sources] def dedupNames(names: Seq[String]): Seq[String] = {
    val cardinality = mutable.Map[String, Int]()
    def claim(n: String): String = cardinality.get(n) match {
      case None => cardinality(n) = 0; n
      case Some(c) => cardinality(n) = c + 1; claim(n + c)
    }
    names.map(claim)
  }

  /** Read one .xlsx file or a directory of them into a DataFrame of
    * string columns. */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None,
           extractHeader: Boolean = true,
           expandMergedCells: Boolean = false): DataFrame = {
    val files = spark.sparkContext.binaryFiles(path)
    val firstRows = {
      val (_, stream) = files.first()
      parseWorkbook(stream.open(), sheet, expandMergedCells)
    }
    if (firstRows.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Nil))
    val width = firstRows.map(_.length).max
    val names =
      if (extractHeader)
        dedupNames(firstRows.head.padTo(width, null)
          .zipWithIndex.map { case (h, i) => Option(h).getOrElse(colLetters(i)) }.toSeq)
      else (0 until width).map(colLetters)
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))

    val sheetArg = sheet
    val headerArg = extractHeader
    val mergedArg = expandMergedCells
    val rdd = files.flatMap { case (_, stream) =>
      val rows = parseWorkbook(stream.open(), sheetArg, mergedArg)
      val data = if (headerArg) rows.drop(1) else rows
      data.map { cells =>
        Row.fromSeq((0 until width).map(i => if (i < cells.length) cells(i) else null))
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
