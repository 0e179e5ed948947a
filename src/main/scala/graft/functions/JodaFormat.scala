package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{date_format, to_date, to_timestamp}

/** Joda-pattern shim for TO_DATE / TO_TIMESTAMP / TO_CHAR (reference
  * datetime functions use Joda-style patterns —
  * `exec/expr/fn/impl/DateFunctionsUtils.java`; Spark uses java.time
  * DateTimeFormatter — SURVEY §7.4 divergence watchlist).
  *
  * Translates the token families that differ:
  *  - Joda `YYYY` = calendar year → java.time `y` (java `Y` is week-year!)
  *  - Joda `DD` day-of-year keeps `D`; `dd` day-of-month unchanged
  *  - Joda `e` = day-of-week number → java `e`ish; mapped to `u`
  *  - quoted literals ('...') pass through untouched
  */
object JodaFormat {

  def translate(joda: String): String = {
    val out = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < joda.length) {
      val c = joda.charAt(i)
      if (c == '\'') { inQuote = !inQuote; out.append(c); i += 1 }
      else if (inQuote) { out.append(c); i += 1 }
      else {
        var j = i
        while (j < joda.length && joda.charAt(j) == c) j += 1
        val run = j - i
        val repl = c match {
          case 'Y' => "y" * run // Joda year-of-era ≈ calendar year
          case 'x' => "y" * run // Joda weekyear rarely intended; normalize
          case 'e' => "u" * run // day-of-week number
          case _ => c.toString * run
        }
        out.append(repl)
        i = j
      }
    }
    out.toString
  }

  def toDateJoda(c: Column, jodaPattern: String): Column =
    to_date(c, translate(jodaPattern))

  def toTimestampJoda(c: Column, jodaPattern: String): Column =
    to_timestamp(c, translate(jodaPattern))

  def toCharJoda(c: Column, jodaPattern: String): Column =
    date_format(c, translate(jodaPattern))
}
