package graft.explore

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Transform recommendation cards — the engine behind the reference's
  * dataset-curation "cards" (dremio-oss `dac/backend/.../explore/
  * ExtractRecommender.java:55`, `SplitRecommender.java:43`,
  * `ReplaceRecommender.java:53`). The user highlights a piece of one sample
  * cell (a [[Selection]]); the recommender proposes candidate transform
  * rules (extract-by-position, extract-by-char-group, split-on-delimiter,
  * replace/keep-only/exclude by pattern), and each card is then scored
  * against the REAL column: how many rows does this rule match, and what
  * would it produce on a few of them.
  *
  * Spark-first evaluation: the reference scores cards by generating one
  * `regexp_matches` projection per card over a sample table. Here ALL
  * cards' match counts are computed in ONE distributed aggregate pass —
  * a single `agg(count, sum(when(m1,1)), sum(when(m2,1)), …)` job whose
  * partial aggregates combine map-side, so scoring N cards over a 100 TB
  * column costs one scan and shuffles N longs per partition, not a
  * per-card query. Examples come from one bounded `take`.
  */
object Recommenders {

  /** What the user highlighted: `cellText` is the whole sample cell
    * (null ⇒ the cell was NULL), `[offset, offset+length)` the selection. */
  final case class Selection(cellText: String, offset: Int, length: Int) {
    def selected: String =
      if (cellText == null) null else cellText.substring(offset, offset + length)
  }

  /** One recommendation card. `matchSql` is a boolean SQL predicate over
    * the column; `applySql` the transform's SQL expression (None for rules
    * that only filter rows, e.g. keep-only); `filterSql` the row-filter
    * form where it exists (keep-only / exclude semantics). */
  final case class Card(
      transform: String, // extract | split | replace
      description: String,
      matchSql: String => String,
      applySql: Option[String => String],
      filterSql: Option[String => String] = None)

  /** A scored card: match count over the evaluated column plus a few
    * example (input, output) pairs from matching rows. */
  final case class ScoredCard(
      card: Card,
      matchCount: Long,
      total: Long,
      examples: Seq[(String, String)])

  private def q(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  private def hasCase(s: String): Boolean = s.toUpperCase != s.toLowerCase
  private def ci(ignoreCase: Boolean): String = if (ignoreCase) "(?i)(?u)" else ""
  private def quoted(s: String): String = Pattern.quote(s)

  // ---------------------------------------------------------------- extract

  /** Position + char-group extract rules (`ExtractRecommender.java:86-127`).
    * Position: the three anchorings of the selection (both ends from the
    * start; start-anchored with the tail measured from the end; both ends
    * from the end) as `substr` with negative offsets for from-the-end —
    * exactly the reference's offset arithmetic
    * (`ExtractRecommender.java:209-247`). Char-group: when the selection is
    * a maximal run of `\d+` or `\w+`, extract the i-th (or last) such run. */
  def extractRules(sel: Selection): Seq[Card] = {
    require(sel.cellText != null && sel.length > 0,
      "extract recommendation requires a non-empty text selection")
    val start = sel.offset
    val end = start + sel.length - 1 // inclusive
    val total = sel.cellText.length

    def substrCard(desc: String, offsetSql: String, lenSql: String => String): Card = {
      def fn(c: String) = s"substr($c, $offsetSql, ${lenSql(c)})"
      Card("extract", desc,
        matchSql = c => s"length(${fn(c)}) > 0",
        applySql = Some(c => s"CASE WHEN length(${fn(c)}) > 0 THEN ${fn(c)} ELSE NULL END"))
    }

    val position = Seq(
      substrCard(s"Characters ${start} - ${end}",
        (start + 1).toString, _ => sel.length.toString),
      substrCard(s"Characters ${start} - ${total - end - 1} (from the end)",
        (start + 1).toString, c => s"length($c) - ${start + (total - end - 1)}"),
      substrCard(s"Characters ${total - start - 1} - ${total - end - 1} (both from the end)",
        s"-${total - start}", _ => (end - start + 1).toString))

    val charGroups = Seq("digit" -> "\\d+", "word" -> "\\w+").flatMap {
      case (name, pat) =>
        val before = start > 0 && sel.cellText.substring(start - 1, start).matches(pat)
        val after = end + 1 < total && sel.cellText.substring(end + 1, end + 2).matches(pat)
        val isRun = sel.selected.matches(pat)
        if (before || after || !isRun) Nil
        else {
          // which maximal run of this class the selection is
          val m = Pattern.compile(pat).matcher(sel.cellText)
          val starts = Iterator.continually(m).takeWhile(_.find()).map(_.start).toList
          val idx = starts.indexOf(start)
          if (idx < 0) Nil
          else {
            def card(i: Int, fromEnd: Boolean) = {
              val ord = if (fromEnd) "last" else s"${i}th"
              Card("extract", s"$ord $name group (${pat})",
                matchSql = c => s"size(regexp_extract_all($c, ${q(pat)}, 0)) > $i",
                applySql = Some(c =>
                  s"element_at(regexp_extract_all($c, ${q(pat)}, 0), ${if (fromEnd) -1 else i + 1})"))
            }
            card(idx, fromEnd = false) ::
              (if (idx == starts.size - 1) card(0, fromEnd = true) :: Nil else Nil)
          }
        }
    }
    position ++ charGroups
  }

  // ----------------------------------------------------- extract list / map

  /** Array-element extract rules (`ExtractListRecommender.java:49-82`): the
    * selection's character range in the JSON-rendered cell locates array
    * positions via [[JsonSelections]]. One element ⇒ the single-element
    * card; a range ⇒ the four sublist anchorings (each end measured from
    * the start or from the end), exactly the reference's `ListSelection`
    * fan-out. Offsets measured from the end use the SAMPLE cell's length —
    * that is the rule's meaning on every other row. */
  def extractListRules(sel: Selection): Seq[Card] = {
    val (ps, pe) = JsonSelections.locate(sel.cellText, sel.offset, sel.offset + sel.length)
      .getOrElse(throw new IllegalArgumentException(
        s"invalid JSON selection: ${sel.cellText}"))
    def lastIdx(p: List[JsonSelections.PathElem]): Int = p.reverse.collectFirst {
      case JsonSelections.Idx(i) => i
    }.getOrElse(throw new IllegalArgumentException(
      "list extract selection must cover array elements"))
    val s = lastIdx(ps)
    val e = lastIdx(pe)
    // length of the sample cell's array, for from-the-end offsets
    val n = JsonSelections.topLevelCount(sel.cellText)
    if (s == e)
      Seq(Card("extract", s"Element: $s",
        matchSql = c => s"$c[$s] IS NOT NULL",
        applySql = Some(c => s"$c[$s]")))
    else {
      val j = n - 1 - s // start offset from the end
      val k = n - 1 - e // end offset from the end
      def guard(cond: String => String, body: String => String): String => String =
        c => s"CASE WHEN ${cond(c)} THEN ${body(c)} ELSE NULL END"
      def card(desc: String, apply: String => String): Card =
        Card("extract", desc,
          matchSql = c => s"size(${apply(c)}) > 0",
          applySql = Some(apply))
      Seq(
        card(s"Elements: $s - $e",
          guard(c => s"size($c) > $e", c => s"slice($c, ${s + 1}, ${e - s + 1})")),
        card(s"Elements: $s - $k (from the end)",
          guard(c => s"size($c) > ${k + s}",
            c => s"slice($c, ${s + 1}, size($c) - ${k + s})")),
        card(s"Elements: $j (from the end) - $e",
          guard(c => s"size($c) > $j AND ${e + j + 2} - size($c) > 0",
            c => s"slice($c, size($c) - $j, ${e + j + 2} - size($c))")),
        card(s"Elements: $j - $k (both from the end)",
          guard(c => s"size($c) > ${math.max(j, k)}",
            c => s"slice($c, size($c) - $j, ${j - k + 1})")))
    }
  }

  /** Struct/map path extract (`ExtractMapRecommender.java:37-99`): the UI
    * hands the key path directly (`MapSelection.mapPathList`); the card is
    * the bracket-path extraction with an IS NOT NULL match. Path syntax:
    * dot-separated keys with optional `[i]` array steps — `a.b[2]`. */
  def extractMapRules(path: String): Seq[Card] = {
    val steps: Seq[String] = path.split('.').toSeq.flatMap { seg =>
      val base = seg.takeWhile(_ != '[')
      val idxs = "\\[(\\d+)\\]".r.findAllMatchIn(seg).map(_.group(1)).toSeq
      (if (base.nonEmpty) Seq(q(base)) else Nil) ++ idxs
    }
    def apply(c: String) = steps.foldLeft(c)((acc, s) => s"$acc[$s]")
    Seq(Card("extract", s"extract from map $path",
      matchSql = c => s"${apply(c)} IS NOT NULL",
      applySql = Some(apply)))
  }

  // ------------------------------------------------------------------ split

  /** Split-on-delimiter rules (`SplitRecommender.java:43-57`): the selected
    * text as an exact delimiter, plus an ignore-case variant when it has
    * case. Apply yields the pieces array; positional picks compose on top. */
  def splitRules(sel: Selection): Seq[Card] = {
    require(sel.cellText != null && sel.length > 0,
      "split recommendation requires a non-empty text selection")
    val delim = sel.selected
    def card(ignoreCase: Boolean): Card = {
      val pat = ci(ignoreCase) + quoted(delim)
      Card("split",
        s"""Exactly matches "$delim"""" + (if (ignoreCase) " ignore case" else ""),
        matchSql = c => s"$c rlike ${q(".*" + pat + ".*")}",
        applySql = Some(c => s"split($c, ${q(pat)})"))
    }
    card(ignoreCase = false) :: (if (hasCase(delim)) card(ignoreCase = true) :: Nil else Nil)
  }

  // ---------------------------------------------------------------- replace

  /** Replace / keep-only / exclude rules (`ReplaceRecommender.java:53-130`):
    * NULL cell ⇒ IS NULL; otherwise contains (+ starts-with when anchored
    * left, ends-with when anchored right, exact when the whole cell), each
    * in both case permutations when the text has case; plus the `\d+`
    * pattern card when the selection is a maximal digit run. */
  def replaceRules(sel: Selection): Seq[Card] = {
    if (sel.cellText == null)
      return Seq(Card("replace", "Is null",
        matchSql = c => s"$c IS NULL",
        applySql = Some(c => c), // replacement value spliced by applyReplace
        filterSql = Some(c => s"$c IS NULL")))

    val start = sel.offset
    val end = start + sel.length
    val content = sel.selected

    def perms(mk: Boolean => Card): Seq[Card] =
      if (hasCase(content)) Seq(mk(true), mk(false)) else Seq(mk(false))

    def regexCard(kind: String, regex: String, ignoreCase: Boolean): Card = {
      val pat = ci(ignoreCase) + regex
      Card("replace",
        s"""$kind "$content"""" + (if (ignoreCase) " ignore case" else ""),
        matchSql = c => s"$c rlike ${q(pat)}",
        applySql = Some(c => s"regexp_replace($c, ${q(pat)}, REPLACEMENT)"),
        filterSql = Some(c => s"$c rlike ${q(pat)}"))
    }

    val contains = perms(ic => regexCard("Contains", ".*" + quoted(content) + ".*", ic)
      .copy(applySql = Some(c => s"regexp_replace($c, ${q(ci(ic) + quoted(content))}, REPLACEMENT)")))
    val startsW =
      if (start == 0) perms(ic => regexCard("Starts with", "^" + quoted(content) + ".*", ic)
        .copy(applySql = Some(c => s"regexp_replace($c, ${q(ci(ic) + "^" + quoted(content))}, REPLACEMENT)")))
      else Nil
    val endsW =
      if (end == sel.cellText.length)
        perms(ic => regexCard("Ends with", ".*" + quoted(content) + "$", ic)
          .copy(applySql = Some(c => s"regexp_replace($c, ${q(ci(ic) + quoted(content) + "$")}, REPLACEMENT)")))
      else Nil
    val exact =
      if (start == 0 && end == sel.cellText.length)
        perms { ic =>
          val m: String => String =
            if (ic) c => s"lower($c) = lower(${q(content)})" else c => s"$c = ${q(content)}"
          Card("replace", s"""Exactly matches "$content"""" + (if (ic) " ignore case" else ""),
            matchSql = m,
            applySql = Some(c => s"CASE WHEN ${m(c)} THEN REPLACEMENT ELSE $c END"),
            filterSql = Some(m))
        }
      else Nil

    // digit-run pattern card (ReplaceRecommender.recommendReplacePattern)
    val digitPat = {
      val before = start > 0 && sel.cellText.substring(start - 1, start).matches("\\d")
      val after = end < sel.cellText.length && sel.cellText.substring(end, end + 1).matches("\\d")
      if (!before && !after && content.nonEmpty && content.matches("\\d+"))
        Seq(regexCard("Matches pattern", "\\d+", ignoreCase = false)
          .copy(description = """Matches regex "\d+""""))
      else Nil
    }

    contains ++ startsW ++ endsW ++ exact ++ digitPat
  }

  /** Splice a replacement value into a replace card's apply expression. */
  def applyReplace(card: Card, col: String, replacement: String): String =
    card.applySql.map(_.apply(col).replace("REPLACEMENT", q(replacement)))
      .getOrElse(q(replacement))

  // -------------------------------------------------------------- evaluation

  /** Score every card against the real column in ONE aggregate pass and
    * collect up to `exampleRows` example transforms per applicable card
    * from one bounded `take`. Returns cards ranked by match count
    * (descending, ties by description) — the reference's card ordering. */
  def evaluate(df: DataFrame, col: String, cards: Seq[Card],
               exampleRows: Int = 3): Seq[ScoredCard] = {
    if (cards.isEmpty) return Nil
    val c = s"`$col`"
    val aggs = count(lit(1)).as("__total") +:
      cards.zipWithIndex.map { case (card, i) =>
        sum(when(expr(card.matchSql(c)), 1L).otherwise(0L)).as(s"__m$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getLong(0)
    val counts = cards.indices.map(i => if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))

    // one bounded pass for examples: input + each card's example output
    val exampleExprs = cards.zipWithIndex.collect {
      case (card, i) if card.applySql.isDefined =>
        i -> expr(card.applySql.get.apply(c).replace("REPLACEMENT", "'…'")).cast("string").as(s"__e$i")
    }
    val anyMatch = cards.map(k => expr(k.matchSql(c))).reduce(_ || _)
    val sample: Seq[Row] =
      if (exampleExprs.isEmpty || exampleRows <= 0) Nil
      else df.where(anyMatch)
        .select((expr(c).cast("string").as("__in") +: exampleExprs.map(_._2)): _*)
        .take(exampleRows).toSeq
    val exIdx = exampleExprs.map(_._1).zipWithIndex.toMap // card idx -> sample col offset

    cards.zipWithIndex.map { case (card, i) =>
      val examples = exIdx.get(i) match {
        case Some(off) => sample.collect {
          case r if !r.isNullAt(off + 1) => (r.getString(0), r.getString(off + 1))
        }
        case None => Nil
      }
      ScoredCard(card, counts(i), total, examples)
    }.sortBy(sc => (-sc.matchCount, sc.card.description))
  }

  /** The full card deck for a selection on a string column, scored — the
    * one-call surface the reference exposes per transform tab. */
  def recommend(df: DataFrame, col: String, sel: Selection,
                exampleRows: Int = 3): Seq[ScoredCard] = {
    val deck =
      (if (sel.cellText != null && sel.length > 0)
        extractRules(sel) ++ splitRules(sel) else Nil) ++ replaceRules(sel)
    evaluate(df, col, deck, exampleRows)
  }
}
