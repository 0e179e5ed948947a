package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lucene query-string engine behind `lucene_match` / CONTAINS.
  *
  * The reference embeds the full classic Lucene QueryParser grammar in its
  * SQL parser (`sabot/grammar/src/main/codegen/includes/lucene.ftl`) and
  * exposes it as the boolean `CONTAINS(field:query …)` predicate
  * (`exec/planner/sql/parser/SqlContains.java` — BIT return type). There
  * it is only ever pushed down to Elasticsearch; here the same query
  * language is evaluated natively by the engine, so it works over ANY
  * table. Spark-first shape: a compiled, serializable matcher referenced
  * from a codegen'd Catalyst expression — a map-only predicate, no
  * shuffle, and the query string parses ONCE at plan time, not per row.
  *
  * Supported (classic QueryParser semantics):
  *   - terms (`error`), phrases (`"out of memory"`), phrase slop
  *     (`"out memory"~2` — ordered, total gap ≤ slop)
  *   - boolean: `AND`/`&&`, `OR`/`||`, `NOT`/`!`, `+must`, `-mustNot`,
  *     grouping with parens; classic occur resolution — AND promotes its
  *     left neighbor to MUST, OR demotes it back to SHOULD, a MUST-less
  *     query matches on any SHOULD clause
  *   - field scoping: `lang:en`, `title:(foo bar)`; unscoped terms match
  *     ANY input field (single-column input has one field)
  *   - wildcards `te?t`/`test*`/`*est` (per analyzed token), regex
  *     `/te.t/` (whole-token), fuzzy `roam~1` (Damerau-Levenshtein,
  *     default 2 edits), ranges `[a TO b]` / `{a TO b}` (lexicographic on
  *     analyzed tokens; `*` = unbounded), bare `*` = match-all
  *   - boosts (`^2`) parse and are ignored — CONTAINS is boolean, there
  *     is no score to boost (same as the reference's BIT contract)
  *
  * Analyzer (both sides — indexed text and query terms): lowercase, then
  * maximal runs of Unicode letters/digits. Deterministic and replayable
  * by DuckDB as `regexp_split_to_array(lower(text), '[^\p{L}\p{Nd}]+')`,
  * which is what the oracle for the registered query does.
  */
object Lucene {

  sealed abstract class Occur
  case object Should extends Occur
  case object Must extends Occur
  case object MustNot extends Occur

  sealed trait Q extends Serializable {
    def field: Option[String]
  }
  final case class TermQ(field: Option[String], term: String) extends Q
  final case class PhraseQ(field: Option[String], terms: Vector[String],
                           slop: Int) extends Q
  final case class WildQ(field: Option[String], pattern: String) extends Q {
    @transient lazy val re: java.util.regex.Pattern = {
      val sb = new StringBuilder
      pattern.foreach {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case c   => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      java.util.regex.Pattern.compile(sb.toString)
    }
  }
  final case class RegexQ(field: Option[String], regex: String) extends Q {
    @transient lazy val re: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(regex)
  }
  final case class FuzzyQ(field: Option[String], term: String,
                          maxEdits: Int) extends Q
  final case class RangeQ(field: Option[String], lo: Option[String],
                          hi: Option[String], incLo: Boolean,
                          incHi: Boolean) extends Q
  final case class MatchAllQ(field: Option[String]) extends Q
  final case class BoolQ(clauses: Vector[(Occur, Q)]) extends Q {
    def field: Option[String] = None
  }

  /** Analyzer shared by documents and query terms. */
  def analyze(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    val n = lower.length
    while (i < n) {
      val cp = lower.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) {
        val start = i
        var j = i
        while (j < n && Character.isLetterOrDigit(lower.codePointAt(j)))
          j += Character.charCount(lower.codePointAt(j))
        out += lower.substring(start, j)
        i = j
      } else i += Character.charCount(cp)
    }
    out.toArray
  }

  // ------------------------------------------------------------------
  // parser: hand lexer + recursive descent over the lucene.ftl grammar
  // ------------------------------------------------------------------

  private final class P(s: String) {
    private var pos = 0
    private def ws(): Unit = { while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1 }
    def eof: Boolean = { ws(); pos >= s.length }
    def peek: Char = { ws(); s.charAt(pos) }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"lucene_match: $msg at offset $pos in query: $s")

    /** keyword conjunction/modifier lookahead (word boundary enforced) */
    private def keyword(k: String): Boolean = {
      ws()
      if (s.regionMatches(true, pos, k, 0, k.length) &&
          (pos + k.length >= s.length ||
            !Character.isLetterOrDigit(s.charAt(pos + k.length)))) {
        pos += k.length; true
      } else false
    }
    private def sym(c: Char): Boolean = {
      ws(); if (pos < s.length && s.charAt(pos) == c) { pos += 1; true } else false
    }
    private def sym2(c: String): Boolean = {
      ws()
      if (pos + 1 < s.length && s.substring(pos, pos + 2) == c) { pos += 2; true }
      else false
    }

    def parseQuery(): Q = {
      val clauses = scala.collection.mutable.ArrayBuffer.empty[(Occur, Q)]
      var first = true
      while (!eof && peek != ')') {
        // Conjunction
        val conj =
          if (first) None
          else if (sym2("&&") || keyword("AND")) Some(true)
          else if (sym2("||") || keyword("OR")) Some(false)
          else None
        // Modifiers
        val occurMod =
          if (sym('+')) Some(Must)
          else if (sym('-')) Some(MustNot)
          else if (sym('!') || keyword("NOT")) Some(MustNot)
          else None
        val q = parseClause()
        // classic QueryParser addClause: AND promotes the previous SHOULD
        // clause to MUST; OR demotes a previous MUST back to SHOULD
        conj match {
          case Some(true) if clauses.nonEmpty && clauses.last._1 == Should =>
            clauses(clauses.length - 1) = (Must, clauses.last._2)
          case Some(false) if clauses.nonEmpty && clauses.last._1 == Must =>
            clauses(clauses.length - 1) = (Should, clauses.last._2)
          case _ => ()
        }
        val occur = occurMod.getOrElse(if (conj.contains(true)) Must else Should)
        clauses += ((occur, q))
        first = false
      }
      if (clauses.isEmpty) fail("empty query")
      if (clauses.length == 1 && clauses.head._1 == Should) clauses.head._2
      else BoolQ(clauses.toVector)
    }

    private def parseClause(): Q = {
      ws()
      // optional `field :` prefix (lookahead for the colon)
      val save = pos
      val field = readBareWord() match {
        case Some(w) if sym(':') => Some(w.toLowerCase(java.util.Locale.ROOT))
        case _ => pos = save; None
      }
      val q =
        if (sym('(')) {
          val inner = parseQuery()
          if (!sym(')')) fail("expected ')'")
          scope(inner, field)
        } else parseAtom(field)
      skipBoost()
      q
    }

    /** push a field scope onto every unscoped leaf of a grouped query */
    private def scope(q: Q, field: Option[String]): Q =
      if (field.isEmpty) q
      else q match {
        case b: BoolQ => BoolQ(b.clauses.map { case (o, c) => (o, scope(c, field)) })
        case t: TermQ if t.field.isEmpty => t.copy(field = field)
        case p: PhraseQ if p.field.isEmpty => p.copy(field = field)
        case w: WildQ if w.field.isEmpty => w.copy(field = field)
        case r: RegexQ if r.field.isEmpty => r.copy(field = field)
        case f: FuzzyQ if f.field.isEmpty => f.copy(field = field)
        case r: RangeQ if r.field.isEmpty => r.copy(field = field)
        case m: MatchAllQ if m.field.isEmpty => m.copy(field = field)
        case other => other
      }

    private def parseAtom(field: Option[String]): Q = {
      ws()
      if (pos >= s.length) fail("expected a term")
      s.charAt(pos) match {
        case '"' =>
          pos += 1
          val sb = new StringBuilder
          while (pos < s.length && s.charAt(pos) != '"') {
            if (s.charAt(pos) == '\\' && pos + 1 < s.length) pos += 1
            sb.append(s.charAt(pos)); pos += 1
          }
          if (pos >= s.length) fail("unterminated phrase")
          pos += 1
          val slop = readSlop().getOrElse(0)
          val terms = analyze(sb.toString).toVector
          if (terms.isEmpty) fail("empty phrase")
          if (terms.length == 1 && slop == 0) TermQ(field, terms.head)
          else PhraseQ(field, terms, slop)
        case '[' | '{' =>
          val incLo = s.charAt(pos) == '['; pos += 1
          val lo = readRangeWord()
          if (!keyword("TO")) fail("expected TO in range")
          val hi = readRangeWord()
          ws()
          if (pos >= s.length || (s.charAt(pos) != ']' && s.charAt(pos) != '}'))
            fail("unterminated range")
          val incHi = s.charAt(pos) == ']'; pos += 1
          def bound(w: String): Option[String] =
            if (w == "*") None else Some(w.toLowerCase(java.util.Locale.ROOT))
          RangeQ(field, bound(lo), bound(hi), incLo, incHi)
        case '/' =>
          pos += 1
          val sb = new StringBuilder
          while (pos < s.length && s.charAt(pos) != '/') {
            if (s.charAt(pos) == '\\' && pos + 1 < s.length &&
                s.charAt(pos + 1) == '/') pos += 1
            sb.append(s.charAt(pos)); pos += 1
          }
          if (pos >= s.length) fail("unterminated regex")
          pos += 1
          RegexQ(field, sb.toString)
        case _ =>
          val w = readBareWord().getOrElse(fail("expected a term"))
          if (w == "*") MatchAllQ(field)
          else {
            val fuzz = readSlop()
            val lower = w.toLowerCase(java.util.Locale.ROOT)
            if (fuzz.isDefined)
              FuzzyQ(field, lower, math.max(0, math.min(2, fuzz.get)))
            else if (lower.exists(c => c == '*' || c == '?'))
              WildQ(field, lower)
            else {
              val terms = analyze(w).toVector
              if (terms.isEmpty) fail(s"term '$w' analyzes to nothing")
              else if (terms.length == 1) TermQ(field, terms.head)
              else PhraseQ(field, terms, 0) // hyphenated etc. → phrase
            }
          }
      }
    }

    /** `~` with optional number (fuzzy edits / phrase slop; bare ~ = 2) */
    private def readSlop(): Option[Int] = {
      if (pos < s.length && s.charAt(pos) == '~') {
        pos += 1
        val start = pos
        while (pos < s.length && (s.charAt(pos).isDigit)) pos += 1
        Some(if (pos > start) s.substring(start, pos).toInt else 2)
      } else None
    }

    private def skipBoost(): Unit =
      if (pos < s.length && s.charAt(pos) == '^') {
        pos += 1
        while (pos < s.length &&
          (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
      }

    private def term_start(c: Char): Boolean =
      !c.isWhitespace && !"+-!():^[]{}\"~/".contains(c)
    private def term_char(c: Char): Boolean =
      !c.isWhitespace && !"():^~\"".contains(c)

    private def readBareWord(): Option[String] = {
      ws()
      if (pos >= s.length) return None
      if (s.charAt(pos) == '*' &&
          (pos + 1 >= s.length || !term_char(s.charAt(pos + 1)))) {
        pos += 1; return Some("*")
      }
      if (!term_start(s.charAt(pos)) && s.charAt(pos) != '*') return None
      val start = pos
      val sb = new StringBuilder
      while (pos < s.length && term_char(s.charAt(pos))) {
        if (s.charAt(pos) == '\\' && pos + 1 < s.length) pos += 1
        sb.append(s.charAt(pos)); pos += 1
      }
      if (pos == start) None else Some(sb.toString)
    }

    private def readRangeWord(): String = {
      ws()
      if (pos < s.length && s.charAt(pos) == '"') {
        pos += 1
        val start = pos
        while (pos < s.length && s.charAt(pos) != '"') pos += 1
        val w = s.substring(start, pos); pos += 1; w
      } else {
        val start = pos
        while (pos < s.length && !s.charAt(pos).isWhitespace &&
          s.charAt(pos) != ']' && s.charAt(pos) != '}') pos += 1
        s.substring(start, pos)
      }
    }
  }

  def parse(query: String): Q = {
    val p = new P(query)
    val q = p.parseQuery()
    require(p.eof, s"lucene_match: trailing input in query: $query")
    q
  }

  /** Damerau-Levenshtein (adjacent transposition counts 1) with cutoff. */
  private[functions] def editsWithin(a: String, b: String, max: Int): Boolean = {
    if (math.abs(a.length - b.length) > max) return false
    if (max == 0) return a == b
    val m = a.length; val n = b.length
    var prev2: Array[Int] = null
    var prev = Array.tabulate(n + 1)(identity)
    var i = 1
    while (i <= m) {
      val cur = new Array[Int](n + 1)
      cur(0) = i
      var rowMin = cur(0)
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var v = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
            a.charAt(i - 2) == b.charAt(j - 1))
          v = math.min(v, prev2(j - 2) + 1)
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > max) return false
      prev2 = prev; prev = cur; i += 1
    }
    prev(n) <= max
  }

  /** ordered sloppy-phrase match: terms in order, total extra gap ≤ slop
    * (greedy earliest-next gives the minimal span from each start). */
  private def phraseAt(tokens: Array[String], terms: Vector[String],
                       slop: Int): Boolean = {
    val k = terms.length
    var start = 0
    while (start <= tokens.length - k) {
      if (tokens(start) == terms.head) {
        var ti = 1
        var pos = start
        var ok = true
        while (ok && ti < k) {
          var p = pos + 1
          while (p < tokens.length && tokens(p) != terms(ti)) p += 1
          if (p >= tokens.length) ok = false
          else { pos = p; ti += 1 }
        }
        if (ok && (pos - start) - (k - 1) <= slop) return true
      }
      start += 1
    }
    false
  }

  /** Compiled matcher: evaluates a parsed query against per-field analyzed
    * token arrays. `fields` is the input column layout (lowercased); the
    * compile step validates every field the query names against it. */
  final class Matcher(val q: Q, val fields: Array[String]) extends Serializable {
    private val idx: Map[String, Int] = fields.zipWithIndex.toMap

    { // validate field references once, at compile time
      def walk(x: Q): Unit = x match {
        case b: BoolQ => b.clauses.foreach(c => walk(c._2))
        case leaf =>
          leaf.field.foreach(f => require(idx.contains(f),
            s"lucene_match: query names unknown field '$f' " +
              s"(have: ${fields.mkString(", ")})"))
      }
      walk(q)
    }

    /** token arrays aligned with `fields`, null = null input value */
    def matches(tokens: Array[Array[String]]): Boolean = eval(q, tokens)

    private def anyField(field: Option[String], tokens: Array[Array[String]])
                        (p: Array[String] => Boolean): Boolean = field match {
      case Some(f) => val t = tokens(idx(f)); t != null && p(t)
      case None    => tokens.exists(t => t != null && p(t))
    }

    private def eval(x: Q, tokens: Array[Array[String]]): Boolean = x match {
      case TermQ(f, t)       => anyField(f, tokens)(_.contains(t))
      case PhraseQ(f, ts, s) => anyField(f, tokens)(phraseAt(_, ts, s))
      case w: WildQ          => anyField(w.field, tokens)(_.exists(tok => w.re.matcher(tok).matches()))
      case r: RegexQ         => anyField(r.field, tokens)(_.exists(tok => r.re.matcher(tok).matches()))
      case FuzzyQ(f, t, e)   => anyField(f, tokens)(_.exists(tok => editsWithin(t, tok, e)))
      case RangeQ(f, lo, hi, il, ih) => anyField(f, tokens)(_.exists { tok =>
        lo.forall(l => if (il) tok >= l else tok > l) &&
          hi.forall(h => if (ih) tok <= h else tok < h)
      })
      case MatchAllQ(f)      => anyField(f, tokens)(_ => true)
      case BoolQ(clauses)    =>
        val musts = clauses.filter(_._1 == Must)
        val nots = clauses.filter(_._1 == MustNot)
        val shoulds = clauses.filter(_._1 == Should)
        musts.forall(c => eval(c._2, tokens)) &&
          !nots.exists(c => eval(c._2, tokens)) &&
          (musts.nonEmpty || shoulds.isEmpty ||
            shoulds.exists(c => eval(c._2, tokens)))
    }
  }

  /** Codegen-referenced runtime: adapts the raw column value (UTF8String
    * or InternalRow of strings) to the matcher. Analysis happens here,
    * once per row, only for the fields the query can touch. */
  final class Runtime(query: String, fieldNames: Array[String])
      extends Serializable {
    private val matcher = new Matcher(parse(query), fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)))
    private val nFields = math.max(1, fieldNames.length)

    def matches(v: Object): Boolean = v match {
      case s: UTF8String =>
        matcher.matches(Array(analyze(s.toString)))
      case row: InternalRow =>
        val toks = new Array[Array[String]](nFields)
        var i = 0
        while (i < nFields) {
          toks(i) =
            if (row.isNullAt(i)) null
            else analyze(row.getUTF8String(i).toString)
          i += 1
        }
        matcher.matches(toks)
      case other =>
        throw new IllegalStateException(
          s"lucene_match: unsupported input ${other.getClass}")
    }
  }
}

/** lucene_match(text, 'query') / lucene_match(struct(a, b), 'f:query'):
  * boolean Lucene-query predicate (the reference's CONTAINS operator,
  * `SqlContains.java` — BIT return). Text input: every clause matches the
  * one column. Struct input: `field:` clauses address struct fields by
  * name, unscoped clauses match any field. The query must be a literal —
  * it compiles once at plan time (field names validated against the input
  * schema) and the codegen'd row path only analyzes + walks tokens. */
case class LuceneMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable

  private def queryString: String = right match {
    case Literal(s: UTF8String, StringType) if s != null => s.toString
    case _ => throw new IllegalArgumentException(
      "lucene_match: the query must be a non-null string literal")
  }

  private def fieldNames: Array[String] = left.dataType match {
    case StringType => Array("_text")
    case StructType(fs) =>
      require(fs.nonEmpty && fs.forall(_.dataType == StringType),
        "lucene_match: struct input must have only string fields")
      fs.map(_.name)
    case other => throw new IllegalArgumentException(
      s"lucene_match: input must be STRING or STRUCT<STRING...>, got $other")
  }

  @transient private lazy val runtime = new Lucene.Runtime(queryString, fieldNames)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    try { runtime; org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess }
    catch { case e: IllegalArgumentException =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(e.getMessage)
    }
  }

  override def nullSafeEval(input: Any, query: Any): Any =
    runtime.matches(input.asInstanceOf[Object])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = ctx.addReferenceObj("luceneRuntime", runtime,
      classOf[Lucene.Runtime].getName)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = $rt.matches($text);")
  }

  override def prettyName: String = "lucene_match"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
