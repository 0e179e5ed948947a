package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality / language-ID / token-count / fingerprint analytics over
  * the `documents` table. All pure column expressions (codegen'd, no UDFs):
  * at 100 TB these run as a single projection pass over the corpus.
  */
object TextAnalysis {

  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  private[llm] def tokens(c: Column): Column = filter(split(lower(c), "\\s+"), w => length(w) > 0)

  /** [[graft.engine.Parallelism.spread]] for the heavy per-row operators
    * here: tokenize/regex/md5 projections fuse into the scan stage and an
    * under-split source runs them one-task. Every consumer below is
    * partition-order-independent (per-row outputs, integer counts, or
    * 6dp-rounded means — documented per operator). No-ops at scale. */
  private def spreadIn(docs: DataFrame): DataFrame =
    graft.engine.Parallelism.spread(docs)

  /** Quality signals: length, token stats, punctuation/digit/stopword
    * ratios — the usual pre-training heuristics (cf. C4/Gopher rules). */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nToks = size(toks)
    val sw = typedLit(stopwordsEn)
    spreadIn(docs).select(
      col("doc_id"),
      length(col("text")).as("len_chars"),
      nToks.as("n_tokens"),
      (length(col("text")).cast("double") / nToks).as("avg_token_span"),
      (length(regexp_replace(col("text"), "[^.!?,;]", "")).cast("double") /
        length(col("text"))).as("punct_ratio"),
      (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        length(col("text"))).as("digit_ratio"),
      (size(filter(toks, w => array_contains(sw, w))).cast("double") / nToks)
        .as("stopword_ratio"),
      (size(array_distinct(toks)).cast("double") / nToks).as("distinct_token_ratio"))
  }

  /** URL curation signals (the C4/RefinedWeb URL-filter stage: drop
    * documents by source host before reading a byte of text): lowercased
    * host, registrable domain (last-two-label heuristic — a public-suffix
    * list drops into the same expression), path depth, and a blocklist
    * verdict matched on domain SUFFIX (blocking `example.com` blocks
    * `www.sub.example.com` but not `notexample.com`). Pure column
    * expressions over `parse_url`; the blocklist is a plan literal —
    * thousands of entries ride the broadcast the way every dim-table
    * filter does, with zero extra scans. */
  def urlSignals(docs: DataFrame, urlCol: String = "url",
                 blocklist: Seq[String] = Nil): DataFrame = {
    val host = lower(parse_url(col(urlCol), lit("HOST")))
    val path = coalesce(parse_url(col(urlCol), lit("PATH")), lit(""))
    val withHost = docs.withColumn("host", host)
    val blocked =
      if (blocklist.isEmpty) lit(false)
      else exists(typedLit(blocklist.map(_.toLowerCase)),
        b => col("host") === b || col("host").endsWith(concat(lit("."), b)))
    withHost
      .withColumn("registrable_domain",
        concat_ws(".", slice(split(col("host"), "\\."), -2, 2)))
      .withColumn("path_depth",
        size(filter(split(path, "/"), s => length(s) > 0)))
      .withColumn("blocked", blocked)
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letters / digits / single punctuation as separate tokens). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("bpeish_tokens"),
      (length(col("text")) - length(regexp_replace(col("text"), "\\s", ""))).as("ws_chars"))

  /** Key-collision fingerprint (sorted distinct token set → md5), the
    * classic clustering key for messy-duplicate detection. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(array_join(array_sort(array_distinct(tokens(col("text")))), " ")).as("fp"))

  /** HTML → text extraction — the WARC→WET step at the head of every web
    * corpus pipeline (CommonCrawl WET, trafilatura/jusText's baseline):
    * drop script/style/comment blocks, turn block-level closers into
    * newlines, strip the remaining tags, decode the common entities, and
    * normalize whitespace — plus the link/script counts quality filters
    * key on. Regex-based by design (RE2 ∩ java.util.regex dialect so the
    * DuckDB oracle runs the same patterns): NOT a conforming HTML5
    * parser — CDATA, conditional comments and broken markup degrade
    * gracefully rather than parse exactly, the standard trade at
    * scan-rate. One map-only projection, zero shuffles.
    *
    * Entity order matters: named entities decode BEFORE `&amp;` so
    * `&amp;lt;` yields `&lt;` (the text the author wrote), not `<`. */
  def htmlExtract(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val h = col(htmlCol)
    val noScript = regexp_replace(
      regexp_replace(h, "(?is)<script\\b[^>]*>.*?</script>", ""),
      "(?is)<style\\b[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val blocks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    val cleaned = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      entities, "[ \\t]+", " "), " ?\\n ?", "\n"), "\\n{3,}", "\n\n"),
      "^\\s+|\\s+$", "")
    docs
      .withColumn("n_links", regexp_count(h, lit("(?i)<a\\b")))
      .withColumn("n_scripts", regexp_count(h, lit("(?is)<script\\b[^>]*>")))
      .withColumn("text", cleaned)
      .withColumn("extract_ratio",
        when(length(h) === 0, 0.0)
          .otherwise(length(col("text")).cast("double") / length(h)))
  }

  /** URL canonicalization — the normalization step BEFORE URL-keyed dedup
    * (a crawl sees the same page as `HTTP://Host:80/p?b=2&utm_source=x&a=1#f`
    * and `http://host/p?a=1&b=2`): lowercase scheme+authority, strip the
    * fragment, strip default ports (http:80 / https:443), drop tracking
    * parameters (`utm_*`, `gclid`, `fbclid`, `ref`), and SORT the
    * surviving query parameters. The path keeps its case (paths are
    * case-sensitive per RFC 3986; the authority is not). Pure column
    * expressions in the RE2 ∩ java dialect — map-only, oracle-replayable. */
  def canonicalizeUrls(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), "#.*$", "")
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    // lowercase scheme://authority, keep the path's case
    val authLower = concat(
      lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)),
      regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""))
    val noPort = regexp_replace(
      regexp_replace(authLower, "^(http://[^/:]+):80(/.*)?$", "$1$2"),
      "^(https://[^/:]+):443(/.*)?$", "$1$2")
    val params = sort_array(filter(split(query, "&"), p =>
      length(p) > 0 && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)=")))
    df.withColumn("url_canonical",
      concat(noPort,
        when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
          .otherwise(lit(""))))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS algorithm): hash every k-gram of the lowercased text, slide
    * a window of `w` hashes, select each window's MINIMUM hash (ties →
    * the RIGHTMOST occurrence), and keep the distinct (hash, position)
    * selections. Guarantee: any substring match of length ≥ w + k − 1
    * shares at least one fingerprint — the local, position-robust
    * alternative to MinHash for copy/plagiarism/near-dup detection.
    *
    * Hashes are the first 12 hex chars of md5(gram): fixed-width hex
    * minimizes IDENTICALLY as a string in any engine, which is what makes
    * the selection (and so the whole fingerprint set) oracle-exact. A
    * production run at 100 TB would swap md5 for the engine-native
    * xxhash64 — same plan, cheaper kernel; the selection logic is
    * unchanged. Map-only column expressions: one pass, zero shuffles,
    * scan-rate at any corpus size. Fingerprints are `"<hash>:<gramPos>"`
    * strings (1-based position in the gram sequence). */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 5,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1)
    val grams =
      s"""CASE WHEN length(lower($textCol)) < $k THEN array()
         |ELSE transform(sequence(1, length(lower($textCol)) - $k + 1),
         |  i -> substring(md5(substring(lower($textCol), i, $k)), 1, 12)) END"""
        .stripMargin.replace("\n", " ")
    val sel =
      s"""CASE WHEN size(__g) < $w THEN array()
         |ELSE array_distinct(transform(sequence(1, size(__g) - $w + 1),
         |  j -> concat(array_min(slice(__g, j, $w)), ':',
         |    j + $w - array_position(reverse(slice(__g, j, $w)),
         |                            array_min(slice(__g, j, $w))))))
         |END""".stripMargin.replace("\n", " ")
    spreadIn(docs)
      .withColumn("__g", expr(grams))
      .select(col(idCol), size(col("__g")).as("n_grams"),
        expr(sel).as("fingerprints"))
      .withColumn("n_fps", size(col("fingerprints")))
  }

  /** Stopword-profile language ID: score each candidate language by hit
    * count of its function-word list; argmax wins (ties → highest score
    * first, then lexicographic). A real deployment swaps in char-n-gram
    * profiles; the plumbing (N scores per row, argmax via greatest/when)
    * is the same single-pass projection. */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> stopwordsEn,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "del"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ein"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta", "men", "zai", "you", "he"))

  /** PII redaction: replace emails, dotted IPv4s, and NNN-NNN-NNNN phone
    * numbers with typed placeholder tags, reporting per-doc hit counts and
    * an md5 of the redacted text (the hash gates the full replacement
    * output without shipping it). Patterns stay inside the portable
    * RE2 ∩ java.util.regex dialect so the DuckDB oracle runs them
    * verbatim. Single codegen'd projection — one pass over the corpus. */
  def piiRedact(docs: DataFrame): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")
    spreadIn(docs).select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(ipRe)).as("n_ips"),
      regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
      md5(red).as("red_md5"),
      length(red).as("red_len"))
  }

  /** The Gopher document-quality rule set (Rae et al. 2021,
    * arXiv:2112.11446 Appendix A — the standard pre-training gate, also
    * the core of RefinedWeb/Dolma curation): word-count bounds, mean word
    * length bounds, symbol-to-word ratio (# and ellipsis), bullet-line /
    * ellipsis-line fractions, alphabetic-word fraction, and a minimum
    * count of distinct common English stopwords. One map-only pass of
    * pure column expressions — no shuffle, no UDF; at 100 TB this is a
    * scan-rate filter like every other row predicate. Returns every
    * signal plus the composite `pass` verdict so thresholds can be
    * re-tuned without recomputing. */
  def gopherRules(docs: DataFrame,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8, minStopwords: Int = 2): DataFrame = {
    val gopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = tokens(col("text"))
    val n = size(toks)
    val meanWordLen =
      aggregate(transform(toks, w => length(w)), lit(0), (a, x) => a + x)
        .cast("double") / n
    val nHash = length(regexp_replace(col("text"), "[^#]", ""))
    val nEllipsis =
      (length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3
    val symbolRatio = (nHash + nEllipsis).cast("double") / n
    val lines = split(col("text"), "\n")
    val nLines = size(lines)
    val bulletFrac = size(filter(lines, l =>
      ltrim(l).startsWith("-") || ltrim(l).startsWith("*") ||
        ltrim(l).startsWith("•"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
      .cast("double") / nLines
    val alphaFrac = size(filter(toks, w => w.rlike("[a-z]"))).cast("double") / n
    val nStop = size(filter(typedLit(gopherStopwords), sw => array_contains(toks, sw)))
    spreadIn(docs).select(
      col("doc_id"),
      n.as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"),
      nStop.as("n_stop_hits"),
      (n >= minWords && n <= maxWords &&
        meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen &&
        symbolRatio <= maxSymbolRatio &&
        bulletFrac <= maxBulletFrac && ellipsisFrac <= maxEllipsisFrac &&
        alphaFrac >= minAlphaFrac && nStop >= minStopwords).as("pass"))
  }

  /** Within-document line dedup (the Dolma/RefinedWeb "remove duplicated
    * lines inside a page" repair step — nav bars and footers repeat
    * INSIDE a page, not only across pages, and C4 §2.2 removes them
    * per-page before any corpus-level dedup): keep only each line's
    * FIRST occurrence, preserving order, and rebuild the document.
    * Returns line counts plus the cleaned text's md5/length so the
    * rebuild itself is checkable, not just the counts.
    *
    * One map-only pass of array expressions (no UDF, no shuffle, no
    * per-doc window — a scan-rate transform at 100 TB); the
    * first-occurrence test is `array_position(lines, x) == i+1` inside
    * a codegen'd higher-order filter, quadratic only in the per-doc
    * line count. */
  def dedupLinesInDoc(docs: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = filter(lines, (x, i) =>
      array_position(lines, x) === (i + lit(1)).cast("long"))
    val clean = array_join(kept, "\n")
    // NOT spread: DedupSpec pins this operator's map-only/no-Exchange plan
    // (the per-row rebuild is cheap; the guarantee is worth more)
    docs.select(col("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      length(clean).as("clean_chars"),
      md5(clean.cast("binary")).as("clean_md5"))
  }

  /** The C4 cleaning rule set (Raffel et al. 2020, arXiv:1910.10683
    * §2.2 — the other canonical pre-training gate next to
    * [[gopherRules]]): line-level keeps + page-level drops.
    *  - keep a line only if its trimmed form ends in terminal
    *    punctuation (`. ! ? "`), has ≥ `minLineWords` words, and does
    *    not mention "javascript";
    *  - drop the whole page when it contains "lorem ipsum" or a curly
    *    brace (code), when any configured bad word appears, or when the
    *    CLEANED page has fewer than `minSentences` sentences.
    * One map-only pass of column expressions (no UDF, no shuffle — a
    * scan-rate filter at 100 TB). Returns per-line/page signals plus the
    * cleaned text's md5/length, so thresholds re-tune without recompute.
    * The bad-word list is a parameter (C4's published list is an
    * external artifact); default empty. */
  def c4Rules(docs: DataFrame, minLineWords: Int = 3, minSentences: Int = 5,
              badwords: Seq[String] = Nil): DataFrame = {
    val lines = split(col("text"), "\n")
    def keepLine(l: Column): Column = {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minLineWords &&
        !lower(t).contains("javascript")
    }
    val kept = filter(lines, keepLine _)
    val cleaned = array_join(kept, "\n")
    val nSentences = length(regexp_replace(cleaned, "[^.!?]", ""))
    val hasLorem = lower(col("text")).contains("lorem ipsum")
    val hasBrace = col("text").contains("{")
    val hasBadword = badwords.foldLeft(lit(false)) { (acc, w) =>
      acc || lower(col("text")).contains(w.toLowerCase)
    }
    // NOT spread: sub-second op — the exchange's fixed cost exceeds the
    // parallel-map saving (bench A/B)
    docs.select(
      col("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_lines_kept"),
      nSentences.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (!hasLorem && !hasBrace && !hasBadword &&
        nSentences >= minSentences).as("page_keep"),
      md5(cleaned).as("clean_md5"),
      length(cleaned).as("clean_len"))
  }

  /** Gopher-style repetition signals: per-doc bigram duplication fraction
    * and top-bigram coverage (a doc whose most common 2-gram covers a
    * large share of the text is boilerplate/spam). Explode + two-phase
    * count — both aggregations partial-combine map-side, so the shuffle
    * carries (doc, gram, partial count), never raw text. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    // native tokenize-once bigram kernel, duplicates kept (distinct=false)
    // NOT spread: the map side is a bare tokenize feeding a partial agg —
    // A/B showed the extra exchange costs what the parallel tokenize saves
    val bigrams = graft.functions.Functions.word_ngrams(col("text"), 2, distinct = false)
    docs.select(col("doc_id"), explode(bigrams).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(
        sum(col("cnt")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_n"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"), col("top_n"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"))
          .as("dup_bigram_frac"),
        (col("top_n").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
  }

  /** Token-distribution entropy per doc: Shannon entropy of the token
    * frequency distribution (H = ln N − Σ c·ln c / N) plus the
    * log-normalized form (H / ln distinct). Low entropy flags boilerplate
    * and keyword-stuffed spam; it complements the repetition signals.
    * Same two-phase explode/count shape as [[repetitionSignals]] — both
    * aggregations partial-combine map-side, the shuffle carries
    * (doc, token, count). Entropies are rounded to 6 decimals so the
    * cross-engine float-accumulation-order divergence (~1e-14) can never
    * flip a hash compare. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    // NOT spread: bare tokenize → partial agg (see repetitionSignals)
    val h = log(col("n_tokens").cast("double")) - col("__s") / col("n_tokens")
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt").cast("double") * log(col("cnt").cast("double"))).as("__s"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(h, 6).as("token_entropy"),
        when(col("n_distinct") === 1, lit(0.0))
          .otherwise(round(h / log(col("n_distinct").cast("double")), 6))
          .as("norm_entropy"))
  }

  /** Corpus bigram language-model score per doc: mean log2 of the add-k
    * smoothed conditional P(w2|w1) = (c(w1 w2)+k)/(c(w1)+k·V) with counts
    * and vocabulary V taken from the corpus itself. The cheap statistical
    * stand-in for perplexity-based quality filtering (the CCNet/Gopher
    * recipe scores docs with a KenLM n-gram model the same way): fluent,
    * corpus-typical text scores high; gibberish and token-salad score low.
    * Docs with fewer than 2 tokens have no bigrams and emit no row.
    *
    * Scale: two count aggregations (both map-side partial), then the doc
    * grams re-join the count tables keyed on the gram / first word —
    * plain shuffle joins that scale with corpus vocabulary; only the
    * 1-row vocabulary size broadcasts. Tokenization matches [[tokens]]
    * (lowercased whitespace split) via the tokenize-once `word_ngrams`
    * kernel. log2 averages are rounded to 6 decimals so accumulation
    * order can't flip a hash compare. */
  def lmScore(docs: DataFrame, k: Double = 0.5): DataFrame = {
    // NOT spread: bare tokenize → partial agg (see repetitionSignals)
    val eligible = docs.filter(size(tokens(col("text"))) >= 2)
    val grams = eligible.select(col("doc_id"),
      explode(graft.functions.Functions.word_ngrams(col("text"), 2, distinct = false))
        .as("gram"))
    val uni = eligible.select(explode(tokens(col("text"))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c_uni"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
    grams
      .join(bi(grams), "gram")
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log2((col("c_bi") + lit(k)) / (col("c_uni") + lit(k) * col("v"))).as("logp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("logp")), 6).as("mean_log2p"))
  }

  private def bi(grams: DataFrame): DataFrame =
    grams.groupBy("gram").agg(count(lit(1)).as("c_bi"))

  /** Trigram LM with STUPID BACKOFF (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — the web-scale LM scoring recipe):
    * S(w3|w1w2) = c123/c12, backing off to 0.4·c23/c2, then to an add-k
    * smoothed unigram floor 0.4²·(c3+k)/(N+kV) so out-of-vocabulary
    * words score finite instead of log(0). The model trains on `train`
    * and scores `score` — the real deployment shape (reference corpus →
    * candidate corpus), and what actually exercises the backoff chain.
    *
    * Scale: three count aggregates over the training corpus (all
    * map-side partial, gram-keyed shuffles), then the scored docs' grams
    * LEFT-join the count tables; only the 1-row (N, V) totals broadcast.
    * Means round to 6dp so accumulation order can't flip a hash
    * compare. */
  def trigramLmScore(train: DataFrame, score: DataFrame,
                     alpha: Double = 0.4, k: Double = 0.5): DataFrame = {
    // NOT spread: bare tokenize → partial aggs (see repetitionSignals)
    val tri = train.select(explode(
        graft.functions.Functions.word_ngrams(col("text"), 3, distinct = false))
        .as("g3")).groupBy("g3").agg(count(lit(1)).as("c123"))
    val big = train.select(explode(
        graft.functions.Functions.word_ngrams(col("text"), 2, distinct = false))
        .as("g2")).groupBy("g2").agg(count(lit(1)).as("c12"))
    val uni = train.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val totals = uni.agg(sum(col("c1")).cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))

    val grams = score.filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), explode(
        graft.functions.Functions.word_ngrams(col("text"), 3, distinct = false))
        .as("g3"))
      .withColumn("w1", substring_index(col("g3"), " ", 1))
      .withColumn("w3", substring_index(col("g3"), " ", -1))
      .withColumn("w2",
        substring_index(substring_index(col("g3"), " ", 2), " ", -1))
      .withColumn("g12", concat_ws(" ", col("w1"), col("w2")))
      .withColumn("g23", concat_ws(" ", col("w2"), col("w3")))

    val biAs = (a: String) => big.select(col("g2").as(a + "_g"), col("c12").as("c_" + a))
    val scored = grams
      .join(tri, Seq("g3"), "left")
      .join(biAs("b12"), grams("g12") === col("b12_g"), "left")
      .join(biAs("b23"), grams("g23") === col("b23_g"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c_w2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c_w3")), Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        when(col("c123").isNotNull && col("c_b12").isNotNull,
          col("c123").cast("double") / col("c_b12"))
          .otherwise(lit(alpha) *
            when(col("c_b23").isNotNull && col("c_w2").isNotNull,
              col("c_b23").cast("double") / col("c_w2"))
              .otherwise(lit(alpha) *
                (coalesce(col("c_w3").cast("double"), lit(0.0)) + lit(k)) /
                (col("n") + lit(k) * col("v")))).as("s"),
        col("c123").isNull.cast("int").as("backed_off"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("backed_off")).as("n_backoffs"),
        round(avg(log2(col("s"))), 6).as("mean_log2s"))
  }

  /** TF-IDF keyword extraction: the top-k most distinctive terms per
    * document against the corpus (tf × smoothed idf — the classic
    * `ln((N+1)/(df+1)) + 1` form), the standard featurization for
    * quality/topic signals and near-neighbor blocking.
    *
    * Scale: term frequencies are one two-phase aggregate on (doc, term);
    * document frequencies one aggregate on term (8-byte-ish keys after
    * dictionary hashing at real scale; raw terms here for oracle
    * bit-exactness); N is a 1-row broadcast; the per-doc top-k window
    * partitions by doc_id, so each partition sorts only ONE document's
    * distinct terms (bounded by doc length — never the vocabulary).
    * Scores round to 6dp so accumulation order can't flip a hash
    * compare; ties break by term ascending. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col("doc_id")).cast("double").as("n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * (log((col("n") + 1) / (col("df") + 1)) + 1), 6).as("tfidf"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** CCNet-style perplexity tiers: score every doc with the corpus bigram
    * LM ([[lmScore]]), cut the score distribution at the exact 1/3 and 2/3
    * percentiles, and label each doc `head` (most fluent), `middle`, or
    * `tail` — the bucketing CCNet uses to keep/downsample/drop web text by
    * LM perplexity.
    *
    * Scale: the cuts are ONE tiny aggregate (two numbers) broadcast back
    * over the scored set — bucket assignment is an embarrassingly parallel
    * comparison, NOT a global NTILE sort (a single-partition window over
    * 100 TB of scores would serialize; two percentiles + a broadcast
    * doesn't). Cuts are rounded to 6dp so libm/summation-order noise in
    * the interpolation can't flip a boundary doc between engines. */
  def perplexityBuckets(docs: DataFrame, k: Double = 0.5): DataFrame = {
    val scored = lmScore(docs, k)
    val cuts = scored.agg(
      round(expr("percentile(mean_log2p, 1.0d/3)"), 6).as("p33"),
      round(expr("percentile(mean_log2p, 2.0d/3)"), 6).as("p66"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("mean_log2p"),
        when(col("mean_log2p") > col("p66"), lit("head"))
          .when(col("mean_log2p") > col("p33"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Power-of-two token-length histogram per language — the batch-shaping
    * profile an inference/training scheduler needs (how many docs land in
    * each 2^k..2^(k+1) context bucket). The bucket exponent is computed
    * with integer arithmetic (`length(bin(n)) - 1`), not floor(log2):
    * log2 via doubles can land on 7.9999… at exact powers of two and
    * mis-bucket boundary docs differently per engine. Single projection +
    * one small aggregation. */
  def lengthBuckets(docs: DataFrame): DataFrame = {
    val n = size(tokens(col("text")))
    val bucket = when(n <= 0, lit(-1))
      .otherwise((length(bin(n.cast("long"))) - 1).cast("int"))
    docs.select(col("lang"), n.as("n_tokens"), bucket.as("bucket_log2"))
      .groupBy(col("lang"), col("bucket_log2")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .withColumn("bucket_lo",
        when(col("bucket_log2") < 0, lit(0L))
          .otherwise(pow(lit(2.0), col("bucket_log2")).cast("long")))
  }

  /** Character-class hygiene signals (C4-style corpus filters): control
    * characters (minus \t\n\r), non-ASCII fraction, and U+FFFD
    * replacement characters — the standard mojibake / binary-contamination
    * detectors. Patterns stay in the portable RE2 ∩ java.util.regex
    * dialect; single codegen'd projection. */
  def charClassSignals(docs: DataFrame): DataFrame = {
    val ctl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    val nonAscii = "[^\\x00-\\x7F]"
    // NOT spread: sub-second op (see c4Rules)
    docs.select(
      col("doc_id"),
      length(col("text")).as("len_chars"),
      regexp_count(col("text"), lit(ctl)).as("n_control"),
      regexp_count(col("text"), lit(nonAscii)).as("n_non_ascii"),
      regexp_count(col("text"), lit("�")).as("n_replacement"),
      (regexp_count(col("text"), lit(ctl)).cast("double") /
        length(col("text"))).as("control_ratio"),
      (regexp_count(col("text"), lit(nonAscii)).cast("double") /
        length(col("text"))).as("non_ascii_ratio"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): rank a raw corpus by how target-like each
    * document is. Features are hashed bag-of-ngrams (word unigrams +
    * bigrams → md5-derived buckets, so ANY engine reproduces them);
    * the target and raw bucket distributions are Laplace-smoothed, and a
    * document's log importance weight is
    * Σ_features [ln p̂_target(bucket) − ln p̂_raw(bucket)] — high weight =
    * looks like the target domain, the paper's selection criterion
    * (downstream: top-k or Gumbel resampling).
    *
    * Scale: ONE count aggregate over `buckets` keys (map-side partial;
    * B=1024 keys is a trivial shuffle) produces both distributions; they
    * return to the plan as one broadcast B-entry literal lookup array and
    * scoring is a single map-only pass — no join, no window, nothing
    * driver-side beyond the bounded B-row distribution (the accepted
    * codebook pattern). Weights round to 6dp so engine-specific float
    * accumulation order (~1e-13) can't flip a hash compare. */
  def dsirWeights(docs: DataFrame, isTarget: Column,
                  buckets: Int = 1024): DataFrame = {
    val b = buckets
    def feats(text: Column): Column = concat(tokens(text),
      graft.functions.Functions.word_ngrams(text, 2, distinct = false))
    def bucketOf(tok: Column): Column =
      pmod(conv(substring(md5(tok.cast("binary")), 1, 6), 16, 10).cast("long"),
        lit(b.toLong))
    // Featurize + md5-bucket ONCE: both the distribution aggregate and the
    // scoring pass consume the per-doc bucket ARRAY — previously each pass
    // re-tokenized and re-md5'd the corpus from scratch (the md5s are the
    // dominant cost). `spread` parallelizes the one featurize pass; the
    // eager localCheckpoint pins its result for both consumers (narrow
    // int-array rows, text dropped — same residency trade as semDedup's
    // assigned corpus; spark.graft.dsir.materialize=false re-derives per
    // consumer instead).
    val withB = graft.engine.Parallelism.spread(
        docs.select(col("doc_id"), isTarget.as("is_t"), col("text")))
      .select(col("doc_id"), col("is_t"), feats(col("text")).as("fs"))
      .filter(size(col("fs")) >= 1)
      .select(col("doc_id"), col("is_t"), size(col("fs")).as("n_feats"),
        transform(col("fs"), f => bucketOf(f)).as("bks"))
      .transform { df =>
        val on = df.sparkSession.conf
          .getOption("spark.graft.dsir.materialize").forall(_.toBoolean)
        if (on) df.localCheckpoint(true) else df
      }
    val dist = withB.select(col("is_t"), explode(col("bks")).as("bk"))
      .groupBy("bk").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .collect() // bounded: exactly `buckets` rows
    val ct = new Array[Long](b); val cr = new Array[Long](b)
    dist.foreach { r =>
      val i = r.getLong(0).toInt; ct(i) = r.getLong(1); cr(i) = r.getLong(2)
    }
    val totT = ct.sum.toDouble; val totR = cr.sum.toDouble
    val lut: Seq[Double] = (0 until b).map(i =>
      math.log((ct(i) + 1.0) / (totT + b)) - math.log((cr(i) + 1.0) / (totR + b)))
    // same per-row left-fold order as the old per-feature form (transform
    // preserves fs order), so dsir_lw is bit-identical
    withB.select(col("doc_id"), col("n_feats"),
      round(aggregate(col("bks"), lit(0.0), (acc, bk) =>
        acc + element_at(typedLit(lut), (bk + 1).cast("int"))), 6)
        .as("dsir_lw"))
  }

  /** Multinomial Naive-Bayes domain/quality classifier — the statistical
    * core of the fastText-style filters the big pipelines train on a
    * target corpus vs the raw crawl (CCNet's Wikipedia-vs-CommonCrawl
    * filter; the GPT-3 quality classifier scored the same way, with docs
    * kept by thresholding the log-odds). Trains and scores in one
    * distributed pass: per-token class counts give the add-k smoothed
    * per-class likelihoods, and each doc's score is
    * `log P(doc|target) − log P(doc|rest) + log(prior odds)` — positive
    * means target-like.
    *
    * Scale: ONE token-count aggregate (map-side partial) builds the
    * model; the vocabulary table never leaves the cluster — scoring
    * re-joins the exploded tokens on the word key (a plain shuffle join
    * that scales with corpus vocabulary), and only the 1-row totals and
    * prior broadcast. Log-odds round to 6 decimals so accumulation order
    * can't flip a hash compare. Zero-token docs emit no row. */
  def nbDomainLogOdds(docs: DataFrame, isTarget: Column,
                      k: Double = 0.5): DataFrame = {
    val labeled = docs.select(col("doc_id"), isTarget.as("is_t"), col("text"))
    val toks = labeled.select(col("doc_id"), col("is_t"),
      explode(tokens(col("text"))).as("w"))
    val counts = toks.groupBy("w").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
      count(lit(1)).as("c_all"))
    val totals = counts.agg(
      sum(col("c_t")).as("n_t"),
      sum(col("c_all") - col("c_t")).as("n_o"),
      count(lit(1)).cast("double").as("v"))
    val prior = labeled.agg(
      log(sum(when(col("is_t"), 1L).otherwise(0L)).cast("double") /
        sum(when(col("is_t"), 0L).otherwise(1L)).cast("double")).as("lp"))
    toks.join(counts, "w")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (log((col("c_t") + lit(k)) / (col("n_t") + lit(k) * col("v"))) -
          log((col("c_all") - col("c_t") + lit(k)) /
            (col("n_o") + lit(k) * col("v")))).as("lo"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lo")).as("s"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("n_tokens"),
        round(col("s") + col("lp"), 6).as("nb_logodds"))
  }

  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, w => array_contains(typedLit(words), w))).as("score"),
        lit(lang).as("lang"))
    }
    // one greatest() into a temp struct, then project both fields from it
    spreadIn(docs).select(col("doc_id"), col("lang").as("labeled_lang"),
        greatest(scored: _*).as("best"))
      .select(col("doc_id"), col("labeled_lang"),
        col("best.lang").as("predicted_lang"),
        col("best.score").as("score"))
  }
}
