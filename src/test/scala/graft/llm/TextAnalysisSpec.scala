package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quality signals compute pinned values on a crafted doc") {
    val df = Seq((1L, "The cat sat, and the dog ran!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualitySignals(df).head()
    assert(r.getAs[Int]("len_chars") == 29)
    assert(r.getAs[Int]("n_tokens") == 7)
    // "," and "!" -> 2 punct chars of 29
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 29) < 1e-12)
    // the, and, the -> 3 stopwords of 7 tokens ("cat," keeps the comma so
    // tokens are: the cat sat, and the dog ran!
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 3.0 / 7) < 1e-12)
  }

  test("token counts: whitespace vs bpe-ish segmentation") {
    val df = Seq((1L, "hello world 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).head()
    assert(r.getAs[Int]("ws_tokens") == 3)
    // hello | world | 42 | !
    assert(r.getAs[Int]("bpeish_tokens") == 4)
    assert(r.getAs[Int]("ws_chars") == 2)
  }

  test("fingerprint collapses token order and duplicates") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta alpha"),
      (3L, "delta epsilon zeta")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df).select("fp").as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("language id picks the profile with most stopword hits") {
    val df = Seq(
      (1L, "the cat is on the mat and it is warm", "en"),
      (2L, "el perro y la casa de los amigos en un dia", "es")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.languageId(df)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
  }

  test("pii redaction replaces emails, ips, and phones with typed tags") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org from 192.168.1.10 or call 555-867-5309"),
      (2L, "no pii here, just 3.14 and v1.2 release notes")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.piiRedact(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = rows(1L)
    assert(r1.getAs[Int]("n_emails") == 1)
    assert(r1.getAs[Int]("n_ips") == 1)
    assert(r1.getAs[Int]("n_phones") == 1)
    // "mail [EMAIL] from [IP] or call [PHONE]"
    assert(r1.getAs[Int]("red_len") == "mail [EMAIL] from [IP] or call [PHONE]".length)
    val r2 = rows(2L)
    assert(r2.getAs[Int]("n_emails") == 0 && r2.getAs[Int]("n_ips") == 0 &&
      r2.getAs[Int]("n_phones") == 0)
  }

  test("repetition signals flag duplicated bigrams and boilerplate coverage") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now"), // 7 bigrams, 2 distinct
      (2L, "each word appears exactly once here")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionSignals(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_bigrams") == 7L)
    assert(r1.getAs[Long]("n_distinct") == 2L)
    assert(r1.getAs[Long]("top_n") == 4L) // "buy now" x4
    assert(math.abs(r1.getAs[Double]("top_bigram_frac") - 4.0 / 7) < 1e-12)
    val r2 = rows(2L)
    assert(r2.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r2.getAs[Long]("top_n") == 1L)
  }

  test("token entropy: uniform text maxes out, repeated text collapses") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),   // 4 distinct of 4 -> H = ln 4, norm 1
      (2L, "spam spam spam spam spam"), // 1 distinct -> H = 0, norm 0
      (3L, "one one two")               // H = ln3 - (2 ln2)/3
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tokenEntropy(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(math.abs(rows(1L).getAs[Double]("token_entropy") - math.log(4)) < 1e-6)
    assert(math.abs(rows(1L).getAs[Double]("norm_entropy") - 1.0) < 1e-6)
    assert(rows(2L).getAs[Double]("token_entropy") == 0.0)
    assert(rows(2L).getAs[Double]("norm_entropy") == 0.0)
    val h3 = math.log(3) - 2 * math.log(2) / 3
    assert(math.abs(rows(3L).getAs[Double]("token_entropy") - h3) < 1e-6)
    assert(rows(3L).getAs[Long]("n_tokens") == 3L)
    assert(rows(3L).getAs[Long]("n_distinct") == 2L)
  }

  test("char-class signals count control, non-ascii, and replacement chars") {
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "bell and tab\t inside"), // \t is NOT control for this filter
      (3L, "café résumé �")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.charClassSignals(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Int]("n_control") == 0)
    assert(rows(1L).getAs[Int]("n_non_ascii") == 0)
    assert(rows(2L).getAs[Int]("n_control") == 1) // the bell only
    assert(rows(3L).getAs[Int]("n_non_ascii") == 4) // 3×é + the replacement char
    assert(rows(3L).getAs[Int]("n_replacement") == 1)
    assert(rows(3L).getAs[Double]("non_ascii_ratio") > 0.0)
  }

  test("length buckets use exact power-of-two boundaries") {
    // 1 token -> bucket 0; 2,3 -> bucket 1; 4..7 -> bucket 2; 8 -> bucket 3
    val df = Seq(
      (1L, "en", "w"),
      (2L, "en", "w w"),
      (3L, "en", "w w w"),
      (4L, "en", "w w w w"),
      (5L, "en", Seq.fill(8)("w").mkString(" ")),
      (6L, "fr", Seq.fill(7)("w").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.lengthBuckets(df).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("bucket_log2")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("bucket_lo")))).toMap
    assert(got(("en", 0)) == ((1L, 1L)))
    assert(got(("en", 1)) == ((2L, 2L)))  // 2- and 3-token docs
    assert(got(("en", 2)) == ((1L, 4L)))
    assert(got(("en", 3)) == ((1L, 8L)))  // exactly 8 = 2^3 lands in bucket 3
    assert(got(("fr", 2)) == ((1L, 4L)))
  }

  test("bigram LM score: corpus-typical text outscores token salad") {
    // three docs repeat the same fluent sentence (their bigrams dominate
    // the corpus counts); one doc is unique gibberish (every bigram is a
    // smoothed near-zero); one doc is a single token (no bigrams: no row)
    val fluent = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      (1L, fluent), (2L, fluent), (3L, fluent),
      (4L, "zq xv wk jj qp mm zz ll pp"),
      (5L, "loner")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(5L), "a 1-token doc has no bigrams and no row")
    assert(got(1L)._1 == 8 && got(4L)._1 == 8) // both have 8 bigrams
    assert(got(1L)._2 == got(2L)._2 && got(2L)._2 == got(3L)._2)
    assert(got(1L)._2 > got(4L)._2 + 0.5,
      s"fluent ${got(1L)._2} should clearly outscore gibberish ${got(4L)._2}")
    // deterministic across runs
    val again = TextAnalysis.lmScore(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.map { case (k, (_, s)) => k -> s } == again)
  }

  test("DSIR: target-vocabulary documents outweigh off-domain ones; weights are deterministic") {
    // target domain talks about chemistry; raw pool adds sports chatter.
    // A held-out chemistry doc must score ABOVE every sports doc: its
    // hashed-ngram buckets are dense in p_target relative to p_raw.
    val chem = Seq("molecule bond reaction catalyst electron orbital",
      "acid base titration molar reaction yield",
      "catalyst electron bond energy orbital state")
    val sport = Seq("goal match striker penalty league score",
      "race lap driver pit overtake podium finish")
    val docs = (
      chem.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++
      Seq((10L, "reaction catalyst molecule electron bond", false)) ++ // held-out chem
      sport.zipWithIndex.map { case (t, i) => (20L + i, t, false) }
    ).toDF("doc_id", "text", "is_target")
    val w = TextAnalysis.dsirWeights(docs, col("is_target"), buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val heldOut = w(10L)
    Seq(20L, 21L).foreach { s =>
      assert(heldOut > w(s),
        s"held-out target-domain doc ($heldOut) must outweigh sports doc $s (${w(s)})")
    }
    // deterministic: same inputs, same weights (hash-derived buckets, no RNG)
    val again = TextAnalysis.dsirWeights(docs, col("is_target"), buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w == again)
  }

  test("NB classifier: held-out target-vocab doc scores positive, off-domain negative; hand-checked value") {
    // target corpus = chemistry vocabulary, rest = sports. A held-out doc
    // written in target vocabulary must get POSITIVE log-odds even though
    // it is labeled rest (that mislabeled-doc recovery is exactly what the
    // CCNet-style filter is for); pure sports docs must score negative.
    val docs = (
      Seq("molecule bond reaction catalyst electron orbital",
          "acid base titration molar reaction yield",
          "catalyst electron bond energy orbital state")
        .zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++
      Seq((10L, "reaction catalyst molecule electron bond", false)) ++
      Seq("goal match striker penalty league score",
          "race lap driver pit overtake podium finish")
        .zipWithIndex.map { case (t, i) => (20L + i, t, false) }
    ).toDF("doc_id", "text", "is_target")
    val got = TextAnalysis.nbDomainLogOdds(docs, col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(10L) > 0, s"held-out chemistry doc must score target-like: ${got(10L)}")
    Seq(20L, 21L).foreach(s =>
      assert(got(s) < 0, s"sports doc $s must score rest-like: ${got(s)}"))
    // hand-checked minimal model: target tokens {a,a}; rest tokens {b}
    // (doc2) and {a} (doc3 — its own token trains the rest class too).
    // V=2, k=0.5, n_t=2, n_o=2:
    //   P(a|t) = (2+0.5)/(2+1) = 5/6;  P(a|o) = (1+0.5)/(2+1) = 1/2
    //   prior  = ln(d_t/d_o) = ln(1/2)
    //   score(doc3) = ln(5/6) - ln(1/2) + ln(1/2) = ln(5/6)
    val tiny = Seq((1L, "a a", true), (2L, "b", false), (3L, "a", false))
      .toDF("doc_id", "text", "is_target")
    val t3 = TextAnalysis.nbDomainLogOdds(tiny, col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expect = math.log(5.0 / 6.0)
    assert(math.abs(t3(3L) - expect) < 1e-6, s"got ${t3(3L)}, want $expect")
  }

  test("intra-doc line dedup keeps first occurrences in order; md5 pinned cross-engine") {
    val docs = Seq((1L, "a\nb\na\nc\nb"), (2L, "solo line")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupLinesInDoc(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(4)))).toMap
    // value computed independently with DuckDB: md5('a\nb\nc')
    assert(got(1L) == ((5, 3, "c32b2057b9bd62caa835386346177935")))
    assert(got(2L)._1 == 1 && got(2L)._2 == 1)
    // map-only: no shuffle in the plan
    val plan = TextAnalysis.dedupLinesInDoc(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line dedup must be map-only:\n$plan")
  }

  test("DSIR scoring plan is map-only: no join, no window, one scan") {
    val docs = (0L to 30L).map(i =>
      (i, s"word$i token${i % 5} filler common text", i % 3 == 0))
      .toDF("doc_id", "text", "is_target")
    val df = TextAnalysis.dsirWeights(docs, col("is_target"), buckets = 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"DSIR scoring must not join:\n$plan")
    assert(!plan.contains("Window"), s"DSIR scoring must not window:\n$plan")
  }

  test("unicode normalization: NFC composes, strip_accents drops marks, SQL face registered") {
    import graft.functions.Functions.{strip_accents, unicode_normalize}
    // combining-acute sequences + precomposed accents, explicit escapes
    val df = Seq((1L, "e\u0301to\u0301 \u00dcn\u00ef\u00e7\u00f6d\u00e9"))
      .toDF("doc_id", "t")
    val r = df.select(
      org.apache.spark.sql.functions.length(unicode_normalize($"t")).as("nfc_len"),
      strip_accents($"t").as("stripped")).head()
    // NFC composes the two base+COMBINING ACUTE pairs: 13 chars -> 11
    assert(r.getAs[Int]("nfc_len") == 11, r.toString)
    assert(r.getAs[String]("stripped") == "eto Unicode", r.getAs[String]("stripped"))
    graft.functions.Functions.registerAll(spark)
    val sqlR = spark.sql(
      "SELECT strip_accents('\u00e9\u00f1'), unicode_normalize('e\u0301', 'NFC')").head()
    assert(sqlR.getString(0) == "en" && sqlR.getString(1) == "\u00e9", sqlR.toString)
    // non-literal form argument refuses loudly, and so does a bad form
    val bad = intercept[Exception](
      spark.sql("SELECT unicode_normalize('x', lower('NFC'))").collect())
    assert(bad.getMessage.contains("literal"), bad.getMessage.take(200))
    val badForm = intercept[Exception](
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect())
    assert(badForm.getMessage.contains("NFC/NFD"), badForm.getMessage.take(200))
    // supplementary-plane combining marks strip too (code-point iteration:
    // U+1E008 is category Mn but needs two UTF-16 units)
    val astral = new String(Character.toChars(0x1E008))
    val s2 = Seq((1L, "a" + astral + "b")).toDF("doc_id", "t")
      .select(strip_accents($"t")).head().getString(0)
    assert(s2 == "ab", s2.map(_.toInt).mkString(","))
  }

  test("html extraction: blocks, entity order, counts pinned on a crafted page") {
    val page = "<html><head><style>b{}</style>" +
      "<script>if (1 < 2) alert('x')</script></head>" +
      "<body><!-- c --><h1>Title</h1><p>Para &amp;lt; &lt;tag&gt; &amp; more</p>" +
      "<div><a href='u1'>l1</a> and <a href='u2'>l2</a></div></body></html>"
    val r = TextAnalysis.htmlExtract(Seq((1L, page)).toDF("doc_id", "html")).head()
    assert(r.getAs[Int]("n_links") == 2)
    assert(r.getAs[Int]("n_scripts") == 1)
    // &amp;lt; decodes to the TEXT "&lt;" (author-escaped), &lt;tag&gt; to "<tag>"
    assert(r.getAs[String]("text") ==
      "Title\nPara &lt; <tag> & more\nl1 and l2", r.getAs[String]("text"))
  }

  test("html extraction: script content with tags inside never leaks") {
    val page = "<body><script>document.write('<p>injected</p>')</script>real</body>"
    val r = TextAnalysis.htmlExtract(Seq((1L, page)).toDF("doc_id", "html")).head()
    assert(r.getAs[String]("text") == "real", r.getAs[String]("text"))
  }

  test("url canonicalization: case, ports, tracking params, ordering, fragment") {
    val cases = Seq(
      ("HTTP://Www.Ex.COM:80/A/B?b=2&utm_source=x&a=1#frag",
       "http://www.ex.com/A/B?a=1&b=2"),
      ("https://host.test:443/p?gclid=1&fbclid=2&ref=3", "https://host.test/p"),
      ("https://host.test:8443/p?z=1", "https://host.test:8443/p?z=1"), // non-default port kept
      ("http://h.test/CaSe", "http://h.test/CaSe"), // path case preserved
      ("http://h.test:80", "http://h.test"))
    val df = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    val got = TextAnalysis.canonicalizeUrls(df)
      .orderBy($"doc_id").select("url_canonical").as[String].collect().toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
  }

  test("winnowing: the w+k-1 match guarantee holds on planted overlap") {
    // k=4, w=3 -> any shared substring of length >= 6 must share a
    // fingerprint HASH (positions may differ)
    val shared = "xyzuvw" // length k + w - 1 = 6
    val df = Seq(
      (1L, s"aaaa${shared}bbbb"),
      (2L, s"cccccc${shared}dddd"),
      (3L, "completely unrelated text")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, k = 4, w = 3)
      .select($"doc_id", $"fingerprints").as[(Long, Seq[String])].collect()
      .map { case (id, f) => id -> f.map(_.split(":")(0)).toSet }.toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      s"docs sharing a ${shared.length}-char substring must share a fingerprint")
    assert(fps(1L).intersect(fps(3L)).isEmpty ||
      fps(2L).intersect(fps(3L)).isEmpty, "unrelated doc matched both (hash fluke)")
  }

  test("winnowing: identical grams tie to the RIGHTMOST selection per window") {
    // "aaaaaaaa" with k=3: 6 identical grams; w=3 windows at j=1..4 each
    // pick the rightmost minimum -> positions w..n_grams, one per window
    val df = Seq((1L, "aaaaaaaa")).toDF("doc_id", "text")
    val r = TextAnalysis.winnowFingerprints(df, k = 3, w = 3).head()
    assert(r.getAs[Int]("n_grams") == 6)
    val fps = r.getSeq[String](r.fieldIndex("fingerprints"))
    val positions = fps.map(_.split(":")(1).toLong).sorted
    assert(positions == Seq(3L, 4L, 5L, 6L), s"rightmost ties: $positions")
    assert(fps.map(_.split(":")(0)).distinct.size == 1, "one distinct hash")
  }

  test("winnowing: short texts degrade to empty, never error") {
    val df = Seq((1L, "ab"), (2L, "abcdefgh"), (3L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.winnowFingerprints(df, k = 8, w = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Int]("n_fps"))).toMap
    assert(rows(1L) == ((0, 0)))    // shorter than k
    assert(rows(2L) == ((1, 0)))    // one gram, fewer than w
    assert(rows(3L) == ((0, 0)))
  }
}
