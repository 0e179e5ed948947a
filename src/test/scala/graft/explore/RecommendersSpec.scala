package graft.explore

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.explore.Recommenders._

/** Card semantics pinned against the reference recommenders
  * (`ExtractRecommender.java:86-127`, `SplitRecommender.java:43-57`,
  * `ReplaceRecommender.java:53-130`): which rules appear for a given
  * selection, what their generated SQL does on real rows, and that
  * scoring runs as ONE aggregate job over all cards. */
class RecommendersSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val phones = Seq(
    "25-989-741-2988", "13-137-193-2709", "31-593-787-7971",
    "not a phone", null.asInstanceOf[String])
    .toDF("phone")

  test("extract: selection anchored three ways by position plus digit/word groups") {
    // highlight "989" in the first phone
    val sel = Selection("25-989-741-2988", 3, 3)
    val rules = extractRules(sel)
    rules.count(_.description.startsWith("Characters")) shouldBe 3
    // "989" is a maximal digit run AND a maximal word run
    rules.map(_.description) should contain("1th digit group (\\d+)")
    rules.exists(_.description.contains("word group")) shouldBe true
    // not the last digit group -> no backwards card for digits
    rules.map(_.description) should not contain ("last digit group (\\d+)")

    val scored = evaluate(phones, "phone", rules)
    val digit = scored.find(_.card.description == "1th digit group (\\d+)").get
    digit.matchCount shouldBe 3 // three well-formed phones; null + text miss
    digit.total shouldBe 5
    digit.examples should not be empty
    digit.examples.foreach { case (in, out) => in should include(out) }

    // apply semantics: second digit run
    val applied = phones.selectExpr(digit.card.applySql.get("phone")).as[String].collect()
    applied should contain("989")
  }

  test("extract: selecting the trailing run also recommends the backwards (last) card") {
    val sel = Selection("25-989-741-2988", 11, 4)
    val rules = extractRules(sel)
    rules.map(_.description) should contain("last digit group (\\d+)")
    val last = rules.find(_.description.startsWith("last digit")).get
    phones.where("phone = '13-137-193-2709'")
      .selectExpr(last.applySql.get("phone")).as[String].head() shouldBe "2709"
  }

  test("extract: position cards implement the reference substr arithmetic") {
    val sel = Selection("25-989-741-2988", 3, 3)
    val cards = extractRules(sel).filter(_.description.startsWith("Characters"))
    // all three anchorings recover the same slice on a same-shaped cell
    cards.foreach { c =>
      phones.where("phone = '31-593-787-7971'")
        .selectExpr(c.applySql.get("phone")).as[String].head() shouldBe "593"
    }
  }

  test("split: exact delimiter card plus ignore-case variant only when cased") {
    splitRules(Selection("a-b", 1, 1)).map(_.description) shouldBe
      List("Exactly matches \"-\"")
    splitRules(Selection("aXb", 1, 1)).map(_.description) shouldBe
      List("Exactly matches \"X\"", "Exactly matches \"X\" ignore case")

    val card = splitRules(Selection("25-989-741-2988", 2, 1)).head
    val pieces = phones.where("phone rlike '^[0-9]'")
      .selectExpr(card.applySql.get("phone") + " AS p")
      .selectExpr("size(p)").as[Int].collect()
    pieces should contain only 4
    // ignore-case split actually splits case-insensitively
    val ic = splitRules(Selection("aXb", 1, 1)).find(_.description.endsWith("ignore case")).get
    Seq("1x2X3").toDF("s").selectExpr("size(" + ic.applySql.get("s") + ")")
      .as[Int].head() shouldBe 3
  }

  test("replace: null cell -> IS NULL card; anchored selections add starts/ends/exact") {
    replaceRules(Selection(null, 0, 0)).map(_.description) shouldBe List("Is null")

    val mid = replaceRules(Selection("abcdef", 2, 2)) // "cd", unanchored
    mid.map(_.description) shouldBe
      List("Contains \"cd\" ignore case", "Contains \"cd\"")

    val whole = replaceRules(Selection("abc", 0, 3)).map(_.description)
    whole should contain allOf ("Contains \"abc\"", "Starts with \"abc\"",
      "Ends with \"abc\"", "Exactly matches \"abc\"")

    // digit selection bounded by non-digits adds the \d+ pattern card
    val dig = replaceRules(Selection("x42y", 1, 2)).map(_.description)
    dig should contain("Matches regex \"\\d+\"")
    // but not when the run continues past the selection
    replaceRules(Selection("x423", 1, 2)).map(_.description) should not contain
      ("Matches regex \"\\d+\"")
  }

  test("replace: apply + keep-only forms work and score in one pass") {
    val sel = Selection("25-989-741-2988", 0, 2) // "25" at the start
    val scored = evaluate(phones, "phone", replaceRules(sel))
    val starts = scored.find(_.card.description == "Starts with \"25\"").get
    starts.matchCount shouldBe 1
    val kept = phones.where(starts.card.filterSql.get("phone")).as[String].collect()
    kept shouldBe Array("25-989-741-2988")

    val replaced = phones.where("phone IS NOT NULL")
      .selectExpr(Recommenders.applyReplace(starts.card, "phone", "**") + " AS r")
      .as[String].collect()
    replaced should contain("**-989-741-2988")
    replaced should contain("not a phone") // untouched
  }

  test("extract list: selection locates array elements; single + four sublist anchorings") {
    val cell = """["a","b","c","d"]"""
    val offB = cell.indexOf("\"b\"")
    val offC = cell.indexOf("\"c\"")

    val single = extractListRules(Selection(cell, offB, 3))
    single.map(_.description) shouldBe List("Element: 1")
    val df = Seq(Seq("a", "b", "c", "d"), Seq("x", "y"), Seq("p")).toDF("arr")
    df.selectExpr(single.head.applySql.get("arr")).as[String].collect() shouldBe
      Array("b", "y", null)

    val multi = extractListRules(Selection(cell, offB, offC + 3 - offB))
    multi.map(_.description) shouldBe List(
      "Elements: 1 - 2", "Elements: 1 - 1 (from the end)",
      "Elements: 2 (from the end) - 2", "Elements: 2 - 1 (both from the end)")
    // on a cell-shaped row every anchoring recovers the selection
    val orig = Seq(Seq("a", "b", "c", "d")).toDF("arr")
    multi.foreach { c =>
      orig.selectExpr(c.applySql.get("arr")).as[Seq[String]].head() shouldBe Seq("b", "c")
    }
    // on a longer row the anchorings diverge, each honoring its offsets
    val longer = Seq(Seq("v", "w", "x", "y", "z")).toDF("arr")
    def on(card: Card) = longer.selectExpr(card.applySql.get("arr")).as[Seq[String]].head()
    on(multi(0)) shouldBe Seq("w", "x") // 1 - 2 from the start
    on(multi(1)) shouldBe Seq("w", "x", "y") // 1 from start .. 1 from end
    on(multi(2)) shouldBe Seq("x") // 2 from end .. index 2
    on(multi(3)) shouldBe Seq("x", "y") // 2 from end .. 1 from end

    // nested: the selection's innermost array position is the element
    val inner = extractListRules(Selection("""{"k":[10,20]}""", 9, 2)) // "20"
    inner.map(_.description) shouldBe List("Element: 1")
    // selecting the whole array (no element position) is rejected, like the
    // reference's extractArrayIndex on a non-array path element
    an[IllegalArgumentException] should be thrownBy
      extractListRules(Selection("""{"k":[10,20]}""", 5, 7))
  }

  test("extract map: key path card with bracket extraction and IS NOT NULL match") {
    val cards = extractMapRules("a.b")
    cards.map(_.description) shouldBe List("extract from map a.b")
    val df = spark.sql(
      "SELECT named_struct('a', named_struct('b', 7), 'z', 1) AS m " +
        "UNION ALL SELECT named_struct('a', named_struct('b', CAST(NULL AS INT)), 'z', 2)")
    df.selectExpr(cards.head.applySql.get("m")).as[Option[Int]].collect().toSet shouldBe
      Set(Some(7), None)
    val scored = evaluate(df, "m", cards)
    scored.head.matchCount shouldBe 1 // NULL leaf doesn't match

    // array steps in the path
    val withArr = extractMapRules("a[1]")
    spark.sql("SELECT named_struct('a', array(10, 20, 30)) AS m")
      .selectExpr(withArr.head.applySql.get("m")).as[Int].head() shouldBe 20
  }

  test("recommend: full deck is ranked by match count and scoring is one job") {
    val sel = Selection("25-989-741-2988", 3, 3)
    val scored = recommend(phones, "phone", sel)
    scored.map(_.matchCount) shouldBe scored.map(_.matchCount).sorted.reverse
    // the deck includes all three transform families
    scored.map(_.card.transform).distinct.sorted shouldBe List("extract", "replace", "split")

    // ONE aggregate pass: the scoring runs as a single SQL execution, not a
    // per-card action. Count distinct execution ids of jobs tagged with a
    // dedicated job group — the group id is thread-local, so concurrent
    // suites sharing the session can't inflate (or starve) the count the
    // way a global query-history size delta can once its ring saturates.
    val group = "graft-recommender-onepass"
    val execIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null && group == js.properties.getProperty("spark.jobGroup.id"))
          Option(js.properties.getProperty("spark.sql.execution.id")).foreach(execIds.add)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "one-pass scoring check", interruptOnCancel = false)
      evaluate(phones, "phone", extractRules(sel), exampleRows = 0)
      spark.sparkContext.clearJobGroup()
      // listener bus delivery is async; wait for the first tagged job
      val deadline = System.nanoTime() + 10e9.toLong
      while (execIds.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      execIds.size should (be >= 1 and be <= 2) // one scoring agg, no per-card jobs
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
