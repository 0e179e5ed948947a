package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** lucene_match — the reference's CONTAINS predicate evaluated natively
  * (classic Lucene QueryParser semantics; `lucene.ftl` / SqlContains). */
class LuceneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def m(text: String, query: String): Boolean = {
    val rt = new Lucene.Runtime(query, Array("_text"))
    rt.matches(org.apache.spark.unsafe.types.UTF8String.fromString(text))
  }

  test("terms, default-OR, AND/OR/NOT, +/- modifiers (classic occur rules)") {
    val doc = "The quick brown Fox jumps over the lazy dog"
    assert(m(doc, "fox"))           // analyzed lowercase
    assert(m(doc, "FOX"))           // query term analyzed too
    assert(!m(doc, "cat"))
    assert(m(doc, "fox cat"))       // default OR: one SHOULD suffices
    assert(m(doc, "fox AND dog"))
    assert(!m(doc, "fox AND cat"))
    assert(m(doc, "fox && dog") && m(doc, "fox || cat"))
    assert(!m(doc, "fox AND NOT dog"))
    assert(m(doc, "fox AND NOT cat"))
    assert(m(doc, "+fox dog"))      // must + optional should
    assert(!m(doc, "+cat dog"))     // the must fails even though dog hits
    assert(!m(doc, "fox -dog"))     // prohibited
    assert(m(doc, "fox -cat"))
    assert(m(doc, "!cat"))          // pure-negative query: no should needed
    // classic promote/demote: AND retroactively requires its left clause
    assert(!m(doc, "cat AND dog"))
    assert(m(doc, "cat OR dog"))
  }

  test("phrases, slop, grouping, field scoping over structs") {
    val doc = "error: out of heap memory in stage twelve"
    assert(m(doc, "\"out of heap\""))
    assert(!m(doc, "\"heap of out\""))       // order matters
    assert(!m(doc, "\"out heap\""))          // gap needs slop
    assert(m(doc, "\"out heap\"~1"))
    assert(m(doc, "\"out memory\"~2") && !m(doc, "\"out memory\"~1"))
    assert(m(doc, "(error OR warning) AND \"heap memory\""))
    assert(!m(doc, "(warning OR fatal) AND \"heap memory\""))
    // hyphenated term analyzes to a consecutive phrase
    assert(m("state-of-the-art model", "state-of-the-art"))
    assert(!m("state of modern art", "state-of-the-art"))
    // struct input: field: scoping, unscoped matches ANY field
    val rt = new Lucene.Runtime("title:alpha AND beta", Array("title", "body"))
    def row(t: String, b: String) =
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(rt.matches(row("Alpha news", "beta inside")))
    assert(rt.matches(row("alpha beta", "nothing")))
    assert(!rt.matches(row("beta only", "alpha in body not title")))
    // a grouped field query scopes every leaf: title:(alpha OR gamma)
    val rt2 = new Lucene.Runtime("title:(alpha OR gamma)", Array("title", "body"))
    assert(rt2.matches(row("gamma ray", "x")) && !rt2.matches(row("x", "alpha")))
    // unknown field refuses at compile time
    assertThrows[IllegalArgumentException](
      new Lucene.Runtime("nope:x", Array("title", "body")))
  }

  test("wildcards, regex, fuzzy, ranges, match-all, boosts ignored") {
    val doc = "testing retrieval systems at roam scale"
    assert(m(doc, "test*"))
    assert(!m(doc, "tost*"))
    assert(m(doc, "t?sting") && !m(doc, "t?st"))
    assert(m(doc, "*ieval"))
    assert(m(doc, "/t.sting/") && !m(doc, "/t.sting.+/"))
    assert(m(doc, "roam~1") && m(doc, "foam~1") && !m(doc, "fxam~1"))
    assert(m(doc, "roam~") && !m(doc, "rx~0"))  // bare ~ defaults to 2 edits
    // transposition counts as ONE edit (Damerau)
    assert(Lucene.editsWithin("raom", "roam", 1))
    assert(m(doc, "[roam TO systems]"))
    assert(!m(doc, "{roam TO scale}"))           // exclusive on both ends
    assert(m(doc, "[scale TO *]") && m(doc, "[* TO at]"))
    assert(m(doc, "*"))
    assert(m(doc, "testing^2 AND scale^0.5"))     // boosts parse, no effect
  }

  test("SQL registration + codegen'd plan path + struct input through SQL") {
    Functions.registerAll(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "Spark query engines shuffle data", "intro"),
      (2L, "lucene builds inverted indexes", "search"),
      (3L, "the quick brown fox", "animals")
    ).toDF("id", "body", "title")
    df.createOrReplaceTempView("lucene_docs")
    val hits = spark.sql(
      "SELECT id FROM lucene_docs WHERE lucene_match(body, '\"inverted indexes\" OR shuffle')")
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L))
    val scoped = spark.sql(
      "SELECT id FROM lucene_docs WHERE lucene_match(struct(body, title), 'title:search AND lucene')")
      .collect().map(_.getLong(0)).toSet
    assert(scoped == Set(2L))
    // literal-query requirement refuses loudly
    assertThrows[Exception](spark.sql(
      "SELECT lucene_match(body, title) FROM lucene_docs").collect())
    // the predicate stays inside WholeStageCodegen over a REAL scan
    // (a LocalRelation would be constant-folded at plan time)
    val pdir = java.nio.file.Files.createTempDirectory("graft_lucene").toString
    df.write.mode("overwrite").parquet(pdir)
    val onDisk = spark.read.parquet(pdir)
      .where(Functions.lucene_match(col("body"), "fox OR lucene"))
    assert(onDisk.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    val plan = onDisk.queryExecution.executedPlan.toString
    // `*(n)` marks a WholeStageCodegen span in the string form
    assert(plan.contains("*(1) Filter lucene_match"), plan)
    assert(!plan.contains("Fallback"), plan)
  }
}
