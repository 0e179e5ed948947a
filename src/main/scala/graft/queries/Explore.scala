package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.explore.Recommenders
import graft.explore.Recommenders.Selection

/** Dataset-curation recommendations applied end-to-end (reference
  * `dac/backend/.../explore/` card engine — ExtractRecommender.java:55,
  * SplitRecommender.java:43, ReplaceRecommender.java:53): each query runs
  * the recommender on a real column with a concrete cell selection, picks
  * a card by its semantic identity, and applies the card's generated SQL —
  * so the oracle checks the full recommend → rank → apply path, not a
  * hand-written transform. */
object Explore {

  private def pick(cards: Seq[Recommenders.ScoredCard],
                   transform: String, descContains: String): Recommenders.ScoredCard =
    cards.find(c => c.card.transform == transform &&
        c.card.description.contains(descContains))
      .getOrElse(sys.error(s"no $transform card matching '$descContains' recommended"))

  /** Highlight the digit run in "Customer#000000042" → the char-group
    * extract card (`\d+` group 0) applied over every customer. */
  val extractCustnum: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val sel = Selection("Customer#000000042", 9, 9)
    val scored = Recommenders.evaluate(t.customer, "c_name", Recommenders.extractRules(sel))
    val card = pick(scored, "extract", "digit group")
    require(card.matchCount == card.total, "digit-group card must match every c_name")
    t.customer.select(col("c_custkey"),
      expr(card.card.applySql.get("c_name")).as("cust_digits"))
  }
  val extractCustnumSql: String = """
    SELECT c_custkey, regexp_extract(c_name, '\d+') AS cust_digits FROM customer"""

  /** Highlight the "#" in "Brand#13" → the split card; apply and take both
    * pieces. */
  val splitBrand: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val sel = Selection("Brand#13", 5, 1)
    val scored = Recommenders.evaluate(t.part, "p_brand", Recommenders.splitRules(sel))
    val card = pick(scored, "split", "Exactly matches \"#\"")
    require(card.matchCount == card.total, "every p_brand splits on #")
    t.part.select(col("p_partkey"),
      expr(card.card.applySql.get("p_brand"))(0).as("brand_head"),
      expr(card.card.applySql.get("p_brand"))(1).as("brand_num"))
  }
  val splitBrandSql: String = """
    SELECT p_partkey, split_part(p_brand, '#', 1) AS brand_head,
           split_part(p_brand, '#', 2) AS brand_num FROM part"""

  /** Highlight the whole cell "PROMO" in p_type → the exact-match replace
    * card's keep-only (row filter) form. */
  val keepOnlyPromo: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val sel = Selection("PROMO", 0, 5)
    val scored = Recommenders.evaluate(t.part, "p_type", Recommenders.replaceRules(sel))
    val card = pick(scored, "replace", "Exactly matches \"PROMO\"")
    t.part.where(expr(card.card.filterSql.get("p_type")))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_promo"))
  }
  val keepOnlyPromoSql: String = """
    SELECT p_brand, COUNT(*) AS n_promo FROM part
    WHERE p_type = 'PROMO' GROUP BY p_brand"""

  val queries: Map[String, QueryFn] = Map(
    "explore_extract_custnum" -> extractCustnum,
    "explore_split_brand" -> splitBrand,
    "explore_keeponly_promo" -> keepOnlyPromo)

  val oracle: Map[String, String] = Map(
    "explore_extract_custnum" -> extractCustnumSql,
    "explore_split_brand" -> splitBrandSql,
    "explore_keeponly_promo" -> keepOnlyPromoSql)
}
