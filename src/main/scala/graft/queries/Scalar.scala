package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.engine.Tables

/** Scalar-function surface coverage (SURVEY §2.8: 352 @FunctionTemplate
  * impls in dremio-oss `exec/expr/fn/impl` — string, math, datetime, hash,
  * array/map, JSON conversion). Each query exercises a function family
  * against the oracle; engine-specific formatting functions (double→string,
  * Joda patterns) are covered by unit specs instead, where the expected
  * values are pinned (SURVEY §7.4 divergence watchlist).
  */
object Scalar {

  /** String family (reference StringFunctions.java:39). */
  val fnString: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.part.filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 8).as("sub"),
        length(col("p_name")).as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        split_part(col("p_name"), lit(" "), lit(2)).as("word2"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        translate(col("p_brand"), "#", "-").as("tr"),
        reverse(col("p_type")).as("rev"),
        trim(lit("  x  ")).as("trimmed"),
        replace(col("p_name"), lit(" "), lit("_")).as("repl"))
      .orderBy(col("p_partkey"))
  }
  val fnStringSql: String = """
    SELECT p_partkey,
      upper(p_name) AS up, lower(p_brand) AS lo,
      substring(p_name, 1, 8) AS sub, CAST(length(p_name) AS INT) AS len,
      concat_ws('|', p_brand, p_type) AS cw,
      split_part(p_name, ' ', 2) AS word2,
      lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
      translate(p_brand, '#', '-') AS tr,
      reverse(p_type) AS rev,
      trim('  x  ') AS trimmed,
      replace(p_name, ' ', '_') AS repl
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"""

  /** Edit distance + positional string family (reference
    * StringFunctions LEVENSHTEIN/POSITION/LEFT/RIGHT/ASCII). */
  val fnEditdist: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.part.filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        levenshtein(col("p_name"), col("p_type")).as("lev2"),
        ascii(col("p_name")).as("first_code"),
        expr("left(p_name, 5)").as("l5"),
        expr("right(p_type, 4)").as("r4"),
        instr(col("p_name"), "a").as("pos_a"))
      .orderBy(col("p_partkey"))
  }
  val fnEditdistSql: String = """
    SELECT p_partkey,
      CAST(levenshtein(p_brand, p_type) AS INT) AS lev,
      CAST(levenshtein(p_name, p_type) AS INT) AS lev2,
      CAST(ascii(p_name) AS INT) AS first_code,
      left(p_name, 5) AS l5,
      right(p_type, 4) AS r4,
      CAST(instr(p_name, 'a') AS INT) AS pos_a
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"""

  /** Regex family (regexp_like/extract/replace — StringFunctions.java). */
  val fnRegexp: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer.filter(col("c_custkey") <= 300)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        col("c_name").rlike("[0-9]{3}").as("has3digits"))
      .orderBy(col("c_custkey"))
  }
  val fnRegexpSql: String = """
    SELECT c_custkey,
      regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      regexp_matches(c_name, '[0-9]{3}') AS has3digits
    FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""

  /** Datetime family (DateTypeFunctions.java:41: EXTRACT/DATE_TRUNC/
    * DATE_PART/arithmetic/LAST_DAY/UNIX epoch). */
  val fnDatetime: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders.filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("plus3d"),
        last_day(col("o_orderdate")).cast("timestamp_ntz").as("eom"),
        datediff(col("o_orderdate"), tsLit("1995-01-01")).as("days_since"))
      .orderBy(col("o_orderkey"))
  }
  val fnDatetimeSql: String = """
    SELECT o_orderkey,
      CAST(year(o_orderdate) AS INT) AS y,
      CAST(month(o_orderdate) AS INT) AS m,
      CAST(day(o_orderdate) AS INT) AS d,
      CAST(quarter(o_orderdate) AS INT) AS q,
      date_trunc('month', o_orderdate) AS month_start,
      o_orderdate + INTERVAL 3 DAY AS plus3d,
      CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom,
      CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since
    FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey"""

  /** Math family (MathFunctions.java:41) — the deterministic subset (libm
    * transcendentals exp/ln differ in the last ulp across engines and are
    * pinned in unit specs instead). */
  val fnMath: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem.filter(col("l_orderkey") <= 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        signum(col("l_discount") - 0.05).as("sg"),
        sqrt(col("l_quantity")).as("sq"),
        (col("l_quantity") % 7).as("md"),
        greatest(col("l_quantity"), col("l_linenumber") * 10).as("gr"),
        least(col("l_quantity"), col("l_linenumber") * 10).as("le"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val fnMathSql: String = """
    SELECT l_orderkey, l_linenumber,
      CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      abs(l_discount - 0.05) AS ab,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
      sqrt(l_quantity) AS sq,
      CAST(l_quantity AS DOUBLE) % 7 AS md,
      greatest(l_quantity, l_linenumber * 10) AS gr,
      least(l_quantity, l_linenumber * 10) AS le
    FROM lineitem WHERE l_orderkey <= 500 ORDER BY l_orderkey, l_linenumber"""

  /** Conditional family (CASE/COALESCE/NULLIF/NVL — reference codegen'd
    * case expressions). */
  val fnConditional: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer.filter(col("c_custkey") <= 300)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg"),
        nvl(nullif(col("c_nationkey"), lit(0)), lit(-1)).as("nat"))
      .orderBy(col("c_custkey"))
  }
  val fnConditionalSql: String = """
    SELECT c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'overdrawn'
           WHEN c_acctbal < 5000 THEN 'standard'
           ELSE 'premium' END AS tier,
      COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(bldg)') AS seg,
      COALESCE(NULLIF(c_nationkey, 0), -1) AS nat
    FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""

  /** Hash/checksum family (Hash64Functions/XXHash/HASHSHA256 — engine-native
    * murmur/xx seeds differ, so the cross-engine-stable md5/sha256 are the
    * oracle surface; xxhash64/murmur are pinned in unit specs). */
  val fnHash: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.nation.select(
      col("n_nationkey"),
      md5(col("n_name")).as("h_md5"),
      sha2(col("n_name"), 256).as("h_sha256"))
      .orderBy(col("n_nationkey"))
  }
  val fnHashSql: String = """
    SELECT n_nationkey, md5(n_name) AS h_md5, sha256(n_name) AS h_sha256
    FROM nation ORDER BY n_nationkey"""

  /** Array family (exec/expr/fn/impl/array/ — scalar-returning subset). */
  val fnArray: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val words = split(col("p_name"), " ")
    t.part.filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        size(words).as("n_words"),
        element_at(words, 1).as("first_word"),
        array_contains(words, "green").as("has_green"),
        array_position(words, element_at(words, -1)).as("last_pos"),
        array_join(slice(sort_array(words), 1, 2), "+").as("sorted2"))
      .orderBy(col("p_partkey"))
  }
  val fnArraySql: String = """
    SELECT p_partkey,
      CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
      string_split(p_name, ' ')[1] AS first_word,
      list_contains(string_split(p_name, ' '), 'green') AS has_green,
      CAST(list_position(string_split(p_name, ' '),
           string_split(p_name, ' ')[-1]) AS BIGINT) AS last_pos,
      array_to_string(list_sort(string_split(p_name, ' '))[1:2], '+') AS sorted2
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"""

  /** Reference custom-operator surface (DremioSqlOperatorTable.java:67
    * names registered by functions.DremioSurface) exercised over fixture
    * rows — regexp_split/array_slice/array_to_string/array_length/truncate
    * run through SQL TEXT so the whole registry path is oracle-gated, not
    * just the Column API. DuckDB equivalents: str_split_regex (≡ ALL-mode
    * split with no cap), 1-based inclusive list slicing, floor arithmetic
    * for decimal-place truncation. */
  val fnDremioOps: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT p_partkey,
        array_length(regexp_split(p_name, ' ', 'ALL', 100)) AS n_tokens,
        array_to_string(array_slice(regexp_split(p_name, ' ', 'ALL', 100), 0, 2), '-') AS first2,
        regexp_split(p_name, ' ', 'FIRST', 0)[0] AS head_word,
        CAST(truncate(p_retailprice, 1) AS DOUBLE) AS trunc_price,
        CAST(truncate(p_retailprice) AS DOUBLE) AS trunc_whole,
        CAST(bitwise_and(p_partkey, 255) AS INT) AS low_byte,
        hashsha256(p_brand) AS brand_sha
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""")
  }
  val fnDremioOpsSql: String = """
    SELECT p_partkey,
      CAST(len(str_split_regex(p_name, ' ')) AS INT) AS n_tokens,
      array_to_string(str_split_regex(p_name, ' ')[1:2], '-') AS first2,
      str_split_regex(p_name, ' ')[1] AS head_word,
      floor(p_retailprice * 10) / 10 AS trunc_price,
      floor(p_retailprice) AS trunc_whole,
      CAST(p_partkey % 256 AS INT) AS low_byte,
      sha256(p_brand) AS brand_sha
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"""

  /** JSON extraction (ConvertFromJsonOperator surface; events.props holds
    * string-embedded JSON per FIXTURES.md). Typed via from_json with an
    * explicit schema + path via get_json_object. */
  val fnJson: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val schema = StructType(Seq(StructField("k", IntegerType)))
    t.events.filter(col("event_id") < 500)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"), schema).getField("k").as("k_typed"))
      .orderBy(col("event_id"))
  }
  val fnJsonSql: String = """
    SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
      CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
    FROM events WHERE event_id < 500 ORDER BY event_id"""

  /** Mixed-type UNION column (reference `CompleteType.java:143-171`): one
    * payload column carrying a JSON number, string, or array depending on
    * the row, parsed into Spark's VARIANT type. Per-row runtime type tags
    * and union accessors (NULL on type mismatch) are oracle-checked
    * against DuckDB's JSON type system, both mapped to canonical tags. */
  val fnVariant: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders.filter(col("o_orderkey") < 2000)
      .withColumn("v", expr(
        """try_parse_json(CASE CAST(o_orderkey % 3 AS INT)
          |  WHEN 0 THEN CAST(o_custkey AS STRING)
          |  WHEN 1 THEN concat('"', o_orderstatus, '"')
          |  ELSE concat('[', CAST(o_orderkey AS STRING), ',', CAST(o_custkey AS STRING), ']')
          |END)""".stripMargin))
      .select(
        col("o_orderkey"),
        expr(
          """CASE WHEN schema_of_variant(v) = 'STRING' THEN 'str'
            |     WHEN schema_of_variant(v) LIKE 'ARRAY%' THEN 'arr'
            |     ELSE 'num' END""".stripMargin).as("tag"),
        expr("try_variant_get(v, '$', 'bigint')").as("as_num"),
        expr("CASE WHEN schema_of_variant(v) = 'STRING' " +
          "THEN try_variant_get(v, '$', 'string') END").as("as_str"),
        expr("try_variant_get(v, '$[0]', 'bigint')").as("first_elem"))
      .orderBy(col("o_orderkey"))
  }
  val fnVariantSql: String = """
    WITH p AS (
      SELECT o_orderkey,
        CASE CAST(o_orderkey % 3 AS INT)
          WHEN 0 THEN CAST(o_custkey AS VARCHAR)
          WHEN 1 THEN concat('"', o_orderstatus, '"')
          ELSE concat('[', CAST(o_orderkey AS VARCHAR), ',', CAST(o_custkey AS VARCHAR), ']')
        END AS payload
      FROM orders WHERE o_orderkey < 2000)
    SELECT o_orderkey,
      CASE WHEN json_type(payload::JSON) = 'VARCHAR' THEN 'str'
           WHEN json_type(payload::JSON) = 'ARRAY' THEN 'arr'
           ELSE 'num' END AS tag,
      TRY_CAST(CASE WHEN json_type(payload::JSON) IN ('ARRAY', 'OBJECT') THEN NULL
                    ELSE json_extract_string(payload::JSON, '$') END AS BIGINT) AS as_num,
      CASE WHEN json_type(payload::JSON) = 'VARCHAR'
           THEN json_extract_string(payload::JSON, '$') END AS as_str,
      TRY_CAST(json_extract(payload::JSON, '$[0]') AS BIGINT) AS first_elem
    FROM p ORDER BY o_orderkey"""

  val queries: Map[String, QueryFn] = Map(
    "fn_string" -> fnString,
    "fn_editdist" -> fnEditdist,
    "fn_regexp" -> fnRegexp,
    "fn_datetime" -> fnDatetime,
    "fn_math" -> fnMath,
    "fn_conditional" -> fnConditional,
    "fn_hash" -> fnHash,
    "fn_array" -> fnArray,
    "fn_dremio_ops" -> fnDremioOps,
    "fn_json" -> fnJson,
    "fn_variant" -> fnVariant)

  val oracle: Map[String, String] = Map(
    "fn_dremio_ops" -> fnDremioOpsSql,
    "fn_string" -> fnStringSql,
    "fn_editdist" -> fnEditdistSql,
    "fn_regexp" -> fnRegexpSql,
    "fn_datetime" -> fnDatetimeSql,
    "fn_math" -> fnMathSql,
    "fn_conditional" -> fnConditionalSql,
    "fn_hash" -> fnHashSql,
    "fn_array" -> fnArraySql,
    "fn_json" -> fnJsonSql,
    "fn_variant" -> fnVariantSql)
}
