package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** EXECUTED sweep of the reference's complete documented function surface
  * (`services/functions/src/main/resources/function_specs/documented/` —
  * 230 names): every name runs through `spark.sql` with a representative
  * invocation. A name passes only if the statement executes; the four
  * filesystem-directory helpers are the only documented divergence
  * (no reference-style FS dataset abstraction to point them at). */
class FunctionSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** name → representative invocation (SELECT body or full statement). */
  private val calls: Seq[(String, String)] = Seq(
    "ABS" -> "ABS(-3)", "ACOS" -> "ACOS(0.5)",
    "APPROX_COUNT_DISTINCT" -> "APPROX_COUNT_DISTINCT(x) FROM VALUES (1),(2) t(x)",
    "ARRAYS_OVERLAP" -> "ARRAYS_OVERLAP(array(1), array(1))",
    "ARRAY_AGG" -> "ARRAY_AGG(x) FROM VALUES (1),(2) t(x)",
    "ARRAY_APPEND" -> "ARRAY_APPEND(array(1), 2)",
    "ARRAY_AVG" -> "ARRAY_AVG(array(1, 2))",
    "ARRAY_CAT" -> "ARRAY_CAT(array(1), array(2))",
    "ARRAY_COMPACT" -> "ARRAY_COMPACT(array(1, NULL))",
    "ARRAY_CONCAT" -> "ARRAY_CONCAT(array(1), array(2))",
    "ARRAY_CONTAINS" -> "ARRAY_CONTAINS(array(1), 1)",
    "ARRAY_DISTINCT" -> "ARRAY_DISTINCT(array(1, 1))",
    "ARRAY_FREQUENCY" -> "ARRAY_FREQUENCY(array('a', 'a'))",
    "ARRAY_GENERATE_RANGE" -> "ARRAY_GENERATE_RANGE(1, 4)",
    "ARRAY_INSERT" -> "ARRAY_INSERT(array(1, 2), 1, 9)",
    "ARRAY_INTERSECTION" -> "ARRAY_INTERSECTION(array(1, 2), array(2))",
    "ARRAY_LENGTH" -> "ARRAY_LENGTH(array(1))",
    "ARRAY_MAX" -> "ARRAY_MAX(array(1, 2))", "ARRAY_MIN" -> "ARRAY_MIN(array(1, 2))",
    "ARRAY_POSITION" -> "ARRAY_POSITION(array(1), 1)",
    "ARRAY_PREPEND" -> "ARRAY_PREPEND(array(1), 0)",
    "ARRAY_REMOVE" -> "ARRAY_REMOVE(array(1, 2), 1)",
    "ARRAY_REMOVE_AT" -> "ARRAY_REMOVE_AT(array(1, 2), 0)",
    "ARRAY_SIZE" -> "ARRAY_SIZE(array(1))",
    "ARRAY_SLICE" -> "ARRAY_SLICE(array(1, 2, 3), 0, 2)",
    "ARRAY_SUM" -> "ARRAY_SUM(array(1, 2))",
    "ARRAY_TO_STRING" -> "ARRAY_TO_STRING(array(1, 2), '-')",
    "ASCII" -> "ASCII('a')", "ASIN" -> "ASIN(0.5)", "ATAN" -> "ATAN(1)",
    "ATAN2" -> "ATAN2(1, 1)",
    "AVG" -> "AVG(x) FROM VALUES (1),(2) t(x)",
    "BIN" -> "BIN(3)", "BINARY_STRING" -> "BINARY_STRING('abc')",
    "BITWISE_AND" -> "BITWISE_AND(12, 10)", "BITWISE_NOT" -> "BITWISE_NOT(1)",
    "BITWISE_OR" -> "BITWISE_OR(1, 2)", "BITWISE_XOR" -> "BITWISE_XOR(3, 1)",
    "BIT_AND" -> "BIT_AND(x) FROM VALUES (3),(1) t(x)",
    "BIT_LENGTH" -> "BIT_LENGTH('a')",
    "BIT_OR" -> "BIT_OR(x) FROM VALUES (1),(2) t(x)",
    "BOOL_AND" -> "BOOL_AND(x) FROM VALUES (true),(false) t(x)",
    "BOOL_OR" -> "BOOL_OR(x) FROM VALUES (true),(false) t(x)",
    "BTRIM" -> "BTRIM('  a  ')", "CARDINALITY" -> "CARDINALITY(array(1))",
    "CASE" -> "CASE WHEN 1 = 1 THEN 'y' ELSE 'n' END",
    "CAST" -> "CAST('1' AS INT)", "CBRT" -> "CBRT(27)", "CEILING" -> "CEILING(1.2)",
    "CHARACTER_LENGTH" -> "CHARACTER_LENGTH('ab')", "CHAR_LENGTH" -> "CHAR_LENGTH('ab')",
    "CHR" -> "CHR(65)", "COALESCE" -> "COALESCE(NULL, 1)",
    "COLLECT" -> "COLLECT(x) FROM VALUES (1),(2) t(x)",
    "COL_LIKE" -> "COL_LIKE('abc', 'a%')",
    "CONCAT" -> "CONCAT('a', 'b')", "CONCAT_WS" -> "CONCAT_WS('-', 'a', 'b')",
    "CONTAINS" -> "CONTAINS('abc', 'b')",
    "CONVERT_FROM" -> "CONVERT_FROM('{\"a\": 1}', 'JSON')",
    "CONVERT_REPLACEUTF8" -> "CONVERT_REPLACEUTF8(CAST('ab' AS BINARY), '?')",
    "CONVERT_TIMEZONE" -> "CONVERT_TIMEZONE('UTC', 'America/Los_Angeles', TIMESTAMP '2024-01-01 00:00:00')",
    "CONVERT_TO" -> "CONVERT_TO(named_struct('a', 1), 'JSON')",
    "CORR" -> "CORR(x, y) FROM VALUES (1.0, 2.0),(2.0, 4.0) t(x, y)",
    "COS" -> "COS(0)", "COSH" -> "COSH(0)", "COT" -> "COT(1)",
    "COUNT" -> "COUNT(*) FROM VALUES (1) t(x)",
    "COVAR_POP" -> "COVAR_POP(x, y) FROM VALUES (1.0, 2.0),(2.0, 4.0) t(x, y)",
    "COVAR_SAMP" -> "COVAR_SAMP(x, y) FROM VALUES (1.0, 2.0),(2.0, 4.0) t(x, y)",
    "CRC32" -> "CRC32(CAST('a' AS BINARY))",
    "CUME_DIST" -> "CUME_DIST() OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "CURRENT_DATE" -> "CURRENT_DATE", "CURRENT_DATE_UTC" -> "CURRENT_DATE_UTC()",
    "CURRENT_SCHEMA" -> "CURRENT_SCHEMA()", "CURRENT_TIME" -> "CURRENT_TIME()",
    "CURRENT_TIMESTAMP" -> "CURRENT_TIMESTAMP",
    "DATETYPE" -> "DATETYPE('2024-01-02')",
    "DATE_ADD" -> "DATE_ADD(DATE '2024-01-01', 1)",
    "DATE_DIFF" -> "DATE_DIFF(DATE '2024-01-02', DATE '2024-01-01')",
    "DATE_PART" -> "DATE_PART('YEAR', DATE '2024-01-01')",
    "DATE_SUB" -> "DATE_SUB(DATE '2024-01-02', 1)",
    "DATE_TRUNC" -> "DATE_TRUNC('MONTH', TIMESTAMP '2024-01-15 00:00:00')",
    "DAYOFMONTH" -> "DAYOFMONTH(DATE '2024-01-15')",
    "DEGREES" -> "DEGREES(3.14159)",
    "DENSE_RANK" -> "DENSE_RANK() OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "E" -> "E()", "EXP" -> "EXP(1)",
    "EXTRACT" -> "EXTRACT(YEAR FROM DATE '2024-01-01')",
    "FACTORIAL" -> "FACTORIAL(5)",
    "FIND_IN_SET" -> "FIND_IN_SET('b', 'a,b,c')",
    "FIRST_VALUE" -> "FIRST_VALUE(x) OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "FLATTEN" -> "FLATTEN(array(array(1), array(2)))",
    "FLOOR" -> "FLOOR(1.8)", "FORMAT_NUMBER" -> "FORMAT_NUMBER(1234.5, 1)",
    "FROM_HEX" -> "FROM_HEX('41')",
    "GEO_BEYOND" -> "GEO_BEYOND(0D, 0D, 0D, 1D, 1000D)",
    "GEO_DISTANCE" -> "GEO_DISTANCE(0D, 0D, 0D, 1D)",
    "GEO_NEARBY" -> "GEO_NEARBY(0D, 0D, 0D, 1D, 1000000D)",
    "GREATEST" -> "GREATEST(1, 2)", "HASH" -> "HASH('a')", "HASH64" -> "HASH64('a')",
    "HLL" -> "HLL(x) FROM VALUES (1),(2) t(x)",
    "ILIKE" -> "ILIKE('Abc', 'a%')",
    "INITCAP" -> "INITCAP('ab cd')",
    "ISFALSE" -> "ISFALSE(false)", "ISNULL" -> "ISNULL(NULL)",
    "ISNUMERIC" -> "ISNUMERIC('12.5')", "ISTRUE" -> "ISTRUE(true)",
    "IS_BIGINT" -> "IS_BIGINT('9999999999')", "IS_DATE" -> "IS_DATE('2024-01-01')",
    "IS_INT" -> "IS_INT('12')", "IS_LIST" -> "IS_LIST(array(1))",
    "IS_MEMBER" -> "IS_MEMBER('admin')",
    "IS_UTF8" -> "IS_UTF8(CAST('ab' AS BINARY))",
    "IS_VARCHAR" -> "IS_VARCHAR('x')",
    "LAG" -> "LAG(x) OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "LAST_DAY" -> "LAST_DAY(DATE '2024-01-15')",
    "LAST_QUERY_ID" -> "LAST_QUERY_ID()",
    "LEAD" -> "LEAD(x) OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "LEAST" -> "LEAST(1, 2)", "LEFT" -> "LEFT('abc', 2)", "LENGTH" -> "LENGTH('ab')",
    "LIKE" -> "'abc' LIKE 'a%'",
    "LISTAGG" -> "LISTAGG(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('a'),('b') t(x)",
    "LOCALTIME" -> "LOCALTIME()", "LOCALTIMESTAMP" -> "LOCALTIMESTAMP()",
    "LOCATE" -> "LOCATE('b', 'abc')", "LOG" -> "LOG(2, 8)", "LOG10" -> "LOG10(100)",
    "LOG2" -> "LOG2(8)", "LOWER" -> "LOWER('AB')", "LPAD" -> "LPAD('a', 3, '0')",
    "LSHIFT" -> "LSHIFT(1, 3)", "LTRIM" -> "LTRIM('  a')",
    "MAP" -> "MAP('k', 1)", "MAP_CONSTRUCT" -> "MAP_CONSTRUCT('k', 1)",
    "MAP_KEYS" -> "MAP_KEYS(map('k', 1))", "MAP_VALUES" -> "MAP_VALUES(map('k', 1))",
    "MAX" -> "MAX(x) FROM VALUES (1),(2) t(x)",
    "MEDIAN" -> "MEDIAN(x) FROM VALUES (1),(2) t(x)",
    "MIN" -> "MIN(x) FROM VALUES (1),(2) t(x)",
    "NDV" -> "NDV(x) FROM VALUES (1),(2) t(x)",
    "NORMALIZE_STRING" -> "NORMALIZE_STRING('¼', 'NFKD')",
    "NOW" -> "NOW()",
    "NTILE" -> "NTILE(2) OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "NULLIF" -> "NULLIF(1, 1)", "OCTET_LENGTH" -> "OCTET_LENGTH('ab')",
    "PARSE_URL" -> "PARSE_URL('http://h/p', 'HOST')",
    "PERCENTILE_CONT" -> "PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY x) FROM VALUES (1.0),(2.0) t(x)",
    "PERCENTILE_DISC" -> "PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) FROM VALUES (1.0),(2.0) t(x)",
    "PERCENT_RANK" -> "PERCENT_RANK() OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "PI" -> "PI()", "PMOD" -> "PMOD(-7, 3)",
    "POSITION" -> "POSITION('b' IN 'abc')", "POWER" -> "POWER(2, 3)",
    "QUERY_USER" -> "QUERY_USER()", "RADIANS" -> "RADIANS(180)",
    "RANDOM" -> "RANDOM()",
    "RANK" -> "RANK() OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "REGEXP_COL_LIKE" -> "REGEXP_COL_LIKE('abc', '^a')",
    "REGEXP_COL_MATCHES" -> "REGEXP_COL_MATCHES('abc', 'b')",
    "REGEXP_EXTRACT" -> "REGEXP_EXTRACT('a1', '([0-9])', 1)",
    "REGEXP_LIKE" -> "REGEXP_LIKE('abc', '^a')",
    "REGEXP_MATCHES" -> "REGEXP_MATCHES('abc', 'b')",
    "REGEXP_REPLACE" -> "REGEXP_REPLACE('a1', '[0-9]', 'x')",
    "REGEXP_SPLIT" -> "REGEXP_SPLIT('a1b', '[0-9]', 'ALL', 10)",
    "REPEAT" -> "REPEAT('ab', 2)", "REPEATSTR" -> "REPEATSTR('ab', 2)",
    "REPLACE" -> "REPLACE('abc', 'b', 'x')", "REVERSE" -> "REVERSE('abc')",
    "RIGHT" -> "RIGHT('abc', 2)", "ROUND" -> "ROUND(1.45, 1)",
    "ROW_NUMBER" -> "ROW_NUMBER() OVER (ORDER BY x) FROM VALUES (1),(2) t(x)",
    "RPAD" -> "RPAD('a', 3, '0')", "RSHIFT" -> "RSHIFT(8, 2)",
    "RSHIFTUNSIGNED" -> "RSHIFTUNSIGNED(-8, 2)", "RTRIM" -> "RTRIM('a  ')",
    "SESSION_USER" -> "SESSION_USER()",
    "SET_UNION" -> "SET_UNION(array(1), array(2))",
    "SHIFTLEFT" -> "SHIFTLEFT(1, 3)", "SHIFTRIGHT" -> "SHIFTRIGHT(8, 2)",
    "SHIFTRIGHTUNSIGNED" -> "SHIFTRIGHTUNSIGNED(-8, 2)",
    "SIGN" -> "SIGN(-2)",
    "SIMILAR_TO" -> "SIMILAR_TO('abc', 'a%')",
    "SIN" -> "SIN(0)", "SINH" -> "SINH(0)", "SIZE" -> "SIZE(array(1))",
    "SPACE" -> "SPACE(2)", "SPLIT_PART" -> "SPLIT_PART('a-b', '-', 1)",
    "SQRT" -> "SQRT(4)",
    "STDDEV" -> "STDDEV(x) FROM VALUES (1.0),(2.0) t(x)",
    "STDDEV_POP" -> "STDDEV_POP(x) FROM VALUES (1.0),(2.0) t(x)",
    "STDDEV_SAMP" -> "STDDEV_SAMP(x) FROM VALUES (1.0),(2.0) t(x)",
    "STRING_BINARY" -> "STRING_BINARY(CAST('ab' AS BINARY))",
    "STRPOS" -> "STRPOS('abc', 'b')",
    "ST_FROMGEOHASH" -> "ST_FROMGEOHASH('9q8yy')",
    "ST_GEOHASH" -> "ST_GEOHASH(37.77, -122.42, 9)",
    "SUBLIST" -> "SUBLIST(array(1, 2, 3), 2, 2)",
    "SUBSTRING" -> "SUBSTRING('abc', 2, 1)",
    "SUM" -> "SUM(x) FROM VALUES (1),(2) t(x)",
    "TAN" -> "TAN(0)", "TANH" -> "TANH(0)",
    "TIMESTAMPADD" -> "TIMESTAMPADD(DAY, 1, TIMESTAMP '2024-01-01 00:00:00')",
    "TIMESTAMPDIFF" -> "TIMESTAMPDIFF(DAY, TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-02 00:00:00')",
    "TIMESTAMPTYPE" -> "TIMESTAMPTYPE('2024-01-01 00:00:00')",
    "TOASCII" -> "TOASCII('abc', 'UTF-8')",
    "TO_CHAR" -> "TO_CHAR(125.8, '999.9')",
    "TO_DATE" -> "TO_DATE('2024-01-01')", "TO_HEX" -> "TO_HEX(255)",
    "TO_NUMBER" -> "TO_NUMBER('125', '999')",
    "TO_TIME" -> "TO_TIME('13:02:01')",
    "TO_TIMESTAMP" -> "TO_TIMESTAMP('2024-01-01 00:00:00')",
    "TO_UTF8" -> "TO_UTF8('abc')",
    "TRANSACTION_TIMESTAMP" -> "TRANSACTION_TIMESTAMP()",
    "TRANSLATE" -> "TRANSLATE('ab', 'b', 'c')", "TRIM" -> "TRIM('  a  ')",
    "TRUNCATE" -> "TRUNCATE(3.75, 1)", "TYPEOF" -> "TYPEOF(1)",
    "UNIX_TIMESTAMP" -> "UNIX_TIMESTAMP(TIMESTAMP '2024-01-01 00:00:00')",
    "UPPER" -> "UPPER('ab')", "USER" -> "USER()",
    "VAR_POP" -> "VAR_POP(x) FROM VALUES (1.0),(2.0) t(x)",
    "VAR_SAMP" -> "VAR_SAMP(x) FROM VALUES (1.0),(2.0) t(x)",
    "WEEKOFYEAR" -> "WEEKOFYEAR(DATE '2024-01-15')",
    "XOR" -> "XOR(3, 1)", "YEARWEEK" -> "YEARWEEK(DATE '2024-02-01')",
    // filesystem-directory helpers resolve against a real directory tree
    "MAXDIR" -> "MAXDIR('/root/testdata')",
    "MINDIR" -> "MINDIR('/root/testdata')",
    "IMAXDIR" -> "IMAXDIR('/root', 'testdata')",
    "IMINDIR" -> "IMINDIR('/root', 'testdata')")

  /** Documented names NOT runnable here, each with why. */
  private val divergences: Map[String, String] = Map.empty

  test("every documented reference function name executes (230-name sweep)") {
    val failures = calls.flatMap { case (name, body) =>
      val sql = if (body.contains(" FROM ")) s"SELECT $body" else s"SELECT $body AS v"
      try { spark.sql(sql).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"${failures.size} failed:\n${failures.mkString("\n")}")
    // the sweep + documented divergences cover the full published list
    assert(calls.size + divergences.size == 230,
      s"sweep covers ${calls.size} + ${divergences.size} divergences; expected 230")
    assert(calls.map(_._1).toSet.intersect(divergences.keySet).isEmpty)
  }

  test("MAXDIR family picks directory extremes (case-sensitive and -insensitive)") {
    val root = java.nio.file.Files.createTempDirectory("sweep_dirs")
    Seq("alpha", "Bravo", "charlie", "delta").foreach(n =>
      java.nio.file.Files.createDirectory(root.resolve(n)))
    java.nio.file.Files.createFile(root.resolve("zz_not_a_dir.txt")) // ignored
    def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").collect().head.get(0)
    // case-sensitive: uppercase sorts below lowercase ('B' < 'a')
    assert(one(s"MAXDIR('$root')") == "delta")
    assert(one(s"MINDIR('$root')") == "Bravo")
    // case-insensitive compare, original name returned
    assert(one(s"IMAXDIR('$root')") == "delta")
    assert(one(s"IMINDIR('$root')") == "alpha")
    // two-arg (root, relative) form; missing path → NULL
    assert(one(s"MAXDIR('${root.getParent}', '${root.getFileName}')") == "delta")
    assert(one(s"MAXDIR('$root/nope')") == null)
  }

  test("value pins for the names this sweep introduced") {
    def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").collect().head.get(0)
    assert(one("FROM_HEX('41')").asInstanceOf[Array[Byte]].toSeq == Seq('A'.toByte))
    assert(one("TO_HEX(255)") == "FF")
    assert(one("STRING_BINARY(BINARY_STRING('Dremio'))") == "Dremio")
    assert(one("STRING_BINARY(CAST(X'0041' AS BINARY))") == "\\x00A")
    assert(one("NORMALIZE_STRING('¼', 'NFKD')") == "1⁄4")
    assert(one("CONVERT_REPLACEUTF8(X'41FF42', '?')") == "A?B")
    assert(one("IS_UTF8(X'41FF')") == false)
    assert(one("IS_UTF8(CAST('ok' AS BINARY))") == true)
    // geohash round trip: encode → decode lands within cell error
    assert(one("ST_GEOHASH(37.77, -122.42, 9)") ==
      graft.functions.DremioSurface.geohashEncode(37.77, -122.42, 9))
    val dec = one("ST_FROMGEOHASH(ST_GEOHASH(37.77, -122.42, 9))")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(math.abs(dec.getDouble(0) - 37.77) < 1e-3 &&
      math.abs(dec.getDouble(1) + 122.42) < 1e-3)
    assert(one("SIMILAR_TO('abc', 'a%')") == true)
    assert(one("SIMILAR_TO('abc', 'a_')") == false)   // _ matches exactly one
    assert(one("SIMILAR_TO('a.c', 'a.c')") == true)
    assert(one("SIMILAR_TO('axc', 'a.c')") == false)  // . is literal in SQL regex
    assert(one("ISNUMERIC('12.5')") == true && one("ISNUMERIC('x')") == false)
    assert(one("ISNUMERIC(3)") == true)
    assert(one("IS_INT('12')") == true && one("IS_INT('12.5')") == false)
    assert(one("IS_DATE('2024-01-01')") == true && one("IS_DATE('nope')") == false)
    // Spark 4.1's native TIME type serves TO_TIME
    assert(one("CAST(TO_TIME('13:02:01') AS STRING)") == "13:02:01")
    assert(one("YEARWEEK(DATE '2003-02-01')") == 5)
    assert(one("LSHIFT(1, 3)") == 8 && one("RSHIFT(8, 2)") == 2)
    assert(one("XOR(3, 1)") == 2)
    assert(one("CONVERT_TO(named_struct('a', 1), 'JSON')") == "{\"a\":1}")
    assert(one("CAST(CONVERT_FROM('{\"a\": 7}', 'JSON'):a AS INT)") == 7)
  }
}
