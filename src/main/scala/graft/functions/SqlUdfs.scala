package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-defined UDFs (reference: `CREATE FUNCTION` with SQL body, expanded at
  * plan time — dremio-oss `exec/catalog/udf/DremioScalarUserDefinedFunction
  * .java`). Spark 4 SQL scalar functions give the same plan-time expansion;
  * used here to carry the reference's function-name aliases that Spark
  * lacks (SURVEY §2.8/§7.3 "FunctionRegistry aliases").
  */
object SqlUdfs {

  private val defs = Seq(
    // Dremio-surface aliases over Spark built-ins
    "CREATE OR REPLACE TEMPORARY FUNCTION charsubstring(s STRING, p INT, l INT) " +
      "RETURNS STRING RETURN substring(s, p, l)",
    "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) " +
      "RETURNS INT RETURN locate(sub, s)",
    "CREATE OR REPLACE TEMPORARY FUNCTION col_like(s STRING, pat STRING) " +
      "RETURNS BOOLEAN RETURN s LIKE pat",
    "CREATE OR REPLACE TEMPORARY FUNCTION dremio_ltrim(s STRING, cs STRING) " +
      "RETURNS STRING RETURN ltrim(cs, s)",
    "CREATE OR REPLACE TEMPORARY FUNCTION last_matching_map_entry_for_key(" +
      "m MAP<STRING, STRING>, k STRING) RETURNS STRING RETURN element_at(m, k)",
    // masking family (reference MaskingFunctions.java / HIVE_MASK*)
    "CREATE OR REPLACE TEMPORARY FUNCTION mask_full(s STRING) " +
      "RETURNS STRING RETURN mask(s)",
    "CREATE OR REPLACE TEMPORARY FUNCTION mask_show_last_n(s STRING, n INT) " +
      "RETURNS STRING RETURN concat(mask(substring(s, 1, greatest(length(s) - n, 0))), " +
      "substring(s, greatest(length(s) - n + 1, 1)))",
    "CREATE OR REPLACE TEMPORARY FUNCTION mask_hash(s STRING) " +
      "RETURNS STRING RETURN sha2(s, 256)",
    // context functions (reference ContextFunctions.java): query_user()
    // is the QUERY executor's identity — the AUTHENTICATEd principal when
    // one exists (graft_principal() folds per query in the optimizer),
    // else the Spark session user
    "CREATE OR REPLACE TEMPORARY FUNCTION query_user() " +
      "RETURNS STRING RETURN coalesce(graft_principal(), current_user())",
    "CREATE OR REPLACE TEMPORARY FUNCTION session_user_name() " +
      "RETURNS STRING RETURN session_user()",
    // geo (reference GeoFunctions.java) — haversine meters
    "CREATE OR REPLACE TEMPORARY FUNCTION geo_distance(" +
      "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE) RETURNS DOUBLE RETURN " +
      "2 * 6371008.8 * asin(sqrt(pow(sin(radians(lat2 - lat1) / 2), 2) + " +
      "cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)))",
    "CREATE OR REPLACE TEMPORARY FUNCTION geo_nearby(" +
      "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE, dist DOUBLE) " +
      "RETURNS BOOLEAN RETURN geo_distance(lat1, lon1, lat2, lon2) <= dist",
    "CREATE OR REPLACE TEMPORARY FUNCTION geo_beyond(" +
      "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE, dist DOUBLE) " +
      "RETURNS BOOLEAN RETURN geo_distance(lat1, lon1, lat2, lon2) > dist",
    // remaining masking family (reference MaskingFunctions.java HIVE_MASK*
    // ids: mask/show first/last n; n > length degrades to whole string)
    "CREATE OR REPLACE TEMPORARY FUNCTION mask_first_n(s STRING, n INT) " +
      "RETURNS STRING RETURN concat(mask(substring(s, 1, n)), " +
      "substring(s, n + 1))",
    "CREATE OR REPLACE TEMPORARY FUNCTION mask_last_n(s STRING, n INT) " +
      "RETURNS STRING RETURN concat(substring(s, 1, greatest(length(s) - n, 0)), " +
      "mask(substring(s, greatest(length(s) - n, 0) + 1)))",
    "CREATE OR REPLACE TEMPORARY FUNCTION mask_show_first_n(s STRING, n INT) " +
      "RETURNS STRING RETURN concat(substring(s, 1, n), " +
      "mask(substring(s, n + 1)))",
    // UTC/context time surface (DremioSqlOperatorTable CURRENT_*_UTC,
    // STATEMENT_TIMESTAMP/TRANSACTION_TIMESTAMP/TIMEOFDAY; single-JVM
    // sessions have no txn scope beyond the statement, same as reference
    // coordinators treat autocommitted queries)
    "CREATE OR REPLACE TEMPORARY FUNCTION current_timestamp_utc() " +
      "RETURNS TIMESTAMP RETURN to_utc_timestamp(current_timestamp(), current_timezone())",
    "CREATE OR REPLACE TEMPORARY FUNCTION current_date_utc() " +
      "RETURNS DATE RETURN to_date(to_utc_timestamp(current_timestamp(), current_timezone()))",
    "CREATE OR REPLACE TEMPORARY FUNCTION current_time_utc() " +
      "RETURNS STRING RETURN date_format(to_utc_timestamp(current_timestamp(), current_timezone()), 'HH:mm:ss')",
    "CREATE OR REPLACE TEMPORARY FUNCTION statement_timestamp() " +
      "RETURNS TIMESTAMP RETURN current_timestamp()",
    "CREATE OR REPLACE TEMPORARY FUNCTION transaction_timestamp() " +
      "RETURNS TIMESTAMP RETURN current_timestamp()",
    "CREATE OR REPLACE TEMPORARY FUNCTION timeofday() " +
      "RETURNS STRING RETURN date_format(current_timestamp(), 'EEE MMM dd HH:mm:ss.SSS zzz yyyy')",
    "CREATE OR REPLACE TEMPORARY FUNCTION system_user() " +
      "RETURNS STRING RETURN current_user()",
    "CREATE OR REPLACE TEMPORARY FUNCTION empty_array() " +
      "RETURNS ARRAY<STRING> RETURN array()",
    // boolean predicates (reference ISTRUE/ISFALSE/ISNULL docs)
    "CREATE OR REPLACE TEMPORARY FUNCTION istrue(b BOOLEAN) " +
      "RETURNS BOOLEAN RETURN b IS TRUE",
    "CREATE OR REPLACE TEMPORARY FUNCTION isfalse(b BOOLEAN) " +
      "RETURNS BOOLEAN RETURN b IS FALSE",
    // ISNULL needs no shim: Spark ships isnull(x) under the same name
    // TIME surface (reference CURRENT_TIME/LOCALTIME/TO_TIME; graft's TIME
    // convention is INT millis-of-day — functions.TimeConv)
    // CURRENT_TIME / TO_TIME need no shim: Spark 4.1's TIME type ships
    // current_time() and to_time() under the reference's names
    "CREATE OR REPLACE TEMPORARY FUNCTION localtime() " +
      "RETURNS STRING RETURN date_format(localtimestamp(), 'HH:mm:ss')",
    // ARRAY_FREQUENCY (reference exec/expr/fn/impl/array/ArrayFrequency):
    // value → occurrence-count map, composed from higher-order builtins
    // NULL elements are dropped (a null map key is illegal, and `y = x`
    // would three-value-logic them to a wrong count anyway)
    "CREATE OR REPLACE TEMPORARY FUNCTION array_frequency(a ARRAY<STRING>) " +
      "RETURNS MAP<STRING, INT> RETURN map_from_entries(" +
      "transform(array_distinct(filter(a, x -> x IS NOT NULL)), " +
      "x -> struct(x, size(filter(a, y -> y = x)))))",
    // tabular SQL UDF (reference DremioTabularUserDefinedFunction +
    // TabularUserDefinedFunctionExpanderRule: table functions expanded at
    // plan time; Spark 4 SQL table functions do the same). Usable in a
    // FROM clause: SELECT * FROM int_range(5).
    "CREATE OR REPLACE TEMPORARY FUNCTION int_range(n INT) " +
      "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n)) AS i")

  /** Install all SQL UDFs into the session (idempotent: OR REPLACE). */
  def register(spark: SparkSession): Unit = defs.foreach(spark.sql(_))
}
