package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CONVERT_FROM(col, 'JSON') equivalent (dremio-oss
  * `sabot/op/fromjson/ConvertFromJsonOperator.java:52`): the reference
  * *infers* the JSON schema while reading; Spark's `from_json` requires a
  * schema up-front. We bridge with sample-based inference: run Spark's JSON
  * schema inference over a bounded sample of the column, then apply
  * `from_json` with the learned schema (distributed, codegen'd).
  *
  * At 100 TB the sample stays bounded (`sampleRows` rows via `limit`, pushed
  * to the first partitions) — inference cost does not grow with table size.
  */
object JsonOps {

  def inferJsonSchema(df: DataFrame, jsonCol: String, sampleRows: Int = 10000): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol)).na.drop().limit(sampleRows).as[String]
    spark.read.json(sample).schema
  }

  /** Adds `outCol` = parsed struct of `jsonCol`. */
  def convertFromJson(df: DataFrame, jsonCol: String, outCol: String,
                      sampleRows: Int = 10000): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), inferJsonSchema(df, jsonCol, sampleRows)))

  /** COMPLEX_TO_JSON (dremio-oss `exec/physical/config/ComplexToJson.java`). */
  def complexToJson(c: Column): Column = to_json(c)

  // ---------- mixed-type columns (the reference's UNION type) ----------
  // The reference's schema-free JSON reader gives one field different types
  // on different rows (`CompleteType.java:143-171` UNION; accessors return
  // NULL on type mismatch). Spark-first re-expression: Spark 4's VARIANT
  // type — binary-encoded semi-structured values with per-row runtime
  // types, codegen'd accessors, and shreddable storage. No custom type
  // system needed; these helpers pin the union-semantics mapping.

  /** Parse a raw JSON text column into a VARIANT (invalid JSON → NULL,
    * like the reference's error-tolerant union reader). */
  def variantFromJson(df: DataFrame, jsonCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, try_parse_json(col(jsonCol)))

  /** Per-row runtime type tag of a variant value (the union tag):
    * "BIGINT", "STRING", "ARRAY<BIGINT>", "OBJECT<...>", ... */
  def variantTypeOf(c: Column): Column = schema_of_variant(c)

  /** Typed accessor with union semantics: value at `path` cast to
    * `targetType`, NULL when the row's runtime type doesn't fit. */
  def variantGet(c: Column, path: String, targetType: String): Column =
    try_variant_get(c, path, targetType)
}
