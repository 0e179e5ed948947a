package graft.accel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stats-driven reflection suggestions — the reference's
  * `services/accelerator/.../analysis/ReflectionSuggester.java:57` +
  * `ReflectionAnalyzer.java`: profile a dataset's columns (row count, NDV,
  * max rendered length) and propose reflection layouts — one RAW
  * (pass-through display of every field, `ReflectionSuggester.java:277`)
  * and one AGG whose dimensions are the lowest-cardinality narrow columns
  * under a cartesian-product budget and whose measures are the numeric
  * columns (`generate()`, `ReflectionSuggester.java:296-337`).
  *
  * Spark-first analysis: the reference issues a stats query per dataset
  * through its job service; here the profile is ONE distributed aggregate
  * over the DataFrame — `count(*)` plus per-column
  * `approx_count_distinct` (HLL, the same sketch family as the
  * reference's `ndv()`) and `max(length(...))`, partials combining
  * map-side. Profiling a 100 TB table costs one scan, no shuffle beyond
  * one row per partition.
  */
object ReflectionSuggester {

  // ReflectionSuggester.java:100-108
  val MaxDimensionFieldLength = 50
  val CartesianCardinalityUpperLimit: Long = 2L << 30
  val MaxMeasureFields = 30
  val MeasureFieldsRatio = 0.9
  // generate(): a further dimension must stay under 1% of the row count
  val DimensionCardinalityRatio = 0.01

  final case class ColumnStat(
      name: String,
      dataType: DataType,
      cardinality: Long,
      maxLen: Long) {
    def numeric: Boolean = dataType.isInstanceOf[NumericType]
    /** DECIMAL/FLOAT/DOUBLE are never dimensions (DX-7524 note,
      * `ReflectionSuggester.java:208-226`); integers may be. */
    def fractional: Boolean = dataType match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    }
    def complex: Boolean = dataType match {
      case _: ArrayType | _: MapType | _: StructType | BinaryType => true
      case _ => false
    }
  }

  final case class Suggestion(
      name: String,
      rtype: String, // RAW | AGG
      displayFields: Seq[String],
      dimensions: Seq[String],
      measures: Seq[String])

  /** One-pass column profile: (row count, per-column stats). Complex and
    * binary columns get no NDV (they cannot be dimensions or measures —
    * only RAW display fields). */
  def analyze(df: DataFrame): (Long, Seq[ColumnStat]) = {
    val fields = df.schema.fields.toSeq
    def statCols(f: StructField): Seq[Column] = {
      val simple = !ColumnStat(f.name, f.dataType, 0, 0).complex
      if (simple)
        Seq(approx_count_distinct(col(f.name)).as(s"__ndv_${f.name}"),
          coalesce(max(length(col(f.name).cast("string"))), lit(0L))
            .cast("long").as(s"__len_${f.name}"))
      else Nil
    }
    val aggs = count(lit(1)).cast("long").as("__n") +: fields.flatMap(statCols)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(0)
    val byName = row.schema.fieldNames.zipWithIndex.toMap
    val stats = fields.map { f =>
      val card = byName.get(s"__ndv_${f.name}")
        .map(i => row.getLong(i)).getOrElse(Long.MaxValue)
      val len = byName.get(s"__len_${f.name}")
        .map(i => row.getLong(i)).getOrElse(Long.MaxValue)
      ColumnStat(f.name, f.dataType, card, len)
    }
    (n, stats)
  }

  /** Suggest reflection layouts for a dataset (`getReflectionGoals`,
    * `ReflectionSuggester.java:115`). */
  def suggest(df: DataFrame, dataset: String): Seq[Suggestion] = {
    val (n, stats) = analyze(df)
    val raw = Suggestion(s"AUTO_${dataset}_RAW_0", "RAW",
      stats.map(_.name), Nil, Nil)

    val eligible = stats.filterNot(_.complex)
    val agg: Seq[Suggestion] =
      if (eligible.isEmpty) Nil
      else {
        val candidates = eligible.sortBy(_.cardinality) // cardinality ranking
        val dimCandidates = candidates.filter(c =>
          c.maxLen <= MaxDimensionFieldLength && !c.fractional)
        val measureLimit = math.min(MaxMeasureFields,
          math.max(1, (eligible.size * MeasureFieldsRatio).toInt))
        val measureCandidates =
          candidates.reverse.filter(_.numeric).take(measureLimit)

        if (dimCandidates.isEmpty) Nil
        else {
          // generate(): first dimension unconditionally, then greedily
          // under the 1%-of-rows and cartesian-product budgets
          val cardinalityLimit = math.max(n, 0L) * DimensionCardinalityRatio
          val dims = dimCandidates.tail.foldLeft(
            (Vector(dimCandidates.head), dimCandidates.head.cardinality)) {
            case ((acc, product), c) =>
              val newProduct = product * math.max(c.cardinality, 1L)
              if (c.cardinality <= cardinalityLimit &&
                  newProduct <= CartesianCardinalityUpperLimit)
                (acc :+ c, newProduct)
              else (acc, product)
          }._1
          val measures = measureCandidates.filterNot(m => dims.exists(_.name == m.name))
          Seq(Suggestion(s"AUTO_${dataset}_AGG_0", "AGG", Nil,
            dims.map(_.name), measures.map(_.name)))
        }
      }
    raw +: agg
  }

  /** Materialize a suggestion as a live reflection: RAW stores the dataset
    * as-is; AGG stores per-group COUNT plus SUM/MIN/MAX of every measure —
    * exactly the shape [[Reflections]] rolls queries up onto (reference
    * default measures, `ReflectionValidator.getDefaultMeasures`). Returns
    * the created reflection's name. */
  def materialize(spark: SparkSession, df: DataFrame, s: Suggestion,
                  path: String): String = {
    val mv = s.rtype match {
      case "RAW" => df.select(s.displayFields.map(col): _*)
      case "AGG" =>
        val aggs = count(lit(1)).as("cnt") +: s.measures.flatMap(m => Seq(
          sum(col(m)).as(s"sum_$m"), min(col(m)).as(s"min_$m"),
          max(col(m)).as(s"max_$m")))
        df.groupBy(s.dimensions.map(col): _*).agg(aggs.head, aggs.tail: _*)
      case other => throw new IllegalArgumentException(s"unknown type $other")
    }
    Reflections.create(s.name, mv, path)
    s.name
  }
}
