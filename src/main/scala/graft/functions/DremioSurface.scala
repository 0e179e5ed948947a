package graft.functions

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's custom SQL-operator surface that Spark lacks by NAME
  * (`exec/planner/sql/DremioSqlOperatorTable.java:67` — 156 operators; the
  * ones not already Spark built-ins or earlier graft functions). Almost
  * everything here is a PLAN-TIME expansion onto Spark's codegen'd
  * built-ins via the Column DSL — polymorphic over element types (which
  * `CREATE FUNCTION` SQL UDFs cannot be), zero runtime shims. The two
  * context functions resolve to literals at plan time, exactly how the
  * reference treats them (`ContextFunctions.java`). */
object DremioSurface {

  /** REGEXP_SPLIT(input, regex, 'FIRST'|'LAST'|'INDEX'|'ALL', n) — the
    * reference's four-mode splitter (`dac/explore/udfs/SplitPattern.java:
    * 115-190`, operator `DremioSqlOperatorTable.java:163`):
    * FIRST/LAST/INDEX(i) split at exactly one match occurrence into
    * [prefix, suffix] (out-of-range INDEX → whole input), ALL(max) emits
    * at most `max` segments and DROPS the remainder (not Java split's
    * clamp-last). No match → [input]. pattern/mode/n are constant per the
    * reference's @Param(constant) — compiled once at construction.
    * Registry breadth, not a hot-path kernel → eval with CodegenFallback. */
  case class RegexpSplitExpr(input: Expression, regex: String, mode: String,
                             param: Int)
      extends UnaryLikeExpr with CodegenFallback {
    override def child: Expression = input
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val pattern = Pattern.compile(regex)

    override def nullSafeEval(in: Any): Any = {
      val s = in.asInstanceOf[UTF8String].toString
      val m = pattern.matcher(s)
      val spans = Vector.newBuilder[(Int, Int)]
      while (m.find()) spans += ((m.start, m.end))
      val matches = spans.result()
      def u(a: String) = UTF8String.fromString(a)
      val parts: Seq[UTF8String] =
        if (matches.isEmpty) Seq(u(s))
        else mode match {
          case "ALL" =>
            val out = Vector.newBuilder[UTF8String]
            var p = 0
            var budget = param
            var broke = false
            val it = matches.iterator
            while (!broke && it.hasNext) {
              val (ms, me) = it.next()
              if (p <= ms) { out += u(s.substring(p, ms)); budget -= 1 }
              p = me
              if (budget <= 0) broke = true
            }
            if (!broke && budget > 0) out += u(s.substring(p))
            out.result()
          case one =>
            val pick = one match {
              case "FIRST" => Some(matches.head)
              case "LAST"  => Some(matches.last)
              case "INDEX" => if (param < matches.size) Some(matches(param)) else None
              case other => throw new IllegalArgumentException(
                s"regexp_split: unknown mode '$other' (FIRST|LAST|INDEX|ALL)")
            }
            pick match {
              case Some((ms, me)) => Seq(u(s.substring(0, ms)), u(s.substring(me)))
              case None           => Seq(u(s))
            }
        }
      new GenericArrayData(parts.toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(input = c)
  }

  /** NORMALIZE_STRING(s, 'NFC'|'NFD'|'NFKC'|'NFKD') — unicode normalization
    * (reference `NORMALIZE_STRING.yaml`; java.text.Normalizer). */
  case class NormalizeString(input: Expression, form: String)
      extends UnaryLikeExpr with CodegenFallback {
    override def child: Expression = input
    override def dataType: DataType = StringType
    @transient private lazy val f = java.text.Normalizer.Form.valueOf(form.toUpperCase)
    override def nullSafeEval(in: Any): Any = UTF8String.fromString(
      java.text.Normalizer.normalize(in.asInstanceOf[UTF8String].toString, f))
    override protected def withNewChildInternal(c: Expression): Expression = copy(input = c)
  }

  /** CONVERT_REPLACEUTF8(bytes, replacement) — decode as UTF-8, invalid
    * sequences become the replacement string (reference
    * `CONVERT_REPLACEUTF8.yaml`). */
  case class ConvertReplaceUtf8(input: Expression, replacement: String)
      extends UnaryLikeExpr with CodegenFallback {
    override def child: Expression = input
    override def dataType: DataType = StringType
    override def nullSafeEval(in: Any): Any = {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        .replaceWith(replacement)
      UTF8String.fromString(
        dec.decode(java.nio.ByteBuffer.wrap(in.asInstanceOf[Array[Byte]])).toString)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(input = c)
  }

  /** IS_UTF8(bytes) — strict UTF-8 validity (reference `IS_UTF8.yaml`). */
  case class IsUtf8(input: Expression) extends UnaryLikeExpr with CodegenFallback {
    override def child: Expression = input
    override def dataType: DataType = BooleanType
    override def nullSafeEval(in: Any): Any =
      try {
        StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(in.asInstanceOf[Array[Byte]]))
        true
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    override protected def withNewChildInternal(c: Expression): Expression = copy(input = c)
  }

  /** STRING_BINARY(bytes) — printable chars pass through, everything else
    * escapes as \\xNN (reference `STRING_BINARY.yaml`). */
  case class StringBinary(input: Expression) extends UnaryLikeExpr with CodegenFallback {
    override def child: Expression = input
    override def dataType: DataType = StringType
    override def nullSafeEval(in: Any): Any = {
      val bytes = in.asInstanceOf[Array[Byte]]
      val sb = new java.lang.StringBuilder(bytes.length)
      bytes.foreach { b =>
        if (b >= 0x20 && b < 0x7F) sb.append(b.toChar)
        else sb.append(f"\\x${b & 0xFF}%02X")
      }
      UTF8String.fromString(sb.toString)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(input = c)
  }

  // ---- geohash (reference GeoFunctions ST_GEOHASH / ST_FROMGEOHASH) ----
  private val GeohashBase32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  private[functions] def geohashEncode(lat: Double, lon: Double, precision: Int): String = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val sb = new java.lang.StringBuilder(precision)
    var bits = 0; var bitCount = 0; var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { bits = (bits << 1) | 1; lonLo = mid }
        else { bits <<= 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { bits = (bits << 1) | 1; latLo = mid }
        else { bits <<= 1; latHi = mid }
      }
      even = !even
      bitCount += 1
      if (bitCount == 5) { sb.append(GeohashBase32(bits)); bits = 0; bitCount = 0 }
    }
    sb.toString
  }

  private[functions] def geohashDecode(h: String): (Double, Double) = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    var even = true
    h.foreach { ch =>
      val cd = GeohashBase32.indexOf(ch.toLower)
      require(cd >= 0, s"st_fromgeohash: invalid geohash character '$ch'")
      var mask = 16
      while (mask > 0) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if ((cd & mask) != 0) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if ((cd & mask) != 0) latLo = mid else latHi = mid
        }
        even = !even
        mask >>= 1
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  case class GeohashEncodeExpr(lat: Expression, lon: Expression, precision: Int)
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(lat, lon)
    override def nullable: Boolean = true
    override def dataType: DataType = StringType
    override def eval(row: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = lat.eval(row); val b = lon.eval(row)
      if (a == null || b == null) null
      else UTF8String.fromString(geohashEncode(
        a.asInstanceOf[Number].doubleValue, b.asInstanceOf[Number].doubleValue, precision))
    }
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
      copy(lat = cs(0), lon = cs(1))
  }

  case class GeohashDecodeExpr(input: Expression)
      extends UnaryLikeExpr with CodegenFallback {
    override def child: Expression = input
    override def dataType: DataType = StructType(Seq(
      StructField("latitude", DoubleType, nullable = false),
      StructField("longitude", DoubleType, nullable = false)))
    override def nullSafeEval(in: Any): Any = {
      val (la, lo) = geohashDecode(in.asInstanceOf[UTF8String].toString)
      org.apache.spark.sql.catalyst.InternalRow(la, lo)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(input = c)
  }

  /** SQL `SIMILAR TO` pattern → Java regex (reference SIMILAR_TO function
    * form): % → .*, _ → ., [] classes pass through, other regex
    * metacharacters are literal. */
  private[functions] def similarToRegex(pat: String): String = {
    val sb = new java.lang.StringBuilder(pat.length + 8)
    var inClass = false
    pat.foreach {
      case '%' if !inClass => sb.append(".*")
      case '_' if !inClass => sb.append('.')
      case '[' => inClass = true; sb.append('[')
      case ']' => inClass = false; sb.append(']')
      case c if !inClass && "\\.^$*+?()|{}".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    "^" + sb + "$"
  }

  /** MAXDIR/MINDIR/IMAXDIR/IMINDIR (reference FS-dataset directory
    * helpers, `DremioSqlOperatorTable` — the canonical use is resolving
    * the newest date-named partition directory:
    * `WHERE dir0 = MAXDIR('dfs', '/events')`). One or two string args
    * (a path, or a root + relative path joined); returns the
    * lexicographically max/min immediate SUBDIRECTORY name, the I-
    * variants comparing case-insensitively while returning the original
    * name. Listing goes through the Hadoop FileSystem client (works on
    * file:/hdfs/s3a paths alike); no subdirectories → NULL.
    *
    * The arguments must be literals, so the extreme is resolved ONCE on
    * the driver at function-build (analysis) time and substituted as a
    * Literal — a per-row expression would issue one Hadoop listStatus per
    * input row and could not run on remote executors at all (no active
    * session there). The folded Literal also lets Catalyst constant-fold
    * the enclosing predicate into partition pruning. */
  private[functions] def dirExtreme(fn: String, es: Seq[Expression],
                                    wantMax: Boolean,
                                    caseInsensitive: Boolean): Expression = {
    require(es.forall(e => e.foldable && e.dataType == StringType),
      s"$fn: arguments must be string literals (a path, or root + relative path)")
    val parts = es.map(_.eval())
    val pick: Any =
      if (parts.contains(null)) null
      else {
        val path = parts.map(_.toString.stripSuffix("/")).mkString("/")
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(Bridge.hadoopConf(SparkSession.active))
        if (!fs.exists(hp)) null
        else {
          val names = fs.listStatus(hp).filter(_.isDirectory).map(_.getPath.getName)
          if (names.isEmpty) null
          else {
            val key: String => String =
              if (caseInsensitive) _.toLowerCase else identity
            if (wantMax) names.maxBy(key) else names.minBy(key)
          }
        }
      }
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(pick, StringType)
    // the folded value is a live filesystem listing: deterministic to
    // Catalyst, stale the moment the directory changes — the plan cache
    // must never memoize a statement built through it
    lit.setTagValue(graft.accel.PlanCache.VolatileFoldTag, ())
    lit
  }

  /** Minimal single-child base (avoids depending on non-public helpers). */
  abstract class UnaryLikeExpr extends Expression {
    def child: Expression
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def foldable: Boolean = child.foldable
    def nullSafeEval(in: Any): Any
    override def eval(row: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(row)
      if (v == null) null else nullSafeEval(v)
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = {
      require(cs.length == 1); withNewChildInternal(cs.head)
    }
    protected def withNewChildInternal(c: Expression): Expression
  }

  private def c(e: Expression): Column = Bridge.column(e)
  private def ex(col: Column): Expression = Bridge.toCatalyst(col)

  private def foldString(fn: String, e: Expression, what: String): String = {
    require(e.foldable && e.dataType == StringType && e.eval() != null,
      s"$fn: $what must be a string literal")
    e.eval().toString
  }
  private def foldInt(fn: String, e: Expression, what: String): Int = {
    require(e.foldable, s"$fn: $what must be an integer literal")
    e.eval().toString.toInt
  }

  /** Empty array of the SAME element type as `a` (slice keeps the type). */
  private def emptyLike(a: Column): Column = slice(a, 1, 0)

  /** 0-based position with negative-from-end resolution (the reference's
    * `ArraySliceFunction.resolvePosition`). */
  private def resolvePos(i: Column, n: Column): Column =
    when(i < 0, n + i).otherwise(i)

  /** Register every operator-table name. Idempotent; polymorphic builders
    * expand to built-in expressions during analysis. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, arities: Set[Int])(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => {
        require(arities.isEmpty || arities(es.length),
          s"$name expects ${arities.toSeq.sorted.mkString(" or ")} argument(s), got ${es.length}")
        b(es)
      }, "built-in")

    // ---- array family (exec/expr/fn/impl/array/, convertlets) ----
    // ---- filesystem-directory helpers (MAXDIR family) ----
    one("maxdir", Set(1, 2))(es => dirExtreme("maxdir", es, wantMax = true, caseInsensitive = false))
    one("mindir", Set(1, 2))(es => dirExtreme("mindir", es, wantMax = false, caseInsensitive = false))
    one("imaxdir", Set(1, 2))(es => dirExtreme("imaxdir", es, wantMax = true, caseInsensitive = true))
    one("imindir", Set(1, 2))(es => dirExtreme("imindir", es, wantMax = false, caseInsensitive = true))

    one("array_cat", Set(2))(es => ex(concat(c(es(0)), c(es(1)))))
    one("array_concat", Set.empty)(es => ex(concat(es.map(c): _*)))
    one("array_intersection", Set(2))(es => ex(array_intersect(c(es(0)), c(es(1)))))
    one("array_length", Set(1))(es => ex(size(c(es(0)))))
    // ARRAY_TO_STRING accepts any element type (ArrayJoin wants strings →
    // cast elementwise first, like the reference's implicit varchar cast)
    def toDelimited(es: Seq[Expression]): Expression =
      org.apache.spark.sql.catalyst.expressions.ArrayJoin(
        ex(transform(c(es(0)), x => x.cast("string"))), es(1), None)
    one("array_to_string", Set(2))(toDelimited)
    one("list_to_delimited_string", Set(2))(toDelimited)
    one("set_union", Set(2))(es => ex(array_union(c(es(0)), c(es(1)))))
    one("sublist", Set(3))(es => ex(slice(c(es(0)), c(es(1)), c(es(2))))) // 1-based, neg-from-end: slice semantics
    one("mappify", Set(1))(es => ex(map_entries(c(es(0)))))
    one("kvgen", Set(1))(es => ex(map_entries(c(es(0)))))
    one("map_construct", Set.empty)(es => ex(map(es.map(c): _*)))

    // ARRAY_SUM/ARRAY_AVG (ArraySumConvertlet/ArrayAvgConvertlet:
    // avg = sum / length, length counts nulls)
    def arraySum(a: Column): Column = aggregate(
      transform(a, x => x.cast("double")),
      lit(null).cast("double"),
      (acc, x) => when(x.isNull, acc).when(acc.isNull, x).otherwise(acc + x))
    one("array_sum", Set(1))(es => ex(arraySum(c(es(0)))))
    one("array_avg", Set(1))(es => ex(arraySum(c(es(0))) / size(c(es(0)))))

    // ARRAY_SLICE(arr, from[, to]): 0-based, negative-from-end, from
    // inclusive / to exclusive, ANY invalid range → empty array (reference
    // ArraySliceFunction.sliceArray: explicit empty on from>to / to>size)
    one("array_slice", Set(2, 3)) { es =>
      val a = c(es(0))
      val n = size(a)
      val f = resolvePos(c(es(1)), n)
      val t = if (es.length == 3) resolvePos(c(es(2)), n) else n
      val sliced = filter(a, (_, i) => i >= f && i < t)
      ex(when(f < 0 || t < 0 || f > t || t > n, emptyLike(a)).otherwise(sliced))
    }

    // ARRAY_REMOVE_AT(arr, i): drop the resolved 0-based index; out of
    // range → unchanged (ArrayRemoveAtFunction.java:52-76)
    one("array_remove_at", Set(2)) { es =>
      val a = c(es(0))
      val p = resolvePos(c(es(1)), size(a))
      ex(filter(a, (_, i) => i =!= p))
    }

    // ARRAY_GENERATE_RANGE(start, stop[, step]): stop-EXCLUSIVE integer
    // range (ArrayGenerateRangeFunctions.java); Spark sequence() is
    // stop-inclusive and throws on wrong-direction bounds → guard + shrink
    one("array_generate_range", Set(2, 3)) { es =>
      val start = c(es(0)); val stop = c(es(1))
      val step = if (es.length == 3) c(es(2)) else lit(1)
      val sgn = when(step > 0, lit(1)).otherwise(lit(-1))
      val empty = emptyLike(sequence(start, start))
      ex(when(step === 0 || (stop - start) * sgn <= 0, empty)
        .otherwise(sequence(start, stop - sgn, step)))
    }

    // ---- scalar odds and ends ----
    one("bitwise_and", Set(2))(es => ex(c(es(0)).bitwiseAND(c(es(1)))))
    one("hashsha256", Set(1))(es => ex(sha2(c(es(0)).cast("string"), 256)))
    // numeric TRUNCATE(x[, d]): toward zero at d decimal places
    // (MathFunctions.java trunc family; negative d truncates to tens etc.)
    one("truncate", Set(1, 2)) { es =>
      val x = c(es(0)).cast("double")
      val p = if (es.length == 2) pow(lit(10.0), c(es(1))) else lit(1.0)
      ex(signum(x) * floor(abs(x) * p) / p)
    }
    one("regexp_col_like", Set(2))(es => ex(regexp_like(c(es(0)), c(es(1)))))
    one("regexp_matches", Set(2))(es => ex(regexp_like(c(es(0)), c(es(1)))))

    one("regexp_split", Set(4)) { es =>
      RegexpSplitExpr(es(0),
        foldString("regexp_split", es(1), "pattern"),
        foldString("regexp_split", es(2), "mode").toUpperCase,
        foldInt("regexp_split", es(3), "parameter"))
    }

    // ---- documented-name aliases over Spark built-ins (reference
    // function_specs/documented/*.yaml — same semantics, different name) ----
    one("from_hex", Set(1))(es => ex(unhex(c(es(0)))))
    one("to_hex", Set(1))(es => ex(hex(c(es(0)))))
    one("hash64", Set.empty)(es => ex(xxhash64(es.map(c): _*)))
    one("lshift", Set(2))(es =>
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(es(0), es(1)))
    one("rshift", Set(2))(es =>
      org.apache.spark.sql.catalyst.expressions.ShiftRight(es(0), es(1)))
    one("rshiftunsigned", Set(2))(es =>
      org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned(es(0), es(1)))
    one("repeatstr", Set(2))(es => ex(repeat(c(es(0)), c(es(1)).cast("int"))))
    one("collect", Set(1))(es => ex(collect_list(c(es(0)))))
    one("ndv", Set(1))(es => ex(approx_count_distinct(c(es(0)))))
    one("hll", Set(1))(es => ex(hll_sketch_agg(c(es(0)))))
    one("regexp_col_matches", Set(2))(es => ex(regexp_like(c(es(0)), c(es(1)))))
    one("xor", Set(2))(es => ex(c(es(0)).bitwiseXOR(c(es(1)))))
    one("bitwise_or", Set(2))(es => ex(c(es(0)).bitwiseOR(c(es(1)))))
    one("bitwise_xor", Set(2))(es => ex(c(es(0)).bitwiseXOR(c(es(1)))))
    one("bitwise_not", Set(1))(es =>
      org.apache.spark.sql.catalyst.expressions.BitwiseNot(es(0)))
    one("random", Set(0, 1))(es =>
      if (es.isEmpty) ex(rand()) else ex(rand(es.head.eval().toString.toLong)))
    one("datetype", Set(1))(es => ex(c(es(0)).cast("date")))
    one("timestamptype", Set(1))(es => ex(c(es(0)).cast("timestamp_ntz")))
    // CONVERT_FROM/CONVERT_TO (reference conv family, `exec/expr/fn/impl/
    // conv/`): the two formats with cross-engine meaning — JSON (→ Spark 4
    // VARIANT, the reference's union-typed result) and UTF8
    one("convert_from", Set(2)) { es =>
      foldString("convert_from", es(1), "format").toUpperCase match {
        case "JSON" => ex(parse_json(c(es(0)).cast("string")))
        case "UTF8" => ex(decode(c(es(0)).cast("binary"), "UTF-8"))
        case other => throw new IllegalArgumentException(
          s"convert_from: unsupported format '$other' (JSON, UTF8)")
      }
    }
    one("convert_to", Set(2)) { es =>
      foldString("convert_to", es(1), "format").toUpperCase match {
        case "JSON" => ex(to_json(c(es(0))))
        case "UTF8" => ex(encode(c(es(0)).cast("string"), "UTF-8"))
        case other => throw new IllegalArgumentException(
          s"convert_to: unsupported format '$other' (JSON, UTF8)")
      }
    }
    one("to_utf8", Set(1))(es => ex(encode(c(es(0)).cast("string"), "UTF-8")))
    one("binary_string", Set(1))(es => ex(c(es(0)).cast("binary")))
    one("yearweek", Set(1))(es => ex(weekofyear(c(es(0)).cast("date"))))
    one("string_binary", Set(1))(es => StringBinary(es(0)))
    // TOASCII(s, charset): reinterpret s's code units as charset bytes →
    // UTF-8 string (the read-as-wrong-encoding repair the reference doc
    // describes)
    one("toascii", Set(2)) { es =>
      ex(decode(encode(c(es(0)), "ISO-8859-1"),
        foldString("toascii", es(1), "charset")))
    }
    one("normalize_string", Set(2))(es =>
      NormalizeString(es(0), foldString("normalize_string", es(1), "form")))
    one("convert_replaceutf8", Set(2))(es =>
      ConvertReplaceUtf8(es(0), foldString("convert_replaceutf8", es(1), "replacement")))
    one("is_utf8", Set(1))(es => IsUtf8(es(0)))
    one("st_geohash", Set(2, 3)) { es =>
      val prec = if (es.length == 3) foldInt("st_geohash", es(2), "precision") else 12
      // decimal literals would reach eval as spark Decimal — normalize
      GeohashEncodeExpr(ex(c(es(0)).cast("double")), ex(c(es(1)).cast("double")), prec)
    }
    one("st_fromgeohash", Set(1))(es => GeohashDecodeExpr(es(0)))
    one("similar_to", Set(2))(es =>
      ex(regexp_like(c(es(0)),
        lit(similarToRegex(foldString("similar_to", es(1), "pattern"))))))

    // type-introspection family (ISNUMERIC/IS_INT/...): resolved from the
    // STATIC type when it is conclusive; string inputs degrade to a
    // runtime try_cast probe (the value-level check the reference applies
    // to varchar input)
    def typeCheck(name: String, matches: DataType => Boolean, castTo: String) =
      one(name, Set(1)) { es =>
        es(0).dataType match {
          case dt if matches(dt) => Literal(true)
          case StringType => ex(c(es(0)).try_cast(castTo).isNotNull)
          case _ => Literal(false)
        }
      }
    typeCheck("isnumeric", {
      case _: NumericType => true; case BinaryType => true; case _ => false
    }, "double")
    typeCheck("is_int", { case IntegerType | ShortType | ByteType => true; case _ => false }, "int")
    typeCheck("is_bigint", { case LongType => true; case _ => false }, "bigint")
    typeCheck("is_date", { case DateType => true; case _ => false }, "date")
    one("is_varchar", Set(1))(es => Literal(es(0).dataType == StringType))
    one("is_list", Set(1))(es => Literal(es(0).dataType.isInstanceOf[ArrayType]))

    // ---- context functions → plan-time literals (ContextFunctions.java;
    // the reference also resolves these against the session) ----
    one("is_member", Set(1)) { es =>
      val role = foldString("is_member", es(0), "role name").toLowerCase
      val member = graft.auth.Privileges.principalOf(SparkSession.active) match {
        case Some(u) => u.roles.contains(role) || (u.admin && role == graft.auth.Privileges.AdminRole)
        case None    => role == graft.auth.Privileges.AdminRole // unauthenticated = root
      }
      Literal(member)
    }
    one("last_query_id", Set(0)) { _ =>
      graft.catalog.QueryHistory.records.lastOption
        .map(r => Literal(r.id)).getOrElse(Literal(null, LongType))
    }
  }
}
