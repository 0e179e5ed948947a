package graft.functions

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
