package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-phrase matching — the blocklist/keyword-scan
  * primitive a training-data pipeline needs at scale. A 10k-phrase
  * blocklist (PII markers, boilerplate signatures, refusal templates,
  * banned domains) applied as OR'ed LIKEs or a regex alternation costs
  * O(text × phrases) per row and falls out of codegen; the automaton is
  * built ONCE at plan time on the driver, ships to executors as a
  * codegen reference object, and matches every phrase in O(text + hits)
  * per row regardless of phrase count.
  *
  * Classic construction (Aho & Corasick 1975, CACM 18(6)): a character
  * trie with BFS-computed failure links; each node's output set is its
  * own terminal phrase plus the failure-chain's outputs, pre-merged at
  * build time so the match loop never walks failure chains for output.
  */
final class AhoCorasick(val phrases: Array[String]) extends Serializable {
  require(phrases.nonEmpty, "multi-phrase matcher needs at least one phrase")
  require(phrases.forall(p => p != null && p.nonEmpty),
    "phrases must be non-null, non-empty strings")

  // Only the flattened arrays are fields — the build-time trie buffers
  // live in the builder's scope, so the serialized reference object the
  // codegen ships to executors carries the automaton exactly once.
  private val (childArr, failArr, outArr) = AhoCorasick.build(phrases)

  /** Distinct matched phrases, in PHRASE-LIST order (deterministic). */
  def hits(text: UTF8String): ArrayData = {
    val s = text.toString
    val seen = new Array[Boolean](phrases.length)
    var node = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      var next = childArr(node).get(ch)
      while (next == null && node != 0) {
        node = failArr(node)
        next = childArr(node).get(ch)
      }
      node = if (next != null) next.intValue() else 0
      val os = outArr(node)
      var j = 0
      while (j < os.length) { seen(os(j)) = true; j += 1 }
      i += 1
    }
    val found = phrases.indices.filter(seen)
    new GenericArrayData(found.map(i => UTF8String.fromString(phrases(i))).toArray[Any])
  }
}

object AhoCorasick {
  /** Classic two-phase construction; returns only the flattened match
    * structures (children maps, failure links, pre-merged outputs). */
  private def build(phrases: Array[String])
      : (Array[java.util.HashMap[Char, Integer]], Array[Int], Array[Array[Int]]) = {
    // trie: growable parallel structures; children as per-node HashMap
    // (phrase alphabets are sparse; a dense char table would be 128KB/node)
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Integer]())
    val fail = scala.collection.mutable.ArrayBuffer(0)
    val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    // phase 1: trie of all phrases
    phrases.zipWithIndex.foreach { case (p, id) =>
      var node = 0
      p.foreach { ch =>
        val next = children(node).get(ch)
        node = if (next != null) next.intValue()
        else {
          children += new java.util.HashMap[Char, Integer]()
          fail += 0
          out += Nil
          val n = children.size - 1
          children(node).put(ch, n)
          n
        }
      }
      out(node) = id :: out(node)
    }
    // phase 2: BFS failure links + output merging
    val queue = new java.util.ArrayDeque[Int]()
    children(0).forEach((_, child) => { fail(child) = 0; queue.add(child) })
    while (!queue.isEmpty) {
      val node = queue.poll()
      children(node).forEach { (ch, child) =>
        var f = fail(node)
        while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
        val target = children(f).get(ch)
        fail(child) = if (target != null && target != child) target.intValue() else 0
        out(child) = out(child) ++ out(fail(child))
        queue.add(child)
      }
    }
    (children.toArray, fail.toArray, out.map(_.toArray).toArray)
  }
}

/** phrase_hits(text, array('p1', 'p2', ...)): distinct phrases of the
  * literal list contained in `text`, in list order. The phrase array
  * must be foldable — the automaton compiles once at plan time. */
case class PhraseHits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  private def phraseList: Array[String] = {
    require(right.foldable && right.dataType.isInstanceOf[ArrayType] &&
      right.dataType.asInstanceOf[ArrayType].elementType == StringType,
      "phrase_hits: phrases must be a literal ARRAY<STRING>")
    val arr = right.eval()
    require(arr != null, "phrase_hits: phrase array must not be null")
    val elems = arr.asInstanceOf[ArrayData].toArray[UTF8String](StringType)
    require(elems.forall(_ != null),
      "phrase_hits: phrase array must not contain null elements")
    elems.map(_.toString)
  }

  @transient private lazy val ac = new AhoCorasick(phraseList)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    try {
      require(left.dataType == StringType, "phrase_hits: text must be STRING")
      ac
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } catch { case e: IllegalArgumentException =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(e.getMessage)
    }
  }

  override def nullSafeEval(text: Any, phrases: Any): Any =
    ac.hits(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("ahoCorasick", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = $a.hits($text);")
  }

  override def prettyName: String = "phrase_hits"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
