package graft.explore

import scala.collection.mutable

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

/** Locates a character selection inside a JSON-rendered cell — the seat of
  * the reference's `JSONElementLocator.java` (used by
  * `ExtractListRecommender.java:55` to turn the UI's highlighted text range
  * into array positions). Streaming Jackson parse tracking every value's
  * character span and path; a position resolves to the INNERMOST value
  * span containing it. */
object JsonSelections {

  sealed trait PathElem
  final case class Key(name: String) extends PathElem
  final case class Idx(i: Int) extends PathElem

  private final case class Span(start: Long, end: Long, path: List[PathElem])

  private def spans(json: String): Seq[Span] = {
    val p = new JsonFactory().createParser(json)
    val out = mutable.ArrayBuffer[Span]()
    // stack of (path at container start, container start offset, array index counter)
    var path = List.empty[PathElem]
    val containerStart = mutable.Stack[(List[PathElem], Long)]()
    val arrayIdx = mutable.Stack[Int]()
    var pendingKey: Option[String] = None
    var inArray = List.empty[Boolean]

    def valuePath(): List[PathElem] = {
      val elem: Option[PathElem] =
        if (inArray.headOption.contains(true)) {
          val i = arrayIdx.pop(); arrayIdx.push(i + 1); Some(Idx(i))
        } else pendingKey.map(Key)
      pendingKey = None
      elem match { case Some(e) => path :+ e; case None => path }
    }

    var tok = p.nextToken()
    while (tok != null) {
      tok match {
        case JsonToken.FIELD_NAME =>
          pendingKey = Some(p.currentName())
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
          val vp = valuePath()
          containerStart.push((vp, p.currentTokenLocation().getCharOffset))
          path = vp
          inArray = (tok == JsonToken.START_ARRAY) :: inArray
          if (tok == JsonToken.START_ARRAY) arrayIdx.push(0)
        case JsonToken.END_OBJECT | JsonToken.END_ARRAY =>
          val (vp, start) = containerStart.pop()
          if (tok == JsonToken.END_ARRAY) arrayIdx.pop()
          inArray = inArray.tail
          out += Span(start, p.currentLocation().getCharOffset, vp)
          path = if (vp.isEmpty) Nil else vp.init
        case _ => // scalar value
          val vp = valuePath()
          p.finishToken() // strings decode lazily; force the end offset
          out += Span(p.currentTokenLocation().getCharOffset,
            p.currentLocation().getCharOffset, vp)
      }
      tok = p.nextToken()
    }
    out.toSeq
  }

  /** Number of elements in the top-level JSON array (the sample cell's
    * length — anchors from-the-end offsets in list extract rules). */
  def topLevelCount(json: String): Int =
    spans(json).collect {
      case Span(_, _, Idx(i) :: Nil) => i + 1
    }.maxOption.getOrElse(0)

  /** Paths of the selection's start and (inclusive) end positions, or None
    * when the text is not valid JSON or a position falls outside any value. */
  def locate(json: String, from: Int, to: Int): Option[(List[PathElem], List[PathElem])] =
    try {
      val all = spans(json)
      def at(pos: Int): Option[List[PathElem]] =
        all.filter(s => s.start <= pos && pos < s.end)
          .sortBy(s => s.end - s.start).headOption.map(_.path)
      for (s <- at(from); e <- at(math.max(from, to - 1))) yield (s, e)
    } catch { case _: Exception => None }
}
