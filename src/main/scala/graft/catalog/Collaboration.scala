package graft.catalog

import scala.collection.concurrent.TrieMap

/** Dataset collaboration metadata — wiki text and tags with optimistic
  * versioning (reference `dac/.../service/collaboration/
  * CollaborationHelper.java`: each update must present the stored
  * version and bumps it; a stale version throws
  * ConcurrentModificationException, surfaced as HTTP 409 by the REST
  * layer; tags are validated for length and uniqueness —
  * `CollaborationHelper.validateTags`). Driver-held control-plane state,
  * like the grants/reflections registries. */
object Collaboration {

  final case class Wiki(text: String, version: Long)
  final case class Tags(tags: Seq[String], version: Long)

  private val wikis = TrieMap.empty[String, Wiki]
  private val tagsMap = TrieMap.empty[String, Tags]

  private def key(id: String): String = id.trim.toLowerCase

  def getWiki(id: String): Option[Wiki] = wikis.get(key(id))
  def getTags(id: String): Option[Tags] = tagsMap.get(key(id))

  /** Version handshake shared by both stores: absent entity accepts only
    * an absent version (and stores v0); an existing entity accepts only
    * its current version (and bumps). */
  private def nextVersion(current: Option[Long], provided: Option[Long],
                          what: String): Long = (current, provided) match {
    case (None, None) => 0L
    case (None, Some(v)) => throw new java.util.ConcurrentModificationException(
      s"$what does not exist yet; omit version on first save (got [$v])")
    case (Some(c), Some(v)) if v == c => c + 1L
    case (Some(c), bad) => throw new java.util.ConcurrentModificationException(
      s"the provided version [${bad.map(_.toString).getOrElse("null")}] " +
        s"does not match the stored version [$c]")
  }

  def setWiki(id: String, text: String, version: Option[Long]): Wiki =
    wikis.synchronized {
      val next = Wiki(text, nextVersion(getWiki(id).map(_.version), version, "wiki"))
      wikis.update(key(id), next)
      next
    }

  def setTags(id: String, tags: Seq[String], version: Option[Long]): Tags = {
    require(tags.forall(t => t.nonEmpty && t.length <= 128),
      "tags must be 1-128 characters")
    require(tags.map(_.toLowerCase).distinct.size == tags.size,
      "tags must be unique")
    tagsMap.synchronized {
      val next = Tags(tags, nextVersion(getTags(id).map(_.version), version, "tags"))
      tagsMap.update(key(id), next)
      next
    }
  }

  /** Test hygiene. */
  def reset(): Unit = { wikis.clear(); tagsMap.clear() }
}
