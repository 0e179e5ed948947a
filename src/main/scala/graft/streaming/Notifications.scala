package graft.streaming

import scala.collection.concurrent.TrieMap

/** Pluggable file-arrival notification for auto-ingest pipes (reference:
  * `sabot/grammar/src/main/codegen/includes/ingestion.ftl:190-214` —
  * `NOTIFICATION_PROVIDER = AWS_SQS | AZURE_STORAGE_QUEUE` with a queue
  * reference): file arrival PUSHES instead of the pipe polling a full
  * directory listing. TRIGGER PIPE on a notified pipe loads exactly the
  * files named by pending events — at 100 TB source prefixes a listing is
  * the dominant trigger cost (and on object stores an eventually-
  * consistent one); the event queue makes trigger cost O(arrived files).
  *
  * The cloud queues themselves are environment-blocked in this sandbox
  * (no SQS/Azure endpoints), but the SEAM is not: `Source` is the
  * provider contract (poll/ack — SQS receive/delete semantics), the
  * grammar keeps the reference's provider slot, and [[LocalDirSource]]
  * is the in-tree implementation (a spool directory of event files) used
  * by tests and available to any deployment with a shared filesystem.
  * AWS_SQS / AZURE_STORAGE_QUEUE parse and register, and refuse loudly
  * at TRIGGER time until a real Source is registered for them.
  */
object Notifications {

  /** One file-arrival event. `id` is the queue's own handle (used for
    * ack); `path` the arrived file. */
  final case class FileEvent(id: String, path: String)

  /** Provider contract — deliberately the SQS shape: poll is
    * NON-destructive (events stay pending until acked), ack deletes after
    * the load committed. A crash between load and ack re-polls the same
    * events; the pipe's loaded-files log makes the replay a no-op. */
  trait Source {
    def poll(queueRef: String): Seq[FileEvent]
    def ack(queueRef: String, events: Seq[FileEvent]): Unit
  }

  /** Spool-directory provider: the queue reference is a directory; every
    * event is a small text file (any name) whose content is the arrived
    * file's absolute path. Writers publish events atomically (write tmp +
    * rename — the same contract as the lake commit log). Poll order is
    * filename order, deterministic. */
  object LocalDirSource extends Source {
    override def poll(queueRef: String): Seq[FileEvent] = {
      import scala.jdk.CollectionConverters._
      val dir = java.nio.file.Paths.get(queueRef)
      if (!java.nio.file.Files.isDirectory(dir)) return Nil
      val names = {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filterNot(n => n.endsWith(".tmp") || n.startsWith("."))
          .toVector.sorted
        finally s.close()
      }
      names.flatMap { n =>
        try {
          val body = new String(
            java.nio.file.Files.readAllBytes(dir.resolve(n)), "UTF-8").trim
          if (body.isEmpty) None else Some(FileEvent(n, body))
        } catch { case _: java.io.IOException => None } // racing publisher
      }
    }
    override def ack(queueRef: String, events: Seq[FileEvent]): Unit = {
      val dir = java.nio.file.Paths.get(queueRef)
      events.foreach(e =>
        try java.nio.file.Files.deleteIfExists(dir.resolve(e.id))
        catch { case _: java.io.IOException => () })
    }
  }

  /** Providers the grammar ACCEPTS. Cloud names are part of the accepted
    * surface (the reference's) even where no Source is registered — the
    * refusal happens at TRIGGER, naming the seam. */
  val RecognizedProviders: Set[String] =
    Set("LOCAL_DIR", "AWS_SQS", "AZURE_STORAGE_QUEUE")

  private val providers = TrieMap[String, Source]("LOCAL_DIR" -> LocalDirSource)

  /** Register (or replace) a provider implementation — the deployment
    * hook for real SQS/Azure clients. */
  def register(name: String, source: Source): Unit =
    providers.put(name.toUpperCase(java.util.Locale.ROOT), source)

  def recognized(name: String): Boolean =
    RecognizedProviders(name.toUpperCase(java.util.Locale.ROOT))

  /** The provider's Source, or a loud refusal distinguishing "unknown
    * provider" (caller bug) from "recognized but not wired in this
    * environment" (the documented cloud divergence). */
  def sourceFor(name: String): Source = {
    val key = name.toUpperCase(java.util.Locale.ROOT)
    providers.getOrElse(key,
      if (RecognizedProviders(key))
        throw new UnsupportedOperationException(
          s"NOTIFICATION_PROVIDER $key is recognized but no client is " +
            "registered in this environment (cloud queues are " +
            "deployment-specific); register one with " +
            "Notifications.register(provider, source)")
      else throw new IllegalArgumentException(
        s"unknown NOTIFICATION_PROVIDER '$name' " +
          s"(have: ${RecognizedProviders.toSeq.sorted.mkString(", ")})"))
  }
}
