package graft.server

import scala.collection.concurrent.TrieMap

/** Live wire-service registry behind `sys.services` (reference
  * `exec/store/sys/ServicesIterator.java` — which services run on which
  * node). Each front end notes itself when its port binds and clears on
  * stop; the view is driver-registry-only, never a Spark job. */
object Services {

  final case class Service(name: String, port: Int, startedMs: Long)

  private val reg = TrieMap.empty[String, Service]

  def note(name: String, port: Int): Unit = {
    reg.put(name, Service(name, port, System.currentTimeMillis()))
    ()
  }

  def clear(name: String): Unit = {
    reg.remove(name)
    ()
  }

  def list: Seq[Service] = reg.values.toSeq.sortBy(_.name)
}
