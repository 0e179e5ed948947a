package graft.catalog

import scala.collection.concurrent.TrieMap

/** Registry of lake VIEW names → backing table directory. A lake view is
  * a session temp view over a snapshot scan, and the DataFrame itself
  * carries no pointer back to the table — but catalog surfaces that
  * report TABLE-level metadata (Flight SQL GetPrimaryKeys, lineage)
  * need the directory to read table properties from. Entries are
  * advisory: consumers must re-check the view still exists in the
  * session catalog (temp views drop through Spark DDL we cannot hook)
  * and treat the registry as a name hint, never a data source. */
object LakeViews {

  private val views = TrieMap.empty[String, String]
  /** name → the exact CREATE statement (reference SqlShowCreate's VIEW
    * arm: `SHOW CREATE VIEW name` prints the stored definition). */
  private val ddls = TrieMap.empty[String, String]

  def register(name: String, dir: String, ddl: String = ""): Unit = {
    val k = name.toLowerCase(java.util.Locale.ROOT)
    views.put(k, dir)
    ddls.put(k, if (ddl.nonEmpty) ddl else s"CREATE LAKE VIEW $name FROM '$dir'")
    ()
  }

  def dirOf(name: String): Option[String] =
    views.get(name.toLowerCase(java.util.Locale.ROOT))

  def ddlOf(name: String): Option[String] =
    ddls.get(name.toLowerCase(java.util.Locale.ROOT))

  def list: Seq[(String, String)] = views.toSeq.sortBy(_._1)
}
