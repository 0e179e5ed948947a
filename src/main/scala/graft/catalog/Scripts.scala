package graft.catalog

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Saved SQL scripts — the reference's script service
  * (`services/script/ScriptServiceImpl.java`: PER-USER saved SQL with
  * name/content limits and a 1000-per-user cap; access beyond the owner
  * flows through `GRANT ... ON SCRIPT` — `SqlGrantOnScript`, privileges
  * VIEW/MODIFY/DELETE/MANAGE_GRANTS, `grant.ftl:191`). The reference
  * manages scripts over REST (the SQL-runner UI); our CREATE/ALTER/DROP
  * SCRIPT DDL is the engine-surface glue for the same lifecycle, and
  * RUN SCRIPT executes the saved text UNDER THE CALLER'S privileges
  * (the script is stored SQL, not stored authority).
  *
  * The namespace is PER-OWNER (the reference's model): two users may
  * both own a script named `report`, a stranger's CREATE can neither
  * collide with nor probe names they cannot see, and resolution prefers
  * the caller's own script, then the unique VISIBLE one (ambiguity
  * names only owners the caller may already see). Grant keys carry the
  * owner, and DROP purges the script's grants — a later script reusing
  * the name (by anyone) starts with a clean slate.
  *
  * Registry is coordinator-side metadata; nothing scales with data.
  */
object Scripts {

  /** Reference limits (ScriptServiceImpl.java:55-58, MAX_SCRIPTS_PER_USER). */
  val NameMaxLength = 128
  val ContentMaxLength = 250000
  val MaxScriptsPerUser = 1000L

  final case class Script(name: String, content: String, owner: String,
                          createdMs: Long, modifiedMs: Long)

  // key = owner + "/" + name (both lowercased)
  private val reg = TrieMap.empty[String, Script]

  /** Privilege object key for a script: owner-qualified, so grants can
    * never attach to a DIFFERENT user's later script of the same name. */
  def scriptObj(owner: String, name: String): String =
    "@script:" + owner.toLowerCase + "/" + name.toLowerCase

  private def principalName(spark: SparkSession): String =
    graft.auth.Privileges.principalOf(spark).map(_.name).getOrElse("<anonymous>")

  /** While enforcement is on, every script operation needs a principal
    * (otherwise anonymous sessions could squat names or burn the
    * per-user cap with scripts nobody can manage). */
  private def requirePrincipal(spark: SparkSession, what: String): Unit = {
    val p = graft.auth.Privileges
    if (p.enforcing && p.principalOf(spark).isEmpty)
      throw new SecurityException(
        s"$what requires an authenticated principal while auth enforcement is on")
  }

  /** Owner / admin / holder-of-`action` gate. */
  private def requireScriptAction(spark: SparkSession, s: Script,
                                  action: String, what: String): Unit = {
    val p = graft.auth.Privileges
    if (p.enforcing) {
      val u = p.principalOf(spark).getOrElse(throw new SecurityException(
        s"$what requires an authenticated principal while auth enforcement is on"))
      if (u.name != s.owner && !u.admin &&
          !p.allowed(u, action, scriptObj(s.owner, s.name)))
        throw new SecurityException(
          s"principal '${u.name}' lacks ${action.toUpperCase} on script " +
            s"'${s.name}' (owner: ${s.owner}; GRANT ${action.toUpperCase} ON " +
            s"SCRIPT ${s.name} TO USER|ROLE ... to allow)")
    }
  }

  def create(spark: SparkSession, name: String, content: String): Script = {
    requirePrincipal(spark, s"CREATE SCRIPT $name")
    val n = name.toLowerCase
    require(n.nonEmpty && n.length <= NameMaxLength,
      s"script name must be 1..$NameMaxLength characters")
    require(content.nonEmpty && content.length <= ContentMaxLength,
      s"script content must be 1..$ContentMaxLength characters")
    val owner = principalName(spark)
    require(reg.values.count(_.owner == owner) < MaxScriptsPerUser,
      s"maximum $MaxScriptsPerUser scripts per user reached")
    val now = System.currentTimeMillis()
    val s = Script(n, content, owner, now, now)
    require(reg.putIfAbsent(s"$owner/$n", s).isEmpty,
      s"you already have a script named '$name'")
    s
  }

  def update(spark: SparkSession, name: String, content: String): Script = {
    val s = resolve(spark, name)
    requireScriptAction(spark, s, "modify", s"ALTER SCRIPT $name")
    require(content.nonEmpty && content.length <= ContentMaxLength,
      s"script content must be 1..$ContentMaxLength characters")
    val updated = s.copy(content = content, modifiedMs = System.currentTimeMillis())
    reg.put(s"${s.owner}/${s.name}", updated)
    updated
  }

  def drop(spark: SparkSession, name: String): Unit = {
    val s = resolve(spark, name)
    requireScriptAction(spark, s, "delete", s"DROP SCRIPT $name")
    reg.remove(s"${s.owner}/${s.name}")
    // grants must die with the script: a future script reusing the name
    // must not inherit them
    graft.auth.Privileges.purgeObject(scriptObj(s.owner, s.name))
  }

  /** The script, VIEW-gated (DESCRIBE and RUN share this). */
  def read(spark: SparkSession, name: String): Script = {
    val s = resolve(spark, name)
    requireScriptAction(spark, s, "view", s"SCRIPT $name")
    s
  }

  /** Name resolution over the per-owner namespace: the caller's OWN
    * script first, else the unique VISIBLE script of that name (so the
    * lookup itself can never probe hidden names); several visible
    * candidates is an error naming only owners the caller may see. */
  private def resolve(spark: SparkSession, name: String): Script = {
    val n = name.toLowerCase
    val own = reg.get(principalName(spark) + "/" + n)
    own.getOrElse {
      val vis = visible(spark).filter(_.name == n)
      vis match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(s"unknown script: $name")
        case many => throw new IllegalArgumentException(
          s"script name '$name' is ambiguous here (owners: " +
            s"${many.map(_.owner).mkString(", ")})")
      }
    }
  }

  /** GRANT/REVOKE ... ON SCRIPT (SqlGrantOnScript): owner, admin, or a
    * MANAGE_GRANTS holder may share; valid privileges are the
    * reference's enum. */
  val ScriptPrivileges: Set[String] = Set("view", "modify", "delete", "manage_grants")

  def grantOnScript(spark: SparkSession, actions: Seq[String], name: String,
                    kind: String, grantee: String, granting: Boolean): Unit = {
    val s = resolve(spark, name)
    val p = graft.auth.Privileges
    if (p.enforcing) {
      val u = p.principalOf(spark).getOrElse(throw new SecurityException(
        "GRANT ON SCRIPT requires an authenticated principal while enforcement is on"))
      if (u.name != s.owner && !u.admin &&
          !p.allowed(u, "manage_grants", scriptObj(s.owner, s.name)))
        throw new SecurityException(
          s"principal '${u.name}' may not manage grants on script '${s.name}'")
    }
    val bad = actions.map(_.toLowerCase).filterNot(a => ScriptPrivileges(a) || a == "all")
    require(bad.isEmpty,
      s"privilege ${bad.mkString(", ").toUpperCase} not valid ON SCRIPT " +
        s"(valid: ${ScriptPrivileges.map(_.toUpperCase).mkString(", ")}, ALL)")
    p.grantRaw(spark, actions, scriptObj(s.owner, s.name), kind, grantee, granting)
  }

  /** Scripts visible to the session: all while enforcement is off;
    * otherwise own + admin-all + VIEW-granted. */
  def visible(spark: SparkSession): Seq[Script] = {
    val p = graft.auth.Privileges
    val all = reg.values.toSeq.sortBy(s => (s.name, s.owner))
    if (!p.enforcing) all
    else p.principalOf(spark) match {
      case None => Nil
      case Some(u) if u.admin => all
      case Some(u) => all.filter(s =>
        s.owner == u.name || p.allowed(u, "view", scriptObj(s.owner, s.name)))
    }
  }

  /** Test/bootstrap reset. */
  def clear(): Unit = reg.clear()
}
