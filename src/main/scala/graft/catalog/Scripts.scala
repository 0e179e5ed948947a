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
  *
  * Anonymous ownership: while auth enforcement is OFF, scripts create
  * under the synthetic owner `<anonymous>` (single-user mode has no
  * principal to bind). This is a deliberate, documented contract — once
  * enforcement is later turned ON, no principal can match that owner,
  * so pre-enforcement scripts become ADMIN-managed (admins can view,
  * run, re-grant or drop them; an admin GRANT can re-share one to a
  * real user), and they pool under the one `<anonymous>` per-user cap.
  * `ScriptsSpec` pins this fate explicitly. The alternative — refusing
  * CREATE SCRIPT without a principal even while enforcement is off —
  * would break the engine's no-auth single-user mode.
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
    persist(spark)
    s
  }

  def update(spark: SparkSession, name: String, content: String): Script = {
    val s = resolve(spark, name)
    requireScriptAction(spark, s, "modify", s"ALTER SCRIPT $name")
    require(content.nonEmpty && content.length <= ContentMaxLength,
      s"script content must be 1..$ContentMaxLength characters")
    val updated = s.copy(content = content, modifiedMs = System.currentTimeMillis())
    reg.put(s"${s.owner}/${s.name}", updated)
    persist(spark)
    updated
  }

  def drop(spark: SparkSession, name: String): Unit = {
    val s = resolve(spark, name)
    requireScriptAction(spark, s, "delete", s"DROP SCRIPT $name")
    reg.remove(s"${s.owner}/${s.name}")
    // grants must die with the script: a future script reusing the name
    // must not inherit them
    graft.auth.Privileges.purgeObject(scriptObj(s.owner, s.name))
    persist(spark)
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
    * otherwise own + admin-all + VIEW-granted. With `limit`, the first k
    * of the (name, owner) order are selected via a BOUNDED heap over the
    * visibility-filtered iterator — O(n log k) and O(k) memory instead of
    * materializing + sorting the whole registry on the driver (SHOW
    * SCRIPTS LIMIT n against a full multi-tenant store). */
  def visible(spark: SparkSession, limit: Option[Int] = None): Seq[Script] = {
    val p = graft.auth.Privileges
    val pred: Script => Boolean =
      if (!p.enforcing) _ => true
      else p.principalOf(spark) match {
        case None => _ => false
        case Some(u) if u.admin => _ => true
        case Some(u) => s =>
          s.owner == u.name || p.allowed(u, "view", scriptObj(s.owner, s.name))
      }
    implicit val ord: Ordering[Script] = Ordering.by(s => (s.name, s.owner))
    limit match {
      case Some(k) => GraftStore.boundedTake(reg.values.iterator.filter(pred), k)
      case None => reg.values.toSeq.filter(pred).sorted
    }
  }

  /** Test/bootstrap reset — durable section included. */
  def clear(): Unit = {
    reg.clear()
    GraftStore.sessionForPersist.foreach(s => GraftStore.delete(s, "scripts"))
  }

  // ---- durability (GraftStore section "scripts"; reference
  // services/script/.../ScriptStore.java persists scripts in the KV
  // store). Grants on script objects ride the "auth" section — the two
  // sections reload independently and agree because grant keys are
  // owner-qualified strings, not references. ----

  private def persist(spark: org.apache.spark.sql.SparkSession): Unit = {
    val root = GraftStore.newObject
    val arr = root.putArray("scripts")
    reg.values.toSeq.sortBy(s => (s.owner, s.name)).foreach { s =>
      val o = arr.addObject()
      o.put("name", s.name); o.put("owner", s.owner)
      o.put("content", s.content)
      o.put("createdMs", s.createdMs); o.put("modifiedMs", s.modifiedMs)
    }
    GraftStore.saveResync(spark, "scripts", root)(loadFrom)
  }

  def loadFrom(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftStore.load(spark, "scripts").foreach { root =>
      reg.clear()
      root.path("scripts").forEach { o =>
        val s = Script(o.path("name").asText(), o.path("content").asText(),
          o.path("owner").asText(), o.path("createdMs").asLong(0L),
          o.path("modifiedMs").asLong(0L))
        reg.put(s"${s.owner}/${s.name}", s)
      }
    }

  /** Restart simulation for specs: in-memory only, store survives. */
  private[graft] def resetMemoryForTest(): Unit = reg.clear()
}
