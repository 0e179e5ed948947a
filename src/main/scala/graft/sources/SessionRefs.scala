package graft.sources

import org.apache.spark.sql.SparkSession

/** Session version context (reference `SqlUseVersion` —
  * `sabot/grammar/src/main/codegen/includes/versionSupport.ftl`:
  * `USE BRANCH|TAG <ref> [IN <source>]`): a per-SparkSession default ref
  * per lake table. Once set, default-head reads of that table
  * (`lake_scan('<dir>')`, `SHOW LOGS IN LAKE`) resolve against the ref,
  * and `INSERT INTO LAKE` routes to the branch — exactly the reference's
  * Nessie session context, where a USE statement re-points every
  * unqualified table access until reset.
  *
  * Statement-level `AT BRANCH|TAG` always wins over the session context
  * (same precedence as the reference). Under a BRANCH pin, row-level DML
  * (DELETE/UPDATE) stages on the branch via copy-on-write; under a tag or
  * USE VERSION pin any mutation is REFUSED loudly (immutable views), as
  * are statements with no branch-routed form (MERGE/TRUNCATE) — silently
  * applying those to main while the session is pinned elsewhere would be
  * a correctness trap.
  *
  * Storage: the SparkSession's RuntimeConfig (session-scoped, inherited
  * by `newSession()` clones like every other session conf) under a key
  * derived from the normalized table path.
  */
object SessionRefs {

  private val Prefix = "spark.graft.lake.sessionref."

  private def key(dir: String): String = {
    val norm = new java.io.File(dir).getAbsolutePath
    val md = java.security.MessageDigest.getInstance("MD5")
    Prefix + md.digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** USE BRANCH|TAG: pin this session's default ref for `dir`. */
  def set(spark: SparkSession, dir: String, ref: String): Unit =
    spark.conf.set(key(dir), ref)

  /** USE DEFAULT (or USE BRANCH main): back to the main head. */
  def clear(spark: SparkSession, dir: String): Unit =
    spark.conf.unset(key(dir))

  /** Active session ref for `dir`, if any. */
  def get(spark: SparkSession, dir: String): Option[String] =
    spark.conf.getOption(key(dir))

  /** USE VERSION (reference `USE COMMIT`): pin reads to a FIXED version —
    * an anonymous tag, immutable by construction. */
  def setVersion(spark: SparkSession, dir: String, v: Long): Unit =
    spark.conf.set(key(dir), s"version:$v")

  /** The active pin, decoded: Left(version) for a USE VERSION pin,
    * Right(refName) for USE BRANCH|TAG. */
  def pin(spark: SparkSession, dir: String): Option[Either[Long, String]] =
    get(spark, dir).map { v =>
      if (v.startsWith("version:")) Left(v.stripPrefix("version:").toLong)
      else Right(v)
    }

  /** Loud guard for DML statements that have no branch-routed form. */
  def requireDefault(spark: SparkSession, dir: String, statement: String): Unit =
    get(spark, dir).foreach { ref =>
      throw new IllegalStateException(
        s"$statement: session is pinned to ref '$ref' for lake '$dir' " +
          "(USE BRANCH|TAG); only INSERT routes to a branch — run " +
          s"USE DEFAULT IN LAKE '$dir' first to apply DML to main")
    }
}
