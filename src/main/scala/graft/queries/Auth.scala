package graft.queries

import graft.auth.Privileges
import graft.engine.Tables

/** Access-control surface as a CORRECTNESS-registered query (reference
  * Parser.tdd:656-660 user/role/grant grammar; dac enforcement): the
  * aggregate runs under an AUTHENTICATED NON-ADMIN principal with
  * enforcement on — the result is only obtainable because the principal
  * holds GRANT SELECT on the `nation` view. Oracle-checked like any other
  * query, proving grants gate reads without changing results.
  *
  * State discipline: enforcement is global; the builder authenticates, runs
  * the guarded SELECT (analysis is eager, so the privilege check happens
  * inside the try), and ALWAYS restores enforcement-off + an unbound
  * session principal. Setup is idempotent, so bench reruns are safe.
  */
object Auth {

  val authSelect: QueryFn = (s, dir) => Auth.synchronized {
    Tables.ensure(s, dir)
    if (!Privileges.listUsers.exists(_.name == "auth_admin"))
      s.sql("CREATE USER auth_admin PASSWORD 'adm-pw' ADMIN")
    if (!Privileges.listUsers.exists(_.name == "auth_reader"))
      s.sql("CREATE USER auth_reader PASSWORD 'reader-pw'")
    s.sql("AUTHENTICATE USER auth_admin PASSWORD 'adm-pw'")
    s.sql("GRANT SELECT ON nation TO USER auth_reader")
    s.sql("ALTER AUTH ENFORCE ON")
    try {
      s.sql("AUTHENTICATE USER auth_reader PASSWORD 'reader-pw'")
      // analyzed (and privilege-checked) eagerly as auth_reader
      s.sql("""SELECT n_regionkey, count(*) AS n_nations,
                      min(n_name) AS first_name
               FROM nation GROUP BY n_regionkey""")
    } finally {
      s.sql("AUTHENTICATE USER auth_admin PASSWORD 'adm-pw'")
      s.sql("ALTER AUTH ENFORCE OFF")
      s.conf.unset(Privileges.TokenConf)
      s.conf.unset(Privileges.UserConf)
    }
  }

  val queries: Map[String, QueryFn] = Map("auth_select" -> authSelect)

  val oracle: Map[String, String] = Map(
    "auth_select" -> """
      SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
      FROM nation GROUP BY n_regionkey""")
}
