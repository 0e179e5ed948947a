package org.apache.spark.sql.jdbc

/** Derby with join-subtree pushdown capability — the Spark-native seat of
  * the reference's ARP dialect files (`common/dialect/arp/`, consumed by
  * `PlannerPhase.java:171` JDBC_PUSHDOWN): a source's dialect declares
  * which relational subtrees may ship to the remote system.
  *
  * Spark 4's DSv2 JDBC scan implements join pushdown
  * (`JDBCScanBuilder extends SupportsPushDownJoin`, gated on
  * `spark.sql.optimizer.datasourceV2JoinPushdown`), but each dialect
  * must opt in via `supportsJoin`; the built-in Derby dialect never
  * does, although Derby handles the generated join shape
  * (`SELECT … FROM (subquery) alias JOIN (subquery) alias ON …`). With
  * this dialect registered, a join of two tables in the SAME Derby
  * database compiles to ONE remote SQL statement and Spark reads back
  * the joined rows — moving the ANSWER, not two tables. Lives in the
  * jdbc package because `DerbyDialect` is package-private (the same
  * shim convention as `org.apache.spark.sql.graft.Bridge`).
  */
private[jdbc] final class GraftDerbyJoinDialect extends DerbyDialect {
  override def supportsJoin: Boolean = true
}

object GraftDerbyJoinDialect {
  // registerDialect prepends, so this wins over the built-in Derby
  // dialect for jdbc:derby: URLs
  lazy val ensureRegistered: Unit =
    JdbcDialects.registerDialect(
      (new GraftDerbyJoinDialect): JdbcDialect)
}
