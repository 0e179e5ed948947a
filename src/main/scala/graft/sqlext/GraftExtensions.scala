package graft.sqlext

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension wiring (the Spark-native analog of the reference's
  * pluggable coordinator: grammar extension + planner rules + function
  * registry — SURVEY §3/§4). Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.sqlext.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    e.injectOptimizerRule(session => new graft.accel.Reflections.Substitute(session))
    e.injectOptimizerRule(session => new graft.plans.CountFromManifest(session))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
