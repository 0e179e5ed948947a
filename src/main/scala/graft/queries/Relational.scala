package graft.queries

object Relational {
  val queries: Map[String, QueryFn] = Map()
  val oracle: Map[String, String] = Map()
}
