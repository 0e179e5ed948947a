package graft.queries

object Events {
  val queries: Map[String, QueryFn] = Map()
  val oracle: Map[String, String] = Map()
}
