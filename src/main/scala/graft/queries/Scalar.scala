package graft.queries

object Scalar {
  val queries: Map[String, QueryFn] = Map()
  val oracle: Map[String, String] = Map()
}
