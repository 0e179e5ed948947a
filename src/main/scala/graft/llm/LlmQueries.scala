package graft.llm

import graft.queries.QueryFn

object LlmQueries {
  val queries: Map[String, QueryFn] = Map()
  val oracle: Map[String, String] = Map()
}
