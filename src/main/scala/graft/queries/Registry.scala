package graft.queries

/** Union of every query group — the single map [[graft.SparkEntry]]
  * exposes to the driver. Groups are added as SURVEY §2 categories are
  * implemented.
  */
object Registry {
  val all: Map[String, QueryDef] = RefQueries.defs ++ ExtQueries.defs ++
    StateQueries.defs
}
