package graft.queries

/** TPC-H-style relational coverage (joins, broadcast dims, windowed aggs)
  * — filled in incrementally; see SparkEntry.
  */
object RelationalQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
