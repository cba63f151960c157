package graft.queries

/** Deduplication operators over `documents` (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard).
  */
object DedupQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
