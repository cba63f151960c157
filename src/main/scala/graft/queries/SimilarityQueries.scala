package graft.queries

/** Similarity search over `embeddings` (brute-force cosine top-k, LSH ANN).
  */
object SimilarityQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
