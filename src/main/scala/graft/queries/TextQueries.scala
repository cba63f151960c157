package graft.queries

/** Text-analysis pipeline operators over `documents` (token counting,
  * quality scoring, language ID, fingerprinting).
  */
object TextQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
