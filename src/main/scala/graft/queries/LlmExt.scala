package graft.queries

/** LLM-data-pipeline extension coverage (SURVEY.md §2.12: E1-E5) over
  * `documents` and `embeddings`. */
object LlmExt {
  val all: Seq[Declared] = Seq.empty
}
