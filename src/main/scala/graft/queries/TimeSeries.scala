package graft.queries

/** Time-series operator coverage (SURVEY.md §2: A5, A8, P8, P9) over the
  * `events` table. Filled in with declared queries in this round. */
object TimeSeries {
  val all: Seq[Declared] = Seq.empty
}
