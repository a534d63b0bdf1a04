package graft.core

/** Shared adaptive-strategy thresholds (ADVICE r11: the 2M-row broadcast
  * gate was duplicated as bare literals in Graph/Similarity/Evaluation —
  * retuning one copy risked the others drifting apart).
  */
object Gates {

  /** Row-count ceiling under which an iterative operator broadcasts its
    * per-round node/item-sized frame instead of sort-merge-joining it
    * against the (checkpointed, stats-erased) big side. ~2M (long, long)
    * rows ≈ 30 MB framed — inside every broadcast comfort zone, far below
    * Spark's 8 GB / 512M-row hard cap. Above it, operators fall back to a
    * pinned-layout sort-merge shape, which is also the 100 TB shape once
    * node frames outgrow broadcast. A caller-visible scale constant, not
    * a local[32] tuning.
    */
  val BcastRowsMax = 2000000L
}
