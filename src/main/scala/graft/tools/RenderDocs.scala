package graft.tools

import graft.queries.Declared

/** Renders SCALING.md from the declared-query registry so the scale
  * notes in code and the document can never drift apart.
  * Usage: RenderDocs <outFile> */
object RenderDocs {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    sb ++= "# SCALING — per-operator 100 TB design notes\n\n"
    sb ++= "Auto-generated from `graft.queries.Declared.all` " +
      "(`sbt \"runMain graft.tools.RenderDocs SCALING.md\"`). Each declared\n"
    sb ++= "query carries its shuffle/broadcast/skew story next to the code;\n"
    sb ++= "this file is the rendered index. Oracle = DuckDB hash-verified;\n"
    sb ++= "rows-only = non-SQL-expressible, semantics pinned by ScalaTest.\n\n"
    sb ++= "| query | SURVEY §2 | check | scale story |\n"
    sb ++= "|---|---|---|---|\n"
    Declared.all.foreach { d =>
      val check = if (d.oracle.isDefined) "oracle" else "rows-only"
      sb ++= s"| ${d.name} | ${d.surveyRef} | $check | ${d.scaleNote} |\n"
    }
    sb ++= "\n## Global posture\n\n"
    sb ++= """- **AQE on everywhere** (coalesce + skew-join splitting) — GraftSession defaults.
- **Broadcast what is bounded** (dims, sensor fleets, query vectors); shuffle only content-derived uniform keys (hashes, ids); never a cartesian on the scale path.
- **Scan hygiene**: filters and projections are plain column predicates so Parquet pushdown + min/max row-group skipping stay effective; geometry reduces to centroid/bbox DOUBLE columns before any join.
- **Hot paths are codegen'd**: no UDF inside a join condition or aggregation loop; UDFs (st_distance/st_intersects/buffer) run only on bbox-pruned survivors.
- **Driver-side work is bounded**: the only collects are the kriging system (n = sensor fleet) and 1-row bounds/query-vector lookups.
- **Explosion joins widen first**: broadcast joins that multiply row counts repartition a too-narrow probe side to cluster parallelism (no-op on already-wide scans).
"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args.head), sb.toString)
    println(s"wrote ${args.head} (${Declared.all.length} queries)")
  }
}
