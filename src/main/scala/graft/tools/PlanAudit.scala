package graft.tools

import graft.SparkEntry
import graft.core.GraftSession
import graft.plans.Guardrails

/** Dev tool — run EVERY declared query's plan through the Guardrails
  * optimizer audit (cartesian joins, single-partition windows,
  * mid-plan global sorts) and print a per-query hazard summary:
  * the suite-wide enforcement pass of the no-hazard discipline each
  * operator was written under. Queries whose builders execute eagerly
  * (streaming drains, literal-vector fetches) are audited through
  * that execution; pure-lazy builders are audited by forcing the
  * optimized plan only — no job runs.
  *
  * `runMain graft.tools.PlanAudit <sfDir> [nameSubstring]` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val filter = args.drop(1).headOption.getOrElse("")
    val spark = GraftSession.local(appName = "graft-plan-audit")
    var clean = 0
    var expectedTotal = 0
    val suppressedByClass = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(filter))
    entries.foreach { case (name, build) =>
      Guardrails.drain(); Guardrails.drainExpected()
      val verdict =
        try {
          val df = build(spark, dir)
          val opt = df.queryExecution.optimizedPlan // force optimizer (and the rule)
          // structural verification of claimed single-partition
          // windows runs on the FINAL plan (the in-rule view sees
          // intermediate optimizer states — see verifyWindowClaims)
          val hz = Guardrails.drain() ++ Guardrails.verifyWindowClaims(opt)
          val exp = Guardrails.drainExpected()
          expectedTotal += exp.size
          exp.foreach { case (_, bound) => suppressedByClass(bound) += 1 }
          if (hz.isEmpty) { clean += 1; "" }
          else hz.groupBy(_.kind).toSeq.sortBy(_._1)
            .map { case (k, v) =>
              s"$k x${v.size} [${v.map(_.detail).mkString("; ")}]" }
            .mkString(", ")
        } catch {
          case e: Throwable =>
            s"ERROR ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next().take(100)}"
        }
      if (verdict.nonEmpty) println(f"$name%-28s $verdict")
    }
    println(s"== ${entries.size} queries audited, $clean flag-free, " +
      s"$expectedTotal call-site-documented hazards suppressed ==")
    // boundedness census: every registered expectation by class, so a
    // reviewer sees at a glance when a "documented" hazard is really
    // class-5; `unbounded` entries are listed in full and should be ZERO
    val reg = Guardrails.registered.toSeq
    val byClass = reg.groupBy(_.bound)
    println("== expectation census (registered): " +
      Guardrails.BoundClass.all.toSeq.sorted.map(c =>
        s"$c=${byClass.getOrElse(c, Nil).size}").mkString(", ") + " ==")
    println("== suppressed hazards by class: " +
      suppressedByClass.toSeq.sortBy(_._1).map { case (c, n) => s"$c=$n" }
        .mkString(", ") + " ==")
    byClass.getOrElse(Guardrails.BoundClass.Unbounded, Nil).foreach { e =>
      println(s"!! UNBOUNDED-by-convention expectation: ${e.reason}")
    }
    spark.stop()
  }
}
