package graft.plans

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule

/** E6 — plan guardrails: an optimizer-time audit for the hazards that
  * sink 100 TB jobs long after they passed at test scale. The rule
  * mutates NOTHING — it walks each optimized logical plan and records
  * every hazard it sees into a process-wide audit that CI (PlanSpec)
  * and operators can drain:
  *
  *   - `cartesian_join`       — a join with no condition: |A|·|B| rows.
  *   - `single_partition_window` — a Window with an empty partition
  *     spec: every row through ONE task. Legitimate only on
  *     rollup-sized frames (the skyline/globalRowNumber discipline);
  *     at fact scale it is the classic silent cliff.
  *   - `global_sort`          — a global Sort not feeding a Limit:
  *     a full range-shuffle + total order of the input. Fine for a
  *     final ORDER BY of a small result; a hazard mid-plan.
  *
  * This is the codified form of the review rules every operator in
  * this repo was built under (see SCALING.md); wiring it into the
  * optimizer makes the rule hold for user-composed plans too, not
  * just the shipped operators. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) so ANY session
  * built with the extensions — cluster or local — carries the audit. */
object Guardrails {

  final case class Hazard(kind: String, detail: String)

  // keyed set: the optimizer may re-run a rule batch to fixpoint, and
  // one query plans several times (analysis, AQE re-optimize) — the
  // audit reports each distinct hazard site once
  private val found = ConcurrentHashMap.newKeySet[Hazard]()

  private[plans] def record(kind: String, detail: String): Unit = {
    found.add(Hazard(kind, detail))
    ()
  }

  /** Return and clear the audit. */
  def drain(): Set[Hazard] = {
    val snapshot = Set.newBuilder[Hazard]
    val it = found.iterator()
    while (it.hasNext) { snapshot += it.next(); it.remove() }
    snapshot.result()
  }

  /** One-line summary of a plan node for the audit detail — class name
    * plus output columns, NOT the full tree (plans at 100 TB are
    * thousands of lines; the audit must stay cheap to keep). */
  private[plans] def describe(p: LogicalPlan): String =
    s"${p.nodeName}(${p.output.map(_.name).take(8).mkString(", ")})"
}

/** The audit rule proper. Non-mutating; O(plan size) per invocation. */
class GuardrailRule extends Rule[LogicalPlan] {
  import Guardrails._

  /** Provably small: the planner can bound the side's row count to a
    * broadcast-safe size. */
  private def bounded(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= 1000L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // two legitimate sort shapes are whitelisted:
    //  - the presentation prefix (Sort/Project/Limit chain at the
    //    root): the final ORDER BY of a small result;
    //  - any Sort under a Limit (through Projects): plans as
    //    TakeOrdered (per-partition heaps), never a full sort.
    var presentation: List[LogicalPlan] = Nil
    var cur: LogicalPlan = plan
    var descend = true
    while (descend) cur match {
      case s: Sort => presentation ::= s; cur = s.child
      case p: Project => cur = p.child
      case l: GlobalLimit => cur = l.child
      case l: LocalLimit => cur = l.child
      case _ => descend = false
    }
    plan.foreachUp {
      case l @ (_: GlobalLimit | _: LocalLimit) =>
        var c = l.children.head
        var go = true
        while (go) c match {
          case s: Sort => presentation ::= s; go = false
          case p: Project => c = p.child
          case li: GlobalLimit => c = li.child
          case li: LocalLimit => c = li.child
          case _ => go = false
        }
      case _ =>
    }
    plan.foreachUp {
      case j: Join
          if j.condition.isEmpty &&
            (j.joinType == Inner || j.joinType == Cross) &&
            !bounded(j.left) && !bounded(j.right) =>
        // a provably-small side (global aggregate -> maxRows 1, a
        // literal, a limit) is a deliberate broadcast pattern (our
        // stats crossJoins), not a runaway product
        record("cartesian_join", describe(j))
      case w: Window if w.partitionSpec.isEmpty =>
        record("single_partition_window", describe(w))
      case s: Sort
          if s.global && !presentation.exists(_ eq s) &&
            !s.child.isInstanceOf[Sort] =>
        record("global_sort", describe(s))
      case _ =>
    }
    plan
  }
}
