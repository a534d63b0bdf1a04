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

  /** The boundedness TAXONOMY: every documented exception must say
    * WHAT bounds the hazard frame, in one of five auditable classes —
    * so a reviewer sees at a glance when a new "documented" hazard is
    * actually unbounded. Census printed by `tools.PlanAudit`.
    *
    *  - `k-literal`  — bounded by a literal/parameter (top-k, nBins,
    *    1-row stat frames, 2^k lattices with k capped, numPartitions).
    *  - `rollup`     — bounded by the distinct values of a column the
    *    operator itself rolls up first (distinct-value CDFs, survival
    *    risk tables, grouping keys); cardinality is data-dependent but
    *    a vanishing fraction of fact volume by construction.
    *  - `calendar`   — bounded by a time grain (days, hours, bars,
    *    series checkpoints): grows with elapsed time, not data volume.
    *  - `vocabulary` — bounded by a real-world vocabulary (catalog
    *    items, sources, languages, experiment arms).
    *  - `unbounded`  — by-convention only (the caller promises a
    *    bounded slice). ZERO entries should carry this class: it
    *    exists so an honest hazard is visible, not hidden. */
  object BoundClass {
    val KLiteral = "k-literal"
    val Rollup = "rollup"
    val Calendar = "calendar"
    val Vocabulary = "vocabulary"
    val Unbounded = "unbounded"
    val all: Set[String] =
      Set(KLiteral, Rollup, Calendar, Vocabulary, Unbounded)
  }

  /** A documented, by-design hazard: `kind` + a column-name marker the
    * hazard site's describe line must contain, + the reason it is safe
    * (always a boundedness argument — "rollup-sized", "k-row
    * broadcast") + the [[BoundClass]] that argument falls in.
    * Registered by the OPERATOR at the call site that builds the
    * deliberately-small frame, so the audit distinguishes the
    * documented exceptions from new hazards instead of letting the
    * latter hide among dozens of known flags. */
  final case class Expectation(kind: String, colMarker: String,
      reason: String, bound: String)

  // keyed set: the optimizer may re-run a rule batch to fixpoint, and
  // one query plans several times (analysis, AQE re-optimize) — the
  // audit reports each distinct hazard site once
  private val found = ConcurrentHashMap.newKeySet[Hazard]()
  private val foundExpected = ConcurrentHashMap.newKeySet[(Hazard, String)]()
  private val expectations = ConcurrentHashMap.newKeySet[Expectation]()

  /** Declare a by-design hazard at its call site. Idempotent;
    * process-wide (the optimizer audits plans long after the operator
    * function returned, so expectations cannot be scoped tighter than
    * the process). The marker should be an operator-owned column name
    * appearing in the hazard node's output — specific enough that an
    * UNRELATED new hazard of the same kind still trips the audit.
    * `bound` names the boundedness class ([[BoundClass]]) the reason
    * argues. */
  def expect(kind: String, colMarker: String, reason: String,
      bound: String): Unit = {
    require(BoundClass.all(bound),
      s"unknown bound class '$bound' — one of ${BoundClass.all.toSeq.sorted.mkString(", ")}")
    expectations.add(Expectation(kind, colMarker, reason, bound))
    ()
  }

  /** Snapshot of every registered expectation (census input). */
  def registered: Set[Expectation] = {
    val b = Set.newBuilder[Expectation]
    val it = expectations.iterator()
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Column tokens of a describe() line: the names inside the parens,
    * split on commas and trimmed. */
  private def detailTokens(detail: String): Set[String] = {
    val open = detail.indexOf('(')
    val close = detail.lastIndexOf(')')
    val body =
      if (open >= 0 && close > open) detail.substring(open + 1, close)
      else detail
    body.split(',').iterator.map(_.trim).filter(_.nonEmpty).toSet
  }

  private[plans] def record(kind: String, detail: String): Unit = {
    // Whole-token matching: an expectation matches only when EVERY
    // column in its (comma-separated) marker list appears verbatim in
    // the hazard node's column list. The previous raw-substring scheme
    // let broad markers ("look", a "__left" prefix) classify genuinely
    // NEW hazards in unrelated queries as expected, muting the alarm.
    val cols = detailTokens(detail)
    val it = expectations.iterator()
    var matched: Expectation = null
    while (it.hasNext && matched == null) {
      val e = it.next()
      if (e.kind == kind) {
        val want = e.colMarker.split(',').iterator
          .map(_.trim).filter(_.nonEmpty).toList
        if (want.nonEmpty && want.forall(cols.contains)) matched = e
      }
    }
    if (matched == null) found.add(Hazard(kind, detail))
    else foundExpected.add((Hazard(kind, detail), matched.bound))
    ()
  }

  private def drainSet[A](s: java.util.Set[A]): Set[A] = {
    val snapshot = Set.newBuilder[A]
    val it = s.iterator()
    while (it.hasNext) { snapshot += it.next(); it.remove() }
    snapshot.result()
  }

  /** Return and clear the UNEXPECTED hazards — the audit's alarm. */
  def drain(): Set[Hazard] = drainSet(found)

  /** Return and clear the expected (call-site-documented) hazards,
    * each tagged with its expectation's [[BoundClass]]. */
  def drainExpected(): Set[(Hazard, String)] = drainSet(foundExpected)

  /** One-line summary of a plan node for the audit detail — class name
    * plus output columns, NOT the full tree (plans at 100 TB are
    * thousands of lines; the audit must stay cheap to keep). Window
    * nodes lead with their window-expression names: those are the
    * operator-owned markers expectations match on (the child columns a
    * window inherits say nothing about WHICH window this is). */
  private[plans] def describe(p: LogicalPlan): String = p match {
    case w: Window =>
      val win = w.windowExpressions.map(_.name)
      val rest = w.child.output.map(_.name).take(math.max(0, 8 - win.size))
      s"Window(${(win ++ rest).take(8).mkString(", ")})"
    case _ =>
      s"${p.nodeName}(${p.output.map(_.name).take(8).mkString(", ")})"
  }
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
