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

  /** Marker→expectation match (shared by [[record]] and
    * [[verifyWindowClaims]]). */
  private def matchExpectation(kind: String, detail: String): Option[Expectation] = {
    val cols = detailTokens(detail)
    val it = expectations.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.kind == kind) {
        val want = e.colMarker.split(',').iterator
          .map(_.trim).filter(_.nonEmpty).toList
        if (want.nonEmpty && want.forall(cols.contains)) return Some(e)
      }
    }
    None
  }

  /** STRUCTURAL verification of every single_partition_window claim in
    * a FINAL optimized plan: a claim is not a proof — the round-9
    * decileLift regression hid behind a marker that matched BY NAME
    * while the window actually sat over the fact table. A matched
    * expectation whose window fails [[GuardrailRule.windowChildBounded]]
    * is returned as a hazard naming the claim it tried to hide behind.
    *
    * This runs on the caller's final `optimizedPlan`, NOT inside the
    * optimizer rule: injected rules execute inside the operator-
    * optimization fixpoint and see INTERMEDIATE states (e.g. before
    * LimitPushDown installs the maxRows-bearing GlobalLimit), which
    * structural checks would false-alarm on. Unmatched windows are
    * still alarmed by the rule itself. */
  def verifyWindowClaims(plan: LogicalPlan): Set[Hazard] = {
    val out = Set.newBuilder[Hazard]
    plan.foreachUp {
      case w: Window if w.partitionSpec.isEmpty =>
        val detail = describe(w)
        matchExpectation("single_partition_window", detail).foreach { e =>
          if (!GuardrailRule.windowChildBounded(w.child))
            out += Hazard("single_partition_window",
              s"$detail [claimed '${e.reason}' but structurally " +
                "unverified: no Aggregate/bounded child under the window]")
        }
      case _ =>
    }
    out.result()
  }

  private def drainSet[A](s: java.util.Set[A]): Set[A] = {
    val snapshot = Set.newBuilder[A]
    val it = s.iterator()
    while (it.hasNext) { snapshot += it.next(); it.remove() }
    snapshot.result()
  }

  /** localCheckpoint a ROLLUP-SIZED frame and re-attach the row-count
    * bound the checkpoint's LogicalRDD erases: the count is nearly free
    * (the checkpoint just materialized the partitions) and the no-op
    * limit gives downstream single-partition windows a STRUCTURAL
    * maxRows proof ([[verifyWindowClaims]]) instead of a name claim.
    * Do NOT use on fact frames — there the limit would be a lie and
    * the count a wasted job; this helper is for the
    * checkpoint-then-window rollup pattern only. */
  def checkpointPinned(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cp = df.localCheckpoint()
    val n = cp.count()
    require(n <= Int.MaxValue,
      s"checkpointPinned on a non-rollup frame ($n rows)")
    cp.limit(n.toInt)
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

object GuardrailRule {
  /** STRUCTURAL proof that a single-partition window sits over a
    * rollup, not the fact table: descend through cardinality-
    * preserving/reducing unary nodes (Project/Filter/Sort/Window/
    * repartitions) until an Aggregate — the group-by that MADE the
    * rollup — or a node with a provable maxRows bound. A call-site
    * expectation whose window fails this check is treated as a NEW
    * hazard, not a documented one: names can mislabel (round-9
    * decileLift did), plan structure cannot. Run against FINAL
    * optimized plans only (see [[Guardrails.verifyWindowClaims]]). */
  private[graft] def windowChildBounded(p: LogicalPlan): Boolean = {
    var cur = p
    var steps = 0
    while (steps < 64) {
      steps += 1
      if (cur.maxRows.exists(_ <= 100000L)) return true
      cur match {
        case _: Aggregate => return true
        case pr: Project => cur = pr.child
        case f: Filter => cur = f.child
        case s: Sort => cur = s.child
        case w: Window => cur = w.child
        case r: RepartitionOperation => cur = r.child
        case l: GlobalLimit => cur = l.child
        case l: LocalLimit => cur = l.child
        case _: Deduplicate => return true // distinct of a rollup path
        case u: Union => return u.children.forall(windowChildBounded)
        // a join of two bounded frames is bounded (≤ |L|·|R|) — the
        // densify/attach-scalar pattern (rollup ⋈ literal table,
        // rollup ⋈ 1-row stat) every finishing stage uses
        case j: Join =>
          return windowChildBounded(j.left) && windowChildBounded(j.right)
        case g: Generate =>
          // explode of a LITERAL-sized array over a bounded child is
          // bounded by |child|·|array| (densify-digits/densify-bins);
          // explode of a DATA-DEPENDENT array is accepted only over a
          // ≤1000-row child (the collect-then-redistribute pattern:
          // whatever was collected already passed a 1-row bottleneck,
          // so the re-explode is the collected rollup's size). A
          // collect_list re-explode over an unbounded frame is NOT
          // accepted — that can re-inflate a rollup to fact size.
          val litSized = g.generator.children.forall {
            case _: org.apache.spark.sql.catalyst.expressions.CreateArray => true
            case l: org.apache.spark.sql.catalyst.expressions.Literal =>
              l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
            case _ => false
          }
          if (litSized || g.child.maxRows.exists(_ <= 1000L)) cur = g.child
          else return false
        case _ => return false
      }
    }
    false
  }
}

/** The audit rule body. Non-mutating; O(plan size) per invocation. */
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
