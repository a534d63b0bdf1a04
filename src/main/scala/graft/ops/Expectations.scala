package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C11+/E6 — declarative data contracts: a rule list evaluated in ONE
  * aggregation pass over the frame, yielding a per-rule violation
  * report (the Great-Expectations-style gate, engine-native). A rule
  * is (name, SQL predicate); a row VIOLATES when the predicate is
  * false OR null — null-hostile on purpose: an unexpected null is a
  * contract breach, not a free pass.
  *
  * The report, not an exception, is the product: pipelines route on
  * `pass` (quarantine the batch, alert, or proceed) and the report
  * row count is |rules| — driver-safe at any input size.
  *
  * Scale: all rules share one scan + one agg (conditional sums, map-
  * side combined) — adding a rule costs one column, never a pass. */
object Expectations {

  final case class Rule(name: String, predicateSql: String)

  /** Evaluate rules; returns (rule, n_rows, n_violations, pass) with
    * pass = 1 iff no violations. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate requires at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    val aggs = count(lit(1)).as("__n") +: rules.map { r =>
      sum(when(coalesce(expr(r.predicateSql), lit(false)), 0L)
        .otherwise(1L)).as(s"__v_${r.name}")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { r =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_${r.name}").as("n_violations"),
        (col(s"__v_${r.name}") === 0L).cast("int").as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** C11+/E6 — functional-dependency audit (the profiling half of FD
    * discovery à la TANE/HyFD, restricted to DECLARED candidates —
    * discovery over all column pairs is a schema-sized loop the
    * caller writes, not a data-sized one): for each candidate
    * lhs → rhs, report how close the data comes to satisfying it.
    * A group (= one lhs value combination) violates when it maps to
    * more than one distinct rhs value. `violation_rows` counts the
    * minimum row repairs (Σ over violating groups of group_size −
    * largest-rhs-block — the standard g3 error numerator, Kivinen &
    * Mannila 1995).
    *
    * Returns one row per candidate: (fd, n_groups, n_violating,
    * violation_rows, holds).
    *
    * Scale: each candidate costs ONE lhs-keyed partial agg over a
    * (lhs, rhs)-rollup — map-side combined, no distinct-expansion;
    * candidates are audited independently (a union of narrow aggs),
    * so adding one adds one rollup, never a fact-table rescan of the
    * others' width. */
  def fdAudit(df: DataFrame,
      candidates: Seq[(Seq[String], String)]): DataFrame = {
    require(candidates.nonEmpty, "at least one FD candidate")
    val reports = candidates.map { case (lhs, rhs) =>
      require(lhs.nonEmpty, "lhs must be non-empty")
      val fdName = s"${lhs.mkString(",")} -> $rhs"
      val pairs = df.groupBy((lhs :+ rhs).map(col): _*)
        .agg(count(lit(1)).as("__c"))
      val groups = pairs.groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("__nd"), sum(col("__c")).as("__sz"),
          max(col("__c")).as("__mx"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("__nd") > 1, col("__sz") - col("__mx"))
          .otherwise(0L)).as("violation_rows"))
        .select(lit(fdName).as("fd"), col("n_groups"), col("n_violating"),
          col("violation_rows"),
          (col("n_violating") === 0L).cast("int").as("holds"))
    }
    reports.reduce(_ unionByName _)
  }
}
