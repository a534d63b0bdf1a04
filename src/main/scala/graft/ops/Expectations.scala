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
}
