package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E6 — skew mitigation by salting (SURVEY §2.12 design rules).
  *
  * AQE's skew-join splitting handles storage-level skew at runtime, but
  * a pathologically hot AGGREGATION key (one key = 30% of a 100 TB
  * table) still funnels one reducer. Salted two-phase aggregation
  * spreads the hot key over `salt` sub-keys: phase 1 aggregates
  * (key, salt) partials, phase 2 merges per key — the classic
  * partial/final split made explicit.
  *
  * Only ALGEBRAIC aggregates (sum/count/min/max — mergeable partials)
  * are supported; avg derives as sum/count at the caller.
  */
object Salting {

  /** Two-phase salted aggregation of `valueCols` grouped by `key`:
    * output columns sum_c, count_c, min_c, max_c per value column. */
  def saltedAggregate(df: DataFrame, key: String, salt: Int,
      valueCols: Seq[String]): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val partials =
      valueCols.map(c => sum(col(c)).as(s"__sum_$c")) ++
      valueCols.map(c => count(col(c)).as(s"__cnt_$c")) ++
      valueCols.map(c => min(col(c)).as(s"__min_$c")) ++
      valueCols.map(c => max(col(c)).as(s"__max_$c"))
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    val finals =
      valueCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
      valueCols.map(c => sum(col(s"__cnt_$c")).as(s"count_$c")) ++
      valueCols.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
      valueCols.map(c => max(col(s"__max_$c")).as(s"max_$c"))
    phase1.groupBy(col(key)).agg(finals.head, finals.tail: _*)
  }

  /** Salted join against a dimension with a hot foreign key: the fact
    * side gets a pseudo-random salt, the dim side is exploded `salt`×
    * so every (key, salt) pair matches. One hot reducer becomes `salt`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
