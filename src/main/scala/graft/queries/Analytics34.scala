package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Aggregates

/** Round-7 batch: robust location estimators — the Hodges-Lehmann
  * Walsh-average median and the median-of-means heavy-tail-safe mean,
  * both exact integers end to end. */
object Analytics34 {

  /** q454 — A-stat: Hodges-Lehmann location of DAILY shipped quantity
    * per return flag — median of Walsh averages over the calendar-grain
    * rollup (the |days|² pair join runs on the rollup, never raw
    * facts), reported as 2·HL so the selection stays integer. */
  val q454 = Declared(
    "q454_hodges_lehmann", "A-stat",
    (s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("flag"),
          to_date(col("l_shipdate")).as("__d"))
        .agg(sum(col("l_quantity").cast("long")).as("__q"))
        .withColumn("__day", datediff(col("__d"), lit("1990-01-01")).cast("long"))
      Aggregates.hodgesLehmann(daily, Seq(col("flag")), col("__q"),
          col("__day"))
        .orderBy(col("flag"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag AS flag,
           |    date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE))
           |      AS d,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           |  FROM lineitem GROUP BY 1, 2),
           |p AS (
           |  SELECT a.flag, a.q + b.q AS w2, a.d AS t1, b.d AS t2
           |  FROM daily a JOIN daily b ON a.flag = b.flag AND a.d <= b.d),
           |r AS (
           |  SELECT flag, w2,
           |    row_number() OVER (PARTITION BY flag ORDER BY w2, t1, t2)
           |      AS rn,
           |    count(*) OVER (PARTITION BY flag) AS np
           |  FROM p),
           |m AS (SELECT flag, CAST(min(w2) AS BIGINT) AS hl2,
           |        CAST(min(np) AS BIGINT) AS n_pairs
           |      FROM r WHERE rn * 2 >= np GROUP BY flag),
           |c AS (SELECT flag, CAST(count(*) AS BIGINT) AS n
           |      FROM daily GROUP BY flag)
           |SELECT c.flag, c.n, m.n_pairs, m.hl2
           |FROM c JOIN m ON c.flag = m.flag ORDER BY c.flag""".stripMargin),
    "The Walsh pair join is |days|² per flag — calendar-bounded squared, " +
      "a documented rollup regime; the median selection reuses the " +
      "key-partitioned weightedQuantile envelope (no single-partition " +
      "window). The robust center that shrugs off a corrupted day.")

  /** q455 — A-stat: median-of-means of line price cents, 9 buckets
    * keyed by (orderkey·8 + linenumber) mod 9 — the heavy-tail-safe
    * mean; one bucket agg + a 9-row TakeOrdered finish. */
  val q455 = Declared(
    "q455_median_of_means", "A-stat",
    (s, dir) => Aggregates.medianOfMeans(
        Tables.lineitem(s, dir),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("l_orderkey * 8 + l_linenumber"), k = 9),
    Some("""WITH b AS (
           |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) AS v,
           |    (l_orderkey * 8 + l_linenumber) % 9 AS bk
           |  FROM lineitem),
           |g AS (
           |  SELECT bk, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(v) AS HUGEINT) AS s,
           |    CAST((CAST(sum(v) AS HUGEINT) * 1000000) // count(*)
           |      AS BIGINT) AS mean_u
           |  FROM b GROUP BY bk),
           |r AS (SELECT mean_u,
           |        row_number() OVER (ORDER BY mean_u, bk) AS rn FROM g)
           |SELECT CAST(sum(g.n) AS BIGINT) AS n,
           |  CAST(count(*) AS BIGINT) AS k_buckets,
           |  (SELECT CAST(max(mean_u) AS BIGINT) FROM r WHERE rn <= 5)
           |    AS mom_micro
           |FROM g""".stripMargin),
    "One bucket-keyed agg with map-side combine + a 9-row TakeOrdered " +
      "finish — no windows, no joins; the robust mean at any scan size. " +
      "Bucket key is replayable modular arithmetic so a second engine " +
      "agrees exactly (pre-hash clustered ids upstream at scale).")

  val all: Seq[Declared] = Seq(q454, q455)
}
