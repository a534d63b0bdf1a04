package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch 70 — density + symbolization: the gridded KDE hotspot
  * surface (the "where is the heat" map behind every spatial
  * dashboard) and SAX symbolic time-series words (the motif/anomaly
  * alphabet behind pattern mining), both in exact integer arithmetic.
  */
object Analytics31 {

  // sensor field in integer cents (exact) — the Analytics30 lattice.
  private def sensorCents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.supplier(s, dir).select(
      expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
      expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y"),
      expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))

  private val sensorsCentsSql =
    """sens AS (
      |  SELECT CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
      |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y,
      |    CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM supplier)""".stripMargin

  /** q391 — A3+/F9: discrete-Epanechnikov KDE hotspot surface on the
    * sensor lattice (cell = 4 units, bandwidth = 3 cells), top-15
    * density cells — all-integer masses, so the ranking is exact. */
  val q391 = Declared(
    "q391_kde_grid", "A3,F9",
    (s, dir) => graft.ops.SpatialStats.kdeGrid(
      sensorCents(s, dir), col("x"), col("y"), col("v"),
      cellSize = 4.0, radius = 3)
      .orderBy(col("kde_mass").desc, col("cx"), col("cy")).limit(15),
    Some(s"""WITH $sensorsCentsSql,
           |cells AS (
           |  SELECT CAST(floor(x / 4.0) AS BIGINT) AS cx,
           |    CAST(floor(y / 4.0) AS BIGINT) AS cy,
           |    CAST(sum(v) AS BIGINT) AS xsum
           |  FROM sens GROUP BY 1, 2),
           |offs AS (
           |  SELECT dx.range AS dx, dy.range AS dy,
           |    9 - dx.range * dx.range - dy.range * dy.range AS w
           |  FROM range(-3, 4) dx, range(-3, 4) dy
           |  WHERE dx.range * dx.range + dy.range * dy.range < 9),
           |scat AS (
           |  SELECT cx + dx AS cx, cy + dy AS cy, xsum * w AS m
           |  FROM cells, offs)
           |SELECT cx, cy, CAST(sum(m) AS BIGINT) AS kde_mass,
           |  CAST(count(*) AS BIGINT) AS n_src
           |FROM scat GROUP BY 1, 2
           |ORDER BY kde_mass DESC, cx, cy LIMIT 15""".stripMargin),
    "ONE fact pass to the cell rollup; the kernel scatter explodes the " +
      "ROLLUP by the 29 in-disc offsets into a map-side-combinable groupBy " +
      "on target cells — never a distance join on facts, no inequality " +
      "predicates. Top-15 is TakeOrdered. Integer masses: the hotspot " +
      "ranking can never flip across engines or partitionings.")

  /** q392 — A8/F1: SAX words (quartile-breakpoint variant) of the
    * daily order-count series per priority class, 16-day segments —
    * the symbolic compression behind motif/novelty mining. */
  val q392 = Declared(
    "q392_sax_words", "A8,F1",
    (s, dir) => {
      val ser = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("k"), col("o_orderdate").as("t"))
        .agg(count(lit(1)).as("v"))
      graft.ops.TimeSeriesOps.saxSymbolize(ser, col("k"), col("t"),
        col("v"), segLen = 16)
    },
    Some("""WITH ser AS (
           |  SELECT o_orderpriority AS k, o_orderdate AS t,
           |    CAST(count(*) AS BIGINT) AS v
           |  FROM orders GROUP BY 1, 2),
           |rn AS (
           |  SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY t)
           |    AS rn
           |  FROM ser),
           |seg AS (
           |  SELECT k, (rn - 1) // 16 AS seg, CAST(sum(v) AS BIGINT) AS s
           |  FROM rn GROUP BY 1, 2 HAVING count(*) = 16),
           |rk AS (
           |  SELECT *, row_number() OVER (ORDER BY s, k, seg) AS r,
           |    count(*) OVER () AS nn
           |  FROM seg),
           |bk AS (
           |  SELECT max(CASE WHEN r = (nn + 3) // 4 THEN s END) AS b1,
           |    max(CASE WHEN r = (nn * 2 + 3) // 4 THEN s END) AS b2,
           |    max(CASE WHEN r = (nn * 3 + 3) // 4 THEN s END) AS b3
           |  FROM rk),
           |sym AS (
           |  SELECT k, seg, CASE WHEN s <= b1 THEN 'a'
           |    WHEN s <= b2 THEN 'b' WHEN s <= b3 THEN 'c'
           |    ELSE 'd' END AS c
           |  FROM seg, bk)
           |SELECT k AS key, string_agg(c, '' ORDER BY seg) AS sax_word,
           |  CAST(count(*) AS BIGINT) AS n_segments
           |FROM sym GROUP BY 1 ORDER BY key""".stripMargin),
    "Per-key rank windows are key-partitioned; the only global step is " +
      "quartile rank selection on the SEGMENT rollup (|points|/16 rows, " +
      "documented bounded window). Symbols are pure integer compares and " +
      "words assemble in one collect_list+sort agg per key — the 100 TB " +
      "cost is the day rollup, everything after is rollup-sized.")

  /** q393 — A-stat: Chao1 unseen-species richness of the yearly part
    * catalog actually shipped — "how many parts does this year's
    * demand REALLY touch, unseen ones included" — plus Good's sample
    * coverage. The corpus question (unseen vocabulary / URLs) in its
    * original ecological form. */
  val q393 = Declared(
    "q393_chao1_richness", "A-stat",
    (s, dir) => graft.ops.Aggregates.chao1Richness(
      Tables.lineitem(s, dir), col("l_partkey"),
      year(col("l_shipdate")).cast("int")),
    Some("""WITH ab AS (
           |  SELECT CAST(year(l_shipdate) AS INT) AS g, l_partkey,
           |    count(*) AS c
           |  FROM lineitem GROUP BY 1, 2),
           |sp AS (
           |  SELECT g, CAST(sum(c) AS BIGINT) AS n_obs,
           |    CAST(count(*) AS BIGINT) AS s_obs,
           |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
           |  FROM ab GROUP BY g)
           |SELECT g, n_obs, s_obs, f1, f2,
           |  CAST(s_obs AS DOUBLE) +
           |    CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE)
           |    AS chao1,
           |  1.0 - CAST(f1 AS DOUBLE) / CAST(n_obs AS DOUBLE) AS coverage
           |FROM sp ORDER BY g""".stripMargin),
    "ONE (year, part) rollup with map-side combine, then a conditional agg " +
      "to |years| rows — the exact abundance spectrum, no distinct-count " +
      "sketch. The unseen-mass estimate that decides whether another crawl " +
      "of the same source can still add vocabulary.")

  /** q394 — A-stat/eval: SNIPS self-normalized off-policy value on
    * the exact q229 replay logs — the lower-variance estimator beside
    * the unbiased one, with Kish ESS as the trust diagnostic. */
  val q394 = Declared(
    "q394_snips_policy_value", "A-stat",
    (s, dir) => {
      val per = Tables.lineitem(s, dir).groupBy(col("l_orderkey")).agg(
        countDistinct(col("l_suppkey")).as("k"),
        min(col("l_suppkey")).as("target"),
        max(when(col("l_linenumber") === 1, col("l_suppkey"))).as("logged"),
        max(when(col("l_linenumber") === 1,
          when(col("l_returnflag") =!= "R", 1L).otherwise(0L))).as("reward"))
      graft.ops.Experimentation.snipsPolicyValue(per, col("logged"),
        col("target"), col("reward"), expr("1000000L div k"))
    },
    Some("""WITH per AS (
           |  SELECT l_orderkey,
           |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS k,
           |    min(l_suppkey) AS target,
           |    max(CASE WHEN l_linenumber = 1 THEN l_suppkey END) AS logged,
           |    max(CASE WHEN l_linenumber = 1 THEN
           |      CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END END)
           |      AS reward
           |  FROM lineitem GROUP BY l_orderkey),
           |w AS (
           |  SELECT *, CASE WHEN logged = target THEN
           |      (CAST(1000000 AS HUGEINT) * 1000000) // (1000000 // k)
           |    ELSE CAST(0 AS HUGEINT) END AS w
           |  FROM per),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN logged = target THEN 1 ELSE 0 END)
           |      AS BIGINT) AS matches,
           |    sum(w * reward) AS wr, sum(w) AS sw, sum(w * w) AS sw2
           |  FROM w)
           |SELECT n, matches,
           |  CASE WHEN sw <> 0 THEN CAST((wr * 1000000) // sw AS BIGINT)
           |    END AS value_snips_ppm,
           |  CAST(wr // n AS BIGINT) AS value_ips_ppm,
           |  CASE WHEN sw2 <> 0 THEN CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
           |    / CAST(sw2 AS DOUBLE) END AS ess_w
           |FROM a""".stripMargin),
    "Identical shuffle shape to q229 (one order-grain agg, one scalar " +
      "agg); the SNIPS/IPS gap and the Kish ESS of the matched weights " +
      "are the variance instrumentation production OPE reads before " +
      "trusting either point estimate.")

  /** q395 — A-stat: supplier-market concentration per nation — HHI
    * points + CR1/CR4/CR8 of revenue share — the sourcing-risk audit
    * ("is this market one supplier failing away from a stockout"). */
  val q395 = Declared(
    "q395_market_concentration", "A-stat",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey"), col("l_suppkey"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
      graft.ops.Aggregates.marketConcentration(rev, col("s_nationkey"),
        col("l_suppkey"), col("cents"))
    },
    Some("""WITH cells AS (
           |  SELECT s_nationkey AS market, l_suppkey AS f,
           |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT)) AS BIGINT) AS s
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |rk AS (
           |  SELECT *, row_number() OVER (PARTITION BY market
           |    ORDER BY s DESC, f) AS r
           |  FROM cells),
           |a AS (
           |  SELECT market, CAST(count(*) AS BIGINT) AS n_firms,
           |    CAST(sum(s) AS HUGEINT) AS t,
           |    sum(CAST(s AS HUGEINT) * s) AS sq,
           |    CAST(sum(CASE WHEN r <= 1 THEN s ELSE 0 END) AS HUGEINT)
           |      AS top1,
           |    CAST(sum(CASE WHEN r <= 4 THEN s ELSE 0 END) AS HUGEINT)
           |      AS top4,
           |    CAST(sum(CASE WHEN r <= 8 THEN s ELSE 0 END) AS HUGEINT)
           |      AS top8
           |  FROM rk GROUP BY market)
           |SELECT market, n_firms, CAST(t AS BIGINT) AS total,
           |  CASE WHEN t <> 0 THEN CAST(sq AS DOUBLE) * 10000.0
           |    / CAST(t AS DOUBLE) / CAST(t AS DOUBLE) END AS hhi,
           |  CASE WHEN t <> 0 THEN CAST(top1 AS DOUBLE) / CAST(t AS DOUBLE)
           |    END AS cr1,
           |  CASE WHEN t <> 0 THEN CAST(top4 AS DOUBLE) / CAST(t AS DOUBLE)
           |    END AS cr4,
           |  CASE WHEN t <> 0 THEN CAST(top8 AS DOUBLE) / CAST(t AS DOUBLE)
           |    END AS cr8
           |FROM a ORDER BY market""".stripMargin),
    "The supplier dim broadcasts into the fact scan; ONE (market, firm) " +
      "rollup with map-side combine; the rank window is market-partitioned " +
      "and the finish is |markets| rows. Exact integer squares — the " +
      "concentration ranking cannot flip across engines.")

  /** q396 — A-stat: Atkinson(ε=1) inequality of order values per
    * priority class — the welfare-form readout beside Gini (q142) and
    * Theil (q253), micro-nat-quantized per distinct value. */
  val q396 = Declared(
    "q396_atkinson_index", "A-stat",
    (s, dir) => graft.ops.Aggregates.atkinsonIndex(
      Tables.orders(s, dir),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      col("o_orderpriority")),
    Some("""WITH v AS (
           |  SELECT o_orderpriority AS g,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS x
           |  FROM orders),
           |pv AS (
           |  SELECT g, x, count(*) AS c,
           |    CAST(round(ln(x) * 1e6, 0) AS BIGINT) AS lnu
           |  FROM v WHERE x > 0 GROUP BY g, x),
           |a AS (
           |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
           |    sum(CAST(x AS HUGEINT) * c) AS s,
           |    sum(CAST(lnu AS HUGEINT) * c) AS lns
           |  FROM pv GROUP BY g)
           |SELECT g, n, CAST(s AS BIGINT) AS sum_x,
           |  CAST(lns // n AS BIGINT) AS mean_ln_micro,
           |  round(1.0 - exp(CAST(CAST(lns // n AS BIGINT) AS DOUBLE) / 1e6)
           |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS atkinson
           |FROM a ORDER BY g""".stripMargin),
    "libm ln runs once per DISTINCT cent value (rollup-sized), quantized " +
      "to micro-nats and summed exactly; exp takes a bit-identical rational " +
      "argument. One (group, value) rollup with map-side combine — the " +
      "inequality panel (Gini/Theil/Atkinson) shares one scan shape.")

  val all: Seq[Declared] = Seq(q391, q392, q393, q394, q395, q396)
}
