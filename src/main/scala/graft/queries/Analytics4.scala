package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Graph
import graft.ops.{Aggregates, SpatialOps, TimeSeriesOps}

/** Round-4 (batch 14): trend & seasonality (seasonal-means
  * decomposition, Theil–Sen robust slope, forecast evaluation),
  * seed-proximity graph ranking (personalized PageRank), and the
  * geohash spatial cell key. Same hash-exactness discipline as the
  * other Analytics modules: integer/decimal decision arithmetic,
  * float ops only on identical exact operands, SQL for iterative /
  * bit-twiddling oracles GENERATED from the same Scala that builds
  * the Spark plan. */
object Analytics4 {

  private val PartOffset = 1L << 40 // bipartite shift, literal in SQL

  private def centsSql(e: String) =
    s"CAST(CAST($e AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** q181 — A5/A8: additive seasonal decomposition of daily order
    * revenue by weekday — value = per-weekday integer mean + residual.
    * Weekday is pure day-number arithmetic (epoch-day mod 7), no
    * calendar function drift between engines. */
  val q181 = Declared(
    "q181_seasonal_decompose", "A5,A8",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .withColumn("day",
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"))
        .groupBy(col("day"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("total_c"))
        .withColumn("weekday", pmod(col("day"), lit(7L)))
      TimeSeriesOps.seasonalDecompose(daily, Nil, col("weekday"),
          col("total_c"))
        .select(col("day"), col("weekday"), col("total_c"),
          col("seasonal_c"), col("resid_c"))
        .orderBy(col("day"))
    },
    Some(s"""WITH daily AS (
           |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
           |      AS BIGINT) AS day,
           |    CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_c
           |  FROM orders GROUP BY 1),
           |w AS (SELECT day, day % 7 AS weekday, total_c FROM daily),
           |prof AS (
           |  SELECT weekday, CAST(sum(total_c) AS HUGEINT) AS s, count(*) AS n
           |  FROM w GROUP BY 1)
           |SELECT day, w.weekday, total_c,
           |  CAST(s // n AS BIGINT) AS seasonal_c,
           |  total_c - CAST(s // n AS BIGINT) AS resid_c
           |FROM w JOIN prof ON w.weekday = prof.weekday
           |ORDER BY day""".stripMargin),
    "The seasonal profile is a 7-row broadcast; facts are touched once with no " +
      "window. Deseasonalized residuals are what q115's 3-sigma gate should " +
      "consume when the metric has a weekday/hour cycle — at 100 TB the profile " +
      "agg map-side combines to |seasons| rows per partition.")

  /** q182 — A5/A8: one-step-ahead forecast evaluation — Holt (q173's
    * exact integer smoother) vs the naive last-value forecast, per
    * order priority, verdict = MASE in ppm. The oracle replays the
    * same recursion as a recursive CTE and lags it one step. */
  val q182 = Declared(
    "q182_forecast_eval", "A5,A8",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      val holt = TimeSeriesOps.holtInt(daily, Seq(col("o_orderpriority")),
        col("day"), col("n"), aNum = 1, aDen = 5, bNum = 1, bDen = 10,
        scale = 1000)
      TimeSeriesOps.forecastEval(holt, Seq("o_orderpriority"), scale = 1000)
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH RECURSIVE d AS (
           |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
           |    count(*) AS n
           |  FROM orders GROUP BY 1, 2),
           |r AS (
           |  SELECT pri, day, CAST(n AS BIGINT) AS n,
           |    row_number() OVER (PARTITION BY pri ORDER BY day) AS rn
           |  FROM d),
           |s AS (
           |  SELECT pri, rn, n, n * 1000 AS l, CAST(0 AS BIGINT) AS b
           |  FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.pri, r.rn, r.n,
           |    (1 * r.n * 1000 + 4 * (s.l + s.b)) // 5 AS l,
           |    (1 * ((1 * r.n * 1000 + 4 * (s.l + s.b)) // 5 - s.l) + 9 * s.b)
           |      // 10 AS b
           |  FROM r JOIN s ON r.pri = s.pri AND r.rn = s.rn + 1),
           |e AS (SELECT pri, rn, n, l + b AS f FROM s),
           |lagged AS (
           |  SELECT a.pri, a.n AS v, b.f AS pf, b.n AS pv
           |  FROM e a JOIN e b ON a.pri = b.pri AND a.rn = b.rn + 1)
           |SELECT pri AS o_orderpriority,
           |  CAST(count(*) AS BIGINT) AS n_eval,
           |  CAST(sum(abs(v * 1000 - pf)) AS BIGINT) AS sae_holt,
           |  CAST(sum(abs((v - pv) * 1000)) AS BIGINT) AS sae_naive,
           |  CASE WHEN sum(abs((v - pv) * 1000)) > 0 THEN
           |    CAST(1000000 * CAST(sum(abs(v * 1000 - pf)) AS HUGEINT) //
           |      CAST(sum(abs((v - pv) * 1000)) AS HUGEINT) AS BIGINT)
           |  END AS mase_ppm
           |FROM lagged GROUP BY pri
           |ORDER BY o_orderpriority""".stripMargin),
    "Evaluation costs one lag window over the SAME rollup-grain series the " +
      "smoother already reduced to — the accuracy gate you run before trusting " +
      "q173's forecasts for capacity planning. MASE < 10^6 iff Holt beats naive.")

  /** q183 — A-stat: Theil–Sen robust weekly revenue trend per return
    * flag — the median of all pairwise slopes, deterministic lower
    * median under the (quotient, num, den) order. OLS (q82) moves
    * arbitrarily under one corrupted week; this moves only past 29%
    * contamination. */
  val q183 = Declared(
    "q183_theil_sen", "A-stat",
    (s, dir) => {
      val weekly = Tables.lineitem(s, dir)
        .withColumn("week",
          expr("datediff(to_date(l_shipdate), '1970-01-01') div 7").cast("long"))
        .groupBy(col("l_returnflag"), col("week"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("rev_c"))
      Aggregates.theilSen(weekly, Seq(col("l_returnflag")), col("week"),
          col("rev_c"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""WITH wk AS (
           |  SELECT l_returnflag,
           |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           |      // 7 AS week,
           |    CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS rev_c
           |  FROM lineitem GROUP BY 1, 2),
           |p AS (
           |  SELECT a.l_returnflag AS flag, b.rev_c - a.rev_c AS num,
           |    b.week - a.week AS den
           |  FROM wk a JOIN wk b
           |    ON a.l_returnflag = b.l_returnflag AND a.week < b.week),
           |r AS (
           |  SELECT flag, num, den,
           |    row_number() OVER (PARTITION BY flag
           |      ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE), num, den)
           |      AS rn,
           |    count(*) OVER (PARTITION BY flag) AS m
           |  FROM p)
           |SELECT flag AS l_returnflag, CAST(m AS BIGINT) AS n_pairs,
           |  num AS slope_num, den AS slope_den,
           |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope
           |FROM r WHERE rn = (m + 1) // 2
           |ORDER BY l_returnflag""".stripMargin),
    "The pair join is key-local over the WEEKLY rollup (|weeks|² pairs per key, " +
      "never fact-sized) and shares its partitioning with the rank window. At " +
      "100 TB the rollup is what shrinks the problem: aggregate first, then the " +
      "robust fit costs the same as at sf0.01.")

  /** q184 — E2+/E6: personalized PageRank over the supplier–part
    * bipartite graph, teleporting only to nation-0 suppliers — rank =
    * proximity to the seed set, the seed-expansion primitive for
    * corpus curation. Same integer recursion as q100; the oracle
    * unrolls the 3 rounds as generated CTEs. */
  val q184 = Declared(
    "q184_ppr", "E2+,E6",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + PartOffset).as("dst"))
      val sources = Tables.supplier(s, dir)
        .filter(col("s_nationkey") === 0).select(col("s_suppkey"))
      Graph.personalizedPageRank(edges, "src", "dst", sources, "s_suppkey",
          iters = 3)
        .filter(col("node") < PartOffset)
        .select(col("node").as("supplier"), col("rank_ppm"))
        .orderBy(col("supplier"))
    },
    Some {
      val base = 1000000L - (85L * 1000000L) / 100L // 150000, as in the op
      def round(k: Int): String =
        s"""i$k AS (
           |  SELECT s.dst AS node, sum(r.r // r.deg) AS inflow
           |  FROM sym s JOIN r${k - 1} r ON s.src = r.node GROUP BY 1),
           |r$k AS (
           |  SELECT d.node, d.deg, d.s,
           |    CAST(d.s * $base + (85 * COALESCE(i.inflow, 0)) // 100
           |      AS BIGINT) AS r
           |  FROM deg d LEFT JOIN i$k i ON d.node = i.node)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_suppkey AS src, l_partkey + $PartOffset AS dst
         |  FROM lineitem),
         |sym AS (
         |  SELECT src, dst FROM e0
         |  UNION
         |  SELECT dst AS src, src AS dst FROM e0),
         |src_set AS (
         |  SELECT s_suppkey AS node FROM supplier WHERE s_nationkey = 0),
         |deg AS (
         |  SELECT sym.src AS node, count(*) AS deg,
         |    CASE WHEN max(ss.node) IS NOT NULL THEN 1 ELSE 0 END AS s
         |  FROM sym LEFT JOIN src_set ss ON sym.src = ss.node
         |  GROUP BY sym.src),
         |r0 AS (
         |  SELECT node, deg, s, CAST(s * 1000000 AS BIGINT) AS r FROM deg),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node AS supplier, r AS rank_ppm
         |FROM r3 WHERE node < $PartOffset
         |ORDER BY supplier""".stripMargin
    },
    "Identical scale contract to q100: per round one node-keyed equi-join + one " +
      "dst-keyed agg, fixed rounds, no driver traffic; the seed set is a " +
      "broadcast flag. Truncating-long arithmetic makes the ranks bit-identical " +
      "under any partitioning — the property the unrolled-CTE oracle certifies.")

  /** q185 — F9/P4: geohash cell keys for the sensor fleet — quantize,
    * interleave, base-32 render, all generated from ONE Scala builder
    * for both engines (only the shift syntax differs), so the 30-bit
    * words and their string spellings agree exactly. gh3 demonstrates
    * the prefix roll-up property (32 child cells share a parent
    * prefix). */
  val q185 = Declared(
    "q185_geohash", "F9,P4",
    (s, dir) => {
      val sensors = Tables.supplier(s, dir).select(
        col("s_suppkey").as("id_sensor"),
        ((expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)") - lit(50.0)) *
          lit(1.7)).as("lat"),
        ((expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)") - lit(50.0)) *
          lit(3.5)).as("lon"))
      SpatialOps.withGeohash(sensors, col("lat"), col("lon"), precision = 6)
        .withColumn("gh3", expr("substr(geohash, 1, 3)"))
        .select(col("id_sensor"), col("lat"), col("lon"),
          col("geohash"), col("gh3"))
        .orderBy(col("id_sensor"))
    },
    Some {
      s"""WITH s0 AS (
         |  SELECT s_suppkey AS id_sensor,
         |    (CAST((s_suppkey * 37) % 100 AS DOUBLE) - 50.0) * 1.7 AS lat,
         |    (CAST((s_suppkey * 73) % 100 AS DOUBLE) - 50.0) * 3.5 AS lon
         |  FROM supplier),
         |q AS (
         |  SELECT id_sensor, lat, lon,
         |    ${SpatialOps.quantSql("lon", 180, 360, 15)} AS lonq,
         |    ${SpatialOps.quantSql("lat", 90, 180, 15)} AS latq
         |  FROM s0),
         |b AS (
         |  SELECT id_sensor, lat, lon,
         |    ${SpatialOps.bitsSql(6, duck = true)} AS ghbits
         |  FROM q)
         |SELECT id_sensor, lat, lon,
         |  ${SpatialOps.charsSql(6, duck = true)} AS geohash,
         |  substr(${SpatialOps.charsSql(6, duck = true)}, 1, 3) AS gh3
         |FROM b ORDER BY id_sensor""".stripMargin
    },
    "Pure scan-side codegen arithmetic — no join, no shuffle, no UDF. The " +
      "geohash is the STRING spelling of the q38 Z-order key: writing 100 TB " +
      "clustered by it gives q175's zone-map pruning on every lat/lon box " +
      "predicate, and per-cell aggregates roll up to coarser cells by prefix " +
      "truncation alone.")

  /** q186 — A-stat: Welch's unequal-variance t-test of quantity
    * between returned (R) and accepted (A) line items — the parametric
    * complement of q152's Mann–Whitney. Exact integer state; the
    * double finish mirrors the op's exact operation order, so the
    * statistic hash-matches unrounded. */
  val q186 = Declared(
    "q186_welch_t", "A-stat",
    (s, dir) => Aggregates.welchTTest(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag"), "A", "R"),
    Some("""WITH g AS (
           |  SELECT l_returnflag AS f,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s,
           |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
           |      AS HUGEINT) AS q
           |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
           |w AS (
           |  SELECT
           |    a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
           |    CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
           |    CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
           |    (CAST(a.n * a.q - a.s * a.s AS DOUBLE) /
           |     CAST(a.n * (a.n - 1) AS DOUBLE)) / CAST(a.n AS DOUBLE) AS ea,
           |    (CAST(b.n * b.q - b.s * b.s AS DOUBLE) /
           |     CAST(b.n * (b.n - 1) AS DOUBLE)) / CAST(b.n AS DOUBLE) AS eb
           |  FROM (SELECT * FROM g WHERE f = 'A') a,
           |       (SELECT * FROM g WHERE f = 'R') b)
           |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           |  ma AS mean_a, mb AS mean_b,
           |  CASE WHEN na > 1 AND nb > 1 THEN
           |    (ma - mb) / sqrt(ea + eb) END AS t_stat,
           |  CASE WHEN na > 1 AND nb > 1 THEN
           |    (ea + eb) * (ea + eb) /
           |    (ea * ea / (CAST(na AS DOUBLE) - 1.0) +
           |     eb * eb / (CAST(nb AS DOUBLE) - 1.0)) END AS df
           |FROM w""".stripMargin),
    "State is 3 exact sums per group with map-side combine — the whole test is " +
      "one agg pass + a 2-row finish at any input size. Run it alongside q152: " +
      "MW answers 'shifted at all?', Welch answers 'by how much, in units?'.")

  /** q187 — A-stat: one-way ANOVA F of quantity across ALL return
    * flags — the k-group mean-difference screen. Per-group S²/n terms
    * micro-quantized before summing (the chi-square trick) keep the
    * sums order-independent. */
  val q187 = Declared(
    "q187_anova_f", "A-stat",
    (s, dir) => Aggregates.anovaF(Tables.lineitem(s, dir),
      col("l_quantity"), col("l_returnflag")),
    Some("""WITH g AS (
           |  SELECT l_returnflag AS f,
           |    CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s,
           |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
           |      AS HUGEINT) AS q
           |  FROM lineitem GROUP BY 1),
           |t AS (
           |  SELECT f, n, s, q,
           |    CAST(round(CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0,
           |      0) AS BIGINT) AS term
           |  FROM g),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS k,
           |    CAST(sum(n) AS BIGINT) AS n,
           |    CAST(sum(s) AS HUGEINT) AS ss,
           |    CAST(sum(q) AS BIGINT) AS qq,
           |    CAST(sum(term) AS BIGINT) AS sumt
           |  FROM t)
           |SELECT k, n,
           |  sumt - CAST(round(CAST(ss * ss AS DOUBLE) /
           |    CAST(n AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS ssb_u,
           |  qq * 1000000 - sumt AS ssw_u,
           |  CASE WHEN k > 1 AND n > k AND qq * 1000000 - sumt > 0 THEN
           |    (CAST(sumt - CAST(round(CAST(ss * ss AS DOUBLE) /
           |       CAST(n AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS DOUBLE) /
           |     CAST(k - 1 AS DOUBLE)) /
           |    (CAST(qq * 1000000 - sumt AS DOUBLE) / CAST(n - k AS DOUBLE))
           |  END AS f_stat
           |FROM a""".stripMargin),
    "One group-keyed agg with map-side combine + a |groups|-row finish. The " +
      "micro-unit quantization is what makes ssb/ssw reproducible under any " +
      "reduce order — the same trick as q153's chi-square terms.")

  /** q188 — A1: two-feature exact OLS — line-item revenue regressed on
    * quantity and discount, per return flag. q82 lifted one dimension:
    * centered co-moments exact in DECIMAL(38,0), Cramer finish in
    * doubles mirrored operation-for-operation in the SQL. */
  val q188 = Declared(
    "q188_ols2", "A1",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      Aggregates.linearFit2Exact(li, Seq(col("l_returnflag")),
          col("l_quantity"),
          (col("l_discount").cast("decimal(18,2)") * 100).cast("long"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""WITH d AS (
           |  SELECT l_returnflag,
           |    CAST(l_quantity AS BIGINT) AS x1,
           |    ${centsSql("l_discount")} AS x2,
           |    ${centsSql("l_extendedprice")} AS y
           |  FROM lineitem),
           |a AS (
           |  SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
           |    CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(x1 * x1) AS HUGEINT) AS s11,
           |    CAST(sum(x2 * x2) AS HUGEINT) AS s22,
           |    CAST(sum(x1 * x2) AS HUGEINT) AS s12,
           |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
           |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
           |  FROM d GROUP BY 1),
           |c AS (
           |  SELECT l_returnflag, n, s1, s2, sy,
           |    CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
           |    CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
           |    CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
           |    CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
           |    CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y
           |  FROM a),
           |f AS (
           |  SELECT l_returnflag, n, s1, s2, sy,
           |    c11 * c22 - c12 * c12 AS det, c11, c22, c12, c1y, c2y
           |  FROM c)
           |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           |  CASE WHEN det <> 0 THEN (c22 * c1y - c12 * c2y) / det END AS b1,
           |  CASE WHEN det <> 0 THEN (c11 * c2y - c12 * c1y) / det END AS b2,
           |  CASE WHEN det <> 0 THEN
           |    (CAST(sy AS DOUBLE) - (c22 * c1y - c12 * c2y) / det *
           |       CAST(s1 AS DOUBLE) - (c11 * c2y - c12 * c1y) / det *
           |       CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE)
           |  END AS intercept
           |FROM f ORDER BY l_returnflag""".stripMargin),
    "Nine exact sums in one map-side-combined agg pass — the multi-feature " +
      "regression at 100 TB costs exactly one scan, like q82. The Cramer finish " +
      "touches |keys| rows. Collinear features yield nulls, not garbage.")

  /** q189 — E6: greedy file-compaction plan — the small-files rewrite
    * audit. Pseudo-files are l_orderkey div 512 row batches; the plan
    * packs them into ~4096-row output groups by prefix sum. */
  val q189 = Declared(
    "q189_compaction_plan", "E6",
    (s, dir) => {
      val files = Tables.lineitem(s, dir)
        .groupBy(expr("l_orderkey div 512").as("fid"))
        .agg(count(lit(1)).as("bytes"))
      graft.ops.Layout.compactionPlan(files, col("fid"), col("bytes"),
          targetBytes = 4096L)
        .orderBy(col("grp"))
    },
    Some("""WITH f AS (
           |  SELECT l_orderkey // 512 AS fid, CAST(count(*) AS BIGINT) AS b
           |  FROM lineitem GROUP BY 1),
           |p AS (
           |  SELECT fid, b,
           |    COALESCE(CAST(sum(b) OVER (ORDER BY fid
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           |      0) AS before
           |  FROM f)
           |SELECT before // 4096 AS grp, CAST(count(*) AS BIGINT) AS n_files,
           |  CAST(sum(b) AS BIGINT) AS bytes,
           |  min(fid) AS file_lo, max(fid) AS file_hi
           |FROM p GROUP BY 1 ORDER BY grp""".stripMargin),
    "The plan runs over the file LISTING (metadata-sized: ~10^5 rows for " +
      "100 TB), not data — the one ordered window is bounded by that listing. " +
      "Greedy prefix packing is within one group of the bin-packing lower bound " +
      "when file sizes are <= target, the compaction-rewrite case.")

  /** q190 — A-stat: next-event prediction accuracy of the first-order
    * Markov model — q102's transition matrix scored as a predictor
    * (modal next type per source, deterministic tie-break). The
    * sequence-model readout of the journey view. */
  val q190 = Declared(
    "q190_markov_accuracy", "A-stat",
    (s, dir) => graft.ops.EventAnalytics.markovAccuracy(
        Tables.events(s, dir), col("user_id"), col("ts"),
        col("event_type"), col("event_id"))
      .orderBy(col("src")),
    Some("""WITH t AS (
           |  SELECT event_type AS src,
           |    lead(event_type) OVER (
           |      PARTITION BY user_id ORDER BY ts, event_id) AS dst
           |  FROM events),
           |c AS (
           |  SELECT src, dst, count(*) AS n
           |  FROM t WHERE dst IS NOT NULL GROUP BY src, dst),
           |pred AS (
           |  SELECT src, dst AS predicted FROM (
           |    SELECT src, dst,
           |      row_number() OVER (PARTITION BY src
           |        ORDER BY n DESC, dst ASC) AS rn
           |    FROM c) WHERE rn = 1)
           |SELECT c.src, predicted,
           |  CAST(sum(n) AS BIGINT) AS n_trans,
           |  CAST(sum(CASE WHEN dst = predicted THEN n ELSE 0 END) AS BIGINT)
           |    AS n_correct,
           |  1000000 * CAST(sum(CASE WHEN dst = predicted THEN n ELSE 0 END)
           |    AS BIGINT) // CAST(sum(n) AS BIGINT) AS acc_ppm
           |FROM c JOIN pred ON c.src = pred.src
           |GROUP BY c.src, predicted
           |ORDER BY c.src""".stripMargin),
    "Event volume dies at the |types|^2 matrix agg (the q102 cost envelope); " +
      "prediction and scoring join on the broadcast-sized matrix. acc_ppm vs " +
      "the modal base rate is the go/no-go for sequence features at 100 TB.")

  val all: Seq[Declared] = Seq(q181, q182, q183, q184, q185,
    q186, q187, q188, q189, q190)
}
