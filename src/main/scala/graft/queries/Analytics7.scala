package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Graph, JaroWinkler, TextAnalysis}
import graft.ops.{Evaluation, Experimentation, Features}

/** Round-4 (batches 22-23): similarity-scored entity resolution on a
  * native Jaro-Winkler expression, corpus drift (Jensen-Shannon),
  * mutual-information feature ranking, multiple-testing control
  * (Benjamini-Hochberg), CUPED variance reduction, label-propagation
  * communities; HITS hubs/authorities, difference-in-differences,
  * MDE power planning, Bradley-Terry preference strengths and the
  * calibration/ECE audit. Same exactness discipline as the other
  * Analytics modules: integer/decimal corpus sums, double finishes
  * mirrored token-for-token in the oracle SQL. */
object Analytics7 {

  private val PartOffset = 1099511627776L // 2^40, same node-space split as q100

  /** q217 — J-fuzzy/X3: similarity-RANKED entity resolution — typo'd
    * part names (2nd char deleted) resolve to the best dictionary
    * name by Jaro-Winkler score, not by an edit-distance threshold:
    * the scorer variant of q108's levenshtein verify, on the native
    * codegen [[graft.ext.JaroWinkler]] expression whose doubles are
    * bit-identical to the oracle engine's `jaro_winkler_similarity`
    * (so the 0.9 cutoff and the rank order agree exactly). */
  val q217 = Declared(
    "q217_jaro_winkler", "J-fuzzy,X3",
    (s, dir) => {
      val parts = Tables.part(s, dir)
      val dict = parts.select(col("p_name").as("clean_name")).distinct()
      val dirty = parts.filter(col("p_partkey") % 5 === 3)
        .select(col("p_partkey").as("dirty_id"),
          concat(substring(col("p_name"), 1, 1),
            expr("substring(p_name, 3)")).as("dirty_name"))
      val best = Window.partitionBy(col("dirty_id"))
        .orderBy(col("jw").desc, col("clean_name"))
      // blocking keys chosen to SURVIVE the corruption model (deletion
      // at position 2): the first char and the 4-char SUFFIX are both
      // invariant, and together they cut candidates ~100× vs either
      // alone — the block is part of the declared semantics and the
      // oracle applies it verbatim
      dirty.join(broadcast(dict),
          substring(col("dirty_name"), 1, 1) === substring(col("clean_name"), 1, 1) &&
          expr("right(dirty_name, 4)") === expr("right(clean_name, 4)") &&
          abs(length(col("dirty_name")) - length(col("clean_name"))) <= 2)
        .withColumn("jw",
          JaroWinkler.jaroWinkler(col("dirty_name"), col("clean_name")))
        .filter(col("jw") >= 0.9)
        .withColumn("__rn", row_number().over(best))
        .filter(col("__rn") === 1)
        .select(col("dirty_id"), col("clean_name"),
          round(col("jw") * 1e6, 0).cast("long").as("jw_ppm"))
        .orderBy(col("dirty_id"))
    },
    Some("""WITH dict AS (SELECT DISTINCT p_name AS clean_name FROM part),
           |dirty AS (
           |  SELECT p_partkey AS dirty_id,
           |         substring(p_name, 1, 1) || substring(p_name, 3) AS dirty_name
           |  FROM part WHERE p_partkey % 5 = 3),
           |scored AS (
           |  SELECT dirty_id, clean_name,
           |         jaro_winkler_similarity(dirty_name, clean_name) AS jw
           |  FROM dirty JOIN dict
           |    ON substring(dirty_name, 1, 1) = substring(clean_name, 1, 1)
           |   AND right(dirty_name, 4) = right(clean_name, 4)
           |   AND abs(length(dirty_name) - length(clean_name)) <= 2),
           |best AS (
           |  SELECT dirty_id, clean_name, jw,
           |    row_number() OVER (PARTITION BY dirty_id
           |                       ORDER BY jw DESC, clean_name) AS rn
           |  FROM scored WHERE jw >= 0.9)
           |SELECT dirty_id, clean_name,
           |       CAST(round(jw * 1e6, 0) AS BIGINT) AS jw_ppm
           |FROM best WHERE rn = 1 ORDER BY dirty_id""".stripMargin),
    "The DISTINCT dictionary broadcasts; the JW kernel runs inside the join " +
      "stage's codegen span (one static call per candidate pair, no UDF " +
      "boundary). First-char + length blocking bounds candidates per dirty row; " +
      "the per-dirty argmax window keys on dirty_id, so 100 TB of dirty rows " +
      "rank inside their own partitions — no global sort anywhere.")

  /** q218 — E4: corpus drift — Jensen-Shannon divergence between the
    * 'en' and 'de' unigram distributions of the document corpus, the
    * bounded symmetric distance a curation pipeline tracks across
    * crawl snapshots and mixture slices. Per-token nano-nat rounding
    * makes the corpus-sized sum order-independent (q141's entropy
    * discipline), so both engines agree exactly. */
  val q218 = Declared(
    "q218_js_divergence", "E4",
    (s, dir) => TextAnalysis.jsDivergence(
      Tables.documents(s, dir), col("text"), col("lang"), "en", "de"),
    Some("""WITH tk AS (
           |  SELECT lang AS s,
           |         unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           |  FROM documents WHERE lang IN ('en', 'de')),
           |tk2 AS (SELECT s, w FROM tk WHERE w <> ''),
           |cnt AS (
           |  SELECT w,
           |    CAST(sum(CASE WHEN s = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           |    CAST(sum(CASE WHEN s = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS cb
           |  FROM tk2 GROUP BY w),
           |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
           |               CAST(sum(cb) AS BIGINT) AS nb FROM cnt),
           |pq AS (
           |  SELECT ca, cb,
           |    CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
           |    CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb
           |  FROM cnt CROSS JOIN tot),
           |term AS (
           |  SELECT ca, cb,
           |    CAST(round((
           |      CASE WHEN ca > 0 THEN pa * ln(pa / ((pa + pb) / 2))
           |           ELSE 0.0 END +
           |      CASE WHEN cb > 0 THEN pb * ln(pb / ((pa + pb) / 2))
           |           ELSE 0.0 END) * 1e9, 0) AS BIGINT) AS t_nano
           |  FROM pq),
           |agg AS (
           |  SELECT
           |    CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
           |    CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b,
           |    CAST(count(*) AS BIGINT) AS vocab_union,
           |    CAST(sum(t_nano) AS BIGINT) AS s_nano
           |  FROM term)
           |SELECT na AS n_a, nb AS n_b, vocab_a, vocab_b, vocab_union,
           |       round(CAST(s_nano AS DOUBLE) / 2 / 1e9, 6) AS jsd
           |FROM agg CROSS JOIN tot""".stripMargin),
    "One token-keyed agg with map-side combine (vocabulary-sized output), a " +
      "broadcast of the two scalar totals, a scalar finish — the corpus is read " +
      "once. Tracked per (snapshot, slice) pair it is the cheap early-warning " +
      "gate that stops a drifted crawl before the expensive dedup/quality passes.")

  /** q219 — A-stat/ML: mutual-information feature ranking — which of
    * line status, quantity decile and discount level carries the most
    * information about the return flag. Exact contingency counts; one
    * nano-nat-rounded term per CELL, summed as longs — the ranking is
    * reproducible bit-for-bit on any engine. */
  val q219 = Declared(
    "q219_mutual_info", "A-stat",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val y = col("l_returnflag")
      Features.mutualInformation(li, "linestatus", col("l_linestatus"), y)
        .unionByName(Features.mutualInformation(li, "qty_decile",
          expr("CAST(l_quantity AS BIGINT) div 10"), y))
        .unionByName(Features.mutualInformation(li, "discount_pct",
          (col("l_discount").cast("decimal(18,2)") * 100).cast("long"), y))
        .orderBy(col("mi_nano").desc, col("feature"))
    },
    Some {
      def mi(label: String, xExpr: String) =
        s"""x_$label AS (
           |  SELECT $xExpr AS x, l_returnflag AS y, CAST(count(*) AS BIGINT) AS nxy
           |  FROM lineitem GROUP BY 1, 2),
           |mx_$label AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM x_$label GROUP BY x),
           |my_$label AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM x_$label GROUP BY y),
           |n_$label AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM x_$label),
           |t_$label AS (
           |  SELECT c.nxy, n,
           |    CAST(round(CAST(c.nxy AS DOUBLE) / CAST(n AS DOUBLE) *
           |      ln(CAST(n AS DOUBLE) * CAST(c.nxy AS DOUBLE) /
           |         (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))) * 1e9, 0)
           |      AS BIGINT) AS t_nano,
           |    c.x, c.y
           |  FROM x_$label c JOIN mx_$label USING (x) JOIN my_$label USING (y)
           |       CROSS JOIN n_$label),
           |r_$label AS (
           |  SELECT '$label' AS feature, max(n) AS n,
           |    CAST(count(DISTINCT x) AS BIGINT) AS levels_x,
           |    CAST(count(DISTINCT y) AS BIGINT) AS levels_y,
           |    CAST(sum(t_nano) AS BIGINT) AS mi_nano,
           |    round(CAST(sum(t_nano) AS DOUBLE) / 1e9, 6) AS mi
           |  FROM t_$label)""".stripMargin
      s"""WITH ${mi("linestatus", "l_linestatus")},
         |${mi("qty_decile", "CAST(l_quantity AS BIGINT) // 10")},
         |${mi("discount_pct", "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)")}
         |SELECT * FROM (
         |  SELECT * FROM r_linestatus
         |  UNION ALL SELECT * FROM r_qty_decile
         |  UNION ALL SELECT * FROM r_discount_pct)
         |ORDER BY mi_nano DESC, feature""".stripMargin
    },
    "Each feature costs ONE (x, y) cell agg over the fact table (map-side " +
      "combinable, cells « rows); margins and terms run on the cell frame. " +
      "Ranking k features is k independent scans that share nothing — " +
      "embarrassingly parallel across an orchestrator at 100 TB.")

  /** q220 — A-stat: Benjamini-Hochberg FDR control over 1 000
    * per-supplier return-rate z-tests — which suppliers' return rates
    * genuinely differ from the global rate at 5% expected false
    * discoveries. The erfc p-values are computed from the SAME A&S
    * 7.1.26 polynomial on both engines, so the step-up comparisons
    * agree on identical IEEE doubles. */
  val q220 = Declared(
    "q220_bh_fdr", "A-stat,W2",
    (s, dir) => Experimentation.bhDiscoveries(
      Tables.lineitem(s, dir).select(col("l_suppkey").as("supplier"),
        col("l_returnflag")),
      "supplier", col("l_returnflag") === "R"),
    Some("""WITH g AS (
           |  SELECT supplier, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS successes
           |  FROM (SELECT l_suppkey AS supplier, l_returnflag FROM lineitem)
           |  GROUP BY supplier),
           |gl AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
           |              CAST(sum(successes) AS BIGINT) AS ts,
           |              CAST(count(*) AS BIGINT) AS m FROM g),
           |z AS (
           |  SELECT supplier, n, successes, m,
           |    (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) -
           |       CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) /
           |    sqrt(CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) *
           |         (1.0 - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) /
           |         CAST(n AS DOUBLE)) AS zv
           |  FROM g CROSS JOIN gl),
           |e AS (SELECT *, 1.0 / (1.0 + 0.3275911 * (abs(zv) / sqrt(2.0))) AS t,
           |             abs(zv) / sqrt(2.0) AS xa FROM z),
           |p AS (SELECT *,
           |    (((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
           |       - 0.284496736) * t + 0.254829592) * t) * exp(-(xa * xa)) AS pv
           |  FROM e),
           |r AS (SELECT *, CAST(row_number() OVER (ORDER BY pv, supplier)
           |                     AS BIGINT) AS p_rank FROM p),
           |k AS (SELECT max(CASE WHEN pv <= CAST(p_rank AS DOUBLE) * 5 / 100 / m
           |                      THEN p_rank ELSE 0 END) AS kk FROM r)
           |SELECT supplier, n, successes,
           |  successes * 1000000 // n AS rate_ppm,
           |  CAST(round(zv * 1000, 0) AS BIGINT) AS z_milli,
           |  CAST(round(pv * 1e9, 0) AS BIGINT) AS p_nano,
           |  p_rank, p_rank <= kk AS discovery
           |FROM r CROSS JOIN k
           |ORDER BY p_rank""".stripMargin),
    "The fact pass is one supplier-keyed agg; p-values, ranks and the step-up " +
      "cutoff all run on |groups| rows. The global p-rank uses the range-shuffle " +
      "row-number (no single-partition window), so a million hypotheses rank in " +
      "parallel; m and the cutoff broadcast back as two scalars.")

  /** q221 — A-stat: CUPED variance reduction — pre-1998 customer spend
    * as the covariate for post-1998 spend under a custkey-parity
    * pseudo-experiment: adjusted arm means plus the experiment-level
    * θ and realized variance-reduction fraction (ρ², in ppm). Exact
    * decimal sums; double finish mirrored in the oracle. */
  val q221 = Declared(
    "q221_cuped", "A-stat",
    (s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val cut = lit("1998-01-01").cast("timestamp")
      val units = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(when(col("o_orderdate") < cut, cents).otherwise(0L))
            .as("x_cents"),
          sum(when(col("o_orderdate") >= cut, cents).otherwise(0L))
            .as("y_cents"))
        .withColumn("arm", expr("o_custkey % 2"))
      Experimentation.cuped(units, "x_cents", "y_cents", "arm")
        .orderBy(col("arm"))
    },
    Some("""WITH u AS (
           |  SELECT o_custkey,
           |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
           |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      ELSE 0 END) AS BIGINT) AS x,
           |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
           |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      ELSE 0 END) AS BIGINT) AS y,
           |    o_custkey % 2 AS arm
           |  FROM orders GROUP BY o_custkey),
           |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(x) AS HUGEINT) AS sxa,
           |             CAST(sum(y) AS HUGEINT) AS sya
           |      FROM u GROUP BY arm),
           |g AS (SELECT CAST(count(*) AS HUGEINT) AS gn,
           |             CAST(sum(x) AS HUGEINT) AS sx,
           |             CAST(sum(y) AS HUGEINT) AS sy,
           |             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           |             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           |             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           |      FROM u),
           |f AS (SELECT arm, n, sxa, sya,
           |             gn * sxy - sx * sy AS covn,
           |             gn * sxx - sx * sx AS varx,
           |             gn * syy - sy * sy AS vary,
           |             CAST(gn * sxy - sx * sy AS DOUBLE) /
           |               CAST(gn * sxx - sx * sx AS DOUBLE) AS theta,
           |             sx, gn
           |      FROM a CROSS JOIN g)
           |SELECT arm, n,
           |  round(CAST(sya AS DOUBLE) / n / 100.0, 6) AS mean_y,
           |  round((CAST(sya AS DOUBLE) / n - theta *
           |         (CAST(sxa AS DOUBLE) / n - CAST(sx AS DOUBLE) / gn))
           |        / 100.0, 6) AS mean_y_adj,
           |  CAST(round(theta * 1e6, 0) AS BIGINT) AS theta_ppm,
           |  CAST(round(CAST(covn AS DOUBLE) * CAST(covn AS DOUBLE) /
           |             (CAST(varx AS DOUBLE) * CAST(vary AS DOUBLE)) * 1e6, 0)
           |       AS BIGINT) AS var_reduction_ppm
           |FROM f ORDER BY arm""".stripMargin),
    "One unit-grain agg (the only fact-table pass) + one arm-grain agg; the six " +
      "global sums broadcast to |arms| rows. A platform runs this per metric per " +
      "experiment — at 100 TB of exposures the two-shuffle shape is what makes " +
      "nightly readouts of hundreds of experiments feasible.")

  /** q222 — E2+/E6: label-propagation communities over the
    * supplier-part co-purchase graph (q100's bipartite node space) —
    * density clusters, not reachability: 3 synchronous min-tie-break
    * rounds, integer labels throughout, replayed exactly by a
    * 3-round unrolled oracle. */
  val q222 = Declared(
    "q222_label_prop", "E2+,E6",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + PartOffset).as("dst"))
      Graph.labelPropagation(edges, "src", "dst", iters = 3)
        .filter(col("node") < PartOffset)
        .select(col("node").as("supplier"), col("community"))
        .orderBy(col("supplier"))
    },
    Some {
      def round(i: Int) =
        s"""c$i AS (
           |  SELECT s.dst AS node, l.lab, count(*) AS c
           |  FROM sym s JOIN l${i - 1} l ON s.src = l.node GROUP BY 1, 2),
           |l$i AS (
           |  SELECT node, lab FROM (
           |    SELECT node, lab,
           |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_suppkey AS a, l_partkey + 1099511627776 AS b
         |  FROM lineitem),
         |sym AS (
         |  SELECT a AS src, b AS dst FROM e0
         |  UNION
         |  SELECT b AS src, a AS dst FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM sym),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT node AS supplier, lab AS community
         |FROM l3 WHERE node < 1099511627776
         |ORDER BY supplier""".stripMargin
    },
    "Each round is one node-keyed equi-join + one (dst, label) agg + one " +
      "per-node struct-min argmax — no window, no driver traffic, fixed rounds " +
      "chained as a single lazy plan. Labels and counts are integers, so the " +
      "result is partition-invariant; on a dedup pair graph this splits the " +
      "mega-component q70 would report into template families.")

  /** q223 — E2+/E6: HITS hubs & authorities on the DIRECTED
    * supplier→part graph — hub quality for suppliers, authority for
    * parts, in one fixed-round integer recursion (q100's PageRank
    * answers "globally central?"; HITS answers the asymmetric
    * question). 2 rounds, max-normalized in integer micro-units,
    * replayed by an unrolled oracle. */
  val q223 = Declared(
    "q223_hits", "E2+,E6",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + PartOffset).as("dst"))
      Graph.hits(edges, "src", "dst", iters = 2)
        .filter(col("node") < PartOffset)
        .select(col("node").as("supplier"), col("hub_u"), col("auth_u"))
        .orderBy(col("supplier"))
    },
    Some {
      def half(r: Int, prev: String) =
        s"""ar$r AS MATERIALIZED (
           |  SELECT e.dst AS node, CAST(sum(s.hub_u) AS BIGINT) AS a
           |  FROM e JOIN $prev s ON e.src = s.node GROUP BY e.dst),
           |am$r AS (SELECT max(a) AS amax FROM ar$r),
           |au$r AS MATERIALIZED (
           |         SELECT node, (a * 1000000) // amax AS auth_u
           |         FROM ar$r CROSS JOIN am$r),
           |hr$r AS MATERIALIZED (
           |  SELECT e.src AS node, CAST(sum(au.auth_u) AS BIGINT) AS h
           |  FROM e JOIN au$r au ON e.dst = au.node GROUP BY e.src),
           |hm$r AS (SELECT max(h) AS hmax FROM hr$r),
           |hu$r AS (SELECT node, (h * 1000000) // hmax AS hub_u
           |         FROM hr$r CROSS JOIN hm$r),
           |s$r AS MATERIALIZED (
           |  SELECT n.node,
           |    coalesce(hu$r.hub_u, 0) AS hub_u,
           |    coalesce(au$r.auth_u, 0) AS auth_u
           |  FROM nodes n
           |  LEFT JOIN hu$r ON n.node = hu$r.node
           |  LEFT JOIN au$r ON n.node = au$r.node)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l_suppkey AS src, l_partkey + 1099511627776 AS dst
         |  FROM lineitem),
         |nodes AS MATERIALIZED (
         |  SELECT src AS node FROM e UNION SELECT dst FROM e),
         |s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub_u,
         |              CAST(1000000 AS BIGINT) AS auth_u FROM nodes),
         |${half(1, "s0")},
         |${half(2, "s1")}
         |SELECT node AS supplier, hub_u, auth_u
         |FROM s2 WHERE node < 1099511627776
         |ORDER BY supplier""".stripMargin
    },
    "Each half-round is one node-keyed equi-join + one sum keyed on the other " +
      "side — uniform id keys, fixed rounds, the normalization max broadcasts " +
      "as a scalar. Integer floor-normalization keeps every intermediate a " +
      "long, so the trajectory is partition-invariant; degree×unit products " +
      "bound at 10¹⁵ for degrees to 10⁹.")

  /** q224 — A-stat: difference-in-differences — did odd-parity
    * customers' order values move differently across the 1998
    * boundary than even-parity ones? Four exact cell sums in one
    * pass; the estimate is a 4-cell double finish. */
  val q224 = Declared(
    "q224_did", "A-stat",
    (s, dir) => Experimentation.diffInDiff(
      Tables.orders(s, dir),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
      col("o_custkey") % 2 === 1,
      col("o_orderdate") >= lit("1998-01-01").cast("timestamp")),
    Some("""WITH c AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
           |    CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END AS t,
           |    CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS p
           |  FROM orders),
           |g AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(y) AS HUGEINT) AS sy
           |      FROM c GROUP BY t, p),
           |w AS (SELECT
           |  max(CASE WHEN t = 1 AND p = 0 THEN n END) AS n_t_pre,
           |  max(CASE WHEN t = 1 AND p = 1 THEN n END) AS n_t_post,
           |  max(CASE WHEN t = 0 AND p = 0 THEN n END) AS n_c_pre,
           |  max(CASE WHEN t = 0 AND p = 1 THEN n END) AS n_c_post,
           |  max(CASE WHEN t = 1 AND p = 0 THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS m_t_pre,
           |  max(CASE WHEN t = 1 AND p = 1 THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS m_t_post,
           |  max(CASE WHEN t = 0 AND p = 0 THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS m_c_pre,
           |  max(CASE WHEN t = 0 AND p = 1 THEN CAST(sy AS DOUBLE) / n / 100.0 END) AS m_c_post
           |  FROM g)
           |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           |  round(m_t_pre, 6) AS mean_t_pre, round(m_t_post, 6) AS mean_t_post,
           |  round(m_c_pre, 6) AS mean_c_pre, round(m_c_post, 6) AS mean_c_post,
           |  round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) AS did
           |FROM w""".stripMargin),
    "One map-side-combinable agg to FOUR groups; everything after is 4 rows. " +
      "The estimator subtracts the shared trend, which is why it survives the " +
      "non-randomized rollouts that CUPED (q221) cannot rescue.")

  /** q225 — A-stat: minimum detectable effect per customer segment —
    * the experiment-sizing table. z-constants are literals, so the
    * finish uses only correctly-rounded IEEE ops (×, ÷, √) and both
    * engines agree exactly. */
  val q225 = Declared(
    "q225_mde", "A-stat",
    (s, dir) => Experimentation.mdeByStratum(
        Tables.customer(s, dir), col("c_mktsegment"),
        col("c_acctbal") > 5000.0)
      .orderBy(col("stratum")),
    Some("""WITH g AS (
           |  SELECT c_mktsegment AS stratum, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS positives
           |  FROM customer GROUP BY 1)
           |SELECT stratum, n, positives,
           |  round(CAST(positives AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p,
           |  CAST(round((1.959964 + 0.841621) *
           |    sqrt(2.0 * (CAST(positives AS DOUBLE) / CAST(n AS DOUBLE)) *
           |         (1.0 - CAST(positives AS DOUBLE) / CAST(n AS DOUBLE)) /
           |         (CAST(n AS DOUBLE) / 2.0)) * 1e6, 0) AS BIGINT) AS mde_ppm
           |FROM g ORDER BY stratum""".stripMargin),
    "One stratum-keyed agg; the finish is |strata| rows. Run BEFORE an " +
      "experiment: a segment whose MDE exceeds the plausible effect size is a " +
      "segment the experiment cannot read — at 100 TB this table is what stops " +
      "underpowered launches, not the post-hoc p-value.")

  /** q226 — A-stat/ML: Bradley-Terry supplier strengths from pairwise
    * price contests inside each order — the preference-aggregation
    * op that turns LLM-judge-style "A beat B" records into one
    * ranking. 3 integer MM rounds, unrolled in the oracle. */
  val q226 = Declared(
    "q226_bradley_terry", "A-stat,E2+",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_linenumber"), col("l_suppkey"), col("l_extendedprice"))
      val a = li.select(col("l_orderkey"), col("l_linenumber").as("__ln1"),
        col("l_suppkey").as("__s1"), col("l_extendedprice").as("__p1"))
      val b = li.select(col("l_orderkey"), col("l_linenumber").as("__ln2"),
        col("l_suppkey").as("__s2"), col("l_extendedprice").as("__p2"))
      val games = a.join(b, "l_orderkey")
        .filter(col("__ln1") < col("__ln2") && col("__s1") =!= col("__s2") &&
          col("__p1") =!= col("__p2"))
        .select(
          when(col("__p1") > col("__p2"), col("__s1")).otherwise(col("__s2"))
            .as("winner"),
          when(col("__p1") > col("__p2"), col("__s2")).otherwise(col("__s1"))
            .as("loser"))
      Evaluation.bradleyTerry(games, col("winner"), col("loser"), iters = 3)
        .orderBy(col("strength_u").desc, col("item"))
    },
    Some {
      // every multiply-referenced CTE is MATERIALIZED: the oracle
      // engine otherwise INLINES each reference, and the per-round
      // double references compound to 2^rounds evaluations of the
      // pair-generation self-join (measured: minutes at sf0.1 vs
      // seconds materialized)
      def rnd(r: Int) =
        s"""d$r AS MATERIALIZED (
           |  SELECT np.i, np.j, np.n,
           |    CAST(round(CAST(np.n AS DOUBLE) * 1e12 /
           |      CAST(greatest(1, pi.p_u + pj.p_u) AS DOUBLE), 0) AS BIGINT) AS d
           |  FROM np JOIN p${r - 1} pi ON np.i = pi.item
           |          JOIN p${r - 1} pj ON np.j = pj.item),
           |ds$r AS (
           |  SELECT item, CAST(sum(d) AS HUGEINT) AS dd FROM (
           |    SELECT i AS item, d FROM d$r
           |    UNION ALL SELECT j AS item, d FROM d$r) GROUP BY item),
           |p$r AS MATERIALIZED (
           |  SELECT it.item,
           |    CAST(CAST(it.wins AS HUGEINT) * 1000000000000 //
           |         greatest(CAST(1 AS HUGEINT), ds$r.dd) AS BIGINT) AS p_u
           |  FROM items it JOIN ds$r ON it.item = ds$r.item)""".stripMargin
      s"""WITH g AS MATERIALIZED (
         |  SELECT CASE WHEN a.l_extendedprice > b.l_extendedprice
         |              THEN a.l_suppkey ELSE b.l_suppkey END AS w,
         |         CASE WHEN a.l_extendedprice > b.l_extendedprice
         |              THEN b.l_suppkey ELSE a.l_suppkey END AS l
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey
         |   AND a.l_linenumber < b.l_linenumber
         |   AND a.l_suppkey <> b.l_suppkey
         |   AND a.l_extendedprice <> b.l_extendedprice),
         |np AS MATERIALIZED (
         |       SELECT least(w, l) AS i, greatest(w, l) AS j,
         |              CAST(count(*) AS BIGINT) AS n
         |       FROM g GROUP BY 1, 2),
         |wn AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS wins
         |       FROM g GROUP BY 1),
         |items AS MATERIALIZED (
         |  SELECT u.item, CAST(sum(u.n) AS BIGINT) AS games,
         |         coalesce(max(wn.wins), 0) AS wins
         |  FROM (SELECT i AS item, n FROM np
         |        UNION ALL SELECT j AS item, n FROM np) u
         |  LEFT JOIN wn ON u.item = wn.item
         |  GROUP BY u.item),
         |p0 AS (SELECT item, CAST(1000000 AS BIGINT) AS p_u FROM items),
         |${(1 to 3).map(rnd).mkString(",\n")},
         |tot AS (SELECT CAST(sum(p_u) AS HUGEINT) AS t FROM p3)
         |SELECT it.item, it.games, it.wins, p3.p_u AS strength_u,
         |  CAST(CAST(p3.p_u AS HUGEINT) * 1000000 //
         |       greatest(CAST(1 AS HUGEINT), tot.t) AS BIGINT) AS share_ppm
         |FROM items it JOIN p3 ON it.item = p3.item CROSS JOIN tot
         |ORDER BY strength_u DESC, it.item""".stripMargin
    },
    "The game log reduces ONCE to the supplier-pair matrix (≤ items², far " +
      "sparser in practice); every MM round is pair-matrix-sized — two " +
      "item-keyed joins + one item-keyed sum. 10⁹ judge votes over 10³ models " +
      "iterate on ≤ 10⁶ pair rows; per-order pair fan-out is bounded (≤ 7 " +
      "line items), so game generation is linear in orders.")

  /** q227 — A-stat/E4: calibration audit + ECE — does the
    * quantity-derived pseudo-confidence mean what it says about
    * return rates? Fully integer (ppm quotients, count-weighted gap
    * sum), so both engines agree bit-for-bit. */
  val q227 = Declared(
    "q227_calibration", "A-stat,E4",
    (s, dir) => Evaluation.calibrationBins(
        Tables.lineitem(s, dir),
        expr("CAST(l_quantity AS BIGINT) * 20000"),
        (col("l_returnflag") === "R").cast("int"),
        bins = 10)
      .orderBy(col("bin")),
    Some("""WITH b AS (
           |  SELECT least(9, (CAST(l_quantity AS BIGINT) * 20000 * 10) // 1000000)
           |           AS bin,
           |         CAST(l_quantity AS BIGINT) * 20000 AS conf,
           |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
           |  FROM lineitem),
           |a AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(conf) AS BIGINT) AS sc,
           |             CAST(sum(y) AS BIGINT) AS sy
           |      FROM b GROUP BY 1),
           |c AS (SELECT bin, n, sc // n AS mean_conf_ppm,
           |             (sy * 1000000) // n AS rate_ppm
           |      FROM a),
           |d AS (SELECT *, abs(mean_conf_ppm - rate_ppm) AS gap_ppm FROM c),
           |e AS (SELECT CAST(sum(n * gap_ppm) // sum(n) AS BIGINT) AS ece_ppm
           |      FROM d)
           |SELECT bin, n, mean_conf_ppm, rate_ppm, gap_ppm, ece_ppm
           |FROM d CROSS JOIN e ORDER BY bin""".stripMargin),
    "One ≤-bins-group agg over the fact table with map-side combine + a scalar " +
      "broadcast-back. The audit every confidence-gated corpus filter needs " +
      "BEFORE its threshold is trusted; a miscalibrated judge score silently " +
      "reweights the training mix.")

  /** q228 — E2+/E6: modularity of the q222 label-propagation
    * partition — the quality gate that tells you whether those
    * communities are real structure or noise. Exact integer
    * numerator/denominator; the only double op is one
    * correctly-rounded division. */
  val q228 = Declared(
    "q228_modularity", "E2+,E6",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + PartOffset).as("dst"))
      // one symmetrize pays for both the LPA rounds and the audit
      val sym = Graph.symmetrize(edges, "src", "dst")
      val labels = Graph.labelPropagation(sym, "src", "dst", iters = 3,
        symmetric = true)
      Graph.modularity(sym, "src", "dst", labels, "node", "community",
        symmetric = true)
    },
    Some {
      def round(i: Int) =
        s"""c$i AS (
           |  SELECT s.dst AS node, l.lab, count(*) AS c
           |  FROM sym s JOIN l${i - 1} l ON s.src = l.node GROUP BY 1, 2),
           |l$i AS MATERIALIZED (
           |  SELECT node, lab FROM (
           |    SELECT node, lab,
           |      row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT l_suppkey AS a, l_partkey + 1099511627776 AS b
         |  FROM lineitem),
         |sym AS MATERIALIZED (
         |  SELECT a AS src, b AS dst FROM e0
         |  UNION
         |  SELECT b AS src, a AS dst FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM sym),
         |${(1 to 3).map(round).mkString(",\n")},
         |tagged AS (
         |  SELECT ls.lab AS cs, ld.lab AS cd
         |  FROM sym s JOIN l3 ls ON s.src = ls.node
         |              JOIN l3 ld ON s.dst = ld.node),
         |perc AS (
         |  SELECT cs AS community, CAST(count(*) AS BIGINT) AS deg2,
         |    CAST(sum(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS BIGINT) AS in2
         |  FROM tagged GROUP BY 1),
         |mm AS (SELECT CAST(count(*) // 2 AS BIGINT) AS m FROM sym),
         |t AS (SELECT 2 * m * in2 - deg2 * deg2 AS tt
         |      FROM perc CROSS JOIN mm),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |             CAST(sum(tt) AS BIGINT) AS q_num FROM t)
         |SELECT n_communities, m, q_num, 4 * m * m AS q_den,
         |  round(CAST(q_num AS DOUBLE) / CAST(4 * m * m AS DOUBLE), 6)
         |    AS modularity
         |FROM a CROSS JOIN mm""".stripMargin
    },
    "Two node-keyed joins (labels onto each endpoint) + two community-keyed " +
      "aggs — the same key discipline as the LPA rounds it audits. Run after " +
      "every community detection at scale: acting on a Q≈0 partition (routing, " +
      "dedup pools) is acting on noise.")

  /** q229 — A-stat/eval: IPS off-policy evaluation — from decisions
    * logged under uniform-over-k randomization (the first line's
    * supplier), estimate the reward of the deterministic min-supplier
    * routing policy. Fully integer Horvitz-Thompson estimator. */
  val q229 = Declared(
    "q229_ips_policy_value", "A-stat",
    (s, dir) => {
      val per = Tables.lineitem(s, dir).groupBy(col("l_orderkey")).agg(
        countDistinct(col("l_suppkey")).as("k"),
        min(col("l_suppkey")).as("target"),
        max(when(col("l_linenumber") === 1, col("l_suppkey"))).as("logged"),
        max(when(col("l_linenumber") === 1,
          when(col("l_returnflag") =!= "R", 1L).otherwise(0L))).as("reward"))
      Experimentation.ipsPolicyValue(per, col("logged"), col("target"),
        col("reward"), expr("1000000L div k"))
    },
    Some("""WITH per AS (
           |  SELECT l_orderkey,
           |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS k,
           |    min(l_suppkey) AS target,
           |    max(CASE WHEN l_linenumber = 1 THEN l_suppkey END) AS logged,
           |    max(CASE WHEN l_linenumber = 1 THEN
           |      CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END END) AS reward
           |  FROM lineitem GROUP BY l_orderkey),
           |w AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN logged = target THEN 1 ELSE 0 END)
           |      AS BIGINT) AS matches,
           |    CAST(sum(CASE WHEN logged = target THEN reward ELSE 0 END)
           |      AS BIGINT) AS matched_reward,
           |    CAST(sum(CASE WHEN logged = target THEN
           |      (CAST(reward AS HUGEINT) * 1000000 * 1000000) //
           |        (1000000 // k)
           |      ELSE 0 END) AS HUGEINT) AS wsum,
           |    CAST(sum(reward) AS HUGEINT) AS sr
           |  FROM per)
           |SELECT n, matches, matched_reward,
           |  CAST(wsum // n AS BIGINT) AS value_ppm,
           |  CAST((sr * 1000000) // n AS BIGINT) AS naive_value_ppm
           |FROM w""".stripMargin),
    "One order-grain agg + one scalar agg — no row ever leaves its partition " +
      "twice. The gate for router changes (which model serves which prompt) " +
      "evaluated on logs alone; `matches` exposes the IPS variance caveat " +
      "before anyone trusts the point estimate.")

  /** q230 — A-stat: post-stratification treatment effect — the
    * order-priority-adjusted spend gap between custkey parities:
    * per-stratum arm means (exact sums) and the share-weighted ATE
    * with per-stratum micro-quantized terms. */
  val q230 = Declared(
    "q230_strat_ate", "A-stat",
    (s, dir) => Experimentation.stratifiedAte(
        Tables.orders(s, dir), col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        col("o_custkey") % 2 === 1)
      .orderBy(col("stratum")),
    Some("""WITH c AS (
           |  SELECT o_orderpriority AS stratum,
           |    CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END AS t,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           |  FROM orders),
           |g AS (SELECT stratum, t, CAST(count(*) AS BIGINT) AS nn,
           |             CAST(sum(y) AS HUGEINT) AS s
           |      FROM c GROUP BY 1, 2),
           |st AS (
           |  SELECT stratum, CAST(sum(nn) AS BIGINT) AS n,
           |    max(CASE WHEN t = 1 THEN nn END) AS n_t,
           |    max(CASE WHEN t = 0 THEN nn END) AS n_c,
           |    max(CASE WHEN t = 1 THEN s END) AS s_t,
           |    max(CASE WHEN t = 0 THEN s END) AS s_c
           |  FROM g GROUP BY stratum),
           |f AS (
           |  SELECT stratum, n, n_t, n_c,
           |    round(CAST(s_t AS DOUBLE) / n_t / 100.0, 6) AS mean_t,
           |    round(CAST(s_c AS DOUBLE) / n_c / 100.0, 6) AS mean_c,
           |    round(CAST(s_t AS DOUBLE) / n_t / 100.0 -
           |          CAST(s_c AS DOUBLE) / n_c / 100.0, 6) AS diff,
           |    CAST(round(CAST(n AS DOUBLE) *
           |      (CAST(s_t AS DOUBLE) / n_t / 100.0 -
           |       CAST(s_c AS DOUBLE) / n_c / 100.0) * 1e6, 0) AS BIGINT)
           |      AS term
           |  FROM st),
           |tot AS (
           |  SELECT CAST(sum(term) AS BIGINT) // CAST(sum(n) AS BIGINT)
           |           AS ate_micro
           |  FROM f WHERE n_t IS NOT NULL AND n_c IS NOT NULL)
           |SELECT stratum, n, n_t, n_c, mean_t, mean_c, diff, ate_micro
           |FROM f CROSS JOIN tot ORDER BY stratum""".stripMargin),
    "One (stratum, arm) agg over the fact table; the ATE is a |strata|-row " +
      "rollup whose scalar broadcasts back. The adjustment that answers " +
      "'is the gap just mix shift?' — the first objection to any " +
      "non-randomized comparison at warehouse scale.")

  val all: Seq[Declared] = Seq(q217, q218, q219, q220, q221, q222,
    q223, q224, q225, q226, q227, q228, q229, q230)
}
