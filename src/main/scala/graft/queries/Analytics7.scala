package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Graph, JaroWinkler, TextAnalysis}
import graft.ops.{Experimentation, Features}

/** Round-4 (batch 22): similarity-scored entity resolution on a native
  * Jaro-Winkler expression, corpus drift (Jensen-Shannon), mutual-
  * information feature ranking, multiple-testing control (Benjamini-
  * Hochberg), CUPED variance reduction, and label-propagation
  * communities. Same exactness discipline as the other Analytics
  * modules: integer/decimal corpus sums, double finishes mirrored
  * token-for-token in the oracle SQL. */
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

  val all: Seq[Declared] = Seq(q217, q218, q219, q220, q221, q222)
}
