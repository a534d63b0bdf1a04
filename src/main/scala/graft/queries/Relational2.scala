package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.ext.Similarity

/** Second relational batch: correlated-style subqueries, median,
  * calendar truncation, LIKE/regexp predicates, array ops over
  * embeddings, map-typed JSON, grouping sets through the spark.sql
  * surface. */
object Relational2 {

  /** q26 — correlated comparison: orders above their customer's average
    * order value (window form; the oracle states it as a correlated
    * subquery — same semantics, exercises the rewrite equivalence). */
  val q26 = Declared(
    "q26_above_cust_avg", "J1,W-frame",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, dir)
        .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("cust_avg") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders o1
           |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders o2
           |                            WHERE o2.o_custkey = o1.o_custkey)
           |ORDER BY o_orderkey""".stripMargin),
    "Window form shuffles once on custkey; the correlated-subquery phrasing would re-aggregate — " +
      "Catalyst rewrites both to the same join at scale.")

  /** q27 — median (continuous interpolation parity Spark/DuckDB). */
  val q27 = Declared(
    "q27_median", "A-quantile",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med_qty"),
          round(percentile(col("l_quantity"), lit(0.25)), 2).as("p25"),
          round(percentile(col("l_quantity"), lit(0.75)), 2).as("p75"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, median(l_quantity) AS med_qty,
           |  round(quantile_cont(l_quantity, 0.25), 2) AS p25,
           |  round(quantile_cont(l_quantity, 0.75), 2) AS p75
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin),
    "Exact median needs a per-group sort; percentile_approx (KLL-style sketch) is the mergeable " +
      "100TB path — here the discrete quantile doubles as its exact check on integer-valued data.")

  /** q28 — calendar truncation (date_trunc month). */
  val q28 = Declared(
    "q28_date_trunc", "F6",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("ship_month"))
    },
    Some("""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           |  count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           |GROUP BY 1
           |ORDER BY ship_month""".stripMargin),
    "Truncation is a scan-side expression; grouping key cardinality = months in range.")

  /** q29 — LIKE and regexp predicates. */
  val q29 = Declared(
    "q29_like_regexp", "F2,F3",
    (s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_type").like("%AND%") ||
          col("p_name").rlike("^[ab]"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n
           |FROM part
           |WHERE p_type LIKE '%AND%' OR regexp_matches(p_name, '^[ab]')
           |GROUP BY p_brand
           |ORDER BY p_brand""".stripMargin),
    "Both predicates evaluate in the scan; LIKE '%..%' can't use stats but costs one codegen'd pass.")

  /** q48 — array ops over embeddings: indexing, size, norm. */
  val q48 = Declared(
    "q48_array_ops", "E3,F-array",
    (s, dir) => {
      Tables.embeddings(s, dir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          max(size(col("embedding"))).as("dim"),
          round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("mean_first"),
          round(max(Similarity.norm(col("embedding"))), 6).as("max_norm"))
        .orderBy(col("label"))
    },
    Some("""SELECT label, count(*) AS n, CAST(max(len(embedding)) AS INT) AS dim,
           |  round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS mean_first,
           |  round(max(sqrt(list_dot_product(
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
           |    list_transform(embedding, x -> CAST(x AS DOUBLE))))), 6) AS max_norm
           |FROM embeddings
           |GROUP BY label
           |ORDER BY label""".stripMargin),
    "Array kernels (element_at/size/aggregate) are codegen'd per row — no explode, no shuffle " +
      "beyond the label agg.")

  /** q49 — JSON-in-string to typed MapType, then aggregate on the
    * extracted value. */
  val q49 = Declared(
    "q49_json_map", "F11",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
        // try_element_at: ANSI element_at throws MAP_KEY_DOES_NOT_EXIST
        // on a missing key; the oracle's json_extract_string yields NULL
        .withColumn("k", try_element_at(col("m"), lit("k")))
        .groupBy((col("user_id") % 10).as("user_mod"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
        .orderBy(col("user_mod"))
    },
    Some("""SELECT user_id % 10 AS user_mod,
           |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           |  count(json_extract_string(props, '$.k')) AS n
           |FROM events
           |GROUP BY 1
           |ORDER BY user_mod""".stripMargin),
    "from_json parses once into a typed map; at 100TB parse in the scan projection, " +
      "never per-extraction.")

  /** q50 — explicit GROUPING SETS through the spark.sql surface
    * (registered temp view), plus grouping() to disambiguate nulls. */
  val q50 = Declared(
    "q50_grouping_sets", "A-rollup,SQL",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q50")
      s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
              |  coalesce(l_linestatus, 'ALL') AS linestatus,
              |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
              |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
              |FROM lineitem_q50
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY returnflag, linestatus""".stripMargin)
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           |  coalesce(l_linestatus, 'ALL') AS linestatus,
           |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
           |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY returnflag, linestatus""".stripMargin),
    "Grouping sets expand pre-shuffle like rollup; identical SQL text runs on both engines — " +
      "the engine's SQL surface is part of the public API.")

  /** q52 — E6: salted two-phase aggregation must equal the plain
    * aggregate (the skew-mitigation path, oracle-checked against the
    * unsalted SQL). */
  val q52 = Declared(
    "q52_salted_agg", "E6,A1",
    (s, dir) => {
      val out = graft.ops.Salting.saltedAggregate(
        Tables.lineitem(s, dir), "l_returnflag", salt = 8, Seq("l_quantity"))
      out.select(col("l_returnflag"),
        round(col("sum_l_quantity"), 2).as("sum_qty"),
        col("count_l_quantity").as("n"),
        col("min_l_quantity").as("min_qty"),
        col("max_l_quantity").as("max_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
           |  count(l_quantity) AS n, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin),
    "Two-phase (key,salt)->key aggregation: a hot key spreads over 8 reducers in phase 1; " +
      "phase 2 merges 8 partial rows per key — the explicit partial/final split for skewed keys.")

  /** q56 — pivot: wide per-category columns (groupBy().pivot().agg());
    * oracle states it as conditional aggregation with the same output
    * names (cross-engine PIVOT syntax differs, semantics don't). */
  val q56 = Declared(
    "q56_pivot", "A-pivot",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .withColumnRenamed("F", "qty_F").withColumnRenamed("O", "qty_O")
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
           |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin),
    "Pivot with EXPLICIT value list compiles to conditional aggs in one pass; without the list " +
      "Spark runs an extra distinct job to discover values — always pin the list at scale.")

  /** The planted SCD2 fixture shared by q95 (the merge) and q123 (the
    * point-in-time read): open customer dimension + an updates batch
    * carrying every fate (%3 changed, %5 no-op, +100000 new). */
  private def scd2History(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val dim = c.select(col("c_custkey"), col("c_mktsegment"),
      to_date(lit("2020-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val updates = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), concat(lit("moved "), col("c_mktsegment")).as("c_mktsegment"))
      .unionByName(c.filter(col("c_custkey") % 5 === 1)
        .select(col("c_custkey"), col("c_mktsegment")))   // no-op batch rows
      .unionByName(c.filter(col("c_custkey") % 4 === 2)
        .select((col("c_custkey") + 100000).as("c_custkey"),
          lit("NEWSEGMENT").as("c_mktsegment")))
    graft.ops.Dimensions.scd2Apply(dim, updates, "c_custkey",
      Seq("c_mktsegment"), "valid_from", "valid_to", "2024-06-01")
  }

  /** The oracle-side twin of [[scd2History]]: the four-branch merge as
    * a CTE block ending in `hist(c_custkey, c_mktsegment, valid_from,
    * valid_to)` — ONE definition for both q95 and q123. */
  private val scd2HistSql =
    """dim AS (
      |  SELECT c_custkey, c_mktsegment,
      |         DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
      |  FROM customer),
      |upd AS (
      |  SELECT c_custkey, 'moved ' || c_mktsegment AS c_mktsegment
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 5 = 1
      |  UNION ALL
      |  SELECT c_custkey + 100000, 'NEWSEGMENT' FROM customer WHERE c_custkey % 4 = 2),
      |changed AS (
      |  SELECT d.c_custkey, d.c_mktsegment AS old_seg, u.c_mktsegment AS new_seg,
      |         d.valid_from
      |  FROM dim d JOIN upd u USING (c_custkey)
      |  WHERE d.c_mktsegment IS DISTINCT FROM u.c_mktsegment),
      |hist AS (
      |  SELECT c_custkey, old_seg AS c_mktsegment, valid_from,
      |         DATE '2024-06-01' AS valid_to
      |  FROM changed
      |  UNION ALL
      |  SELECT c_custkey, new_seg, DATE '2024-06-01', CAST(NULL AS DATE) FROM changed
      |  UNION ALL
      |  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to
      |  FROM dim d LEFT JOIN upd u USING (c_custkey)
      |  WHERE u.c_custkey IS NULL OR d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment
      |  UNION ALL
      |  SELECT u.c_custkey, u.c_mktsegment, DATE '2024-06-01', CAST(NULL AS DATE)
      |  FROM upd u
      |  WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.c_custkey = u.c_custkey))""".stripMargin

  /** q95 — J1/U-merge: SCD type-2 dimension merge. The updates batch
    * plants all four fates against the open customer dimension:
    * %3 = changed segment (close + reopen), %5 = 1 no-op update, new
    * keys (+100000), everything else dimension-only. The oracle
    * rebuilds the same output as four explicit UNION ALL branches. */
  val q95 = Declared(
    "q95_scd2_merge", "J1,U2",
    (s, dir) => scd2History(s, dir)
      .orderBy(col("c_custkey"), col("valid_from"), col("c_mktsegment")),
    Some(s"""WITH $scd2HistSql
            |SELECT c_custkey, c_mktsegment, valid_from, valid_to
            |FROM hist ORDER BY 1, 3, 2""".stripMargin),
    "One business-key full-outer equi-join (uniform hash key) + a scan-side conditional " +
      "explode — no second pass, output <= |dim| + 2|updates|; idempotent on a repeated " +
      "batch (re-apply yields only no-op branches). THE nightly warehouse merge shape.")

  /** q96 — X4 (pivot inverse): unpivot/melt — wide measure columns to
    * tall (measure, value) rows, the reshape every plotting/export
    * stage wants. Melt AFTER the aggregate: 6 rows × 3 measures, not
    * 3× the fact table. */
  val q96 = Declared(
    "q96_unpivot", "X4,A1",
    (s, dir) => {
      val agg = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(sum(col("l_discount")), 2).as("sum_disc"))
      agg.unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          variableColumnName = "measure",
          valueColumnName = "value")
        .orderBy(col("l_returnflag"), col("measure"))
    },
    Some("""WITH a AS (
           |  SELECT l_returnflag,
           |    round(sum(l_quantity), 2) AS sum_qty,
           |    round(sum(l_extendedprice), 2) AS sum_price,
           |    round(sum(l_discount), 2) AS sum_disc
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
           |UNION ALL
           |SELECT l_returnflag, 'sum_price', sum_price FROM a
           |UNION ALL
           |SELECT l_returnflag, 'sum_disc', sum_disc FROM a
           |ORDER BY 1, 2""".stripMargin),
    "Melt placement is the scale decision: after the aggregate it reshapes |groups| rows; " +
      "before it, it would triple the fact-table scan. Unpivot itself is a scan-side " +
      "generator — no shuffle beyond the agg that feeds it.")

  /** q97 — J1/U-diff: snapshot diff (batch CDC). The after-image
    * plants all three fates against orders: %7 = status flip (update),
    * %11 = 3 dropped (delete), %13 = 0 re-keyed (+10M) as inserts;
    * unchanged keys must emit nothing. The oracle rebuilds the diff
    * as three explicit branches. */
  val q97 = Declared(
    "q97_snapshot_diff", "J1,U2",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val before = o.select(col("o_orderkey"), col("o_orderstatus"))
      val after = o.filter(col("o_orderkey") % 11 =!= 3)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"))
        .unionByName(o.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            lit("N").as("o_orderstatus")))
      graft.ops.Dimensions.snapshotDiff(before, after, "o_orderkey",
          Seq("o_orderstatus"))
        .orderBy(col("o_orderkey"), col("change_type"))
    },
    Some("""WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st FROM orders),
           |a AS (
           |  SELECT o_orderkey AS k,
           |         CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS st
           |  FROM orders WHERE o_orderkey % 11 <> 3
           |  UNION ALL
           |  SELECT o_orderkey + 10000000, 'N' FROM orders WHERE o_orderkey % 13 = 0)
           |SELECT a.k AS o_orderkey, 'insert' AS change_type,
           |       a.st AS o_orderstatus, CAST(NULL AS VARCHAR) AS old_o_orderstatus
           |FROM a WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.k = a.k)
           |UNION ALL
           |SELECT b.k, 'delete', CAST(NULL AS VARCHAR), b.st
           |FROM b WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.k = b.k)
           |UNION ALL
           |SELECT b.k, 'update', a.st, b.st
           |FROM b JOIN a ON b.k = a.k
           |WHERE b.st IS DISTINCT FROM a.st
           |ORDER BY 1, 2""".stripMargin),
    "One full-outer equi-join on the business key; unchanged keys (the 100TB majority) " +
      "die in the filter immediately after the join — the diff output is minority-sized. " +
      "This is the kernel every incremental-materialization/CDC pipeline reduces to.")

  /** q99 — W2/W-frame: distributional ranking bands — ntile quartiles,
    * percent_rank and cume_dist per market segment. The window order is
    * made TOTAL (balance, then custkey) so tie handling can't differ
    * between engines; both ratios are the same int/int division of
    * identical operands, rounded to 6 digits on both sides purely as
    * belt-and-braces. */
  val q99 = Declared(
    "q99_rank_bands", "W2,W-frame",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("band"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment,
           |  ntile(4) OVER w AS band,
           |  round(percent_rank() OVER w, 6) AS pr,
           |  round(cume_dist() OVER w, 6) AS cd
           |FROM customer
           |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
           |ORDER BY c_custkey""".stripMargin),
    "All three ranking functions share ONE shuffle+sort on the segment key; each is O(1) " +
      "per row once sorted. Segments are bounded-cardinality but huge — at 100TB the " +
      "per-partition sort is the cost, and it's the same sort a single rank() would pay.")

  /** q108 — J-fuzzy/F2: fuzzy entity resolution — typo'd part names
    * (last char dropped) resolve against the DISTINCT clean-name
    * dictionary via blocked levenshtein: candidates must share the
    * 4-char prefix and sit within ±2 length, then the edit-distance
    * threshold decides. Levenshtein is the classic integer DP — both
    * engines agree exactly; the blocking predicate is part of the
    * declared semantics and the oracle applies it verbatim. */
  val q108 = Declared(
    "q108_fuzzy_match", "J-fuzzy,F2",
    (s, dir) => {
      val parts = Tables.part(s, dir)
      val dict = parts.select(col("p_name").as("clean_name")).distinct()
      val dirty = parts.filter(col("p_partkey") % 7 === 0)
        .select((col("p_partkey") + 10000000L).as("dirty_id"),
          expr("substring(p_name, 1, length(p_name) - 1)").as("dirty_name"))
      // the THRESHOLDED levenshtein (3-arg, returns -1 past the bound)
      // early-exits the DP at band width 2 instead of filling the full
      // len² table. Catalyst pushes the >= 0 predicate back into the
      // join residual (good — non-matches die before the shuffle
      // boundary), so block survivors evaluate the banded DP twice
      // (residual + projection) — |matches|-sized and cheap; a UDF
      // barrier to force single evaluation would cost more than it
      // saves.
      dirty.join(broadcast(dict),
          substring(col("dirty_name"), 1, 4) === substring(col("clean_name"), 1, 4) &&
          abs(length(col("dirty_name")) - length(col("clean_name"))) <= 2)
        .select(col("dirty_id"), col("clean_name"),
          expr("levenshtein(dirty_name, clean_name, 2)").as("distance"))
        .filter(col("distance") >= 0)
        .orderBy(col("dirty_id"), col("clean_name"))
    },
    Some("""WITH dict AS (SELECT DISTINCT p_name AS clean_name FROM part),
           |dirty AS (
           |  SELECT p_partkey + 10000000 AS dirty_id,
           |         substring(p_name, 1, length(p_name) - 1) AS dirty_name
           |  FROM part WHERE p_partkey % 7 = 0)
           |SELECT dirty_id, clean_name,
           |       CAST(levenshtein(dirty_name, clean_name) AS INT) AS distance
           |FROM dirty JOIN dict
           |  ON substring(dirty_name, 1, 4) = substring(clean_name, 1, 4)
           | AND abs(length(dirty_name) - length(clean_name)) <= 2
           | AND levenshtein(dirty_name, clean_name) <= 2
           |ORDER BY dirty_id, clean_name""".stripMargin),
    "Resolve against the DISTINCT entity dictionary, not the fact table — the dictionary " +
      "is vocabulary-sized, so it broadcasts and the edit-distance DP runs scan-side on " +
      "the dirty stream with zero shuffle. The prefix+length block bounds comparisons per " +
      "row; at 100TB the dictionary route is the difference between |dirty|·|block| and " +
      "|dirty|·|parts| DP evaluations.")

  /** q110 — A-array/W2/X4: list-typed aggregation output — each
    * customer's 3 largest order totals as an ORDERED array. collect_list
    * has no order guarantee, so elements are collected as (rank, value)
    * structs and array_sort'ed on the rank — deterministic under any
    * partitioning; ties in price break on o_orderkey in both engines.
    * The COMPARED projection renders the array as a cent-exact CSV
    * string (array elements are not hashable in the oracle harness's
    * canonicalizer); the array itself is built and sized upstream. */
  val q110 = Declared(
    "q110_array_agg_topk", "A-array,W2,X4",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .groupBy(col("o_custkey"))
        .agg(array_sort(collect_list(struct(col("rn"), col("o_totalprice"))))
          .as("top"))
        .select(col("o_custkey"),
          array_join(
            // totalprice is a DOUBLE holding cent-exact values: floor(x·100
            // + 0.5) is the portable cent quantizer (identical IEEE ops both
            // engines; double→long CAST truncation/rounding differs)
            expr("transform(top, t -> CAST(floor(t.o_totalprice * 100 + 0.5) AS BIGINT))"),
            ",").as("top_prices_csv"),
          size(col("top")).as("n_top"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey,
           |  array_to_string(list_transform(
           |    list_slice(list(o_totalprice ORDER BY o_totalprice DESC, o_orderkey),
           |               1, 3),
           |    x -> CAST(floor(x * 100 + 0.5) AS BIGINT)), ',') AS top_prices_csv,
           |  CAST(least(count(*), 3) AS INT) AS n_top
           |FROM orders
           |GROUP BY o_custkey
           |ORDER BY o_custkey""".stripMargin),
    "One shuffle shared by the ranking window and the per-key agg (same key); the array " +
      "is bounded at k elements, so list-typed results stay row-sized however large a " +
      "key's group is — the contract that makes array outputs safe at 100TB.")

  /** q112 — A1/E6: one-pass numeric data profile (describe) over four
    * lineitem measures — every stat for every column in a SINGLE
    * aggregate job; the oracle recomputes each column's stats as its
    * own aggregate and unions them. Decimal sums make the mean exact
    * cross-engine. */
  val q112 = Declared(
    "q112_profile", "A1,E6",
    (s, dir) => {
      graft.ops.Aggregates.profile(Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_name"))
    },
    Some(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
      s"""SELECT '$c' AS col_name, count($c) AS n,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max,
         |  CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS sum,
         |  CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / count($c) AS mean
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    "Algebraic stats fuse into ONE pass; each distinct count runs as its OWN column-" +
      "pruned pass (map-side partial dedup, tiny shuffle) — folding N countDistinct into " +
      "one aggregate makes Spark expand every row (N+1)× first, 3× slower here. The melt " +
      "reshapes a 1-row aggregate — free. This is the first pass every ingestion run " +
      "makes over new 100TB data; exact distinct swaps to HLL there.")

  /** q114 — C1-C8/A1/F1: a pipeline parsed FROM ITS SERIALIZED JSON
    * SPEC runs under the oracle gate — the artifact a user stores,
    * diffs and replays is itself correctness-checked end to end
    * (filter → multi-func group_agg block with the reference's
    * func_source_col naming → order). l_quantity is integer-valued, so
    * every aggregate is exact. */
  val q114 = Declared(
    "q114_pipeline_json", "C1-C8,A1,F1",
    (s, dir) => {
      val spec = """{
        "pipe": "li_rollup",
        "operations": [
          {"name": "recent", "function": "filter",
           "kwargs": {"condition": "l_quantity > 10"}},
          {"name": "rollup", "function": "group_agg",
           "kwargs": {"by": ["l_returnflag", "l_linestatus"],
                      "funcs": ["sum", "count", "min", "max"],
                      "value_cols": ["l_quantity"]}},
          {"name": "order", "function": "order_by",
           "kwargs": {"columns": ["l_returnflag", "l_linestatus"]}}
        ]
      }"""
      graft.pipeline.Pipeline.fromJson(spec).run(Tables.lineitem(s, dir))._1
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  sum(l_quantity) AS sum_l_quantity,
           |  count(l_quantity) AS count_l_quantity,
           |  min(l_quantity) AS min_l_quantity,
           |  max(l_quantity) AS max_l_quantity
           |FROM lineitem WHERE l_quantity > 10
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "The pipeline IR adds nothing to the plan: the parsed spec builds the same filter → " +
      "partial-agg → shuffle → final-agg Catalyst tree a hand-written query gets, so the " +
      "serialization layer is pure provenance — zero runtime tax at any scale.")

  /** q116 — A-quantile: exact INTERPOLATED quartiles per segment —
    * Spark `percentile` and DuckDB `quantile_cont` share the same
    * definition (linear interpolation at rank (n−1)·q over the sorted
    * values), so identical inputs give identical doubles; rounded to 6
    * as belt-and-braces. Complements q27's discrete median. */
  val q116 = Declared(
    "q116_quartiles", "A-quantile",
    (s, dir) => {
      Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(
          round(expr("percentile(c_acctbal, 0.25)"), 6).as("p25"),
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("p50"),
          round(expr("percentile(c_acctbal, 0.75)"), 6).as("p75"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
           |  round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
           |  round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
           |  round(quantile_cont(c_acctbal, 0.75), 6) AS p75
           |FROM customer
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin),
    "Exact percentile needs the per-group sort — the correctness kernel; the mergeable " +
      "100TB path is percentile_approx (KLL sketch, rank-error bound pinned in " +
      "SketchSpec). Segments are bounded-cardinality so the final agg is tiny.")

  /** q117 — A-array/F1: ordered STRING aggregation (listagg) — the
    * first five customer names per segment by custkey, comma-joined.
    * collect_list is order-free, so elements collect as (key, name)
    * structs, array_sort, slice, then join — deterministic under any
    * partitioning; the oracle's string_agg carries an explicit ORDER
    * BY inside the aggregate. */
  val q117 = Declared(
    "q117_string_agg", "A-array,F1",
    (s, dir) => {
      // rank BEFORE collecting so the agg buffer holds at most 5
      // structs per group (collecting the whole group then slicing
      // would be the unbounded-listagg anti-pattern this row forbids);
      // the group size rides the same window pass
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_name"), col("c_custkey"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(Window.partitionBy(col("c_mktsegment")))
            .as("n_cust"))
        .filter(col("rn") <= 5)
        .groupBy(col("c_mktsegment"))
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(rn, c_name))), t -> t.c_name)"),
          ",").as("first_names"),
          max(col("n_cust")).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH r AS (
           |  SELECT c_mktsegment, c_name, c_custkey,
           |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn,
           |    count(*) OVER (PARTITION BY c_mktsegment) AS n_customers
           |  FROM customer)
           |SELECT c_mktsegment,
           |  string_agg(c_name, ',' ORDER BY c_custkey)
           |    FILTER (WHERE rn <= 5) AS first_names,
           |  CAST(max(n_customers) AS BIGINT) AS n_customers
           |FROM r GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin),
    "The per-group payload is bounded at 5 names BEFORE the string join, so the " +
      "aggregation buffer stays row-sized however large the group — the same k-bound " +
      "contract as q110's arrays. Unbounded listagg is the anti-pattern at 100TB.")

  /** q118 — A-quantile: median absolute deviation per return flag —
    * the robust dispersion stat (immune to the outliers q115 flags).
    * Two exact grouped medians: the group median joins back (a
    * |groups|-row broadcast), absolute deviations re-aggregate.
    * Interpolation semantics match q116/q27. */
  val q118 = Declared(
    "q118_mad", "A-quantile,J1",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val med = li.groupBy(col("l_returnflag"))
        .agg(expr("median(l_quantity)").as("m"))
      li.join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag"), col("m"),
          abs(col("l_quantity") - col("m")).as("ad"))
        .groupBy(col("l_returnflag"))
        .agg(round(max(col("m")), 6).as("med"),
          round(expr("median(ad)"), 6).as("mad"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH m AS (
           |  SELECT l_returnflag, median(l_quantity) AS m
           |  FROM lineitem GROUP BY l_returnflag),
           |a AS (
           |  SELECT l.l_returnflag, m.m, abs(l.l_quantity - m.m) AS ad
           |  FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag)
           |SELECT l_returnflag, round(max(m), 6) AS med,
           |       round(median(ad), 6) AS mad
           |FROM a GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin),
    "Pass 1 is a tiny grouped median; its |groups|-row result broadcasts back, so pass 2 " +
      "costs one scan + one grouped median — no extra shuffle of the fact table. MAD is " +
      "what q115's 3-sigma gate upgrades to when the data has heavy tails.")

  /** q120 — E6/J1: SALTED fact⋈dim join — the hot-key spreader for
    * joins (q52 covers aggregation salting): the fact side gets a
    * row-random salt, the dim side replicates once per salt value, and
    * the (key, salt) equi-join spreads any hot key over `salt`
    * reducers. The oracle is the PLAIN join — salting must be
    * invisible in the result, which is the whole contract. */
  val q120 = Declared(
    "q120_salted_join", "E6,J1",
    (s, dir) => {
      val fact = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_totalprice"))
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.ops.Salting.saltedJoin(fact, dim, "o_custkey", salt = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          (round(sum(col("o_totalprice")), 2) / count(lit(1))).as("mean_price"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
           |  round(sum(o_totalprice), 2) / count(*) AS mean_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin),
    "The dim replicates salt× (bounded side only) and the join keys on (key, salt) — a " +
      "key holding 30% of a 100TB fact table spreads over 8 reducers instead of one. " +
      "AQE's skew split handles this adaptively; explicit salting is the portable, " +
      "planner-independent form, and the oracle proves it changes nothing.")

  /** q121 — A5/T2: HOPPING (sliding) event-time windows in batch —
    * 1-hour windows every 30 minutes, so each event lands in exactly
    * two windows. Spark's `window()` generator does the assignment; the
    * oracle derives each event's two covering window starts by
    * truncation arithmetic. Value sums ride DECIMAL then divide. */
  val q121 = Declared(
    "q121_hopping_windows", "A5,T2",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("mean_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("mean_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some("""WITH e AS (
           |  SELECT ts, event_type, value,
           |         make_timestamp(epoch_us(ts) // 1800000000 * 1800000000) AS t30
           |  FROM events),
           |x AS (
           |  SELECT t30 AS window_start, event_type, value FROM e
           |  UNION ALL
           |  SELECT t30 - INTERVAL 30 MINUTE, event_type, value FROM e)
           |SELECT window_start, event_type, count(*) AS n,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_value
           |FROM x GROUP BY window_start, event_type
           |ORDER BY window_start, event_type""".stripMargin),
    "The window generator expands each event window/slide = 2× BEFORE the shuffle — the " +
      "expansion factor is the overlap ratio, the knob to mind at 100TB (1h/30m is 2×; " +
      "1h/1m would be 60×). State and shuffle key on (window, type), both bounded.")

  /** q123 — J1/P8: the SCD2 READ side — point-in-time snapshots from
    * the history q95 writes: segment populations as the dimension
    * stood on each probe date. Before the merge date the NEWSEGMENT
    * keys and the moves must be invisible; after it, all present —
    * write once, read any point in time. */
  val q123 = Declared(
    "q123_scd2_asof", "J1,P8",
    (s, dir) => {
      // cached: both probe snapshots read the same merged history
      val hist = graft.core.OperatorCaches.cached(scd2History(s, dir))
      def snap(d: String) =
        graft.ops.Dimensions.snapshotAsOf(hist, "valid_from", "valid_to", d)
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .select(lit(d).as("as_of"), col("c_mktsegment"), col("n"))
      snap("2024-01-01").unionByName(snap("2024-12-01"))
        .orderBy(col("as_of"), col("c_mktsegment"))
    },
    Some(s"""WITH $scd2HistSql,
            |s AS (
            |  SELECT '2024-01-01' AS as_of, c_mktsegment FROM hist
            |  WHERE valid_from <= DATE '2024-01-01'
            |    AND (valid_to IS NULL OR valid_to > DATE '2024-01-01')
            |  UNION ALL
            |  SELECT '2024-12-01', c_mktsegment FROM hist
            |  WHERE valid_from <= DATE '2024-12-01'
            |    AND (valid_to IS NULL OR valid_to > DATE '2024-12-01'))
            |SELECT as_of, c_mktsegment, count(*) AS n
            |FROM s GROUP BY as_of, c_mktsegment
            |ORDER BY as_of, c_mktsegment""".stripMargin),
    "Snapshot reconstruction is a scan-side validity filter over the history — z-order " +
      "the history on (valid_from, valid_to) and the probe prunes to the covering files. " +
      "Write once (q95), read any point in time: the bitemporal read contract.")

  val all: Seq[Declared] =
    Seq(q26, q27, q28, q29, q48, q49, q50, q52, q56, q95, q96, q97, q99, q108,
      q110, q112, q114, q116, q117, q118, q120, q121, q123)
}
