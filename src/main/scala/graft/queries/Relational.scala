package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator coverage (SURVEY.md §2.2-§2.8): projections,
  * filters, equi/semi/anti joins, multi-function aggregation, windows,
  * set operations, rollup/cube, distinct aggregates, binning, scalar
  * string/date functions.
  *
  * Every query here is declarative DataFrame code — Catalyst gets
  * predicate pushdown, column pruning and join planning; dimension
  * tables are broadcast explicitly where we know they are small at any
  * scale (region/nation are bounded; customer is bounded per TPC-H
  * scaling rules relative to lineitem).
  */
object Relational {

  private def t(name: String)(implicit sd: (SparkSession, String)): DataFrame =
    Tables.load(sd._1, sd._2, name)

  /** q01 — A1/F1: multi-function multi-column aggregation (TPC-H Q1 shape).
    * One hash-aggregate pass computes the func × column product that the
    * reference computes with per-row applies
    * (reference: src/data_preprocessing.py:510-513).
    * Scale: partial (map-side) agg + 2-key final agg; output cardinality
    * is tiny (|flags|×|status|), no skew concern. */
  val q01 = Declared(
    "q01_agg_multi", "A1,F1,P5",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("lineitem")
        .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          // prices have 2 decimal digits and discounts 2 → the product is
          // 4-decimal-exact; rounding at 4 can never land on a .5 tie
          // (where Spark HALF_UP and DuckDB would disagree)
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          (round(sum(col("l_discount")), 2) / count(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice), 2) AS sum_base_price,
           |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           |  round(avg(l_quantity), 4) AS avg_qty,
           |  round(sum(l_discount), 2) / count(l_discount) AS avg_disc,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "Map-side partial agg shrinks 100TB scan to KB before the 2-key shuffle.")

  /** q02 — P1/P5: projection + selective filter; both must reach the
    * Parquet scan (PushedFilters / pruned ReadSchema). */
  val q02 = Declared(
    "q02_filter_project", "P1,P5",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("lineitem")
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate").between(
            lit("1997-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
           |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
           |FROM lineitem
           |WHERE l_quantity > 45
           |  AND l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
           |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    "Filter+projection pushdown: scan reads 6 of 11 columns, row groups skipped via min/max stats.")

  /** q03 — J1: chained equi joins (orders⋈customer⋈nation⋈region) + agg.
    * nation/region are bounded-size dims → broadcast; customer⋈orders is
    * the real shuffle, keyed on custkey (uniform, no skew). */
  val q03 = Declared(
    "q03_join_agg", "J1,A1",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("orders")
        .join(t("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
           |  count(*) AS n_orders
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name
           |ORDER BY r_name, n_name""".stripMargin),
    "nation/region broadcast (bounded dims); orders⋈customer shuffles on custkey — uniform key, AQE coalesces.")

  /** q04 — left-semi join (EXISTS): customers having at least one
    * high-value order. */
  val q04 = Declared(
    "q04_semi_join", "J-semi",
    (s, dir) => {
      implicit val sd = (s, dir)
      val big = t("orders").filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      t("customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
           |FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders
           |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
           |ORDER BY c_custkey""".stripMargin),
    "Semi join never materializes the probe side's payload; filter on orders pushes down before the join.")

  /** q05 — left-anti join (NOT EXISTS): customers with no orders at all. */
  val q05 = Declared(
    "q05_anti_join", "J-anti",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("customer")
        .join(t("orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name
           |FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |ORDER BY c_custkey""".stripMargin),
    "Anti join with column-pruned right side (single key column read from parquet).")

  /** q06 — W2/O-window: ranking windows (row_number/rank/dense_rank),
    * deterministic composite sort key (reference nsmallest keeps first
    * occurrence ⇒ row_number with id tie-break,
    * src/data_preprocessing.py:553). */
  val q06 = Declared(
    "q06_window_rank", "W2",
    (s, dir) => {
      implicit val sd = (s, dir)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t("customer")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 5)
        .select(col("c_mktsegment"), col("rn"), col("rnk"), col("drnk"),
          col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },
    Some("""SELECT c_mktsegment, rn, rnk, drnk, c_custkey, acctbal
           |FROM (
           |  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
           |    row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
           |  FROM customer
           |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
           |) WHERE rn <= 5
           |ORDER BY c_mktsegment, rn""".stripMargin),
    "Single shuffle on the partition key; top-k-per-group stays distributed (no driver collect).")

  /** q07 — analytic + frame windows: lag and running sum per customer
    * over order history (rowsBetween unboundedPreceding..current). */
  val q07 = Declared(
    "q07_window_running", "W-frame",
    (s, dir) => {
      implicit val sd = (s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t("orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("running_total",
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
        .withColumn("next_price", round(lead(col("o_totalprice"), 1).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          col("running_total"), col("prev_price"), col("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
           |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate ASC, o_orderkey ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS prev_price,
           |  round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS next_price
           |FROM orders
           |WHERE o_custkey <= 100
           |ORDER BY o_custkey, o_orderkey""".stripMargin),
    "Running-sum frame is O(1) per row; one shuffle on o_custkey shared by all three window functions.")

  /** q08 — O1: global top-k with total order (composite tie-break key). */
  val q08 = Declared(
    "q08_topk", "O1",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
    },
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey ASC
           |LIMIT 20""".stripMargin),
    "Spark plans TakeOrderedAndProject: per-partition top-k, k-merge on driver — no full sort at 100TB.")

  /** q09 — U3: distinct on a composite key. */
  val q09 = Declared(
    "q09_distinct", "U3",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("lineitem").select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT DISTINCT l_returnflag, l_linestatus
           |FROM lineitem
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "Distinct = partial-agg dedup before shuffle; tiny output.")

  /** q10 — U1: unionByName with a missing column
    * (reference append(sort=True) aligns by name, null-fills —
    * src/data_preprocessing.py:441). */
  val q10 = Declared(
    "q10_union_by_name", "U1",
    (s, dir) => {
      implicit val sd = (s, dir)
      val rich = t("customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
      val poor = t("customer").filter(col("c_acctbal") < -900)
        .select(col("c_custkey"), col("c_name")) // acctbal column missing on purpose
      rich.unionByName(poor, allowMissingColumns = true)
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
           |FROM customer WHERE c_acctbal > 9000
           |UNION ALL
           |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS acctbal
           |FROM customer WHERE c_acctbal < -900
           |ORDER BY c_custkey""".stripMargin),
    "Union is a no-shuffle concat of partition lists; name alignment is plan-time only.")

  /** q11 — set intersect on key domains. */
  val q11 = Declared(
    "q11_intersect", "U-intersect",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("orders").filter(col("o_totalprice") > 250000).select(col("o_custkey").as("custkey"))
        .intersect(t("customer").filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey")))
        .orderBy(col("custkey"))
    },
    Some("""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
           |INTERSECT
           |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
           |ORDER BY custkey""".stripMargin),
    "Intersect plans as dedup + left-semi hash join on the key.")

  /** q12 — set except (customers minus purchasers). */
  val q12 = Declared(
    "q12_except", "U-except",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("customer").select(col("c_custkey").as("custkey"))
        .except(t("orders").select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    },
    Some("""SELECT c_custkey AS custkey FROM customer
           |EXCEPT
           |SELECT o_custkey AS custkey FROM orders
           |ORDER BY custkey""".stripMargin),
    "Except = dedup + left-anti join; both sides column-pruned to the key.")

  /** q13 — rollup with subtotal rows; COALESCE labels avoid cross-engine
    * NULL-ordering divergence in the comparison. */
  val q13 = Declared(
    "q13_rollup", "A-rollup",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("orders")
        .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("revenue"), col("n"))
        .orderBy(col("nation"), col("priority"))
    },
    Some("""SELECT coalesce(n_name, 'ALL') AS nation,
           |  coalesce(o_orderpriority, 'ALL') AS priority,
           |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY ROLLUP (n_name, o_orderpriority)
           |ORDER BY nation, priority""".stripMargin),
    "Rollup expands grouping sets before the shuffle; same single exchange as a flat groupBy.")

  /** q14 — cube over two low-cardinality dimensions. */
  val q14 = Declared(
    "q14_cube", "A-cube",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           |  coalesce(l_linestatus, 'ALL') AS linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
           |FROM lineitem
           |GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY returnflag, linestatus""".stripMargin),
    "Cube multiplies rows 4× pre-shuffle here (2 dims); acceptable — dims are bounded-cardinality.")

  /** q15 — exact distinct aggregates (countDistinct); the approximate
    * variant (approx_count_distinct / HLL) is engine-specific and is
    * exercised in unit tests instead of the cross-engine oracle. */
  val q15 = Declared(
    "q15_distinct_agg", "A-distinct",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("customer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"),
          (round(sum(col("c_acctbal")), 2) / count(col("c_acctbal"))).as("avg_bal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
           |  count(*) AS n_customers, round(sum(c_acctbal), 2) / count(c_acctbal) AS avg_bal
           |FROM customer
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin),
    "Exact distinct expands by the distinct key pre-shuffle; at 100TB prefer approx_count_distinct (HLL, mergeable sketches).")

  /** q16 — A9: equal-width binning (pd.cut analog). Bucket index is
    * exact integer arithmetic in both engines; min/max come from a
    * broadcast 1-row aggregate, not a driver collect. */
  val q16 = Declared(
    "q16_binning", "A9,O2",
    (s, dir) => {
      implicit val sd = (s, dir)
      val li = t("lineitem")
      val bounds = li.agg(min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      li.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          least(floor((col("l_extendedprice") - col("mn")) / ((col("mx") - col("mn")) / 10)),
            lit(9)).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("l_extendedprice")), 2) / count(col("l_extendedprice"))).as("avg_price"))
        .orderBy(col("bucket"))
    },
    Some("""WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem)
           |SELECT CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 10)), 9) AS INT) AS bucket,
           |  count(*) AS n, round(sum(l_extendedprice), 2) / count(l_extendedprice) AS avg_price
           |FROM lineitem, b
           |GROUP BY 1
           |ORDER BY bucket""".stripMargin),
    "Bounds agg is 1 row broadcast back; binning itself is a map-only expression, no extra shuffle.")

  /** q17 — F1-F3: string scalar functions (concat_ws naming contract,
    * replace, upper/substr). */
  val q17 = Declared(
    "q17_string_funcs", "F1,F2,F3",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("part")
        .withColumn("type_key", concat_ws("_", col("p_brand"), upper(substring(col("p_type"), 1, 5))))
        .withColumn("type_slug", regexp_replace(col("p_type"), " ", "-"))
        .groupBy(col("type_key"), col("type_slug"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("p_retailprice")), 2) / count(col("p_retailprice"))).as("avg_price"))
        .orderBy(col("type_key"), col("type_slug"))
    },
    Some("""SELECT concat_ws('_', p_brand, upper(substr(p_type, 1, 5))) AS type_key,
           |  replace(p_type, ' ', '-') AS type_slug,
           |  count(*) AS n, round(sum(p_retailprice), 2) / count(p_retailprice) AS avg_price
           |FROM part
           |GROUP BY 1, 2
           |ORDER BY type_key, type_slug""".stripMargin),
    "Pure codegen'd string expressions inside one WholeStageCodegen span.")

  /** q18 — F4-F6: date/time extraction and grouping by calendar parts. */
  val q18 = Declared(
    "q18_date_funcs", "F4,F5,F6",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("orders")
        .groupBy(year(col("o_orderdate")).cast("int").as("y"),
          quarter(col("o_orderdate")).cast("int").as("q"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("y"), col("q"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(quarter(o_orderdate) AS INT) AS q,
           |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
           |FROM orders
           |GROUP BY 1, 2
           |ORDER BY y, q""".stripMargin),
    "Calendar keys derived in the scan projection; grouping key cardinality bounded by the date span.")

  /** q19 — conditional aggregation (CASE WHEN inside agg). */
  val q19 = Declared(
    "q19_case_agg", "A-case",
    (s, dir) => {
      implicit val sd = (s, dir)
      t("lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(lit(0.0))), 2)
            .as("high_disc_rev"),
          count(when(col("l_tax") > 0.04, lit(1))).as("high_tax_n"),
          round(avg(when(col("l_quantity") > 25, col("l_quantity"))), 4).as("avg_big_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |  round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END), 2) AS high_disc_rev,
           |  count(CASE WHEN l_tax > 0.04 THEN 1 END) AS high_tax_n,
           |  round(avg(CASE WHEN l_quantity > 25 THEN l_quantity END), 4) AS avg_big_qty
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin),
    "Conditional aggs fuse into the same partial-agg pass — one scan, one shuffle.")

  val all: Seq[Declared] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19)
}
