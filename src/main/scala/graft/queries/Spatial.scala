package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.SpatialOps

/** Spatial operator coverage (SURVEY.md J2/J3, A2/A3/A4, A6, P5) via
  * relational reductions the DuckDB oracle can compute without a
  * spatial extension: sensor/feature coordinates are derived
  * deterministically from supplier/part keys with exact integer
  * arithmetic, so distances are exact doubles and rankings can never
  * diverge between engines.
  */
object Spatial {

  /** Synthetic sensor table: 100 sensors on an integer 100×100 grid. */
  private[queries] def sensors(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir).select(
      col("s_suppkey").as("id_sensor"),
      expr("CAST((s_suppkey * 37) % 100 AS DOUBLE)").as("x"),
      expr("CAST((s_suppkey * 73) % 100 AS DOUBLE)").as("y"),
      col("s_acctbal").as("v"))

  private val sensorsSql =
    """sensors AS (
      |  SELECT s_suppkey AS id_sensor,
      |    CAST((s_suppkey * 37) % 100 AS DOUBLE) AS x,
      |    CAST((s_suppkey * 73) % 100 AS DOUBLE) AS y,
      |    s_acctbal AS v
      |  FROM supplier)""".stripMargin

  /** Synthetic feature table: 2000 features (parts) with a value col. */
  private[queries] def features(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey").as("feature_id"),
      expr("CAST((p_partkey * 29) % 100 AS DOUBLE)").as("x"),
      expr("CAST((p_partkey * 53) % 100 AS DOUBLE)").as("y"),
      col("p_retailprice").as("val"))

  private val featuresSql =
    """feats AS (
      |  SELECT p_partkey AS feature_id,
      |    CAST((p_partkey * 29) % 100 AS DOUBLE) AS x,
      |    CAST((p_partkey * 53) % 100 AS DOUBLE) AS y,
      |    p_retailprice AS val
      |  FROM part)""".stripMargin

  /** q30 — J3/A4/W2: kNN aggregation, k=5, row_number tie-break on
    * feature id (reference nsmallest first-occurrence semantics). */
  val q30 = Declared(
    "q30_knn_agg", "J3,A4,W2",
    (s, dir) => {
      val out = SpatialOps.knnAggregate(
        sensors(s, dir).drop("v"), features(s, dir), k = 5,
        funcs = Seq("mean", "max", "count"), valueCols = Seq("val"),
        featureId = "feature_id", sourceName = "part")
      out.select(col("id_sensor"), col("x"), col("y"),
        round(col("mean_part_val"), 4).as("mean_part_val"),
        col("max_part_val"), col("count_part_val"))
        .orderBy(col("id_sensor"))
    },
    Some(s"""WITH $sensorsSql, $featuresSql,
            |ranked AS (
            |  SELECT id_sensor, s.x AS sx, s.y AS sy, val,
            |    row_number() OVER (PARTITION BY id_sensor
            |      ORDER BY (s.x-f.x)*(s.x-f.x) + (s.y-f.y)*(s.y-f.y) ASC,
            |               feature_id ASC) AS rn
            |  FROM sensors s, feats f)
            |SELECT id_sensor, sx AS x, sy AS y,
            |  round(avg(val), 4) AS mean_part_val,
            |  max(val) AS max_part_val,
            |  count(val) AS count_part_val
            |FROM ranked WHERE rn <= 5
            |GROUP BY id_sensor, sx, sy
            |ORDER BY id_sensor""".stripMargin),
    "Broadcast sensors × scan features, one window shuffle on id_sensor; " +
      "at 100TB compose gridBucketJoin in front to prune candidates before ranking.")

  /** q31 — J2/A2: buffer aggregation with empty-buffer null-row
    * semantics (left join). Mean derived as round(sum,2)/count for
    * exact cross-engine compare. */
  val q31 = Declared(
    "q31_buffer_agg", "J2,A2,P5",
    (s, dir) => {
      val out = SpatialOps.bufferAggregate(
        sensors(s, dir).drop("v"), features(s, dir), radius = 7.0,
        funcs = Seq("sum", "count"), valueCols = Seq("val"), sourceName = "part")
      out.select(col("id_sensor"), col("x"), col("y"),
        round(col("sum_part_val"), 2).as("sum_part_val"),
        col("count_part_val"),
        (round(col("sum_part_val"), 2) / col("count_part_val")).as("mean_part_val"))
        .orderBy(col("id_sensor"))
    },
    Some(s"""WITH $sensorsSql, $featuresSql,
            |stats AS (
            |  SELECT id_sensor,
            |    round(sum(val), 2) AS sum_part_val,
            |    count(val) AS count_part_val
            |  FROM sensors s JOIN feats f
            |    ON (s.x-f.x)*(s.x-f.x) + (s.y-f.y)*(s.y-f.y) <= 49
            |  GROUP BY id_sensor)
            |SELECT s.id_sensor, s.x, s.y, st.sum_part_val, st.count_part_val,
            |  st.sum_part_val / st.count_part_val AS mean_part_val
            |FROM sensors s LEFT JOIN stats st ON s.id_sensor = st.id_sensor
            |ORDER BY s.id_sensor""".stripMargin),
    "Radius predicate evaluates scan-side against broadcast sensors — features never shuffle; " +
      "empty buffers surface as null rows via the left join, matching reference NaN semantics.")

  /** q32 — A6: IDW interpolation onto a 10×10 lattice, power 2
    * (weights = 1/d² — no pow/sqrt, exact same IEEE ops both engines),
    * intended-math semantics with exact-hit guard. */
  val q32 = Declared(
    "q32_idw", "A6,J5,F7,F8",
    (s, dir) => {
      SpatialOps.idw(sensors(s, dir), "v", power = 2,
        x0 = 5.0, y0 = 5.0, nx = 10, ny = 10, stepX = 10.0, stepY = 10.0)
        .select(col("gx"), col("gy"), round(col("v_idw"), 4).as("v_idw"))
        .orderBy(col("gx"), col("gy"))
    },
    Some(s"""WITH $sensorsSql,
            |grid AS (
            |  SELECT 5.0 + CAST(i % 10 AS DOUBLE) * 10.0 AS gx,
            |         5.0 + CAST(i // 10 AS DOUBLE) * 10.0 AS gy
            |  FROM generate_series(0, 99) t(i)),
            |j AS (
            |  SELECT gx, gy, coalesce(v, 0.0) AS v,
            |    (gx-x)*(gx-x) + (gy-y)*(gy-y) AS d2
            |  FROM grid, sensors)
            |SELECT gx, gy,
            |  round(coalesce(
            |    max(CASE WHEN d2 = 0 THEN v END),
            |    sum(CASE WHEN d2 > 0 THEN v / d2 END)
            |      / sum(CASE WHEN d2 > 0 THEN 1.0 / d2 END)), 4) AS v_idw
            |FROM j
            |GROUP BY gx, gy
            |ORDER BY gx, gy""".stripMargin),
    "grid×sensors is bounded by the lattice size with sensors broadcast; groupBy lattice point " +
      "is uniform. At 100TB sensors stay the broadcast side; lattice partitions scale linearly.")

  /** q33 — A3/F12: raster buffer stats on the cell-table model with
    * nodata exclusion. Cell values are dyadic rationals (k/8) so sums
    * and means are EXACT doubles — no rounding needed anywhere. */
  val q33 = Declared(
    "q33_raster_stats", "A3,F12",
    (s, dir) => {
      val cells = s.range(4800).select(
        (col("id") % 3 + 1).cast("int").as("band"),
        expr("CAST((id div 3) % 40 AS DOUBLE) * 2.5").as("x"),
        expr("CAST((id div 3) div 40 AS DOUBLE) * 2.5").as("y"),
        expr("CASE WHEN (id * 7) % 11 = 0 THEN 0.0 ELSE CAST((id * 13) % 97 AS DOUBLE) / 8 END").as("value"))
      SpatialOps.rasterBufferStats(
        sensors(s, dir).filter(col("id_sensor") <= 40).drop("v"),
        cells, radius = 8.0, funcs = Seq("mean", "max", "count"))
        .orderBy(col("id_sensor"), col("band"))
    },
    Some(s"""WITH $sensorsSql,
            |cells AS (
            |  SELECT CAST(i % 3 + 1 AS INT) AS band,
            |    CAST((i // 3) % 40 AS DOUBLE) * 2.5 AS x,
            |    CAST((i // 3) // 40 AS DOUBLE) * 2.5 AS y,
            |    CASE WHEN (i * 7) % 11 = 0 THEN 0.0
            |         ELSE CAST((i * 13) % 97 AS DOUBLE) / 8 END AS value
            |  FROM generate_series(0, 4799) t(i))
            |SELECT id_sensor, band,
            |  avg(value) AS mean_value, max(value) AS max_value, count(value) AS count_value
            |FROM sensors s JOIN cells c
            |  ON (s.x-c.x)*(s.x-c.x) + (s.y-c.y)*(s.y-c.y) <= 64
            |WHERE value <> 0 AND id_sensor <= 40
            |GROUP BY id_sensor, band
            |ORDER BY id_sensor, band""".stripMargin),
    "Raster-as-cell-table turns rasterio per-row window reads into one parallel filter+agg; " +
      "nodata is a scan predicate; band pivot happens after the shrink.")

  /** q34 — J2 scale path: grid-bucket join must equal the plain
    * distance join (correctness of the cell decomposition + exact
    * post-filter). Oracle computes the naive join. */
  val q34 = Declared(
    "q34_grid_bucket_join", "J2-scale",
    (s, dir) => {
      SpatialOps.gridBucketJoin(sensors(s, dir).drop("v"), features(s, dir),
        radius = 10.0, cell = 10.0)
        .groupBy(col("id_sensor"))
        .agg(count(lit(1)).as("n_pairs"), round(sum(col("val")), 2).as("sum_val"))
        .orderBy(col("id_sensor"))
    },
    Some(s"""WITH $sensorsSql, $featuresSql
            |SELECT id_sensor, count(*) AS n_pairs, round(sum(val), 2) AS sum_val
            |FROM sensors s JOIN feats f
            |  ON (s.x-f.x)*(s.x-f.x) + (s.y-f.y)*(s.y-f.y) <= 100
            |GROUP BY id_sensor
            |ORDER BY id_sensor""".stripMargin),
    "The large×large strategy: explode sensors to <=4 covering cells, equi-join on cell id " +
      "(a real shuffle key instead of a cartesian), exact distance post-filter. " +
      "This is what replaces broadcast when both sides are 100TB-scale.")

  /** q35 — P5: bbox clip with margin (the reference's .cx[] prefilter)
    * as a standalone declared op. */
  val q35 = Declared(
    "q35_bbox_clip", "P5",
    (s, dir) => {
      val sub = sensors(s, dir).filter(col("id_sensor") <= 10)
      SpatialOps.bboxClip(features(s, dir), sub, margin = 5.0)
        .agg(count(lit(1)).as("n_features"), round(sum(col("val")), 2).as("sum_val"))
    },
    Some(s"""WITH $sensorsSql, $featuresSql,
            |b AS (SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
            |      FROM sensors WHERE id_sensor <= 10)
            |SELECT count(*) AS n_features, round(sum(val), 2) AS sum_val
            |FROM feats, b
            |WHERE feats.x BETWEEN xmin - 5 AND xmax + 5
            |  AND feats.y BETWEEN ymin - 5 AND ymax + 5""".stripMargin),
    "Bbox bounds come from a 1-row broadcast agg; the between predicates are plain Catalyst " +
      "filters → Parquet min/max row-group skipping applies at scale.")

  /** q36 — A7: ordinary kriging (linear variogram) onto a lattice,
    * DATA-DRIVEN (the full 100-sensor fleet) and now under the oracle
    * gate: the DuckDB side replays the ENTIRE solve — empirical
    * variogram (pair gammas left-folded in (i,j) order via
    * list_reduce), least-squares fit with its clamp semantics, K
    * assembly, 101×101 LU with DATA-DEPENDENT partial pivoting as a
    * recursive CTE (pivot = min index among the |column| maxima, row
    * swap by index relabel, one elimination rank-1 update per step),
    * then permuted forward/back substitution per lattice point (the
    * sequential j-folds as ordered-list reductions) and the Σλv /
    * Σλr+μ finishes. Every step is +,−,×,÷,√ in the op's pinned order
    * — correctly-rounded IEEE — so the doubles compare UNROUNDED,
    * extending q77's fixture proof to arbitrary data. The
    * MATERIALIZED hints matter: DuckDB inlines CTEs, and without them
    * the LU recursion would re-run inside every substitution step.
    * SCOPE: the oracle pins the fleet size n = 100 (the suppkey-mod-100
    * position lattice is SATURATED at the sf0.01 correctness gate and
    * above); at sf0.001 the fleet is 10 sensors and the pinned indices
    * do not apply — the gate SF is where the compare runs. */
  val q36 = Declared(
    "q36_kriging", "A7",
    (s, dir) => {
      graft.ops.Kriging.krige(sensors(s, dir), "v", model = "linear",
        x0 = 5.0, y0 = 5.0, nx = 10, ny = 10, stepX = 10.0, stepY = 10.0)
        .orderBy(col("gx"), col("gy"))
    },
    Some(s"""WITH RECURSIVE
            |$sensorsSql,
            |pts AS MATERIALIZED (
            |  SELECT x, y, v, CAST(row_number() OVER (ORDER BY x, y) - 1 AS INT) AS i
            |  FROM (SELECT x, y, avg(coalesce(v, 0.0)) AS v FROM sensors GROUP BY x, y)),
            |prs AS (
            |  SELECT a.i AS i, b.i AS j,
            |    sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d,
            |    0.5 * ((a.v - b.v) * (a.v - b.v)) AS g
            |  FROM pts a JOIN pts b ON b.i > a.i),
            |dmx AS (SELECT max(d) AS dmax FROM prs),
            |bins AS (
            |  SELECT b, (CAST(b AS DOUBLE) + 0.5) * w AS h,
            |    list_reduce(gl, (a, x) -> a + x) / CAST(cnt AS DOUBLE) AS g
            |  FROM (
            |    SELECT least(CAST(floor(d / (dmax / 6)) AS INT), 5) AS b,
            |      dmax / 6 AS w,
            |      list(g ORDER BY i, j) AS gl,
            |      count(*) AS cnt
            |    FROM prs CROSS JOIN dmx
            |    GROUP BY 1, 2)),
            |fitsums AS (
            |  SELECT CAST(count(*) AS DOUBLE) AS n,
            |    list_reduce(list(h ORDER BY b), (a, x) -> a + x) AS sh,
            |    list_reduce(list(g ORDER BY b), (a, x) -> a + x) AS sg,
            |    list_reduce(list(h * h ORDER BY b), (a, x) -> a + x) AS shh,
            |    list_reduce(list(h * g ORDER BY b), (a, x) -> a + x) AS shg
            |  FROM bins),
            |fit AS (
            |  SELECT n, sh, sg,
            |    CASE WHEN n * shh - sh * sh = 0 THEN 0.0
            |         ELSE (n * shg - sh * sg) / (n * shh - sh * sh) END AS araw
            |  FROM fitsums),
            |vp AS (
            |  SELECT greatest(araw, 0.0) AS va,
            |    greatest(0.0, (sg - araw * sh) / n) AS vb
            |  FROM fit),
            |km AS (
            |  SELECT i, j, 1e-10 * dd + (va * dd + vb) AS v
            |  FROM (SELECT a.i AS i, b.i AS j,
            |          sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dd
            |        FROM pts a CROSS JOIN pts b) CROSS JOIN vp
            |  UNION ALL SELECT i, 100, 1.0 FROM pts
            |  UNION ALL SELECT 100, i, 1.0 FROM pts
            |  UNION ALL SELECT 100, 100, 0.0),
            |lurec(step, kind, i, j, v) AS (
            |  SELECT 0, 0, i, j, v FROM km
            |  UNION ALL
            |  SELECT 0, 1, CAST(k AS INT), CAST(k AS INT), CAST(NULL AS DOUBLE)
            |  FROM range(101) r(k)
            |  UNION ALL
            |  SELECT step + 1, kind, i2, j,
            |    CASE WHEN kind = 1 THEN v
            |         WHEN i2 <= step THEN v
            |         WHEN j = step THEN v / dpv
            |         WHEN j > step THEN v - (aik / dpv) * akj
            |         ELSE v END
            |  FROM (
            |    SELECT step, kind, i2, j, v,
            |      max(CASE WHEN kind = 0 AND i2 = step AND j = step THEN v END)
            |        OVER () AS dpv,
            |      max(CASE WHEN kind = 0 AND i2 = step THEN v END)
            |        OVER (PARTITION BY kind, j) AS akj,
            |      max(CASE WHEN kind = 0 AND j = step THEN v END)
            |        OVER (PARTITION BY kind, i2) AS aik
            |    FROM (
            |      SELECT step, kind,
            |        CASE WHEN i = step THEN pv WHEN i = pv THEN step ELSE i END AS i2,
            |        j, v
            |      FROM (
            |        SELECT step, kind, i, j, v,
            |          min(CASE WHEN kind = 0 AND j = step AND i >= step
            |                AND abs(v) = mxv THEN i END) OVER () AS pv
            |        FROM (
            |          SELECT *,
            |            max(CASE WHEN kind = 0 AND j = step AND i >= step
            |                  THEN abs(v) END) OVER () AS mxv
            |          FROM lurec WHERE step < 101))))),
            |luf AS MATERIALIZED (SELECT i, j, v FROM lurec WHERE step = 101 AND kind = 0),
            |pivf AS MATERIALIZED (SELECT i AS pos, j AS orig FROM lurec WHERE step = 101 AND kind = 1),
            |grid AS MATERIALIZED (
            |  SELECT CAST(k AS BIGINT) AS pt,
            |    5.0 + CAST(k % 10 AS DOUBLE) * 10.0 AS gx,
            |    5.0 + CAST(k // 10 AS DOUBLE) * 10.0 AS gy
            |  FROM range(100) r(k)),
            |rhs AS MATERIALIZED (
            |  SELECT pt, i, 1e-10 * dd + (va * dd + vb) AS r
            |  FROM (SELECT g.pt, p.i,
            |          sqrt((g.gx - p.x) * (g.gx - p.x) + (g.gy - p.y) * (g.gy - p.y)) AS dd
            |        FROM grid g CROSS JOIN pts p) CROSS JOIN vp
            |  UNION ALL SELECT pt, 100, 1.0 FROM grid),
            |fwd(step, pt, idx, xv) AS (
            |  SELECT 0, r.pt, pf.pos, r.r
            |  FROM pivf pf JOIN rhs r ON r.i = pf.orig
            |  UNION ALL
            |  SELECT step + 1, pt, idx,
            |    CASE WHEN idx = step + 1
            |      THEN list_reduce(list_prepend(xv, tl), (a, x) -> a - coalesce(x, 0.0))
            |      ELSE xv END
            |  FROM (
            |    SELECT f.step, f.pt, f.idx, f.xv,
            |      list(CASE WHEN f.idx <= f.step THEN l.v * f.xv END)
            |        OVER (PARTITION BY f.pt ORDER BY f.idx
            |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tl
            |    FROM fwd f LEFT JOIN luf l ON l.i = f.step + 1 AND l.j = f.idx
            |    WHERE f.step < 100)),
            |fwdf AS MATERIALIZED (SELECT pt, idx, xv FROM fwd WHERE step = 100),
            |bck(step, pt, idx, xv) AS (
            |  SELECT 0, pt, idx, xv FROM fwdf
            |  UNION ALL
            |  SELECT step + 1, pt, idx,
            |    CASE WHEN idx = 100 - step
            |      THEN list_reduce(list_prepend(xv, tl), (a, x) -> a - coalesce(x, 0.0))
            |           / dii
            |      ELSE xv END
            |  FROM (
            |    SELECT b.step, b.pt, b.idx, b.xv,
            |      max(CASE WHEN b.idx = 100 - b.step THEN l.v END)
            |        OVER (PARTITION BY b.pt) AS dii,
            |      list(CASE WHEN b.idx > 100 - b.step THEN l.v * b.xv END)
            |        OVER (PARTITION BY b.pt ORDER BY b.idx
            |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tl
            |    FROM bck b LEFT JOIN luf l ON l.i = 100 - b.step AND l.j = b.idx
            |    WHERE b.step <= 100)),
            |lam AS MATERIALIZED (SELECT pt, idx, xv FROM bck WHERE step = 101),
            |estl AS (
            |  SELECT l.pt,
            |    list_reduce(list(l.xv * p.v ORDER BY l.idx), (a, x) -> a + x) AS est
            |  FROM lam l JOIN pts p ON p.i = l.idx
            |  GROUP BY l.pt),
            |esvl AS (
            |  SELECT l.pt,
            |    list_reduce(list(l.xv * r.r ORDER BY l.idx), (a, x) -> a + x) AS s
            |  FROM lam l JOIN rhs r ON r.pt = l.pt AND r.i = l.idx
            |  WHERE l.idx < 100
            |  GROUP BY l.pt),
            |lam100 AS (SELECT pt, xv FROM lam WHERE idx = 100)
            |SELECT g.gx, g.gy, e.est AS v_krig, sv.s + lm.xv AS v_krig_var
            |FROM grid g
            |JOIN estl e ON e.pt = g.pt
            |JOIN esvl sv ON sv.pt = g.pt
            |JOIN lam100 lm ON lm.pt = g.pt
            |ORDER BY gx, gy""".stripMargin),
    "Driver solves the (n+1)² system once (n = bounded sensor fleet); lattice evaluation " +
      "distributes with broadcast LU factors — no shuffle, scales linearly in grid size. " +
      "The oracle fixes n=100 (the fleet is position-saturated: suppkey mod 100) and " +
      "replays the identical IEEE op sequence, LU pivots included.")

  /** q37 — A2 through the GEOMETRY layer (VectorOps flagship): same
    * oracle as q31's relational reduction, but the Spark side goes
    * sensors→geometry structs→centroid extraction→bbox-pruned
    * st_distance — proving the geometry path computes exactly what the
    * x/y kernel (and DuckDB) compute. */
  val q37 = Declared(
    "q37_vector_buffer_agg", "A2,P4,P6,F9",
    (s, dir) => {
      import graft.geo.Geo
      val sGeo = sensors(s, dir).select(col("id_sensor"),
        Geo.stPoint(col("x"), col("y")).as("geometry"))
      val fGeo = features(s, dir).select(
        Geo.stPoint(col("x"), col("y")).as("geometry"), col("val"))
      val out = graft.ops.VectorOps.addBufferAggregatedData(
        sGeo, fGeo, radius = 7.0, funcs = Seq("sum", "count"),
        statCols = Seq("val"), sourceName = "part")
      out.select(col("id_sensor"),
        Geo.stX(col("geometry")).as("x"), Geo.stY(col("geometry")).as("y"),
        round(col("sum_part_val"), 2).as("sum_part_val"),
        col("count_part_val"),
        (round(col("sum_part_val"), 2) / col("count_part_val")).as("mean_part_val"))
        .orderBy(col("id_sensor"))
    },
    q31.oracle, // identical semantics to the x/y kernel reduction
    "Geometry reduces to centroid+bbox DOUBLE columns before the join; the exact st_distance " +
      "UDF runs only on bbox survivors — same plan skeleton as the kernel path.")

  /** q38 — E6 layout: Morton (Z-order) keys over the feature set —
    * the write-side data-skipping primitive (Layout.writeZordered
    * sorts by exactly this key; LayoutSpec proves the per-file bbox
    * shrink). The key is pure shift/mask arithmetic, so DuckDB
    * computes it identically bit for bit. */
  val q38 = Declared(
    "q38_zorder_key", "E6,F7",
    (s, dir) => {
      features(s, dir).select(col("feature_id"),
        graft.ops.Layout.zorderKey(col("x"), col("y"),
          0.0, 100.0, 0.0, 100.0, bits = 7).as("zkey"))
        .orderBy(col("feature_id"))
    },
    Some {
      val terms = (0 until 7).map(b =>
        s"(((qx >> $b) & 1) << ${2 * b}) + (((qy >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      s"""WITH $featuresSql,
         |q AS (
         |  SELECT feature_id,
         |    greatest(0, least(127, CAST(floor((x - 0.0) / 100.0 * 128.0) AS BIGINT))) AS qx,
         |    greatest(0, least(127, CAST(floor((y - 0.0) / 100.0 * 128.0) AS BIGINT))) AS qy
         |  FROM feats)
         |SELECT feature_id, $terms AS zkey
         |FROM q ORDER BY feature_id""".stripMargin
    },
    "Scan-side arithmetic; sorting the write by this key gives every parquet file a compact " +
      "2-D bbox, so min-max skipping prunes most files under any spatial predicate — the " +
      "write-side complement of bboxClip/cellJoin at 100TB.")

  /** q77 — A7 under the ORACLE gate: ordinary kriging on a portable
    * fixture. q36 (the data-driven fleet) stays rows-only because
    * arbitrary coordinates route through libm in ways SQL cannot
    * reproduce — but kriging itself is just +,−,×,÷,sqrt once
    * distances are sqrt(dx²+dy²) (all IEEE correctly-rounded), so with
    * a fixture whose every step is exact-portable, DuckDB can mirror
    * the ENTIRE solve bit-for-bit: empirical variogram → least-squares
    * fit (with its clamp semantics) → K assembly (ε-regularized) → LU
    * with the fixture's pinned pivot order (2,0,1,3 — KrigingSpec pins
    * it; first pivot is structurally row 2 since γ(d02=10) is the
    * column max for any a,b ≥ 0) → permuted forward/back substitution
    * per lattice point → Σλᵢvᵢ. The oracle's doubles are compared
    * UNROUNDED — a single mis-transliterated operation anywhere in the
    * chain would flip the hash. Sensor locations are Pythagorean
    * literals (distances 5 and 10 are exact); values come from the
    * documents table, so data flows end to end. */
  val q77 = Declared(
    "q77_kriging_exact", "A7",
    (s, dir) => {
      val sensors3 = graft.core.Tables.documents(s, dir).filter(col("doc_id") < 3)
        .select((col("doc_id") * 3).cast("double").as("x"),
          (col("doc_id") * 4).cast("double").as("y"),
          col("n_chars").cast("double").as("v"))
      graft.ops.Kriging.krige(sensors3, "v", model = "linear",
        x0 = 0, y0 = 0, nx = 4, ny = 4, stepX = 2.0, stepY = 3.0)
        .orderBy(col("gy"), col("gx"))
    },
    Some("""WITH s AS (
           |  SELECT
           |    max(CASE WHEN doc_id = 0 THEN CAST(n_chars AS DOUBLE) END) AS v0,
           |    max(CASE WHEN doc_id = 1 THEN CAST(n_chars AS DOUBLE) END) AS v1,
           |    max(CASE WHEN doc_id = 2 THEN CAST(n_chars AS DOUBLE) END) AS v2
           |  FROM documents WHERE doc_id < 3),
           |emp AS ( -- pair gammas; bins are fixture-fixed (d: 5, 10, 5; w = 10/3)
           |  SELECT *,
           |    (1 + 0.5) * (10.0 / 3) AS h1, (2 + 0.5) * (10.0 / 3) AS h2,
           |    (0.5 * ((v0 - v1) * (v0 - v1)) + 0.5 * ((v1 - v2) * (v1 - v2))) / 2 AS gb1,
           |    0.5 * ((v0 - v2) * (v0 - v2)) / 1 AS gb2
           |  FROM s),
           |fit AS ( -- least-squares line through 2 bins, clamp semantics as implemented
           |  SELECT *, greatest(araw, 0.0) AS a,
           |    greatest(0.0, ((gb1 + gb2) - araw * (h1 + h2)) / 2.0) AS b
           |  FROM (SELECT *,
           |      CASE WHEN 2.0 * (h1 * h1 + h2 * h2) - (h1 + h2) * (h1 + h2) = 0 THEN 0.0
           |           ELSE (2.0 * (h1 * gb1 + h2 * gb2) - (h1 + h2) * (gb1 + gb2))
           |                / (2.0 * (h1 * h1 + h2 * h2) - (h1 + h2) * (h1 + h2)) END AS araw
           |    FROM emp)),
           |km AS ( -- gamma at the three fixture distances; K is symmetric toeplitz here
           |  SELECT *,
           |    1e-10 * 0.0 + (a * 0.0 + b) AS y0g,
           |    1e-10 * 5.0 + (a * 5.0 + b) AS y5,
           |    1e-10 * 10.0 + (a * 10.0 + b) AS y10
           |  FROM fit),
           |lu AS ( -- LU with pivot order (2,0,1,3): row swaps 0<->2 at k=0, 1<->2 at k=1
           |  SELECT *, t32b / u22 AS m32x, t33b - (t32b / u22) * u23 AS u33
           |  FROM (SELECT *,
           |      t12 - m21 * t22 AS u22, t13 - m21 * t23 AS u23,
           |      t32 - m31x * t22 AS t32b, t33 - m31x * t23 AS t33b
           |    FROM (SELECT *, t11 / t21 AS m21, t31 / t21 AS m31x
           |      FROM (SELECT *,
           |          y0g - m10 * y5 AS t11, y5 - m10 * y0g AS t12, 1.0 - m10 * 1.0 AS t13,
           |          y5 - m20 * y5 AS t21, y10 - m20 * y0g AS t22, 1.0 - m20 * 1.0 AS t23,
           |          1.0 - m30 * y5 AS t31, 1.0 - m30 * y0g AS t32, 0.0 - m30 * 1.0 AS t33
           |        FROM (SELECT *, y5 / y10 AS m10, y0g / y10 AS m20, 1.0 / y10 AS m30
           |              FROM km))))),
           |grid AS (
           |  SELECT CAST(i % 4 AS DOUBLE) * 2.0 AS gx, CAST(i // 4 AS DOUBLE) * 3.0 AS gy
           |  FROM range(0, 16) t(i)),
           |rhs AS (
           |  SELECT gx, gy,
           |    1e-10 * sqrt((gx - 0.0) * (gx - 0.0) + (gy - 0.0) * (gy - 0.0))
           |      + (a * sqrt((gx - 0.0) * (gx - 0.0) + (gy - 0.0) * (gy - 0.0)) + b) AS r0,
           |    1e-10 * sqrt((gx - 3.0) * (gx - 3.0) + (gy - 4.0) * (gy - 4.0))
           |      + (a * sqrt((gx - 3.0) * (gx - 3.0) + (gy - 4.0) * (gy - 4.0)) + b) AS r1,
           |    1e-10 * sqrt((gx - 6.0) * (gx - 6.0) + (gy - 8.0) * (gy - 8.0))
           |      + (a * sqrt((gx - 6.0) * (gx - 6.0) + (gy - 8.0) * (gy - 8.0)) + b) AS r2,
           |    lu.* FROM grid CROSS JOIN lu),
           |fwd AS ( -- x = P*rhs = (r2, r0, r1, 1); sequential forward elimination
           |  SELECT *, ((1.0 - m30 * r2) - m31x * f1) - m32x * f2 AS f3
           |  FROM (SELECT *, (r1 - m10 * r2) - m21 * f1 AS f2
           |        FROM (SELECT *, r0 - m20 * r2 AS f1 FROM rhs))),
           |bck AS (
           |  SELECT *, (((r2 - y5 * l1) - y0g * l2) - 1.0 * l3) / y10 AS l0
           |  FROM (SELECT *, ((f1 - t22 * l2) - t23 * l3) / t21 AS l1
           |        FROM (SELECT *, (f2 - u23 * l3) / u22 AS l2
           |              FROM (SELECT *, f3 / u33 AS l3 FROM fwd)))),
           |out AS (
           |  SELECT gx, gy,
           |    (l0 * v0 + l1 * v1) + l2 * v2 AS v_krig,
           |    ((l0 * r0 + l1 * r1) + l2 * r2) + l3 AS v_krig_var
           |  FROM bck)
           |SELECT gx, gy, v_krig, v_krig_var FROM out
           |ORDER BY gy, gx""".stripMargin),
    "Same plan as q36 (driver solve, broadcast factors, shuffle-free lattice eval); the " +
      "fixture exists to make every double bit-portable so the hash compare is exact.")

  /** q109 — P6/F9: point-in-POLYGON containment through the real
    * geometry layer (`Geo.stIntersects` ray cast), hash-matched against
    * a SQL transliteration of the IDENTICAL crossing test (same
    * comparison, same division — identical IEEE operands both sides).
    * The pentagon's half-unit vertices are chosen so NO integer-lattice
    * sensor sits exactly on an edge (checked for the full 100×100
    * grid), so the boundary branch of stIntersects can never fire and
    * parity alone decides on both engines. */
  val q109 = Declared(
    "q109_point_in_polygon", "P6,F9",
    (s, dir) => {
      import graft.geo.Geo
      val verts = Seq((9.5, 8.5), (88.5, 12.5), (78.5, 83.5),
        (37.5, 93.5), (7.5, 57.5))
      val poly = Geo.stPolygon(array(verts.map { case (vx, vy) =>
        struct(lit(vx).as("x"), lit(vy).as("y")) }: _*))
      sensors(s, dir)
        .filter(Geo.stIntersects(Geo.stPoint(col("x"), col("y")), poly))
        .select(col("id_sensor"), col("x"), col("y"), col("v"))
        .orderBy(col("id_sensor"))
    },
    Some(s"""WITH $sensorsSql,
            |edges(ax, ay, bx, by) AS (
            |  VALUES (9.5, 8.5, 88.5, 12.5),
            |         (88.5, 12.5, 78.5, 83.5),
            |         (78.5, 83.5, 37.5, 93.5),
            |         (37.5, 93.5, 7.5, 57.5),
            |         (7.5, 57.5, 9.5, 8.5)),
            |cr AS (
            |  SELECT s.id_sensor,
            |    sum(CASE WHEN (e.ay > s.y) <> (e.by > s.y)
            |              AND s.x < (e.bx - e.ax) * (s.y - e.ay) / (e.by - e.ay) + e.ax
            |             THEN 1 ELSE 0 END) AS k
            |  FROM sensors s CROSS JOIN edges e
            |  GROUP BY s.id_sensor)
            |SELECT s.id_sensor, s.x, s.y, s.v
            |FROM sensors s JOIN cr ON s.id_sensor = cr.id_sensor
            |WHERE cr.k % 2 = 1
            |ORDER BY s.id_sensor""".stripMargin),
    "The polygon is a plan literal — containment is a scan-side predicate, no join at " +
      "all; at 100TB compose bboxClip in front so Parquet min/max skipping prunes files " +
      "before the exact ray cast runs (the same bbox-then-exact discipline as q37).")

  val all: Seq[Declared] =
    Seq(q30, q31, q32, q33, q34, q35, q36, q37, q38, q77, q109)
}
