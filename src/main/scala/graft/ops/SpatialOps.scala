package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.OperatorCaches

/** Spatial aggregation kernels (SURVEY.md J2/J3, A2/A3/A4, A6, P5).
  *
  * The reference implements every one of these as an O(sensors ×
  * features) per-row pandas apply with a linear scan
  * (reference: src/data_preprocessing.py:199, :228, :267, :340). Here
  * each is ONE declarative plan: bbox prefilter (P5) → join (broadcast
  * or grid-bucketed) → hash aggregate, all codegen'd column arithmetic —
  * no UDFs in the hot path.
  *
  * Kernels take explicit x/y DOUBLE columns. The geometry-struct layer
  * (graft.geo) reduces real geometries to centroid/bbox columns before
  * calling in — keeping bbox/distance predicates visible to Catalyst so
  * Parquet min/max skipping and pushdown stay effective at 100 TB.
  */
object SpatialOps {

  // ---- by-design plan-hazard documentation (Guardrails.expect) ------
  // Each entry registers a deliberately-BOUNDED single-partition window
  // or unconditioned join this object builds, with its boundedness
  // argument, so the optimizer audit (PlanAudit / the Guardrails rule)
  // flags only NEW hazards instead of letting them hide among known
  // ones. Markers are operator-owned columns of the hazard plan node.
  graft.plans.Guardrails.expect("cartesian_join",
    "sx, sy", "knnAggregate: 1-row global-bounds broadcast for the pruning radius",
    "k-literal")



  /** Squared Euclidean distance — exact on integer-valued doubles,
    * avoids the sqrt until a real distance is needed. */
  def dist2(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)

  /** The broadcast joins below multiply row counts by orders of
    * magnitude; their output inherits the probe side's partitioning. A
    * small input (one parquet row-group) would funnel the whole
    * explosion through one task, so widen the probe side to the
    * cluster's parallelism first. No-op when the input is already wide
    * (the 100 TB case — there the scan arrives with thousands of
    * splits and repartitioning would be a pure pessimization).
    *
    * The width probe reads `inputFiles` off the logical plan — a pure
    * metadata walk, no physical planning, no plan→RDD conversion (the
    * old `df.rdd.getNumPartitions` probe forced one and its answer
    * predated AQE coalescing anyway). Non-file inputs (in-memory test
    * frames, lattices) report zero files and get widened — harmless,
    * they are small by construction. */
  private[ops] def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val splits = df.inputFiles.length
    if (splits * 2 >= target) df else df.repartition(target)
  }

  /** P5 — bbox prefilter: clip `features` to the total bounds of the
    * sensor set expanded by `margin` (the reference's `.cx[...]` clip,
    * :222-223 — its single optimization; here it composes with Parquet
    * min/max skipping because x/y are plain columns). */
  def bboxClip(features: DataFrame, sensors: DataFrame, margin: Double,
      fx: String = "x", fy: String = "y",
      sx: String = "x", sy: String = "y"): DataFrame = {
    val b = sensors.agg(
      min(col(sx)).as("xmin"), max(col(sx)).as("xmax"),
      min(col(sy)).as("ymin"), max(col(sy)).as("ymax"))
    features.crossJoin(broadcast(b))
      .filter(col(fx).between(col("xmin") - margin, col("xmax") + margin) &&
        col(fy).between(col("ymin") - margin, col("ymax") + margin))
      .drop("xmin", "xmax", "ymin", "ymax")
  }

  /** J2+A2 — buffer aggregation: stats of feature columns within radius
    * `r` of each sensor. The pair generation goes through
    * [[gridBucketJoin]]: a broadcast nested-loop would evaluate the
    * distance predicate |sensors|×|features| times, while cell
    * bucketing only pairs each feature with sensors whose disc can
    * reach its cell (≈9 cells per sensor) — 3× faster already at sf0.1
    * and the only strategy that survives an unbounded sensor side.
    * Sensors with an empty buffer keep a row with nulls (reference
    * :507-508 NaN-row semantics) via the final left join.
    */
  def bufferAggregate(
      sensors: DataFrame,   // id_sensor, x, y (+ payload)
      features: DataFrame,  // x, y + valueCols
      radius: Double,
      funcs: Seq[String],
      valueCols: Seq[String],
      sourceName: String = ""): DataFrame = {
    val clipped = bboxClip(features, sensors, radius)
    val joined = gridBucketJoin(
      sensors.select(col("id_sensor"), col("x"), col("y")), clipped,
      radius, cell = radius)
    val stats = joined.groupBy(col("id_sensor"))
      .agg(Aggregates.block(funcs, sourceName, valueCols).head,
        Aggregates.block(funcs, sourceName, valueCols).tail: _*)
    sensors.join(stats, Seq("id_sensor"), "left")
  }

  /** J2 scale path — grid-bucket spatial join for large×large inputs
    * where neither side broadcasts: both sides are assigned to covering
    * cells of size `cell` (a point buffer of radius r covers at most 4
    * cells when cell >= 2r... we explode each sensor to the cells its
    * disc can touch), equi-join on the cell id, then exact-filter.
    * Turns a cartesian into a shuffle-equi-join keyed by space. */
  def gridBucketJoin(
      sensors: DataFrame, features: DataFrame, radius: Double,
      cell: Double): DataFrame =
    cellJoin(
      sensors.select(col("id_sensor"), col("x").as("sx"), col("y").as("sy")),
      features, radius, cell)

  /** Shared cell-bucket core: `probe` carries (sx, sy) plus any payload
    * columns; each probe point explodes to the 3×3 cells its disc can
    * touch, features map to their containing cell, equi-join on cell id,
    * exact distance post-filter. Output: features.* + probe.*.
    *
    * The feature side IS widened first: with a small probe fleet the
    * planner broadcast-hash-joins on the cell id, which streams the
    * feature side in its scan partitioning — a 1-split parquet read
    * would funnel the pair explosion, exact filter and partial agg
    * through one task. (Only a sort-merge plan would re-shuffle the
    * feature side and make the widening redundant.) */
  private def cellJoin(probe: DataFrame, features: DataFrame, radius: Double,
      cell: Double): DataFrame = {
    require(cell >= radius, "cell must be >= radius so a disc spans <= 4 cells")
    val s = probe
      .withColumn("cx", floor(col("sx") / cell).cast("long"))
      .withColumn("cy", floor(col("sy") / cell).cast("long"))
      .withColumn("gx", explode(sequence(col("cx") - 1, col("cx") + 1)))
      .withColumn("gy", explode(sequence(col("cy") - 1, col("cy") + 1)))
      // keep only cells the disc can actually touch
      .filter(
        (col("sx") - (col("gx") + 1) * cell <= radius) && ((col("gx") * cell) - col("sx") <= radius) &&
        (col("sy") - (col("gy") + 1) * cell <= radius) && ((col("gy") * cell) - col("sy") <= radius))
      .drop("cx", "cy")
    val f = ensureParallelism(features)
      .withColumn("gx", floor(col("x") / cell).cast("long"))
      .withColumn("gy", floor(col("y") / cell).cast("long"))
    f.join(s, Seq("gx", "gy"))
      .filter(dist2(col("sx"), col("sy"), col("x"), col("y")) <= radius * radius)
      .drop("gx", "gy")
  }

  /** Candidate-pruning radius from the feature bbox+count row of
    * [[knnAggregate]]'s stats pass: sized so a disc holds ~16k features
    * under uniform density — generous enough that even a corner sensor
    * (a quarter-disc, ~4k expected) stays covered. None → tiny or
    * degenerate feature set: brute-force instead. */
  private[graft] def estimateKnnRadius(stats: org.apache.spark.sql.Row, k: Int): Option[Double] = {
    if (stats.isNullAt(0) || stats.getLong(4) <= k.toLong * 16) return None
    val n = stats.getLong(4)
    val ex = stats.getDouble(1) - stats.getDouble(0)
    val ey = stats.getDouble(3) - stats.getDouble(2)
    val area = ex * ey
    val rad =
      if (area > 0) math.sqrt(16.0 * k * area / (math.Pi * n))
      // degenerate (collinear) extent: 1-D density — an interval of
      // length 2r should hold ~16k features. Keeps a huge collinear
      // feature set off the unpruned brute path.
      else if (math.max(ex, ey) > 0) 8.0 * k * math.max(ex, ey) / n
      else return None // point-mass features: every distance ties; brute is one window
    if (rad > 0 && java.lang.Double.isFinite(rad)) Some(rad) else None
  }

  /** Pair budget under which a single-job brute ranking beats the
    * multi-exchange pruned plan (each exchange is a scheduled stage;
    * a ~16M-row window is cheaper than five of them). */
  private val knnBrutePairBudget = 16L * 1000 * 1000

  /** J3+A4 — kNN aggregation: stats over the k nearest features per
    * sensor. Ranking by (distance, featureId) — `row_number`, matching
    * the reference's first-occurrence nsmallest tie-break (:553).
    *
    * Scale design, three exactness-preserving layers:
    *
    *  1. POSITION DEDUP — two sensors at the same (x, y) have
    *     provably identical top-k (distance and the feature-id
    *     tie-break depend only on position), so ranking runs per
    *     DISTINCT position and stats join back by position. Free when
    *     positions are unique; collapses the pair space outright when
    *     fleets share sites.
    *  2. ADAPTIVE STRATEGY — |positions|×|features| under
    *     [[knnBrutePairBudget]] takes the single-job broadcast ranking
    *     (fewer exchanges = less wall time at that size); above it,
    *     candidates are pruned through a grid-bucket join at a
    *     density-derived radius.
    *  3. PRUNED PATH IS STILL EXACT — a position with >= k candidates
    *     inside radius r is exactly solved from its candidates (its
    *     true k-th neighbour is within r and every feature within r is
    *     a candidate); under-filled positions (sparse corners, skew,
    *     clustered features) fall back to the broadcast ranking via
    *     anti-join. The full pair space is never materialized for
    *     solved positions.
    *
    * `pruneRadius = Some(0)` forces the brute path, `Some(r)` forces
    * pruning at radius r (tests pin pruned ≡ brute). */
  def knnAggregate(
      sensors: DataFrame, features: DataFrame, k: Int,
      funcs: Seq[String], valueCols: Seq[String],
      featureId: String, sourceName: String = "",
      pruneRadius: Option[Double] = None): DataFrame = {
    val w = Window.partitionBy(col("sx"), col("sy"))
      .orderBy(col("d2").asc, col(featureId).asc)
    def topkOf(pairs: DataFrame): DataFrame =
      pairs.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
    // broadcast hint ONLY when the caller has PROVEN the position set
    // small (the adaptive branch counts it); un-hinted callers (pruned
    // fallback, forced brute) leave the strategy to the planner, so a
    // degenerate path with an unbounded position set cannot force a
    // driver-side broadcast materialization
    def brutePairs(pos: DataFrame, hintBroadcast: Boolean = false): DataFrame =
      ensureParallelism(features)
        .crossJoin(if (hintBroadcast) broadcast(pos) else pos)
        .withColumn("d2", dist2(col("sx"), col("sy"), col("x"), col("y")))
    // Null-coordinate sensors are excluded from ranking: an unknown
    // position has no meaningful neighborhood, so (like SQL aggregates
    // over null groups) they receive NULL stats from the left rejoin
    // below. NaN positions are kept — Spark orders/equates NaN
    // consistently (NaN = NaN), so they dedup and rejoin exactly.
    val pos = sensors.select(col("x").as("sx"), col("y").as("sy"))
      .where(col("x").isNotNull && col("y").isNotNull).distinct()

    def pruned(r: Double): DataFrame = {
      // cached: the bounded candidate set (~16k rows per position,
      // MEMORY_AND_DISK — spills, never OOMs); evaluated once, read by
      // both the solved branch and the unsolved anti-join
      val cand = OperatorCaches.cached(
        cellJoin(pos, features, r, cell = r)
          .withColumn("d2", dist2(col("sx"), col("sy"), col("x"), col("y"))))
      val ranked = cand
        .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("sx"), col("sy"))))
        .withColumn("__rn", row_number().over(w))
      val solvedTopk = ranked.filter(col("__cnt") >= k && col("__rn") <= k).drop("__cnt")
      // no broadcast hint: solved positions are bounded by |positions|,
      // which can be large at scale — AQE picks broadcast when small
      val unsolved = pos.join(solvedTopk.select(col("sx"), col("sy")).distinct(),
        Seq("sx", "sy"), "left_anti")
      solvedTopk.unionByName(topkOf(brutePairs(unsolved)))
    }

    val topk = pruneRadius match {
      case Some(r) if r > 0 => pruned(r)
      case Some(_) => topkOf(brutePairs(pos))
      case None =>
        // one bounded stats pass (bbox + count → a single row) feeds
        // both the strategy choice and the pruning radius
        val fStats = features.agg(min(col("x")), max(col("x")),
          min(col("y")), max(col("y")), count(lit(1))).head()
        val nF = if (fStats.isNullAt(4)) 0L else fStats.getLong(4)
        val nPos = pos.count()
        // brute also requires a broadcastable position set
        if (nF == 0 || nPos == 0 ||
            (nPos <= 4L * 1000 * 1000 && nF <= knnBrutePairBudget / math.max(nPos, 1L)))
          topkOf(brutePairs(pos, hintBroadcast = true))
        else estimateKnnRadius(fStats, k) match {
          case Some(r) => pruned(r)
          case None => topkOf(brutePairs(pos))
        }
    }
    val stats = topk.groupBy(col("sx"), col("sy"))
      .agg(Aggregates.block(funcs, sourceName, valueCols).head,
        Aggregates.block(funcs, sourceName, valueCols).tail: _*)
    // stats is bounded by |positions|; AQE broadcasts it when small,
    // shuffles on position otherwise — no hard hint. Null-safe equality
    // keeps the rejoin total even if a future caller re-admits null
    // positions; today the stats side has no null rows (see `pos`).
    sensors.join(stats,
      sensors("x") <=> stats("sx") && sensors("y") <=> stats("sy"), "left")
      .drop("sx", "sy")
  }

  /** A3 — raster buffer stats over the cell-table model: per sensor,
    * per band, stats of non-nodata cell values within the buffer.
    * Output long format (id_sensor, band, stats...); the named-column
    * pivot (`mean_<raster>_band<b>`, reference :195-197) is
    * [[pivotBands]]. */
  def rasterBufferStats(
      sensors: DataFrame, cells: DataFrame, radius: Double,
      funcs: Seq[String], nodata: Double = 0.0,
      bands: Option[Seq[Int]] = None): DataFrame = {
    val clipped = bboxClip(cells, sensors, radius)
      .filter(col("value") =!= nodata)
    val banded =
      bands.map(bs => clipped.filter(col("band").isin(bs: _*))).getOrElse(clipped)
    gridBucketJoin(sensors.select(col("id_sensor"), col("x"), col("y")),
      banded, radius, cell = radius)
      .groupBy(col("id_sensor"), col("band"))
      .agg(Aggregates.block(funcs, "", Seq("value")).head,
        Aggregates.block(funcs, "", Seq("value")).tail: _*)
  }

  /** A3+ — ZONAL STATISTICS over the raster cell-table model: per
    * (zone, band), stats of the non-nodata cells whose CENTER falls
    * inside the zone polygon — the GDAL-era `zonal_stats` workload the
    * reference's buffer stats (:189-206) approximate with discs, here
    * with true polygon zones. Composes directly with
    * [[graft.io.GeoTiff.readCells]] (S1 raster ingest).
    *
    * Plan: each zone's bbox explodes to the grid cells (size `cell`)
    * it covers; cell-table rows map to their containing grid cell; the
    * equi-join on (gx, gy) turns the point-in-polygon cartesian into a
    * shuffle-keyed join (the gridBucketJoin discipline), refined by the
    * exact `st_intersects` predicate. Output long format:
    * (zoneId, band, stats...).
    *
    * Scale: shuffle keys are space-uniform grid cells; zone fan-out is
    * bbox-area/cell² rows per zone (caller sizes `cell` to the typical
    * zone extent — same contract as gridBucketJoin's `cell >= radius`).
    * Raster volume dominates and is scanned once, filtered scan-side on
    * nodata. Skewed mega-zones split across their many covering cells
    * rather than landing on one task. */
  def zonalStats(cells: DataFrame, zones: DataFrame, zoneIdCol: String,
      geomCol: String, funcs: Seq[String], cell: Double,
      nodata: Double = 0.0): DataFrame = {
    require(cell > 0, "cell must be positive")
    import graft.geo.Geo
    val z = zones.select(col(zoneIdCol).as("__zid"), col(geomCol).as("__zg"))
      .withColumn("__b", Geo.stBounds(col("__zg")))
      .withColumn("gx", explode(sequence(
        floor(col("__b").getField("xmin") / cell).cast("long"),
        floor(col("__b").getField("xmax") / cell).cast("long"))))
      .withColumn("gy", explode(sequence(
        floor(col("__b").getField("ymin") / cell).cast("long"),
        floor(col("__b").getField("ymax") / cell).cast("long"))))
      .drop("__b")
    val c = ensureParallelism(cells.filter(col("value") =!= nodata))
      .withColumn("gx", floor(col("x") / cell).cast("long"))
      .withColumn("gy", floor(col("y") / cell).cast("long"))
    c.join(z, Seq("gx", "gy"))
      .filter(Geo.stIntersects(Geo.stPoint(col("x"), col("y")), col("__zg")))
      .groupBy(col("__zid").as(zoneIdCol), col("band"))
      .agg(Aggregates.block(funcs, "", Seq("value")).head,
        Aggregates.block(funcs, "", Seq("value")).tail: _*)
  }

  /** A3+ — raster RESAMPLE/aggregate on the cell-table model: coarsen
    * by an integer `factor`, each output cell aggregating the factor²
    * input cells it covers (`agg` ∈ mean/min/max/sum/count — the
    * GDAL `gdalwarp -r average`-class downsample, overview building).
    * Output cell centers are the exact centroids of the covered input
    * centers (mean of x, mean of y), so chained resamples stay exact.
    *
    * Scale: ONE groupBy keyed on (band, output cell) — space-uniform,
    * map-side combined; no joins, no skew. */
  def rasterResample(cells: DataFrame, originX: Double, originY: Double,
      scaleX: Double, scaleY: Double, factor: Int,
      agg: String = "mean"): DataFrame = {
    require(factor >= 1, "factor >= 1")
    require(scaleX > 0 && scaleY > 0, "pixel scale must be positive")
    // input col/row from the geotransform (x = ox + (c+0.5)·sx inverts
    // exactly for cell centers); integer div buckets factor² pixels
    val c0 = cells
      .withColumn("__c", floor((col("x") - lit(originX)) / scaleX).cast("long"))
      .withColumn("__r", floor((lit(originY) - col("y")) / scaleY).cast("long"))
      .withColumn("__oc", expr(s"__c div $factor"))
      .withColumn("__or", expr(s"__r div $factor"))
    val v: Column = agg match {
      case "mean" => avg(col("value"))
      case "min" => min(col("value"))
      case "max" => max(col("value"))
      case "sum" => sum(col("value"))
      case "count" => count(col("value")).cast("double")
      case other => throw new IllegalArgumentException(
        s"unknown resample agg '$other' (mean/min/max/sum/count)")
    }
    c0.groupBy(col("band"), col("__oc"), col("__or"))
      .agg(avg(col("x")).as("x"), avg(col("y")).as("y"), v.as("value"),
        count(lit(1)).as("n_cells"))
      .select(col("band"), col("x"), col("y"), col("value"), col("n_cells"))
  }

  /** A3+ — terrain GRADIENTS on the cell-table model (Horn 1981, the
    * 3×3 weighted-difference kernel every GIS slope tool uses): per
    * interior cell (all 8 neighbors present),
    *   dzdx = ((z₊₋+2z₊₀+z₊₊) − (z₋₋+2z₋₀+z₋₊)) / (8·sx)
    *   dzdy = ((z₋₋+2z₀₋+z₊₋) − (z₋₊+2z₀₊+z₊₊)) / (8·sy)  (world-y up)
    * and slope_tan2 = dzdx² + dzdy² — tan² of the slope angle. The
    * OUTPUT stays inside the correctly-rounded IEEE set (sums of
    * dyadic-rational values, two exact divisions, squares): no atan/
    * sqrt/cos, so results are bit-identical on any engine — callers
    * wanting degrees apply atan(√·) presentation-side.
    *
    * Plan: each cell EXPLODES its 8 (weight-tagged) contributions to
    * the neighbors' gradient sums; ONE groupBy on (band, target cell)
    * assembles them; interior cells are exactly those with 8
    * contributors. No self-joins, one shuffle, space-uniform keys.
    *
    * Scale: linear in cells with map-side combine; an N× raster is N×
    * of the same shuffle. Matches the strip-parallel GeoTIFF ingest —
    * gradients of a 100 TB raster catalog are a scan + one shuffle. */
  def terrainGradients(cells: DataFrame, originX: Double, originY: Double,
      scaleX: Double, scaleY: Double): DataFrame = {
    require(scaleX > 0 && scaleY > 0, "pixel scale must be positive")
    // neighbor offset table: contribution of the cell at (c, r) to the
    // target at (c-dc, r-dr), with Horn weights; dr is RASTER row
    // (down), so world dzdy negates the row-difference sum
    val offs = for {
      dc <- Seq(-1, 0, 1); dr <- Seq(-1, 0, 1) if dc != 0 || dr != 0
    } yield (dc, dr,
      dc * (if (dr == 0) 2 else 1),   // weight in the column gradient
      dr * (if (dc == 0) 2 else 1))   // weight in the row gradient
    val offArr = offs.map { case (dc, dr, wx, wy) =>
      s"struct(${dc}L as dc, ${dr}L as dr, ${wx}L as wx, ${wy}L as wy)"
    }.mkString("array(", ", ", ")")
    val c0 = cells
      .withColumn("__c", floor((col("x") - lit(originX)) / scaleX).cast("long"))
      .withColumn("__r", floor((lit(originY) - col("y")) / scaleY).cast("long"))
      .withColumn("__o", explode(expr(offArr)))
      .select(col("band"),
        (col("__c") - col("__o.dc")).as("__tc"),
        (col("__r") - col("__o.dr")).as("__tr"),
        (col("value") * col("__o.wx")).as("__cx"),
        (col("value") * col("__o.wy")).as("__cy"))
    c0.groupBy(col("band"), col("__tc"), col("__tr"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__cx")).as("__sx"), sum(col("__cy")).as("__sy"))
      .filter(col("__n") === 8)
      .select(col("band"),
        (lit(originX) + (col("__tc") + 0.5) * scaleX).as("x"),
        (lit(originY) - (col("__tr") + 0.5) * scaleY).as("y"),
        (col("__sx") / (8 * scaleX)).as("dzdx"),
        (col("__sy") / lit(-8 * scaleY)).as("dzdy"),
        ((col("__sx") / (8 * scaleX)) * (col("__sx") / (8 * scaleX)) +
          (col("__sy") / lit(-8 * scaleY)) * (col("__sy") / lit(-8 * scaleY)))
          .as("slope_tan2"))
  }

  /** A3+/E2 — D8 FLOW DIRECTION + FLOW ACCUMULATION over the integer
    * cell-table DEM (O'Callaghan & Mark 1984, CVGIP — public
    * literature; the hydrology standard behind drainage networks,
    * watershed delineation and stream-power indices). Each cell flows
    * to its steepest-DOWNSLOPE 8-neighbor; accumulation counts every
    * upstream cell draining through (self included).
    *
    * Exact integer semantics: elevations are longs at unit grid
    * spacing, and the steepest-descent comparison clears the √2
    * diagonal denominator by cross-multiplication — slope² =
    * drop²/d² with d² ∈ {1, 2} compares as drop²·(2/d²), an exact
    * long. Ties break on the LOWEST direction index in the standard
    * D8 clockwise-from-east order (E, SE, S, SW, W, NW, N, NE) —
    * deterministic, oracle-replayable. Pits and flats (no strictly
    * positive drop) emit no flow.
    *
    * Accumulation runs `rounds` fixed Jacobi iterations of
    *   acc(v) ← 1 + Σ_{u: flow(u)=v} acc(u)
    * which is exact once `rounds` ≥ the longest flow-path depth (the
    * q155/q384 horizon contract: fixed rounds keep the operator a
    * pure function of the input). Returns one row per cell:
    * (x, y, flow_dir — direction index or null for pits, acc).
    *
    * Scale: the neighbor probe is one explode(8) + grouped argmax
    * keyed on the cell (map-side combine); each accumulation round is
    * one flow-edge join + grouped sum, chained lazily and
    * checkpointed every third round like the BFS family — state is
    * the cell table itself, shuffle keys on the flow target. */
  /** A3+/S5 — POLYGON RASTERIZATION (the gdal_rasterize direction of
    * the vector↔raster bridge; [[zonalStats]] is the inverse): burn
    * each polygon's id into the grid cells whose CENTER it contains
    * (the GDAL default center-sampling rule). Overlaps resolve to the
    * SMALLEST id — deterministic, oracle-replayable.
    *
    * Scale: each polygon explodes to the cell-index window of its own
    * BBOX (never the whole grid — the same bound-the-fan-out discipline
    * as the grid-bucket joins), the exact even-odd ray cast runs as a
    * scan-side predicate on the exploded pairs, and the min-id
    * tie-break is one grouped agg keyed on the cell. No cartesian, no
    * broadcast assumption: a continental raster × a big vector layer
    * shuffles on cell indices only.
    *
    * Grid convention matches [[terrainGradients]]: cell (c, r) has
    * center (originX + (c+0.5)·scaleX, originY − (r+0.5)·scaleY) —
    * row 0 at the TOP. Returns (x, y, c, r, polygon_id) for covered
    * cells only. */
  def rasterizePolygons(polys: DataFrame, idCol: Column, geomCol: Column,
      originX: Double, originY: Double, scaleX: Double, scaleY: Double,
      width: Int, height: Int): DataFrame = {
    require(scaleX > 0 && scaleY > 0, "pixel scale must be positive")
    require(width >= 1 && height >= 1, "grid dims must be positive")
    import graft.geo.Geo
    val p = polys.select(idCol.cast("long").as("__pid"), geomCol.as("__g"))
      .withColumn("__bb", Geo.stBounds(col("__g")))
      // covered CENTER index window: x_c = originX + (c+0.5)·scaleX in
      // [xmin, xmax] → c in [ceil((xmin−ox)/sx − 0.5), floor((xmax−ox)/sx − 0.5)]
      .withColumn("__c0", greatest(lit(0L),
        ceil((col("__bb.xmin") - originX) / scaleX - 0.5).cast("long")))
      .withColumn("__c1", least(lit(width - 1L),
        floor((col("__bb.xmax") - originX) / scaleX - 0.5).cast("long")))
      .withColumn("__r0", greatest(lit(0L),
        ceil((lit(originY) - col("__bb.ymax")) / scaleY - 0.5).cast("long")))
      .withColumn("__r1", least(lit(height - 1L),
        floor((lit(originY) - col("__bb.ymin")) / scaleY - 0.5).cast("long")))
      // sequence() DESCENDS when hi < lo — an off-grid polygon must
      // contribute zero cells, not a reversed walk
      .filter(col("__c0") <= col("__c1") && col("__r0") <= col("__r1"))
    val cells = p
      .withColumn("__c", explode(sequence(col("__c0"), col("__c1"))))
      .withColumn("__r", explode(sequence(col("__r0"), col("__r1"))))
      .withColumn("__x", lit(originX) + (col("__c") + 0.5) * scaleX)
      .withColumn("__y", lit(originY) - (col("__r") + 0.5) * scaleY)
      // STRICT even-odd containment (no boundary disjunct): the GDAL
      // center-burn contract — a center exactly on a polygon edge does
      // NOT burn, matching the even-odd oracle. stIntersects would
      // include it via its segDist==0 disjunct.
      .filter(Geo.stContainsPointStrict(col("__g"),
        Geo.stPoint(col("__x"), col("__y"))))
    cells.groupBy(col("__c").as("c"), col("__r").as("r"))
      .agg(min(col("__pid")).as("polygon_id"),
        max(col("__x")).as("x"), max(col("__y")).as("y"))
      .select(col("x"), col("y"), col("c"), col("r"), col("polygon_id"))
  }

  /** A3+/E2 — COST-DISTANCE surface over the integer cost raster (the
    * gdal_proximity / r.cost operation; Douglas 1994 "Least-cost path
    * in GIS" — public literature): the accumulated least cost from the
    * nearest SOURCE cell to every cell, moving over the 8-neighborhood.
    *
    * EXACT INTEGER METRIC (documented, oracle-replayable): stepping
    * between adjacent cells a → b costs (cost_a + cost_b)·2 for
    * cardinal moves and (cost_a + cost_b)·3 for diagonals — the ×2
    * scaling clears the usual (ca+cb)/2 average and 3/2 is the
    * integer diagonal factor (the √2 of the continuous metric is
    * irrational; a DEFINED rational metric keeps every distance an
    * exact long under any partitioning and any engine).
    *
    * Distances run `rounds` min-plus Jacobi relaxations — exact once
    * `rounds` ≥ the step count of the longest least-cost path (the
    * fixed-horizon purity contract of the BFS family). The SELF-LOOP
    * device keeps each round ONE join + one grouped min: a zero-cost
    * (v → v) edge carries the previous label, so no left join or
    * second pass is needed. Unreached cells report null.
    *
    * Scale: the edge frame (≤ 8 per cell + the self-loop) checkpoints
    * once keyed on the source cell; each round shuffles only the
    * label frame (cell-sized) into the grouped min. */
  def costDistance(cells: DataFrame, xCol: Column, yCol: Column,
      costCol: Column, sourceCond: Column, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "rounds in [1, 64]")
    val dirs = Seq((1, 0, 2L), (1, 1, 3L), (0, 1, 2L), (-1, 1, 3L),
      (-1, 0, 2L), (-1, -1, 3L), (0, -1, 2L), (1, -1, 3L))
    val dirArr = dirs.map { case (dx, dy, m) =>
      s"struct(${dx}L as dx, ${dy}L as dy, ${m}L as m)"
    }.mkString("array(", ", ", ")")
    val base = cells.select(xCol.cast("long").as("__x"),
        yCol.cast("long").as("__y"), costCol.cast("long").as("__c"),
        sourceCond.as("__src"))
      .localCheckpoint()
    val costRangeRow = base.agg(min(col("__c")), max(col("__c"))).head
    if (costRangeRow.isNullAt(0)) // empty raster: empty surface, not an NPE
      return base.select(col("__x").as("x"), col("__y").as("y"),
        lit(null).cast("long").as("cost_dist"))
    val minCost = costRangeRow.getLong(0)
    if (minCost < 1L) throw graft.core.DataIOError("costDistance",
      s"traversal costs must be >= 1, found $minCost — a zero/negative " +
        "cost makes the least-cost metric degenerate")
    // Upper bound too: relaxation adds __dist + __w where unreached
    // cells carry INF = Long.MaxValue/4 and a finite path accumulates
    // up to `rounds` step weights of (ca+cb)·3 ≤ 6·maxCost. The bound
    // keeps INF + w and 64-round path sums inside a long — a larger
    // cost would overflow, wrap negative, and silently WIN the grouped
    // min instead of raising.
    val maxCostBound = Long.MaxValue / 4096 // 64 rounds · 6·cost ≪ INF
    val maxCost = costRangeRow.getLong(1)
    if (maxCost > maxCostBound) throw graft.core.DataIOError("costDistance",
      s"traversal costs must be <= $maxCostBound (Long.MaxValue/4096), " +
        s"found $maxCost — larger costs overflow the exact long metric " +
        "during min-plus relaxation")
    val INF = Long.MaxValue / 4
    val nbrEdges = base
      .withColumn("__d", explode(expr(dirArr)))
      .select(col("__x"), col("__y"), col("__c"),
        (col("__x") + col("__d.dx")).as("__tx"),
        (col("__y") + col("__d.dy")).as("__ty"),
        col("__d.m").as("__m"))
      .join(base.select(col("__x").as("__tx"), col("__y").as("__ty"),
        col("__c").as("__tc")), Seq("__tx", "__ty"))
      .select(col("__x"), col("__y"), col("__tx"), col("__ty"),
        ((col("__c") + col("__tc")) * col("__m")).as("__w"))
    val selfLoop = base.select(col("__x"), col("__y"),
      col("__x").as("__tx"), col("__y").as("__ty"), lit(0L).as("__w"))
    val edges = nbrEdges.unionByName(selfLoop)
      .repartition(cells.sparkSession.sparkContext.defaultParallelism,
        col("__x"), col("__y"))
      .localCheckpoint() // re-read every relaxation round
    var labels = base.select(col("__x"), col("__y"),
      when(col("__src"), lit(0L)).otherwise(lit(INF)).as("__dist"))
    var r = 0
    while (r < rounds) {
      r += 1
      labels = edges.join(labels, Seq("__x", "__y"))
        .groupBy(col("__tx").as("__x"), col("__ty").as("__y"))
        .agg(min(col("__dist") + col("__w")).as("__dist"))
      if (r % 4 == 0 || r == rounds) labels = labels.localCheckpoint()
    }
    labels.select(col("__x").as("x"), col("__y").as("y"),
      when(col("__dist") >= INF, lit(null).cast("long"))
        .otherwise(col("__dist")).as("cost_dist"))
  }

  /** A3+/E2 — VIEWSHED from one observer cell over the integer DEM
    * (the GRASS r.viewshed / GDAL viewshed operation; R3 sampling per
    * Franklin & Ray 1994 — public literature): a cell is VISIBLE when
    * no sampled cell along the sight line subtends a larger vertical
    * angle than the target does.
    *
    * EXACT INTEGER DECISIONS end to end: the line from the observer to
    * a target at lattice offset (dx, dy) is sampled once per step of
    * the dominant axis at the NEAREST cell (round-half-up of the exact
    * rational coordinate — floor((2·num + S) / (2·S)) on integer
    * numerators, no floating point); the angle comparison
    * (z_s − z_o)/d_s vs (z_t − z_o)/d_t clears both irrational
    * denominators by sign analysis + squaring: a/√p ≥ b/√q ⟺
    * (a≥0 ∧ b<0) ∨ (a≥0 ∧ b≥0 ∧ a²q ≥ b²p) ∨ (a<0 ∧ b<0 ∧ a²q ≤ b²p).
    * Every quantity is a long, so visibility is bit-identical under
    * any partitioning and any engine. The observer sights from
    * z_obs + `height`. Cells beyond `maxDist` lattice units (Chebyshev)
    * are out of scope; the observer cell itself is visible.
    *
    * Scale: targets explode to their ≤ maxDist line samples (the
    * documented fan-out dial — O(cells·maxDist)), sample elevations
    * attach by ONE equi-join on the rounded lattice key, and the
    * verdict is one grouped bool agg per target. No cartesian, no
    * window, no driver loop. */
  def viewshed(cells: DataFrame, xCol: Column, yCol: Column, zCol: Column,
      obsX: Long, obsY: Long, height: Long, maxDist: Int): DataFrame = {
    require(height >= 0, "observer height >= 0")
    require(maxDist >= 1 && maxDist <= 4096, "maxDist in [1, 4096]")
    val base = cells.select(xCol.cast("long").as("__x"),
        yCol.cast("long").as("__y"), zCol.cast("long").as("__z"))
      .localCheckpoint() // targets + sample-elevation lookup
    val zObsRow = base.filter(col("__x") === obsX && col("__y") === obsY)
      .select(col("__z")).collect()
    if (zObsRow.isEmpty) throw graft.core.DataIOError("viewshed",
      s"observer cell ($obsX, $obsY) not present in the DEM")
    // the exact round-half-up below uses truncating div — valid on
    // non-negative numerators only, i.e. a non-negative lattice
    val mins = base.agg(min(col("__x")), min(col("__y"))).head()
    if (mins.getLong(0) < 0L || mins.getLong(1) < 0L)
      throw graft.core.DataIOError("viewshed",
        "lattice coordinates must be non-negative (shift the grid)")
    val zo = zObsRow.head.getLong(0) + height
    val targets = base
      .withColumn("__dx", col("__x") - obsX)
      .withColumn("__dy", col("__y") - obsY)
      .filter(greatest(abs(col("__dx")), abs(col("__dy"))) <= maxDist &&
        (col("__dx") =!= 0L || col("__dy") =!= 0L))
      // S = dominant-axis step count; target angle numerator/denominator
      .withColumn("__s", greatest(abs(col("__dx")), abs(col("__dy"))))
      .withColumn("__a", col("__z") - zo) // target rise
      .withColumn("__p", col("__dx") * col("__dx") +
        col("__dy") * col("__dy")) // target dist²
    // one sample per dominant-axis step strictly between obs and target:
    // exact rational position (obs·S + t·d)/S, nearest cell by
    // round-half-up on the integer numerator
    val samples = targets
      // sequence(1, 0) DESCENDS (the engine-wide guard): adjacent
      // targets (__s = 1) have no intervening samples, not a reversed
      // walk that would sample the target itself
      .withColumn("__t", explode(when(col("__s") >= 2L,
        sequence(lit(1L), col("__s") - 1L))
        .otherwise(array().cast("array<bigint>"))))
      .withColumn("__sx", expr(
        s"(2 * ($obsX * __s + __t * __dx) + __s) div (2 * __s)"))
      .withColumn("__sy", expr(
        s"(2 * ($obsY * __s + __t * __dy) + __s) div (2 * __s)"))
      .join(base.select(col("__x").as("__sx"), col("__y").as("__sy"),
        col("__z").as("__sz")), Seq("__sx", "__sy"))
      .withColumn("__b", col("__sz") - zo) // sample rise
      .withColumn("__q", (col("__sx") - obsX) * (col("__sx") - obsX) +
        (col("__sy") - obsY) * (col("__sy") - obsY)) // sample dist²
      // sample BLOCKS target ⟺ sample angle ≥ target angle:
      // b/√q ≥ a/√p with the sign-split squared comparison
      .withColumn("__blocks",
        (col("__b") >= 0L && col("__a") < 0L) ||
        (col("__b") >= 0L && col("__a") >= 0L &&
          col("__b") * col("__b") * col("__p") >=
            col("__a") * col("__a") * col("__q")) ||
        (col("__b") < 0L && col("__a") < 0L &&
          col("__b") * col("__b") * col("__p") <=
            col("__a") * col("__a") * col("__q")))
    val verdicts = samples.groupBy(col("__x"), col("__y"))
      .agg(max(col("__blocks")).as("__blocked"))
    targets
      .join(verdicts, Seq("__x", "__y"), "left") // adjacent cells: no samples
      .select(col("__x").as("x"), col("__y").as("y"),
        (!coalesce(col("__blocked"), lit(false))).as("visible"))
      .unionByName(base.sparkSession.range(1)
        .select(lit(obsX).as("x"), lit(obsY).as("y"),
          lit(true).as("visible")))
  }

  /** Shared D8 core: (checkpointed integer cell frame, checkpointed
    * flow frame (__x, __y, flow_dir, __tx, __ty)). See
    * [[d8FlowAccumulation]] for the full semantics contract. */
  private def d8Flows(cells: DataFrame, xCol: Column, yCol: Column,
      zCol: Column): (DataFrame, DataFrame) = {
    // D8 direction table, clockwise from east
    val dirs = Seq((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1),
      (0, -1), (1, -1))
    val dirArr = dirs.zipWithIndex.map { case ((dx, dy), k) =>
      s"struct(${k}L as k, ${dx}L as dx, ${dy}L as dy, " +
        s"${if (dx != 0 && dy != 0) 1L else 2L}L as w)" // w = 2/d²
    }.mkString("array(", ", ", ")")
    val base = cells.select(xCol.cast("long").as("__x"),
      yCol.cast("long").as("__y"), zCol.cast("long").as("__z"))
      .localCheckpoint() // probe side + elevation lookup + final join
    val probes = base
      .withColumn("__d", explode(expr(dirArr)))
      .select(col("__x"), col("__y"), col("__z"),
        col("__d.k").as("__k"),
        (col("__x") + col("__d.dx")).as("__nx"),
        (col("__y") + col("__d.dy")).as("__ny"),
        col("__d.w").as("__w"))
    val nbr = base.select(col("__x").as("__nx"), col("__y").as("__ny"),
      col("__z").as("__nz"))
    val flows = probes.join(nbr, Seq("__nx", "__ny"))
      .filter(col("__z") > col("__nz"))
      // slope² cleared of the √2: drop²·(2/d²); ties on LOWEST k
      .withColumn("__s2",
        (col("__z") - col("__nz")) * (col("__z") - col("__nz")) * col("__w"))
      .groupBy(col("__x"), col("__y"))
      .agg(max_by(struct(col("__k"), col("__nx"), col("__ny")),
        struct(col("__s2"), -col("__k"))).as("__best"))
      .select(col("__x"), col("__y"), col("__best.__k").as("flow_dir"),
        col("__best.__nx").as("__tx"), col("__best.__ny").as("__ty"))
      .localCheckpoint() // re-read every iterative round
    (base, flows)
  }

  def d8FlowAccumulation(cells: DataFrame, xCol: Column, yCol: Column,
      zCol: Column, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "rounds in [1, 64]")
    val (base, flows) = d8Flows(cells, xCol, yCol, zCol)
    var acc = base.select(col("__x"), col("__y"), lit(1L).as("acc"))
    var r = 0
    while (r < rounds) {
      r += 1
      val inflow = flows
        .join(acc, Seq("__x", "__y"))
        .groupBy(col("__tx").as("__x"), col("__ty").as("__y"))
        .agg(sum(col("acc")).as("__in"))
      acc = base.select(col("__x"), col("__y"))
        .join(inflow, Seq("__x", "__y"), "left")
        .select(col("__x"), col("__y"),
          (lit(1L) + coalesce(col("__in"), lit(0L))).as("acc"))
      // lazy chaining bounds per-round actions; every EIGHTH round (and
      // the last) truncates lineage — the acc frame is cell-sized and
      // each round adds only a join+agg pair to the plan, so a deeper
      // chain trades bounded analysis cost for fewer stage-floor hits
      if (r % 8 == 0 || r == rounds) acc = acc.localCheckpoint()
    }
    base.select(col("__x"), col("__y"))
      .join(flows.select(col("__x"), col("__y"), col("flow_dir")),
        Seq("__x", "__y"), "left")
      .join(acc, Seq("__x", "__y"))
      .select(col("__x").as("x"), col("__y").as("y"), col("flow_dir"),
        col("acc"))
  }

  /** A3+/E2 — D8 WATERSHED LABELING: assign every cell the PIT its
    * flow path terminates in (the drainage-basin partition of the DEM;
    * O'Callaghan-Mark flow model, same direction contract as
    * [[d8FlowAccumulation]]). Pits label themselves. Resolution is
    * POINTER DOUBLING on the flow forest — `rounds` halvings reach
    * roots up to 2^rounds flow-steps away (rounds = 8 covers any path
    * the accumulation horizon could see), the same device as the
    * dedup-components driver (`ext/Graph.connectedComponents`).
    * Returns one row per cell: (x, y, basin_x, basin_y).
    *
    * Scale: each doubling round is ONE self-join of the cell-sized
    * pointer frame keyed on the current parent — log(depth) rounds
    * total, no per-depth iteration. */
  def d8Watersheds(cells: DataFrame, xCol: Column, yCol: Column,
      zCol: Column, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds in [1, 16] (2^r depth)")
    val (base, flows) = d8Flows(cells, xCol, yCol, zCol)
    // parent = flow target; pits parent themselves (forest roots)
    var ptr = base.select(col("__x"), col("__y"))
      .join(flows.select(col("__x"), col("__y"), col("__tx"), col("__ty")),
        Seq("__x", "__y"), "left")
      .select(col("__x"), col("__y"),
        coalesce(col("__tx"), col("__x")).as("__px"),
        coalesce(col("__ty"), col("__y")).as("__py"))
      .localCheckpoint()
    var r = 0
    while (r < rounds) {
      r += 1
      val up = ptr.select(col("__x").as("__px"), col("__y").as("__py"),
        col("__px").as("__gx"), col("__py").as("__gy"))
      ptr = ptr.join(up, Seq("__px", "__py"))
        .select(col("__x"), col("__y"),
          col("__gx").as("__px"), col("__gy").as("__py"))
      // doubling squares reach per round; checkpoint every other round
      // keeps the self-join input materialized without a stage per hop
      if (r % 2 == 0 || r == rounds) ptr = ptr.localCheckpoint()
    }
    ptr.select(col("__x").as("x"), col("__y").as("y"),
      col("__px").as("basin_x"), col("__py").as("basin_y"))
  }

  /** Pivot the long band stats into the reference's
    * `func_<raster>_band<b>` wide naming (:195-197). */
  def pivotBands(longStats: DataFrame, rasterName: String, funcs: Seq[String],
      bands: Seq[Int]): DataFrame = {
    val aggs = for (f <- funcs; b <- bands) yield
      first(when(col("band") === b, col(Aggregates.statName(f, "", "value"))), ignoreNulls = true)
        .as(Aggregates.statName(f, rasterName, s"band$b"))
    longStats.groupBy(col("id_sensor")).agg(aggs.head, aggs.tail: _*)
  }

  /** A3 end-to-end (reference flagship raster branch, :189-206): buffer
    * stats per band, pivoted to `func_<raster>_band<b>` columns, joined
    * back onto the sensor table; sensors whose buffer misses the raster
    * keep a null row (:521-526). Bands default = all (:190-191). */
  def addRasterBufferData(sensors: DataFrame, cells: DataFrame,
      rasterName: String, radius: Double, funcs: Seq[String],
      bands: Option[Seq[Int]] = None, nodata: Double = 0.0): DataFrame = {
    val bandList = bands.getOrElse(
      cells.select(col("band")).distinct().collect().map(_.getInt(0)).sorted.toSeq)
    val stats = rasterBufferStats(sensors, cells, radius, funcs, nodata, Some(bandList))
    sensors.join(pivotBands(stats, rasterName, funcs, bandList), Seq("id_sensor"), "left")
  }

  /** A6 — IDW interpolation of `valueCol` onto a regular lattice.
    * Implements the INTENDED math (the reference's loop index bug writes
    * only cell 0, :381-385) with an exact-hit guard: a lattice point
    * coinciding with a sensor takes that sensor's value (the reference
    * would divide by zero).
    *
    * grid × sensors is a bounded crossJoin (|grid| chosen by the
    * caller; sensors broadcast); the heavy part is the groupBy(grid
    * point) — keyed uniformly, no skew.
    */
  def idw(
      sensors: DataFrame, valueCol: String, power: Int,
      x0: Double, y0: Double, nx: Int, ny: Int, stepX: Double, stepY: Double): DataFrame = {
    val spark = sensors.sparkSession
    val grid = spark.range(nx.toLong * ny)
      .withColumn("gx", lit(x0) + (col("id") % nx).cast("double") * stepX)
      .withColumn("gy", lit(y0) + floor(col("id") / nx).cast("double") * stepY)
      .select("gx", "gy")
    val s = broadcast(sensors.select(col("x"), col("y"),
      coalesce(col(valueCol), lit(0.0)).as("v"))) // reference zero-fills (:374)
    val d2 = dist2(col("gx"), col("gy"), col("x"), col("y"))
    // even powers avoid sqrt entirely: d^p = d2^(p/2) — exact-compare-safe
    // (pow(x,1) is the identity in IEEE libm); odd powers need the sqrt
    val dpow: Column =
      if (power == 2) d2
      else if (power % 2 == 0) pow(d2, power / 2)
      else pow(sqrt(d2), power)
    val dp = when(d2 === 0, lit(null)).otherwise(dpow) // null marks exact hits
    grid.join(s)
      .withColumn("w", lit(1.0) / dp)
      .groupBy(col("gx"), col("gy"))
      .agg(
        max(when(dist2(col("gx"), col("gy"), col("x"), col("y")) === 0, col("v"))).as("exact"),
        (sum(col("w") * col("v")) / sum(col("w"))).as("idw_est"))
      .select(col("gx"), col("gy"),
        coalesce(col("exact"), col("idw_est")).as(s"${valueCol}_idw"))
  }

  // --- geohash (F9-adjacent): the prefix-mergeable spatial cell key ---

  /** Standard geohash base-32 alphabet (Niemeyer 2008, public spec). */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** SQL for the quantized coordinate: floor((c + off) / span · 2^bits)
    * clamped to [0, 2^bits). Pure IEEE ops on identical operands —
    * generated once here for BOTH engines, so the text (and hence the
    * arithmetic order) cannot drift between them. */
  def quantSql(coordE: String, off: Int, span: Int,
      bits: Int): String =
    s"greatest(least(CAST(floor((($coordE) + $off.0) / $span.0 * " +
      s"${1L << bits}.0) AS BIGINT), ${(1L << bits) - 1}), 0)"

  /** SQL for the interleaved geohash bit word over columns named
    * `lonq`/`latq`: bit i of the result (MSB first) is lon bit i/2
    * when i is even, lat bit i/2 when odd — the standard geohash
    * interleave. `duck` switches shift syntax only. */
  def bitsSql(precision: Int, duck: Boolean): String = {
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    def shr(x: String, n: Int) =
      if (n == 0) x else if (duck) s"(($x) >> $n)" else s"shiftright($x, $n)"
    (0 until bits).map { i =>
      val isLon = i % 2 == 0
      val srcBits = if (isLon) lonBits else latBits
      val src = if (isLon) "lonq" else "latq"
      val bit = s"(${shr(src, srcBits - 1 - i / 2)} & 1)"
      val shift = bits - 1 - i
      if (shift == 0) bit else s"($bit * ${1L << shift})"
    }.mkString(" + ")
  }

  /** SQL for the base-32 rendering of a bit word column `ghbits`. */
  def charsSql(precision: Int, duck: Boolean): String = {
    def shr(x: String, n: Int) =
      if (n == 0) x else if (duck) s"(($x) >> $n)" else s"shiftright($x, $n)"
    (0 until precision).map { g =>
      val grp = s"(${shr("ghbits", 5 * (precision - 1 - g))} & 31)"
      s"substr('$GeohashAlphabet', CAST($grp AS INT) + 1, 1)"
    }.mkString("concat(", ", ", ")")
  }

  /** Append a geohash cell column for (lat, lon) at the given
    * precision (chars). The geohash IS a Z-order key over the
    * lat/lon square ([[graft.ops.Layout]] writes Z-ordered layouts;
    * this is the portable string spelling): prefix-truncation merges
    * 32 cells into their parent, so per-cell aggregates roll up by
    * `substr(gh, 1, p−1)` with NO re-scan — the multi-resolution
    * spatial groupBy key at 100 TB.
    *
    * Scale: pure scan-side codegen arithmetic (quantize, interleave,
    * render) — no join, no shuffle, no UDF. */
  def withGeohash(df: DataFrame, latCol: Column, lonCol: Column,
      precision: Int, outCol: String = "geohash"): DataFrame = {
    require(precision >= 1 && precision <= 12,
      "precision must be in [1, 12] chars")
    val bits = 5 * precision
    df.withColumn("__lat", latCol.cast("double"))
      .withColumn("__lon", lonCol.cast("double"))
      .withColumn("lonq", expr(quantSql("__lon", 180, 360, (bits + 1) / 2)))
      .withColumn("latq", expr(quantSql("__lat", 90, 180, bits / 2)))
      .withColumn("ghbits", expr(bitsSql(precision, duck = false)))
      .withColumn(outCol, expr(charsSql(precision, duck = false)))
      .drop("__lat", "__lon", "lonq", "latq", "ghbits")
  }

  /** J2/E2+ — grid-density clustering (a DBSCAN-shaped pass made
    * fully relational; DBSCAN — Ester et al., KDD'96, public
    * literature): points bucket to integer cells, cells with ≥
    * `minPts` points are DENSE, 4-adjacent dense cells connect, and
    * connected components of dense cells are the clusters. Trades
    * DBSCAN's exact ε-ball for the cell approximation every
    * large-scale implementation makes — and becomes three bounded
    * relational steps instead of a neighborhood graph over points.
    * Returns per cluster: (cluster_id = min member cell key,
    * n_cells, n_points) with cell key = cx·100000 + cy.
    *
    * Scale: the density agg is cell-keyed with map-side combine
    * (cells, not points, flow onward); adjacency is a self equi-join
    * of the DENSE cell list shifted by unit offsets; the component
    * pass is [[graft.ext.Graph.connectedComponents]] — O(log n)
    * pointer-doubling rounds over the (small) dense-cell graph. */
  def gridDensityClusters(points: DataFrame, xCol: Column, yCol: Column,
      cellSize: Double, minPts: Long): DataFrame = {
    require(cellSize > 0, "cellSize > 0")
    require(minPts >= 1, "minPts >= 1")
    val cells = points.select(
        floor(xCol / cellSize).cast("long").as("__cx"),
        floor(yCol / cellSize).cast("long").as("__cy"))
      .groupBy(col("__cx"), col("__cy")).agg(count(lit(1)).as("__np"))
      .filter(col("__np") >= minPts)
      .withColumn("__cell", col("__cx") * 100000 + col("__cy"))
      .localCheckpoint() // dense-cell list: read by adjacency + rollup
    val right = cells.select(col("__cx").as("__dx"), col("__cy").as("__dy"),
      col("__cell").as("__dst"))
    // 4-neighborhood: emit each undirected adjacency once (E then N)
    val edges = cells.join(right,
      (col("__dx") === col("__cx") + 1 && col("__dy") === col("__cy")) ||
        (col("__dx") === col("__cx") && col("__dy") === col("__cy") + 1))
      .select(col("__cell").as("src"), col("__dst").as("dst"))
    // isolated dense cells still form singleton clusters: union them
    // in as self-edges so the component pass assigns them labels
    val withSelf = edges.unionByName(
      cells.select(col("__cell").as("src"), col("__cell").as("dst")))
    val comp = graft.ext.Graph.connectedComponents(withSelf, "src", "dst")
    cells.join(comp, col("__cell") === col("node"))
      .groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("__np")).as("n_points"))
  }
}
