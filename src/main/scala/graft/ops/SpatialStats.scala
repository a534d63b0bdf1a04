package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial autocorrelation statistics over gridded point fields —
  * global Moran's I and local Getis-Ord Gi* hotspots (Getis & Ord
  * 1992; Anselin 1995 for the local family). The reference's
  * aggregation surface stops at per-cell rollups
  * (/root/reference/src/data_preprocessing.py:239-273 buffer/grid
  * aggregation); these are the standard next questions a spatial
  * analyst asks of exactly that rollup — "is the field clustered at
  * all?" (Moran) and "where?" (Gi*).
  *
  * Scale design: points collapse to grid CELLS first (map-side
  * combined groupBy — the only fact-table pass). Everything after
  * runs on the bounded cell rollup: queen adjacency is an EQUI-join
  * on 8 generated neighbor keys (never an inequality or cross join),
  * and the two global moments ride in on a broadcast single-row
  * cross join. All deviation algebra is exact integer (cents,
  * decimal(38,0) cross-products); each statistic performs its one
  * double division/sqrt at the very end, in the same pinned order as
  * the oracle — bit-identical, no rounding needed.
  */
object SpatialStats {

  private val d38 = "decimal(38,0)"

  /** Grid-cell rollup: (cx, cy, xsum) with xsum = Σ v (integer). */
  private def cells(points: DataFrame, xCol: Column, yCol: Column,
      vCol: Column, cellSize: Double): DataFrame =
    points
      .groupBy(floor(xCol / cellSize).cast("long").as("cx"),
        floor(yCol / cellSize).cast("long").as("cy"))
      .agg(sum(vCol).as("xsum"))

  /** The 8-neighbor (queen) directed adjacency of occupied cells, as
    * an equi-join on generated neighbor coordinates. Returns
    * (cx, cy, xsum, nx, ny, nxsum) — one row per ordered pair. */
  private def queenPairs(c: DataFrame): DataFrame = {
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1
      if dx != 0 || dy != 0 } yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = c
      .select(col("cx"), col("cy"), col("xsum"),
        explode(array(offsets: _*)).as("o"))
      .select(col("cx"), col("cy"), col("xsum"),
        (col("cx") + col("o.dx")).as("nx"), (col("cy") + col("o.dy")).as("ny"))
    val nbr = c.select(col("cx").as("nx"), col("cy").as("ny"),
      col("xsum").as("nxsum"))
    probes.join(nbr, Seq("nx", "ny"))
  }

  /** Global Moran's I of Σv per grid cell under binary queen
    * contiguity. Single-row result:
    * (n_cells, w_pairs, morans_i) with
    * I = (N/W)·Σ_ij w_ij d_i d_j / Σ_i d_i², d_i = x_i − x̄ —
    * computed on N-scaled integer deviations (N·x_i − S) so the
    * scaling cancels exactly and the lone double division is last. */
  def moransI(points: DataFrame, xCol: Column, yCol: Column, vCol: Column,
      cellSize: Double): DataFrame = {
    val c = cells(points, xCol, yCol, vCol, cellSize)
    val tot = c.agg(count(lit(1)).as("n_cells"), sum("xsum").as("s_tot"))
    val dev = c.crossJoin(broadcast(tot))
      .select(col("cx"), col("cy"), col("n_cells"),
        (col("n_cells") * col("xsum") - col("s_tot")).as("d"))
    val den = dev.agg(max("n_cells").as("n_cells"),
      sum(col("d").cast(d38) * col("d").cast(d38)).as("den"))
    val devPairs = queenPairs(
      dev.select(col("cx"), col("cy"), col("d").as("xsum")))
    val num = devPairs.agg(count(lit(1)).as("w_pairs"),
      sum(col("xsum").cast(d38) * col("nxsum").cast(d38)).as("num"))
    num.crossJoin(broadcast(den))
      .select(col("n_cells"), col("w_pairs"),
        // zero-variance (or isolated-cells) field: I is undefined, not
        // NaN. Unrounded on purpose (q186 discipline): every input is
        // an exact integer and the ×/÷ chain is correctly-rounded IEEE
        // in a pinned order, so both engines produce the identical
        // double bit pattern — rounding could only ADD tie risk.
        when(col("den") =!= 0 && col("w_pairs") =!= 0,
          col("n_cells").cast("double") * col("num").cast("double") /
            (col("w_pairs").cast("double") * col("den").cast("double")))
          .as("morans_i"))
  }

  /** Local Getis-Ord Gi* per occupied cell (3×3 neighborhood
    * INCLUDING self, only occupied cells weighted — the standard
    * binary-weight Gi* on a sparse grid). Output per cell:
    * (cx, cy, x_sum, w_i, gi_z) with
    * z_i = (N·G_i − S·W_i) / sqrt((N·Σx² − S²)(N·W_i − W_i²)/(N−1)),
    * the N-cleared form of Ord & Getis 1995 eq. 4.1 — integer
    * numerator, one sqrt + division at the end (pinned order,
    * unrounded — bit-identical across engines). */
  def getisOrdGiStar(points: DataFrame, xCol: Column, yCol: Column,
      vCol: Column, cellSize: Double): DataFrame = {
    val c = cells(points, xCol, yCol, vCol, cellSize)
    val tot = c.agg(count(lit(1)).as("n_cells"), sum("xsum").as("s_tot"),
      sum(col("xsum").cast(d38) * col("xsum").cast(d38)).as("sq_tot"))
    // neighborhood sum incl self: the 8 queen neighbors + the cell.
    val nbrAgg = queenPairs(c)
      .groupBy(col("cx"), col("cy"))
      .agg(sum("nxsum").as("nsum"), count(lit(1)).as("ncnt"))
    val g = c.join(nbrAgg, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), col("xsum"),
        (coalesce(col("nsum"), lit(0L)) + col("xsum")).as("gi"),
        (coalesce(col("ncnt"), lit(0L)) + lit(1L)).as("wi"))
    // undefined when the neighborhood covers ALL cells (W_i = N) or
    // the field has zero variance — emit null, never NaN.
    val varTerm = (col("n_cells").cast(d38) * col("sq_tot") -
      col("s_tot").cast(d38) * col("s_tot").cast(d38)).cast("double")
    val wTerm = (col("n_cells") * col("wi") - col("wi") * col("wi"))
      .cast("double")
    g.crossJoin(broadcast(tot))
      .select(col("cx"), col("cy"), col("xsum").as("x_sum"),
        col("wi").as("w_i"),
        // unrounded: exact-integer inputs through a pinned-order
        // correctly-rounded chain (÷, ×, sqrt) — bit-identical across
        // engines, no tie exposure (q186 discipline).
        when(varTerm =!= 0.0 && wTerm =!= 0.0,
          (col("n_cells") * col("gi") - col("s_tot") * col("wi"))
            .cast("double") /
          sqrt(varTerm * (wTerm / (col("n_cells") - 1).cast("double"))))
          .as("gi_z"))
  }

  /** A3+ — LISA: local Moran's I per occupied cell (Anselin 1995,
    * "Local Indicators of Spatial Association") — WHERE is the field
    * clustered, and in which quadrant:
    *   I_i = (N·d_i·Σ_{j∈nbrs} d_j) / Σ_k d_k²
    * (binary queen weights, N-scaled deviations so everything before
    * the final division is an exact integer). The quadrant label
    * (HH/LL high-high/low-low cluster, HL/LH outlier) is the map a
    * [[getisOrdGiStar]] hotspot analysis is read against. Returns per
    * occupied cell with ≥1 neighbor: (cx, cy, d_scaled, lag_scaled,
    * local_i, quadrant).
    *
    * Scale: the [[moransI]] envelope — one cell rollup, one queen
    * equi-join, broadcast moments; per-cell output instead of the
    * global sum. */
  def localMoran(points: DataFrame, xCol: Column, yCol: Column,
      vCol: Column, cellSize: Double): DataFrame = {
    val c = cells(points, xCol, yCol, vCol, cellSize)
    val tot = c.agg(count(lit(1)).as("n_cells"), sum("xsum").as("s_tot"))
    val dev = c.crossJoin(broadcast(tot))
      .select(col("cx"), col("cy"), col("n_cells"),
        (col("n_cells") * col("xsum") - col("s_tot")).as("d"))
      .localCheckpoint()
    val den = dev.agg(sum(col("d").cast(d38) * col("d").cast(d38))
      .cast(d38).as("__den"))
    val lag = queenPairs(dev.select(col("cx"), col("cy"),
        col("d").as("xsum")))
      .groupBy(col("cx"), col("cy"))
      .agg(sum(col("nxsum")).as("lag_scaled"), count(lit(1)).as("__nn"))
    dev.join(lag, Seq("cx", "cy"))
      .crossJoin(broadcast(den))
      .select(col("cx"), col("cy"), col("d").as("d_scaled"),
        col("lag_scaled"),
        when(col("__den") =!= 0,
          (col("n_cells").cast(d38) * col("d").cast(d38) *
            col("lag_scaled").cast(d38)).cast("double") /
            col("__den").cast("double")).as("local_i"),
        when(col("d") >= 0 && col("lag_scaled") >= 0, "HH")
          .when(col("d") < 0 && col("lag_scaled") < 0, "LL")
          .when(col("d") >= 0, "HL").otherwise("LH").as("quadrant"))
      .orderBy(col("cx"), col("cy"))
  }

  /** A3+ — join-count statistics for a BINARY field under queen
    * contiguity (Cliff & Ord 1981 ch. 1; the autocorrelation test for
    * presence/absence maps): count BB, WW and BW adjacent ordered
    * pairs and compare BB to its free-sampling expectation
    *   E[BB] = W·n_B(n_B−1) / (N(N−1)),  (ordered pairs, W = Σw)
    * with the exact-integer z-numerator N(N−1)·BB − W·n_B(n_B−1)
    * reported alongside (positive ⇒ black cells clump). Returns ONE
    * row: (n_cells, n_black, w_pairs, bb, ww, bw, bb_expected_num,
    * bb_excess_num) — both _num values share the N(N−1) denominator.
    *
    * Scale: the [[moransI]] envelope on a 0/1 field — one rollup, one
    * queen equi-join, one global agg. */
  def joinCounts(points: DataFrame, xCol: Column, yCol: Column,
      blackCond: Column, cellSize: Double): DataFrame = {
    val c = cells(points, xCol, yCol,
      when(blackCond, 1L).otherwise(0L), cellSize)
      .select(col("cx"), col("cy"),
        when(col("xsum") > 0, 1L).otherwise(0L).as("xsum"))
      .localCheckpoint()
    val tot = c.agg(count(lit(1)).as("n_cells"),
      sum(col("xsum")).as("n_black"))
    val pairs = queenPairs(c)
      .agg(count(lit(1)).as("w_pairs"),
        sum(col("xsum") * col("nxsum")).as("bb"),
        sum((lit(1L) - col("xsum")) * (lit(1L) - col("nxsum"))).as("ww"))
    pairs.crossJoin(broadcast(tot))
      .select(col("n_cells"), col("n_black"), col("w_pairs"),
        col("bb"), col("ww"),
        (col("w_pairs") - col("bb") - col("ww")).as("bw"),
        (col("w_pairs").cast(d38) * col("n_black").cast(d38) *
          (col("n_black") - 1).cast(d38)).cast(d38).cast("long")
          .as("bb_expected_num"),
        ((col("n_cells").cast(d38) * (col("n_cells") - 1).cast(d38) *
          col("bb").cast(d38)) -
          (col("w_pairs").cast(d38) * col("n_black").cast(d38) *
            (col("n_black") - 1).cast(d38))).cast(d38).cast("long")
          .as("bb_excess_num"))
  }


  /** A3+ — Clark–Evans nearest-neighbor index (Clark & Evans 1954):
    * R = observed mean NN distance / expected under CSR
    * (0.5·√(A/n)) — R < 1 clustered, ≈ 1 random, → 2.15 maximally
    * dispersed; with the standard z = (r̄_obs − r̄_exp)/(0.26136·√A/n).
    * Coincident points contribute NN distance 0 exactly; singleton
    * sites resolve their NN through the grid-probe + brute-fallback
    * pattern; each distance is one correctly-rounded sqrt of an exact
    * integer, micro-quantized. No edge correction (stated scope).
    * Returns ONE row: (n_points, sum_nn_micro, mean_nn, r_ce, z_ce).
    *
    * Scale: the [[mutualNearestNeighbors]] envelope — site rollup,
    * 3×3 grid-cell candidate equi-join, site-bounded brute fallback
    * only for radius misses. */
  def clarkEvans(points: DataFrame, xCol: Column, yCol: Column,
      pruneRadius: Double, area: Double): DataFrame = {
    require(pruneRadius > 0 && area > 0, "pruneRadius, area > 0")
    val r2lim = { val r = math.round(pruneRadius); lit(r * r) }
    val pts = points.select(xCol.cast("long").as("px"),
      yCol.cast("long").as("py"))
    val sites = graft.core.OperatorCaches.cached(
      pts.groupBy(col("px"), col("py")).agg(count(lit(1)).as("m")))
    val cell = math.max(1L, math.round(pruneRadius))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val singles = sites.filter(col("m") === 1)
      .select(col("px"), col("py"))
    val probes = singles
      .withColumn("o", explode(array(offsets: _*)))
      .select(col("px"), col("py"),
        expr(s"(px div ${cell}L) + o.dx").as("cx"),
        expr(s"(py div ${cell}L) + o.dy").as("cy"))
    val homes = sites.select(col("px").as("nx"), col("py").as("ny"),
      expr(s"px div ${cell}L").as("cx"), expr(s"py div ${cell}L").as("cy"))
    val d2c = (col("px") - col("nx")) * (col("px") - col("nx")) +
      (col("py") - col("ny")) * (col("py") - col("ny"))
    def argmin(cand: DataFrame): DataFrame = cand
      .groupBy(col("px"), col("py")).agg(min(col("d2")).as("d2"))
    val solved = argmin(probes.join(homes, Seq("cx", "cy"))
      .filter(col("nx") =!= col("px") || col("ny") =!= col("py"))
      .withColumn("d2", d2c).filter(col("d2") <= r2lim))
    val unsolved = singles.join(solved.select(col("px"), col("py")),
      Seq("px", "py"), "left_anti")
    val brute = argmin(unsolved
      .crossJoin(sites.select(col("px").as("nx"), col("py").as("ny")))
      .filter(col("nx") =!= col("px") || col("ny") =!= col("py"))
      .withColumn("d2", d2c))
    val nn = solved.unionByName(brute)
      .withColumn("__dmic",
        floor(sqrt(col("d2").cast("double")) * 1e6 + 0.5).cast("long"))
    val tot = sites.agg(sum(col("m")).as("n_points"))
    nn.agg(sum(col("__dmic")).as("__s"))
      .crossJoin(broadcast(tot))
      .select(col("n_points"),
        coalesce(col("__s"), lit(0L)).as("sum_nn_micro"))
      .withColumn("mean_nn",
        col("sum_nn_micro").cast("double") / 1e6 /
          col("n_points").cast("double"))
      .withColumn("r_ce", round(col("mean_nn") /
        (lit(0.5) * sqrt(lit(area) / col("n_points").cast("double"))), 6))
      .withColumn("z_ce", round(
        (col("mean_nn") -
          lit(0.5) * sqrt(lit(area) / col("n_points").cast("double"))) /
          (lit(0.26136) * sqrt(lit(area)) /
            col("n_points").cast("double")), 6))
      .withColumn("mean_nn", round(col("mean_nn"), 6))
  }

  /** A zone for [[arealInterpolate]]: a named axis-aligned rectangle
    * [x0, x1) × [y0, y1) in the same integer units as the grid. */
  final case class Zone(name: String, x0: Long, y0: Long, x1: Long, y1: Long)

  /** A3+/J2 — areal interpolation (Goodchild & Lam 1980): re-aggregate
    * a gridded value field onto an INCOMPATIBLE zonal system by
    * area-weighting each cell's contribution with its exact rectangle-
    * intersection overlap — the zonal-transfer op behind every
    * census-tract ↔ catchment ↔ pixel-grid reconciliation. Cells are
    * axis-aligned `cellSize` squares, zones axis-aligned rectangles,
    * so every overlap area is an EXACT integer and both the extensive
    * (mass-preserving: Σ v·overlap/cellArea) and intensive
    * (area-weighted mean: Σ v·overlap / Σ overlap) readouts divide
    * exactly once per zone.
    *
    * Returns one row per zone: (zone, covered_area, mass, mean_value)
    * — covered_area = Σ overlap (0 ⇒ null readouts).
    *
    * Scale: ONE fact pass to the cell rollup; zones are a literal
    * broadcast list, so the overlap join is cells × |zones| with the
    * zone predicate pushed into the join — no shuffle keyed wider
    * than the cell grid. */
  def arealInterpolate(points: DataFrame, xCol: Column, yCol: Column,
      vCol: Column, cellSize: Long, zones: Seq[Zone]): DataFrame = {
    require(cellSize > 0, "cellSize > 0")
    require(zones.nonEmpty, "at least one zone")
    require(zones.map(_.name).distinct.size == zones.size,
      "zone names must be unique")
    require(zones.forall(z => z.x1 > z.x0 && z.y1 > z.y0),
      "zones must be non-degenerate rectangles")
    val c = cells(points, xCol, yCol, vCol, cellSize.toDouble)
    val zdf = zones.map(z => struct(lit(z.name).as("zone"),
      lit(z.x0).as("zx0"), lit(z.y0).as("zy0"),
      lit(z.x1).as("zx1"), lit(z.y1).as("zy1")))
    val joined = c.select(col("cx"), col("cy"), col("xsum"),
        explode(array(zdf: _*)).as("z"))
      .select(col("cx"), col("cy"), col("xsum"), col("z.*"))
      .withColumn("__ox",
        greatest(lit(0L), least(col("zx1"), (col("cx") + 1) * cellSize) -
          greatest(col("zx0"), col("cx") * cellSize)))
      .withColumn("__oy",
        greatest(lit(0L), least(col("zy1"), (col("cy") + 1) * cellSize) -
          greatest(col("zy0"), col("cy") * cellSize)))
      .withColumn("__ov", col("__ox") * col("__oy"))
      .filter(col("__ov") > 0)
    val agged = joined.groupBy(col("zone"))
      .agg(sum(col("__ov")).as("__ca"),
        sum(col("xsum").cast(d38) * col("__ov")).as("__wsum"))
    // every declared zone emits a row — zones covering no occupied
    // cell report zero area and null readouts, not silence
    val zoneNames = points.sparkSession.range(1)
      .select(explode(array(zones.map(z => lit(z.name)): _*)).as("zone"))
    zoneNames.join(agged, Seq("zone"), "left")
      .select(col("zone"), coalesce(col("__ca"), lit(0L)).as("covered_area"),
        when(col("__ca").isNotNull, col("__wsum").cast("double") /
          lit(cellSize.toDouble * cellSize)).as("mass"),
        when(col("__ca").isNotNull,
          col("__wsum").cast("double") / col("__ca").cast("double"))
          .as("mean_value"))
      .orderBy(col("zone"))
  }

  /** J3+ — mutual (reciprocal) nearest-neighbor pairs: the record-
    * linkage / panel-matching primitive — a pair (a, b) matches when
    * each is the other's single nearest neighbor (ties broken by
    * (d², id), so the relation is a deterministic function). Output
    * one row per mutual pair: (id_a, id_b, d2) with id_a < id_b.
    *
    * Coordinates are integer-valued by contract (exact d²).
    *
    * Scale: candidate pairs come from a 3×3 grid-bucket EQUI-join at
    * `pruneRadius` (any true neighbor within the radius is in some
    * adjacent cell); points whose nearest candidate is farther than
    * the radius fall back to a brute pass — bounded by the unsolved
    * count, which a well-chosen radius keeps near zero. Never an
    * all-pairs join on the solved path. */
  def mutualNearestNeighbors(points: DataFrame, idCol: Column,
      xCol: Column, yCol: Column, pruneRadius: Double): DataFrame = {
    require(pruneRadius > 0, "pruneRadius > 0")
    val r2 = { val r = math.round(pruneRadius); lit(r * r) }
    val pts = points.select(idCol.cast("long").as("id"),
      xCol.cast("long").as("px"), yCol.cast("long").as("py"))
    // SITE rollup first: coincident points collapse to one row with
    // their two smallest ids — at high multiplicity (the integer-
    // lattice regime) every later stage is bounded by the SITE count,
    // not the row count. Keyed window (site), never global.
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("px"), col("py")).orderBy(col("id"))
    val wsAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("px"), col("py"))
    val sites = graft.core.OperatorCaches.cached(
      pts.withColumn("__rn", row_number().over(ws))
        .withColumn("__m", count(lit(1)).over(wsAll))
        .filter(col("__rn") <= 2)
        .groupBy(col("px"), col("py"))
        .agg(min(col("id")).as("m1"), max(col("id")).as("m2"),
          max(col("__m")).as("m")))
    // a multi-site's two smallest ids are mutual at distance 0 (every
    // farther point loses to the coincident partner)
    val multiPairs = sites.filter(col("m") >= 2)
      .select(col("m1").as("id_a"), col("m2").as("id_b"),
        lit(0L).as("d2"))
    // singleton sites resolve their nearest neighbor across SITES; the
    // reciprocal can only be another singleton (multi-site points pair
    // internally), so the mutual join runs on singles only
    val singles = sites.filter(col("m") === 1)
      .select(col("m1").as("id"), col("px"), col("py"))
    val cell = math.max(1L, math.round(pruneRadius))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = singles
      .withColumn("o", explode(array(offsets: _*)))
      .select(col("id"), col("px"), col("py"),
        expr(s"(px div ${cell}L) + o.dx").as("cx"),
        expr(s"(py div ${cell}L) + o.dy").as("cy"))
    // NN targets are sites; the site's smallest id is the point-level
    // argmin (coincident points tie on d², smallest id wins)
    val homes = sites.select(col("m1").as("nid"), col("px").as("nx"),
      col("py").as("ny"), expr(s"px div ${cell}L").as("cx"),
      expr(s"py div ${cell}L").as("cy"))
    val d2c = (col("px") - col("nx")) * (col("px") - col("nx")) +
      (col("py") - col("ny")) * (col("py") - col("ny"))
    // argmin as a partial-aggregable min over (d², nid) structs — a
    // map-side-combined agg, not a rank window over the pair set
    def argmin(cand: DataFrame): DataFrame = cand
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("nid"))).as("__m"))
      .select(col("id"), col("__m.nid").as("nid"), col("__m.d2").as("d2"))
    val solved = argmin(probes.join(homes, Seq("cx", "cy"))
      .filter(col("nid") =!= col("id"))
      .withColumn("d2", d2c)
      .filter(col("d2") <= r2))
    // brute fallback for singletons with no candidate within the
    // radius — bounded by the unsolved count (near zero at a sane
    // radius), and still site-count-bounded on the right side
    val unsolved = singles.join(solved.select(col("id")),
      Seq("id"), "left_anti")
    val bruteNn = argmin(unsolved
      .crossJoin(sites.select(col("m1").as("nid"), col("px").as("nx"),
        col("py").as("ny")))
      .filter(col("nid") =!= col("id"))
      .withColumn("d2", d2c))
    val nn = solved.unionByName(bruteNn)
    val rev = nn.select(col("id").as("nid"), col("nid").as("id"))
    val singlePairs = nn.join(rev, Seq("id", "nid"))
      .filter(col("id") < col("nid"))
      .select(col("id").as("id_a"), col("nid").as("id_b"), col("d2"))
    multiPairs.unionByName(singlePairs)
  }

  /** A3+ — Ripley's K / L function over an integer point field
    * (Ripley 1977; no edge correction — stated scope): for each
    * radius r, K̂(r) = A · #{ordered pairs with d ≤ r} / (n(n−1)) and
    * L̂(r) = sqrt(K̂/π); L̂ − r > 0 signals clustering at that scale,
    * < 0 dispersion. Pair counts are exact integers from ONE 3×3
    * grid-bucket candidate join at the LARGEST radius; each smaller
    * radius is a conditional sum over the same candidates.
    *
    * Returns one row per radius: (r, n_points, n_pairs, k_hat, l_hat,
    * l_minus_r).
    *
    * Scale: the candidate join is an equi-join on cell keys sized by
    * max(radii) — pair volume is the true local-density pair count,
    * never n²; the per-radius finish is conditional aggregation over
    * one pass of those pairs. */
  /** A3+/F9 — gridded kernel-density hotspot surface with a discrete
    * Epanechnikov kernel (Silverman 1986 §2.4, lattice form): points
    * collapse to grid cells, then every occupied cell SCATTERS its
    * mass to all cells within `radius` cells with the integer weight
    * w(d²) = radius² − d² (the Epanechnikov profile 1 − (d/h)² cleared
    * of its h² denominator — support d² < radius², so the weight is a
    * positive integer and every density value is an EXACT integer).
    * Output one row per cell that receives any mass — including empty
    * cells near occupied ones, the point of a density surface:
    * (cx, cy, kde_mass, n_src) with kde_mass = Σ_src v_src·w and
    * n_src the count of contributing occupied cells.
    *
    * Scale: ONE fact pass to the cell rollup; the scatter is a
    * generated-key explode of the ROLLUP by the ≤ π·radius² in-disc
    * offsets followed by a map-side-combinable groupBy on target cell
    * keys — never a distance join against the fact table, no
    * inequality predicates anywhere. */
  def kdeGrid(points: DataFrame, xCol: Column, yCol: Column, vCol: Column,
      cellSize: Double, radius: Int): DataFrame = {
    require(cellSize > 0, "cellSize > 0")
    require(radius >= 1 && radius <= 16, "1 <= radius <= 16")
    val r2 = radius.toLong * radius
    val c = cells(points, xCol, yCol, vCol, cellSize)
    val offs = for { dx <- -radius to radius; dy <- -radius to radius
      if dx.toLong * dx + dy.toLong * dy < r2 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"),
        lit(r2 - dx.toLong * dx - dy.toLong * dy).as("w"))
    c.select(col("cx"), col("cy"), col("xsum"),
        explode(array(offs: _*)).as("o"))
      .groupBy((col("cx") + col("o.dx")).as("cx"),
        (col("cy") + col("o.dy")).as("cy"))
      .agg(sum(col("xsum") * col("o.w")).as("kde_mass"),
        count(lit(1)).as("n_src"))
  }

  def ripleysK(points: DataFrame, xCol: Column, yCol: Column,
      radii: Seq[Int], area: Double): DataFrame = {
    require(radii.nonEmpty && radii.forall(_ > 0), "radii > 0")
    require(area > 0, "area > 0")
    val rmax = radii.max.toLong
    // SITE rollup first: coincident points collapse to (site,
    // multiplicity); a cross-site pair then counts m_a·m_b ordered
    // point pairs and a site with m ≥ 2 contributes m(m−1) zero-
    // distance pairs — so every stage after the rollup is bounded by
    // the SITE count (the lattice), not the point count.
    val sites = graft.core.OperatorCaches.cached(
      points.select(xCol.cast("long").as("px"), yCol.cast("long").as("py"))
        .groupBy(col("px"), col("py")).agg(count(lit(1)).as("m")))
    // cell = rmax/2 with a ±2 probe window: |Δx| ≤ rmax still lands in
    // the window, and the finer cells cut candidate volume ~30% vs the
    // classic 3×3-at-rmax scheme when rmax is large against the field
    val cell = math.max(1L, (rmax + 1) / 2)
    val reach = ((rmax + cell - 1) / cell).toInt
    val offsets = for { dx <- -reach to reach; dy <- -reach to reach }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = sites
      .withColumn("o", explode(array(offsets: _*)))
      .select(col("px"), col("py"), col("m"),
        expr(s"(px div ${cell}L) + o.dx").as("cx"),
        expr(s"(py div ${cell}L) + o.dy").as("cy"))
    val homes = sites.select(col("px").as("nx"), col("py").as("ny"),
      col("m").as("nm"), expr(s"px div ${cell}L").as("cx"),
      expr(s"py div ${cell}L").as("cy"))
    val pairs = probes.join(homes, Seq("cx", "cy"))
      .filter(col("nx") =!= col("px") || col("ny") =!= col("py"))
      .withColumn("d2",
        (col("px") - col("nx")) * (col("px") - col("nx")) +
          (col("py") - col("ny")) * (col("py") - col("ny")))
      .withColumn("__w", col("m") * col("nm"))
    val aggs = radii.zipWithIndex.map { case (r, ix) =>
      sum(when(col("d2") <= r.toLong * r, col("__w")).otherwise(0L))
        .as(s"__p$ix")
    }
    val counts = pairs.agg(aggs.head, aggs.tail: _*)
    // zero-distance pairs inside multi-sites + the point total
    val n = sites.agg(sum(col("m")).as("n_points"),
      sum(col("m") * (col("m") - 1)).as("__self"))
    val one = counts.crossJoin(broadcast(n))
    val rows = radii.zipWithIndex.map { case (r, ix) =>
      val np = coalesce(col(s"__p$ix"), lit(0L)) + col("__self")
      val kHat = lit(area) * np.cast("double") /
        (col("n_points").cast("double") *
          (col("n_points") - 1).cast("double"))
      one.select(lit(r.toLong).as("r"), col("n_points"),
        np.as("n_pairs"), kHat.as("k_hat"),
        sqrt(kHat / math.Pi).as("l_hat"),
        (sqrt(kHat / math.Pi) - r).as("l_minus_r"))
    }
    rows.reduce(_ unionByName _).orderBy(col("r"))
  }
}
