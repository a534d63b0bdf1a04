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
}
