package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-11 batch: NADCON .las/.los datum grids (the final grid-shift
  * format — reference accepts any EPSG via GDAL/proj,
  * /root/reference/src/data_preprocessing.py:192-193), the composed
  * retrieval gate → MaxSim rerank pipeline, and the streaming
  * near-dup screen. */
object Analytics38 {

  /** q512 — F10/S1: NADCON grid-shift datum transform through
    * `stTransform`. A synthetic 5×25 .las/.los pair (writer→reader
    * round trip of the public NOAA format — the q491 closed-loop
    * device) registers a geographic CRS at 904268; nation keys
    * generate probe points whose coordinates, grid bounds and node
    * shifts are ALL dyadic rationals, so the bilinear interpolation
    * is exact in float32/double and the oracle replays it
    * bit-for-bit. One probe sits OUTSIDE coverage → null coordinates
    * (the engine's visible row-level policy; PROJ errors there).
    *
    * Node shifts (row-major, row S→N, col W→E east-positive):
    * latShift = i/8 + 1/2, lonShift = i/16 + 1/4 arc-seconds with the
    * longitude shift POSITIVE WEST (NOAA convention), i = r·25 + c. */
  val q512 = Declared(
    "q512_nadcon_datum_shift", "F10,S1",
    (s, dir) => {
      import graft.geo.{Geo, Nadcon}
      val tmp = java.nio.file.Files.createTempDirectory("graft_q512").toString
      val grid = Nadcon.Grid("GRAFT SYNTH NAD27", nCols = 25, nRows = 5,
        xMinDeg = -80.0, dxDeg = 0.5, yMinDeg = 30.0, dyDeg = 0.5,
        Array.tabulate(125)(i => i * 0.125f + 0.5f),
        Array.tabulate(125)(i => i * 0.0625f + 0.25f))
      Nadcon.write(s"$tmp/synth.las", s"$tmp/synth.los", grid)
      Geo.registerGridShiftDatum(904268,
        Nadcon.read(s"$tmp/synth.las", s"$tmp/synth.los"))
      val pts = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").cast("long").as("id"))
        .withColumn("lon",
          lit(-80.0) + (col("id") % 5).cast("double") * 0.375 + 0.0625)
        .withColumn("lat",
          lit(30.0) + expr("id div 5").cast("double") * 0.375 + 0.03125)
        .unionByName(s.range(1).select(lit(99L).as("id"),
          lit(-60.0).as("lon"), lit(31.0).as("lat"))) // outside coverage
      val g = pts.withColumn("__g", Geo.stPoint(col("lon"), col("lat")))
        .withColumn("__w", Geo.stTransform(col("__g"), 904268, 4326))
      g.select(col("id"),
          Geo.stX(col("__w")).as("lon_w"), Geo.stY(col("__w")).as("lat_w"))
        .orderBy(col("id"))
    },
    Some("""WITH p AS (
           |  SELECT CAST(n_nationkey AS BIGINT) AS id,
           |    -80.0 + CAST(n_nationkey % 5 AS DOUBLE) * 0.375 + 0.0625 AS lon,
           |    30.0 + CAST(n_nationkey // 5 AS DOUBLE) * 0.375 + 0.03125 AS lat
           |  FROM nation),
           |f AS (
           |  SELECT id, lon, lat,
           |    (lon + 80.0) / 0.5 AS fx,
           |    (lat - 30.0) / 0.5 AS fy
           |  FROM p),
           |c AS (
           |  SELECT id, lon, lat, fx, fy,
           |    LEAST(CAST(floor(fx) AS BIGINT), 23) AS c0,
           |    LEAST(CAST(floor(fy) AS BIGINT), 3) AS r0
           |  FROM f),
           |b AS (
           |  SELECT id, lon, lat, c0, r0,
           |    fx - CAST(c0 AS DOUBLE) AS dx, fy - CAST(r0 AS DOUBLE) AS dy
           |  FROM c),
           |s AS (
           |  SELECT id, lon, lat,
           |    (CAST(r0*25+c0 AS DOUBLE)*0.125+0.5) * (1-dx) * (1-dy)
           |      + (CAST(r0*25+c0+1 AS DOUBLE)*0.125+0.5) * dx * (1-dy)
           |      + (CAST((r0+1)*25+c0 AS DOUBLE)*0.125+0.5) * (1-dx) * dy
           |      + (CAST((r0+1)*25+c0+1 AS DOUBLE)*0.125+0.5) * dx * dy AS dlat,
           |    (CAST(r0*25+c0 AS DOUBLE)*0.0625+0.25) * (1-dx) * (1-dy)
           |      + (CAST(r0*25+c0+1 AS DOUBLE)*0.0625+0.25) * dx * (1-dy)
           |      + (CAST((r0+1)*25+c0 AS DOUBLE)*0.0625+0.25) * (1-dx) * dy
           |      + (CAST((r0+1)*25+c0+1 AS DOUBLE)*0.0625+0.25) * dx * dy AS dlon
           |  FROM b)
           |SELECT id, lon - dlon/3600.0 AS lon_w, lat + dlat/3600.0 AS lat_w
           |FROM s
           |UNION ALL
           |SELECT 99, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
           |ORDER BY id""".stripMargin),
    "The parsed .las/.los pair (~1.4 MB each for CONUS) rides in the " +
      "UDF closure — broadcast-scale, never shuffled; the bilinear + " +
      "fixed-point inverse run scan-side per point, embarrassingly " +
      "parallel. Same story at 100 TB: the shift is a map stage.")

  val all: Seq[Declared] = Seq(q512)
}
