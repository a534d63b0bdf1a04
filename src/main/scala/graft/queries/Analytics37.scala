package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 batch: NTv2 grid-file datum shifts (the last `to_crs`
  * family gap — reference accepts any EPSG,
  * /root/reference/src/data_preprocessing.py:192-193) and the
  * fragmented pre-TechNote2 JPEG-6 TIFF flavor. */
object Analytics37 {

  /** q491 — F10/S1: NTv2 GRID-SHIFT datum transform through
    * `stTransform`. A synthetic 5×5 shift grid (writer→reader round
    * trip of the public .gsb format — same closed-loop device as the
    * TIFF codec queries) registers a geographic CRS at 904267; nation
    * keys generate probe points whose coordinates, grid bounds and
    * node shifts are ALL dyadic rationals, so the bilinear
    * interpolation is exact in float32/double and the oracle replays
    * it bit-for-bit: fx/fy quotients, clamped cell indices, the
    * 4-node blend, and the final ±shift/3600 — each a single IEEE
    * rounding identical on both engines. One probe sits OUTSIDE all
    * sub-grids → null coordinates (the engine's visible row-level
    * policy; PROJ errors there).
    *
    * Node shifts (row-major, row S→N, col E→W positive-west):
    * latShift = i/8 + 1/2, lonShift = i/16 + 1/4 arc-seconds. */
  val q491 = Declared(
    "q491_ntv2_datum_shift", "F10,S1",
    (s, dir) => {
      import graft.geo.{Geo, Ntv2}
      val tmp = java.nio.file.Files.createTempDirectory("graft_q491").toString
      val grid = Ntv2.Grid(Seq(Ntv2.SubGrid("SYNTH", "NONE",
        sLatSec = 108000.0, nLatSec = 115200.0,
        eLonSec = 280800.0, wLonSec = 288000.0,
        latIncSec = 1800.0, lonIncSec = 1800.0,
        Array.tabulate(25)(i => i * 0.125f + 0.5f),
        Array.tabulate(25)(i => i * 0.0625f + 0.25f))))
      Ntv2.write(s"$tmp/synth.gsb", grid)
      Geo.registerNtv2GeographicDatum(904267, Ntv2.read(s"$tmp/synth.gsb"))
      val pts = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").cast("long").as("id"))
        .withColumn("lon",
          lit(-80.0) + (col("id") % 5).cast("double") * 0.375 + 0.0625)
        .withColumn("lat",
          lit(30.0) + expr("id div 5").cast("double") * 0.375 + 0.03125)
        .unionByName(s.range(1).select(lit(99L).as("id"),
          lit(-70.0).as("lon"), lit(31.0).as("lat"))) // outside coverage
      val g = pts.withColumn("__g", Geo.stPoint(col("lon"), col("lat")))
        .withColumn("__w", Geo.stTransform(col("__g"), 904267, 4326))
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
           |    (-lon * 3600.0 - 280800.0) / 1800.0 AS fx,
           |    (lat * 3600.0 - 108000.0) / 1800.0 AS fy
           |  FROM p),
           |c AS (
           |  SELECT id, lon, lat, fx, fy,
           |    LEAST(CAST(floor(fx) AS BIGINT), 3) AS c0,
           |    LEAST(CAST(floor(fy) AS BIGINT), 3) AS r0
           |  FROM f),
           |b AS (
           |  SELECT id, lon, lat, c0, r0,
           |    fx - CAST(c0 AS DOUBLE) AS dx, fy - CAST(r0 AS DOUBLE) AS dy
           |  FROM c),
           |s AS (
           |  SELECT id, lon, lat,
           |    (CAST(r0*5+c0 AS DOUBLE)*0.125+0.5) * (1-dx) * (1-dy)
           |      + (CAST(r0*5+c0+1 AS DOUBLE)*0.125+0.5) * dx * (1-dy)
           |      + (CAST((r0+1)*5+c0 AS DOUBLE)*0.125+0.5) * (1-dx) * dy
           |      + (CAST((r0+1)*5+c0+1 AS DOUBLE)*0.125+0.5) * dx * dy AS dlat,
           |    (CAST(r0*5+c0 AS DOUBLE)*0.0625+0.25) * (1-dx) * (1-dy)
           |      + (CAST(r0*5+c0+1 AS DOUBLE)*0.0625+0.25) * dx * (1-dy)
           |      + (CAST((r0+1)*5+c0 AS DOUBLE)*0.0625+0.25) * (1-dx) * dy
           |      + (CAST((r0+1)*5+c0+1 AS DOUBLE)*0.0625+0.25) * dx * dy AS dlon
           |  FROM b)
           |SELECT id, lon - dlon/3600.0 AS lon_w, lat + dlat/3600.0 AS lat_w
           |FROM s
           |UNION ALL
           |SELECT 99, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
           |ORDER BY id""".stripMargin),
    "The parsed grid (a few MB for national grids) rides in the UDF " +
      "closure — broadcast-scale, never shuffled; the bilinear + " +
      "fixed-point inverse run scan-side per point, embarrassingly " +
      "parallel. Same story at 100 TB: the shift is a map stage.")

  val all: Seq[Declared] = Seq(q491)
}
