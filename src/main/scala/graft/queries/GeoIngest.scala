package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.pipeline.{JStr, Operation, Pipeline}

/** Round-7 batch: binary geo-format INGEST (S1) — the reference opens
  * any GDAL raster/vector file (src/data_preprocessing.py:462-492);
  * these queries exercise the engine's no-GDAL readers end to end:
  * a .shp/.dbf fixture written by the engine's own sink flows back
  * through the reader cascade and the pipeline registry; an
  * uncompressed GeoTIFF decodes (distributed, strip-parallel) into
  * the cell-table model the A3 raster ops consume. Fixtures are
  * deterministic functions of the parquet tables / index formulas, so
  * the DuckDB oracle reproduces them from the tables alone. */
object GeoIngest {

  /** q440 — S1/C8: nation points → shapefile sink → reader cascade →
    * pipeline registry (clean_geometries + filter) → coordinates.
    * Coordinates are exact dyadic/small-decimal doubles (k·2.5, k·3.0)
    * so the .shp IEEE doubles and the DBF long/string attributes
    * round-trip bit-exactly into the oracle's arithmetic. */
  val q440 = Declared(
    "q440_shp_pipeline", "S1,C8",
    (s, dir) => {
      import graft.geo.Geo
      val tmp = java.nio.file.Files.createTempDirectory("graft_q440").toString
      val pts = Tables.nation(s, dir).select(
        col("n_nationkey").cast("long").as("id"),
        col("n_name").as("name"),
        (col("n_nationkey").cast("double") * 2.5).as("px"),
        ((col("n_nationkey") % 7).cast("double") * 3.0).as("py"))
        .select(col("id"), col("name"),
          Geo.stPoint(col("px"), col("py")).as("geometry"))
      graft.io.Shapefile.writePoints(pts, s"$tmp/nations")
      val back = graft.io.Sources.openData(s, s"$tmp/nations.shp")
      val (out, _) = Pipeline("shp_ingest")
        .addOperation(Operation("clean", "clean_geometries"))
        .addOperation(Operation("evens", "filter",
          "condition" -> JStr("id % 2 = 0")))
        .run(back)
      out.select(col("id"), col("name"),
        Geo.stX(col("geometry")).as("x"), Geo.stY(col("geometry")).as("y"))
        .orderBy(col("id"))
    },
    Some("""SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name,
           |  CAST(n_nationkey AS DOUBLE) * 2.5 AS x,
           |  CAST(n_nationkey % 7 AS DOUBLE) * 3.0 AS y
           |FROM nation
           |WHERE n_nationkey % 2 = 0
           |ORDER BY id""".stripMargin),
    "The shapefile legs are RESULT-scale by format (single file, 2 GB " +
      "cap): write and parse on the driver, everything after the read " +
      "is a distributed frame. At 100 TB vector data arrives as parquet; " +
      ".shp is the interchange edge — many small files union via " +
      "openDirOfData, never one big one.")

  /** q441 — S1/A3: uncompressed float32 GeoTIFF → distributed strip
    * decode → cell table → per-scanline stats. Values are k/8 dyadic
    * rationals (exact in float32, double, and any sum order); pixel
    * centers come from the ModelTiepoint/PixelScale geotransform. */
  val q441 = Declared(
    "q441_geotiff_ingest", "S1,A3",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q441").toString
      val w = 16; val h = 12
      val vals = Array.tabulate(w * h)(i => ((i * 13) % 97).toFloat / 8f)
      graft.io.GeoTiff.writeFloat(s"$tmp/r.tif", w, h, vals,
        origin = (0.0, 12.0), scale = (1.0, 1.0))
      graft.io.Sources.openData(s, s"$tmp/r.tif")
        .groupBy(floor(col("y")).cast("long").as("row_band"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
          max(col("value")).as("max_v"))
        .orderBy(col("row_band"))
    },
    Some("""WITH c AS (
           |  SELECT CAST((i * 13) % 97 AS DOUBLE) / 8 AS v,
           |    12.0 - CAST(i // 16 AS DOUBLE) - 0.5 AS y
           |  FROM generate_series(0, 191) t(i))
           |SELECT CAST(floor(y) AS BIGINT) AS row_band,
           |  CAST(count(*) AS BIGINT) AS n,
           |  sum(v) AS sum_v, max(v) AS max_v
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
    "The driver parses only the KB-sized IFD; pixel decode is " +
      "parallelized across strips (each task seeks its own byte range) " +
      "and across files for a raster catalog. Cells enter the same " +
      "band/x/y/value model as q33's raster buffer stats, so nodata " +
      "masking and A3 aggregation compose downstream unchanged.")

  /** q442 — A3+/P6: zonal statistics — per (zone polygon, band) stats
    * of the q33 synthetic raster, zones a rectangle and a triangle
    * whose edges avoid every cell center (so boundary conventions
    * cannot differ between engines); the oracle states each zone as
    * explicit half-plane predicates. */
  val q442 = Declared(
    "q442_zonal_stats", "A3,P6",
    (s, dir) => {
      import graft.geo.Geo
      val cells = s.range(4800).select(
        (col("id") % 3 + 1).cast("int").as("band"),
        expr("CAST((id div 3) % 40 AS DOUBLE) * 2.5").as("x"),
        expr("CAST((id div 3) div 40 AS DOUBLE) * 2.5").as("y"),
        expr("CASE WHEN (id * 7) % 11 = 0 THEN 0.0 " +
          "ELSE CAST((id * 13) % 97 AS DOUBLE) / 8 END").as("value"))
      def ring(pts: (Double, Double)*) = Geo.stPolygon(expr(
        pts.map { case (x, y) => s"struct(${x}d as x, ${y}d as y)" }
          .mkString("array(", ", ", ")")))
      val zones = s.range(1).select(lit(1L).as("zone_id"),
          ring((11.0, 11.0), (11.0, 41.0), (49.0, 41.0), (49.0, 11.0)).as("zone"))
        .unionByName(s.range(1).select(lit(2L).as("zone_id"),
          ring((61.0, 6.0), (96.0, 6.0), (61.0, 36.0)).as("zone")))
      graft.ops.SpatialOps.zonalStats(cells, zones, "zone_id", "zone",
          funcs = Seq("mean", "max", "count"), cell = 40.0)
        .orderBy(col("zone_id"), col("band"))
    },
    Some("""WITH cells AS (
           |  SELECT CAST(i % 3 + 1 AS INT) AS band,
           |    CAST((i // 3) % 40 AS DOUBLE) * 2.5 AS x,
           |    CAST((i // 3) // 40 AS DOUBLE) * 2.5 AS y,
           |    CASE WHEN (i * 7) % 11 = 0 THEN 0.0
           |         ELSE CAST((i * 13) % 97 AS DOUBLE) / 8 END AS value
           |  FROM generate_series(0, 4799) t(i)),
           |zf AS (SELECT * FROM cells WHERE value <> 0),
           |u AS (
           |  SELECT CAST(1 AS BIGINT) AS zone_id, band, value FROM zf
           |  WHERE x > 11 AND x < 49 AND y > 11 AND y < 41
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT), band, value FROM zf
           |  WHERE x > 61 AND y > 6 AND 30*(x-61) + 35*(y-6) < 1050)
           |SELECT zone_id, band, avg(value) AS mean_value,
           |  max(value) AS max_value, count(value) AS count_value
           |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "Zone bboxes explode to covering grid cells; the (gx, gy) equi-join " +
      "turns point-in-polygon into a space-uniform shuffle key with the " +
      "exact st_intersects refinement after — the gridBucketJoin " +
      "discipline. Raster volume scans once; mega-zones split across " +
      "their covering cells instead of one task. Dyadic k/8 values keep " +
      "every stat exact on both engines.")

  /** q443 — A3+/S1: raster resample — GeoTIFF ingest coarsened 4x by
    * mean, the overview-building downsample. Output centers are exact
    * centroids of covered input centers; 16 dyadic values per output
    * cell keep the mean exact. */
  val q443 = Declared(
    "q443_raster_resample", "A3,S1",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q443").toString
      val w = 16; val h = 12
      val vals = Array.tabulate(w * h)(i => ((i * 13) % 97).toFloat / 8f)
      graft.io.GeoTiff.writeFloat(s"$tmp/r.tif", w, h, vals,
        origin = (0.0, 12.0), scale = (1.0, 1.0))
      graft.ops.SpatialOps.rasterResample(
          graft.io.GeoTiff.readCells(s, s"$tmp/r.tif"),
          originX = 0.0, originY = 12.0, scaleX = 1.0, scaleY = 1.0,
          factor = 4, agg = "mean")
        .orderBy(col("band"), col("x"), col("y"))
    },
    Some("""WITH c AS (
           |  SELECT 1 AS band, i % 16 AS cc, i // 16 AS rr,
           |    CAST(i % 16 AS DOUBLE) + 0.5 AS x,
           |    12.0 - CAST(i // 16 AS DOUBLE) - 0.5 AS y,
           |    CAST((i * 13) % 97 AS DOUBLE) / 8 AS v
           |  FROM generate_series(0, 191) t(i))
           |SELECT CAST(band AS INT) AS band, avg(x) AS x, avg(y) AS y,
           |  avg(v) AS value, CAST(count(*) AS BIGINT) AS n_cells
           |FROM c GROUP BY band, cc // 4, rr // 4
           |ORDER BY band, x, y""".stripMargin),
    "One groupBy keyed on (band, output cell) with map-side combine — " +
      "no join, no skew, scales as a pure scan+agg; chained resamples " +
      "stay exact because output centers are centroids of input centers.")

  /** q446 — A3+/S1: Horn terrain gradients of the GeoTIFF fixture —
    * dzdx/dzdy and tan²(slope) per interior cell, all inside the
    * correctly-rounded IEEE set (dyadic values, exact sums, two exact
    * divisions, squares) so both engines agree bit-for-bit with no
    * atan/sqrt anywhere. */
  val q446 = Declared(
    "q446_terrain_gradients", "A3,S1",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q446").toString
      val w = 16; val h = 12
      val vals = Array.tabulate(w * h)(i => ((i * 13) % 97).toFloat / 8f)
      graft.io.GeoTiff.writeFloat(s"$tmp/r.tif", w, h, vals,
        origin = (0.0, 12.0), scale = (1.0, 1.0))
      graft.ops.SpatialOps.terrainGradients(
          graft.io.GeoTiff.readCells(s, s"$tmp/r.tif"),
          originX = 0.0, originY = 12.0, scaleX = 1.0, scaleY = 1.0)
        .orderBy(col("x"), col("y"))
    },
    Some("""WITH c AS (
           |  SELECT i % 16 AS cc, i // 16 AS rr,
           |    CAST((i * 13) % 97 AS DOUBLE) / 8 AS v
           |  FROM generate_series(0, 191) t(i)),
           |n AS (
           |  SELECT t.cc AS tc, t.rr AS tr,
           |    CAST(count(*) AS BIGINT) AS n,
           |    sum(s.v * (s.cc - t.cc)
           |      * (CASE WHEN s.rr = t.rr THEN 2 ELSE 1 END)) AS gx,
           |    sum(s.v * (s.rr - t.rr)
           |      * (CASE WHEN s.cc = t.cc THEN 2 ELSE 1 END)) AS gr
           |  FROM c t JOIN c s
           |    ON abs(s.cc - t.cc) <= 1 AND abs(s.rr - t.rr) <= 1
           |    AND NOT (s.cc = t.cc AND s.rr = t.rr)
           |  GROUP BY 1, 2)
           |SELECT CAST(1 AS INT) AS band,
           |  CAST(tc AS DOUBLE) + 0.5 AS x,
           |  12.0 - CAST(tr AS DOUBLE) - 0.5 AS y,
           |  gx / 8 AS dzdx, gr / -8 AS dzdy,
           |  (gx / 8) * (gx / 8) + (gr / -8) * (gr / -8) AS slope_tan2
           |FROM n WHERE n = 8 ORDER BY x, y""".stripMargin),
    "Each cell explodes its 8 weight-tagged neighbor contributions; ONE " +
      "space-uniform groupBy assembles every gradient — no self-joins, " +
      "map-side combine, linear in cells. Interior detection is the " +
      "contributor count, so ragged raster edges need no special casing.")

  /** q458 — S1/A3: DEFLATE-compressed GeoTIFF with horizontal-
    * differencing predictor (the common integer-raster pairing) →
    * distributed strip decode (inflate + un-predict per task) → cell
    * table → per-scanline stats. uint16 values are exact in double;
    * the oracle rebuilds the raster from its index formula. Closes
    * VERDICT r7 missing #1 (real-world .tif files are nearly always
    * compressed; reference: src/data_preprocessing.py:470-472). */
  val q458 = Declared(
    "q458_geotiff_deflate", "S1,A3",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q458").toString
      val w = 30; val h = 20
      val vals = Array.tabulate(w * h)(i => (i * 37) % 997)
      graft.io.GeoTiff.writeGray16(s"$tmp/rz.tif", w, h, vals,
        origin = (0.0, 20.0), scale = (1.0, 1.0),
        compression = graft.io.GeoTiff.CompDeflate, rowsPerStrip = 4,
        predictor = 2)
      graft.io.Sources.openData(s, s"$tmp/rz.tif")
        .groupBy(floor(col("y")).cast("long").as("row_band"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
          max(col("value")).as("max_v"))
        .orderBy(col("row_band"))
    },
    Some("""WITH c AS (
           |  SELECT CAST((i * 37) % 997 AS DOUBLE) AS v,
           |    20.0 - CAST(i // 30 AS DOUBLE) - 0.5 AS y
           |  FROM generate_series(0, 599) t(i))
           |SELECT CAST(floor(y) AS BIGINT) AS row_band,
           |  CAST(count(*) AS BIGINT) AS n,
           |  sum(v) AS sum_v, max(v) AS max_v
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
    "Decompression is per-strip INSIDE the task that owns the strip — " +
      "inflate and predictor-undo never touch the driver, so a " +
      "compressed raster parallelizes exactly like an uncompressed one " +
      "(same chunk-table shape, smaller I/O). Codec work scales with " +
      "cells per task, not file count.")

  /** q459 — S1/A3: TILED LZW GeoTIFF (16x16 tiles over a 40x28 float32
    * raster — neither dimension a tile multiple, so right/bottom tiles
    * are spec-padded and the reader must clip) → distributed per-tile
    * decode → per-column-stripe stats. k/8 dyadic values are exact in
    * float32/double. */
  val q459 = Declared(
    "q459_geotiff_tiled_lzw", "S1,A3",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q459").toString
      val w = 40; val h = 28
      val vals = Array.tabulate(w * h)(i => ((i * 11) % 89).toFloat / 8f)
      graft.io.GeoTiff.writeFloat(s"$tmp/rt.tif", w, h, vals,
        origin = (0.0, 28.0), scale = (1.0, 1.0),
        compression = graft.io.GeoTiff.CompLzw, tile = Some((16, 16)))
      graft.io.Sources.openData(s, s"$tmp/rt.tif")
        .groupBy(floor(col("x") / 8.0).cast("long").as("col_band"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
          min(col("value")).as("min_v"))
        .orderBy(col("col_band"))
    },
    Some("""WITH c AS (
           |  SELECT CAST((i * 11) % 89 AS DOUBLE) / 8 AS v,
           |    CAST(i % 40 AS DOUBLE) + 0.5 AS x
           |  FROM generate_series(0, 1119) t(i))
           |SELECT CAST(floor(x / 8) AS BIGINT) AS col_band,
           |  CAST(count(*) AS BIGINT) AS n,
           |  sum(v) AS sum_v, min(v) AS min_v
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
    "Tiles are the scan unit: each task LZW-decodes its own tiles and " +
      "emits clipped cells, so decode parallelism is tiles-across x " +
      "tiles-down rather than strip count — the layout real rasters " +
      "use precisely because it distributes. Edge padding dies inside " +
      "the task; no padded cell ever reaches the plan.")

  /** q461 — S1/A3: DEFLATE + FLOATING-POINT-PREDICTOR (3) float32
    * GeoTIFF — the pairing GDAL emits for float rasters (TechNote 3:
    * per-row byte-plane split + byte differencing). k/8 dyadic values
    * are exact in float32/double; the oracle rebuilds the raster from
    * its index formula. Closes the predictor-3 boundary — old-style
    * JPEG (6) is now the reader's only typed-error codec. */
  val q461 = Declared(
    "q461_geotiff_float_predictor", "S1,A3",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q461").toString
      val w = 34; val h = 22
      val vals = Array.tabulate(w * h)(i => ((i * 23) % 101).toFloat / 8f)
      graft.io.GeoTiff.writeFloat(s"$tmp/rf.tif", w, h, vals,
        origin = (0.0, 22.0), scale = (1.0, 1.0),
        compression = graft.io.GeoTiff.CompDeflate, rowsPerStrip = 6,
        predictor = 3)
      graft.io.Sources.openData(s, s"$tmp/rf.tif")
        .groupBy(floor(col("y")).cast("long").as("row_band"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
          max(col("value")).as("max_v"))
        .orderBy(col("row_band"))
    },
    Some("""WITH c AS (
           |  SELECT CAST((i * 23) % 101 AS DOUBLE) / 8 AS v,
           |    22.0 - CAST(i // 34 AS DOUBLE) - 0.5 AS y
           |  FROM generate_series(0, 747) t(i))
           |SELECT CAST(floor(y) AS BIGINT) AS row_band,
           |  CAST(count(*) AS BIGINT) AS n,
           |  sum(v) AS sum_v, max(v) AS max_v
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
    "Predictor undo is byte arithmetic INSIDE the task that owns the " +
      "strip — the plane-split/differencing reverses per chunk with no " +
      "cross-chunk state, so a float raster with the GDAL-default " +
      "predictor parallelizes exactly like an unpredicted one.")

  /** q470 — S2: AVRO container ingest through the open_data cascade —
    * a 3-codec-block deflate file (nullable union column included)
    * decoded by the sync-aligned splittable reader, aggregated per
    * tag. Dyadic v values are exact in double; the oracle rebuilds
    * every record from its index formula. */
  val q470 = Declared(
    "q470_avro_ingest", "S2",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q470").toString
      val schema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"r","fields":[
          |{"name":"id","type":"long"},
          |{"name":"v","type":"double"},
          |{"name":"tag","type":"string"},
          |{"name":"opt","type":["null","long"]}]}""".stripMargin)
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.setSyncInterval(1024) // force several blocks = several splits
      w.create(schema, new java.io.File(s"$tmp/data.avro"))
      (0 until 200).foreach { i =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", i.toLong)
        rec.put("v", ((i * 7) % 31) / 4.0)
        rec.put("tag", "t" + (i % 5))
        rec.put("opt",
          if (i % 4 == 0) null else java.lang.Long.valueOf(i * 3L))
        w.append(rec)
      }
      w.close()
      graft.io.Sources.openData(s, s"$tmp/data.avro")
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          sum(col("opt")).as("sum_opt"),
          count(col("opt")).as("n_opt"))
        .orderBy(col("tag"))
    },
    Some("""WITH r AS (
           |  SELECT 't' || CAST(i % 5 AS VARCHAR) AS tag,
           |    CAST((i * 7) % 31 AS DOUBLE) / 4 AS v,
           |    CASE WHEN i % 4 = 0 THEN NULL ELSE 3 * i END AS opt
           |  FROM generate_series(0, 199) t(i))
           |SELECT tag, CAST(count(*) AS BIGINT) AS n, sum(v) AS sum_v,
           |  CAST(sum(opt) AS BIGINT) AS sum_opt,
           |  CAST(count(opt) AS BIGINT) AS n_opt
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
    "The driver reads only the container header; each task aligns its " +
      "byte span to the next sync marker and decodes whole blocks — " +
      "one big Avro file parallelizes across the cluster exactly like " +
      "splittable text, and a directory adds file-level parallelism on " +
      "top. No connector jar, no extra dependency: the Avro core " +
      "library the classpath already carries.")

  /** q479 — S1: OLD-STYLE JPEG-in-TIFF (compression 6, TIFF 6.0 §22) —
    * the well-formed whole-image-JIF flavor decoded through the same
    * ImageIO path as compression 7. The certified property is
    * engine-internal and exact DESPITE the lossy codec: the 6 and 7
    * files carry byte-identical entropy streams, so their decoded cell
    * tables must be bit-equal — per row band, n cells match the layout
    * and the max |v6 − v7| is exactly 0. Closes the round-8 #1 gap
    * (reference opens any GDAL raster, data_preprocessing.py:470-472);
    * only the fragmented pre-TechNote2 flavor remains a typed error. */
  val q479 = Declared(
    "q479_geotiff_oldstyle_jpeg", "S1,A3",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q479").toString
      val w = 32; val h = 24
      val vals = Array.tabulate(w * h)(i => (i / w) * 3 + (i % w) * 2)
      graft.io.GeoTiff.writeGray8JpegOldStyle(s"$tmp/old6.tif", w, h, vals,
        origin = (0.0, h.toDouble), scale = (1.0, 1.0))
      graft.io.GeoTiff.writeGray8Jpeg(s"$tmp/new7.tif", w, h, vals,
        origin = (0.0, h.toDouble), scale = (1.0, 1.0))
      val c6 = graft.io.Sources.openData(s, s"$tmp/old6.tif")
        .select(col("x"), col("y"), col("value").as("v6"))
      val c7 = graft.io.Sources.openData(s, s"$tmp/new7.tif")
        .select(col("x"), col("y"), col("value").as("v7"))
      c6.join(c7, Seq("x", "y"))
        .groupBy(floor(col("y")).cast("long").as("row_band"))
        .agg(count(lit(1)).as("n"),
          max(abs(col("v6") - col("v7"))).cast("long").as("max_diff"))
        .orderBy(col("row_band"))
    },
    Some("""SELECT CAST(i AS BIGINT) AS row_band,
           |  CAST(32 AS BIGINT) AS n, CAST(0 AS BIGINT) AS max_diff
           |FROM generate_series(0, 23) t(i) ORDER BY 1""".stripMargin),
    "The old-style stream is ONE whole-image chunk, so it decodes in a " +
      "single task — correct for the legacy archives that carry this " +
      "format (small singletons); bulk rasters arrive as strip/tile " +
      "compression-7 files that parallelize per chunk. The join proves " +
      "the 6-path reuses the 7-path codec bit-for-bit.")

  /** q492 — S1: FRAGMENTED pre-TechNote2 JPEG-6 TIFF (raw entropy
    * strips + JPEGQ/DC/ACTables at tags 519/520/521, JPEGProc=1) — the
    * last JPEG-in-TIFF flavor, closed round 10. Same certification
    * device as q479: the SAME pixels written as a 3-strip fragmented-6
    * file and as a 3-strip compression-7 file carry byte-identical
    * entropy streams per strip, so the reassembled §22 decode must be
    * bit-equal to the TechNote2 decode — max |diff| is exactly 0 in
    * every row band, which is the whole oracle. */
  val q492 = Declared(
    "q492_geotiff_fragmented_jpeg", "S1,A3",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q492").toString
      val w = 32; val h = 24
      val vals = Array.tabulate(w * h)(i => (i / w) * 3 + (i % w) * 2)
      graft.io.GeoTiff.writeGray8JpegFragmented(s"$tmp/frag6.tif", w, h,
        vals, origin = (0.0, h.toDouble), scale = (1.0, 1.0),
        rowsPerStrip = 8)
      graft.io.GeoTiff.writeGray8Jpeg(s"$tmp/new7.tif", w, h, vals,
        origin = (0.0, h.toDouble), scale = (1.0, 1.0), rowsPerStrip = 8)
      val c6 = graft.io.Sources.openData(s, s"$tmp/frag6.tif")
        .select(col("x"), col("y"), col("value").as("v6"))
      val c7 = graft.io.Sources.openData(s, s"$tmp/new7.tif")
        .select(col("x"), col("y"), col("value").as("v7"))
      c6.join(c7, Seq("x", "y"))
        .groupBy(floor(col("y")).cast("long").as("row_band"))
        .agg(count(lit(1)).as("n"),
          max(abs(col("v6") - col("v7"))).cast("long").as("max_diff"))
        .orderBy(col("row_band"))
    },
    Some("""SELECT CAST(i AS BIGINT) AS row_band,
           |  CAST(32 AS BIGINT) AS n, CAST(0 AS BIGINT) AS max_diff
           |FROM generate_series(0, 23) t(i) ORDER BY 1""".stripMargin),
    "Fragmented strips decode independently (each task reassembles its " +
      "own JIF from the broadcast-scale table set in Meta), so this " +
      "deprecated flavor parallelizes per strip exactly like " +
      "compression 7 — unlike q479's whole-image stream.")

  /** q499 — S2: ARROW IPC (Feather v2) ingest — the columnar
    * interchange format of the pandas/polars/DuckDB world, read with
    * the arrow-vector classes Spark already ships. The fixture writes
    * 240 formula rows across SIX record batches (batchRows = 40), so
    * the read exercises the footer-indexed batch splits; the oracle
    * replays the formula. All five supported types (long, int, double,
    * string, boolean) plus nulls ride through. */
  val q499 = Declared(
    "q499_arrow_ingest", "S2",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q499").toString
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("grp", IntegerType, nullable = false),
        StructField("v", DoubleType, nullable = false),
        StructField("tag", StringType, nullable = false),
        StructField("flag", BooleanType, nullable = false),
        StructField("opt", LongType, nullable = true)))
      val rows = (0 until 240).map { i =>
        org.apache.spark.sql.Row(i.toLong, i % 7, ((i * 11) % 37) / 8.0,
          "t" + (i % 4), i % 3 == 0,
          if (i % 5 == 0) null else java.lang.Long.valueOf(i * 2L))
      }
      graft.io.ArrowIpc.write(s"$tmp/data.arrow", schema, rows,
        batchRows = 40)
      graft.io.Sources.openData(s, s"$tmp/data.arrow")
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          sum(col("grp").cast("long")).as("sum_grp"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_flag"),
          sum(col("opt")).as("sum_opt"), count(col("opt")).as("n_opt"))
        .orderBy(col("tag"))
    },
    Some("""WITH r AS (
           |  SELECT 't' || CAST(i % 4 AS VARCHAR) AS tag,
           |    CAST((i * 11) % 37 AS DOUBLE) / 8 AS v,
           |    i % 7 AS grp, i % 3 = 0 AS flag,
           |    CASE WHEN i % 5 = 0 THEN NULL ELSE 2 * i END AS opt
           |  FROM generate_series(0, 239) t(i))
           |SELECT tag, CAST(count(*) AS BIGINT) AS n, sum(v) AS sum_v,
           |  CAST(sum(grp) AS BIGINT) AS sum_grp,
           |  CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flag,
           |  CAST(sum(opt) AS BIGINT) AS sum_opt,
           |  CAST(count(opt) AS BIGINT) AS n_opt
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
    "The file footer indexes every record batch, so the driver reads " +
      "schema + block list only and each task seeks straight to its " +
      "batches — splits come free from the format (no sync-marker " +
      "scan), and a directory of files adds file-level parallelism. " +
      "The interchange edge with the pandas/polars world at 100 TB.")

  val all: Seq[Declared] =
    Seq(q440, q441, q442, q443, q446, q458, q459, q461, q470, q479, q492,
      q499)
}
