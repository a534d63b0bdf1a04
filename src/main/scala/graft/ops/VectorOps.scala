package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.ColumnException
import graft.geo.Geo

/** Vector-geometry operators over geometry-struct tables — the
  * reference's flagship surface (SURVEY.md S1, P4, P6, P7, A2, A4).
  *
  * Plan strategy: every geometry is reduced to centroid (cx, cy) and
  * bbox columns FIRST (pure column expressions), the join candidates
  * are pruned with plain double predicates (broadcast sensors → the
  * feature scan filters locally), and only surviving pairs evaluate
  * the exact `st_distance`/`st_intersects` UDF. At 100 TB the UDF
  * therefore runs on ~|result| pairs, not |sensors|×|features|.
  */
object VectorOps {

  /** S1/P7 — vector-load hygiene: drop empty then invalid geometries,
    * reporting counts (the reference warns, :477-485). Counts are
    * computed with one extra aggregate, not a collect. */
  def cleanGeometries(df: DataFrame, geomCol: String = "geometry"): (DataFrame, Long, Long) = {
    val g = col(geomCol)
    // count(when(...)) not sum(): sum over zero rows is null (NPE on getLong)
    val counts = df.agg(
      count(when(Geo.stIsEmpty(g), 1)).as("empty"),
      count(when(!Geo.stIsEmpty(g) && !Geo.stIsValid(g), 1)).as("invalid")).head()
    val (nEmpty, nInvalid) = (counts.getLong(0), counts.getLong(1))
    if (nEmpty > 0) System.err.println(s"[graft.geo] dropping $nEmpty empty geometries")
    if (nInvalid > 0) System.err.println(s"[graft.geo] dropping $nInvalid invalid geometries")
    (df.filter(!Geo.stIsEmpty(g) && Geo.stIsValid(g)), nEmpty, nInvalid)
  }

  /** P4 — derive `area`/`bounds` stat columns on demand (reference
    * :212-215); error listing available columns otherwise (:209-217). */
  def withDerived(features: DataFrame, statCols: Seq[String],
      geomCol: String = "geometry"): DataFrame = {
    // derive against the fold accumulator, not the captured original —
    // deriving two missing columns must keep the first one
    val known: Map[String, DataFrame => DataFrame] = Map(
      "area" -> (df => df.withColumn("area", Geo.stArea(col(geomCol)))),
      "bounds_width" -> (df => df.withColumn("bounds_width",
        Geo.stBounds(col(geomCol)).getField("xmax") - Geo.stBounds(col(geomCol)).getField("xmin"))))
    statCols.foldLeft(features) { (df, c) =>
      if (df.columns.contains(c)) df
      else known.get(c) match {
        case Some(derive) => derive(df)
        case None => throw ColumnException(Seq(c), df.columns.toSeq ++ known.keys)
      }
    }
  }

  private def withCentroidXY(df: DataFrame, geomCol: String, xn: String, yn: String): DataFrame = {
    val c = Geo.stCentroid(col(geomCol))
    df.withColumn(xn, Geo.stX(c)).withColumn(yn, Geo.stY(c))
  }

  /** A2 — buffer-aggregated stats over real geometries: for each
    * sensor, stats of `statCols` across features whose geometry
    * intersects the circle buffer of radius r around the sensor
    * centroid. Circle∩geometry ⟺ distance(centroid, geometry) <= r,
    * so no polygon buffer is materialized at all.
    *
    * Candidate generation is the same cell equi-join as the x/y kernel
    * (SpatialOps.gridBucketJoin semantics, generalized to bbox'd
    * geometries): sensors explode to the ≤9 cells their disc can
    * touch, features explode to the cells their bbox covers, join on
    * cell id, dedup (a wide bbox can meet a disc in several cells),
    * exact st_distance only on survivors. A raw bbox-range join would
    * be a nested loop evaluating |sensors|×|features| predicates.
    * Empty buffers keep their sensor row with nulls (left join). */
  def addBufferAggregatedData(
      sensors: DataFrame,   // id_sensor + geometry
      features: DataFrame,  // geometry + statCols
      radius: Double,
      funcs: Seq[String],
      statCols: Seq[String],
      sourceName: String,
      geomCol: String = "geometry"): DataFrame = {
    val cell = radius
    // ensureParallelism MATTERS here even though the (gx, gy) join
    // shuffles anyway: the map side explodes and shuffle-serializes
    // full geometry structs, which is real per-row work — funneling it
    // through one narrow input partition doubles the query (measured).
    // cellJoin's plain-double features skip the widening instead.
    val feats = SpatialOps.ensureParallelism(withDerived(features, statCols, geomCol))
      .withColumn("__fid", monotonically_increasing_id())
    val s = withCentroidXY(
      sensors.select(col("id_sensor"), col(geomCol).as("__sgeom")), "__sgeom", "sx", "sy")
      .withColumn("__cx", floor(col("sx") / cell).cast("long"))
      .withColumn("__cy", floor(col("sy") / cell).cast("long"))
      .withColumn("gx", explode(sequence(col("__cx") - 1, col("__cx") + 1)))
      .withColumn("gy", explode(sequence(col("__cy") - 1, col("__cy") + 1)))
      .select(col("id_sensor"), col("sx"), col("sy"), col("gx"), col("gy"))
    val b = Geo.stBounds(col(geomCol))
    val fCells = feats
      .withColumn("__b", b)
      .withColumn("gx", explode(sequence(
        floor((col("__b").getField("xmin")) / cell).cast("long"),
        floor((col("__b").getField("xmax")) / cell).cast("long"))))
      .withColumn("gy", explode(sequence(
        floor((col("__b").getField("ymin")) / cell).cast("long"),
        floor((col("__b").getField("ymax")) / cell).cast("long"))))
      .drop("__b")
    val pruned = fCells.join(s, Seq("gx", "gy"))
      .drop("gx", "gy")
      // exact test on cell-join survivors. A feature bbox sharing
      // several cells with one sensor's disc pays the distance UDF up
      // to 4x here — cheap next to the alternative (dedup BEFORE the
      // filter must carry the geometry struct through the aggregate,
      // which degrades HashAggregate to SortAggregate + two sorts)
      .filter(Geo.stDistance(Geo.stPoint(col("sx"), col("sy")), col(geomCol)) <= radius)
      // dedup after dropping the geometry payload: distinct over plain
      // ids hash-aggregates
      .select((Seq(col("id_sensor"), col("__fid")) ++ statCols.map(col)): _*)
      .dropDuplicates("id_sensor", "__fid")
    val stats = pruned.groupBy(col("id_sensor"))
      .agg(Aggregates.block(funcs, sourceName, statCols).head,
        Aggregates.block(funcs, sourceName, statCols).tail: _*)
    sensors.join(stats, Seq("id_sensor"), "left")
  }

  /** A4/J3 — kNN-aggregated stats over real geometries: distance is
    * feature-geometry → sensor-centroid (reference :552), ranking by
    * (distance, featureId) = nsmallest first-occurrence. */
  def addKnnAggregatedData(
      sensors: DataFrame, features: DataFrame, k: Int,
      funcs: Seq[String], statCols: Seq[String],
      featureId: String, sourceName: String,
      geomCol: String = "geometry"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = SpatialOps.ensureParallelism(withDerived(features, statCols, geomCol))
    // drop the geometry payload before broadcasting — only sx/sy survive
    // the join, and polygon structs would multiply shuffle bytes
    val s = broadcast(withCentroidXY(
      sensors.select(col("id_sensor"), col(geomCol).as("__sgeom")), "__sgeom", "sx", "sy")
      .select(col("id_sensor"), col("sx"), col("sy")))
    val withDist = feats.join(s)
      .withColumn("__d", Geo.stDistance(Geo.stPoint(col("sx"), col("sy")), col(geomCol)))
    val w = Window.partitionBy(col("id_sensor")).orderBy(col("__d").asc, col(featureId).asc)
    val topk = withDist.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
    val stats = topk.groupBy(col("id_sensor"))
      .agg(Aggregates.block(funcs, sourceName, statCols).head,
        Aggregates.block(funcs, sourceName, statCols).tail: _*)
    sensors.join(stats, Seq("id_sensor"), "left")
  }
}
