package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.ops.TimeSeriesOps

/** X1 — the named-operator registry: the Scala analog of the
  * reference's "any callable, serialized by __name__" pluggable-op
  * surface (reference: README.md:16-20, src/data_preprocessing.py:
  * 108-111, :683-689).
  *
  * An operator factory takes the op's kwargs (JSON) and returns a
  * DataFrame transform. Everything stays lazy — registering an op adds
  * plan nodes, never executes.
  */
final class OpRegistry private (
    private val ops: Map[String, ListMap[String, Json] => DataFrame => DataFrame]) {

  def apply(function: String): ListMap[String, Json] => DataFrame => DataFrame =
    ops.getOrElse(function,
      throw graft.core.UnknownFunction(function, ops.keys.toSeq.sorted))

  /** User extension point: register a custom op under a name (the spec
    * stays serializable because only the name is persisted). */
  def register(name: String,
      f: ListMap[String, Json] => DataFrame => DataFrame): OpRegistry =
    new OpRegistry(ops + (name -> f))

  def known: Seq[String] = ops.keys.toSeq.sorted
}

object OpRegistry {

  // ---- kwarg extractors ----
  private def str(p: ListMap[String, Json], k: String): String = p.get(k) match {
    case Some(JStr(s)) => s
    case other => sys.error(s"kwarg '$k' must be a string, got $other")
  }
  private def strOpt(p: ListMap[String, Json], k: String): Option[String] =
    p.get(k).collect { case JStr(s) => s }
  private def numOpt(p: ListMap[String, Json], k: String): Option[Double] =
    p.get(k).collect { case JNum(n) => n }
  private def num(p: ListMap[String, Json], k: String): Double = p.get(k) match {
    case Some(JNum(n)) => n
    case other => sys.error(s"kwarg '$k' must be a number, got $other")
  }
  private def strs(p: ListMap[String, Json], k: String): Seq[String] = p.get(k) match {
    case Some(JArr(xs)) => xs.map { case JStr(s) => s; case o => sys.error(s"'$k': $o") }
    case None => Seq.empty
    case other => sys.error(s"kwarg '$k' must be a string array, got $other")
  }
  /** Sort expression with optional trailing direction — "col desc" /
    * "expr asc" — since functions.expr() parses expressions only and
    * would throw on sort-direction syntax. */
  private def sortExpr(s: String): org.apache.spark.sql.Column = {
    val t = s.trim
    val lower = t.toLowerCase
    if (lower.endsWith(" desc")) expr(t.dropRight(5)).desc
    else if (lower.endsWith(" asc")) expr(t.dropRight(4)).asc
    else expr(t)
  }
  private def pairs(p: ListMap[String, Json], k: String): Seq[(String, String)] =
    p.get(k) match {
      case Some(JArr(xs)) => xs.map {
        case JArr(Vector(JStr(a), JStr(b))) => (a, b)
        case o => sys.error(s"'$k' entries must be [beg, end] pairs, got $o")
      }
      case None => Seq.empty
      case other => sys.error(s"kwarg '$k' must be an array of pairs, got $other")
    }

  /** Built-in operator set. Each op is a thin declarative wrapper —
    * the heavy lifting (and the unit tests) live in graft.ops. */
  val default: OpRegistry = new OpRegistry(Map(
    // projections / filters (P1-P3, P5)
    "filter" -> (p => df => df.filter(expr(str(p, "condition")))),
    "select" -> (p => df => df.select(strs(p, "columns").map(col): _*)),
    "drop" -> (p => df => df.drop(strs(p, "columns"): _*)),
    "rename" -> (p => df => {
      val mapping = p.get("mapping") match {
        case Some(JObj(m)) => m.map { case (k, JStr(v)) => (k, v); case (k, o) => sys.error(s"$k: $o") }
        case other => sys.error(s"'mapping' must be an object, got $other")
      }
      mapping.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
    }),
    "with_column" -> (p => df => df.withColumn(str(p, "name"), expr(str(p, "expr")))),
    // null handling (P10) — reference zero-fills pre-interpolation
    "fillna" -> (p => df => {
      val v = num(p, "value")
      val cols = strs(p, "columns")
      if (cols.isEmpty) df.na.fill(v) else df.na.fill(v, cols)
    }),
    "dropna" -> (p => df => {
      val cols = strs(p, "columns")
      if (cols.isEmpty) df.na.drop() else df.na.drop(cols)
    }),
    // P11 — CSV index artifact scrub
    "drop_unnamed" -> (_ => df =>
      df.drop(df.columns.filter(_.toLowerCase.contains("unnamed")).toIndexedSeq: _*)),
    // sorts / limits (O1)
    // A1 as a pipeline citizen: the multi-func × multi-col aggregation
    // block with the reference's func_source_col output naming
    "group_agg" -> (p => df => {
      val funcs = strs(p, "funcs"); val valueCols = strs(p, "value_cols")
      // strs() maps a missing key to empty; fail with a message, not
      // `head of empty list` (the registry's typed-error contract)
      if (funcs.isEmpty) sys.error("group_agg requires a non-empty 'funcs' list")
      if (valueCols.isEmpty) sys.error("group_agg requires a non-empty 'value_cols' list")
      val aggs = graft.ops.Aggregates.block(
        funcs, strOpt(p, "source").getOrElse(""), valueCols)
      df.groupBy(strs(p, "by").map(col): _*).agg(aggs.head, aggs.tail: _*)
    }),
    "order_by" -> (p => df => df.orderBy(strs(p, "columns").map(sortExpr): _*)),
    "limit" -> (p => df => df.limit(num(p, "n").toInt)),
    // set ops (U2, U3)
    "distinct" -> (_ => df => df.distinct()),
    "dedup_first" -> (p => df => TimeSeriesOps.dedupFirst(df,
      strs(p, "keys"), strs(p, "order").map(expr(_).asc))),
    // time series (P8, P9, A5)
    "date_range_filter" -> (p => df => TimeSeriesOps.dateRangeFilter(
      df, str(p, "ts_col"), str(p, "beg"), str(p, "end"))),
    "hour_interval_filter" -> (p => df => df.filter(
      TimeSeriesOps.hourIntervalPredicate(col(str(p, "ts_col")), str(p, "beg"), str(p, "end")))),
    "interval_stats" -> (p => df => TimeSeriesOps.intervalStats(
      df, str(p, "id_col"), str(p, "ts_col"),
      strs(p, "value_cols"), strs(p, "funcs"), pairs(p, "intervals"),
      strOpt(p, "beg").zip(strOpt(p, "end")).headOption)),
    // spatial flagships (A2-A4, A6-A7, A9): the feature/raster dataset is
    // read from the 'file' kwarg, mirroring the reference signature
    // add_buffer_aggregated_data(gdf, file, ...) (:166-206)
    "add_buffer_aggregated_data" -> (p => df => graft.ops.SpatialOps.bufferAggregate(
      df, df.sparkSession.read.parquet(str(p, "file")), num(p, "radius"),
      strs(p, "funcs"), strs(p, "value_cols"), strOpt(p, "source_name").getOrElse(""))),
    "add_knn_aggregated_data" -> (p => df => graft.ops.SpatialOps.knnAggregate(
      df, df.sparkSession.read.parquet(str(p, "file")), num(p, "k").toInt,
      strs(p, "funcs"), strs(p, "value_cols"), str(p, "feature_id"),
      strOpt(p, "source_name").getOrElse(""))),
    "add_raster_buffer_data" -> (p => df => graft.ops.SpatialOps.addRasterBufferData(
      df, df.sparkSession.read.parquet(str(p, "file")),
      strOpt(p, "raster_name").getOrElse("raster"), num(p, "radius"), strs(p, "funcs"),
      Some(strs(p, "bands").map(_.toInt)).filter(_.nonEmpty))),
    // df = the raster CELL TABLE (e.g. GeoTiff.readCells output);
    // zones arrive from a parquet file of (id, geometry) rows
    "zonal_stats" -> (p => df => graft.ops.SpatialOps.zonalStats(
      df, df.sparkSession.read.parquet(str(p, "zones_file")),
      str(p, "zone_id_col"), strOpt(p, "geometry_col").getOrElse("geometry"),
      strs(p, "funcs"), num(p, "cell"),
      numOpt(p, "nodata").getOrElse(0.0))),
    "raster_resample" -> (p => df => graft.ops.SpatialOps.rasterResample(
      df, num(p, "origin_x"), num(p, "origin_y"),
      num(p, "scale_x"), num(p, "scale_y"), num(p, "factor").toInt,
      strOpt(p, "agg").getOrElse("mean"))),
    "terrain_gradients" -> (p => df => graft.ops.SpatialOps.terrainGradients(
      df, num(p, "origin_x"), num(p, "origin_y"),
      num(p, "scale_x"), num(p, "scale_y"))),
    "inverse_distance_weighting" -> (p => df => graft.ops.SpatialOps.idw(
      df, str(p, "value_col"), num(p, "power").toInt,
      num(p, "x0"), num(p, "y0"), num(p, "nx").toInt, num(p, "ny").toInt,
      num(p, "step_x"), num(p, "step_y"))),
    "simple_kriging" -> (p => df => graft.ops.Kriging.krige(
      df, str(p, "value_col"), strOpt(p, "model").getOrElse("linear"),
      num(p, "x0"), num(p, "y0"), num(p, "nx").toInt, num(p, "ny").toInt,
      num(p, "step_x"), num(p, "step_y"))),
    "clean_geometries" -> (p => df =>
      graft.ops.VectorOps.cleanGeometries(df,
        strOpt(p, "geometry_col").getOrElse("geometry"))._1),
    "get_intervals" -> (p => df => graft.ops.Binning.cut(
      df, str(p, "column"), num(p, "n").toInt)),
    // LLM-corpus extensions (E1/E2/E4/E7) as pipeline citizens: the
    // same operators the declared queries exercise, addressable from a
    // serialized pipeline spec
    // round-7 surface as pipeline citizens
    "substring_dup_pairs" -> (p => df => graft.ext.Dedup.substringDupPairs(
      df, str(p, "text_col"), str(p, "id_col"), num(p, "k").toInt,
      num(p, "min_shared").toInt, num(p, "max_doc_freq").toInt,
      cache = false)),
    "substring_dup_mass" -> (p => df => graft.ext.Dedup.substringDupMass(
      df, str(p, "text_col"), str(p, "id_col"), num(p, "k").toInt,
      cache = false)),
    "dbscan" -> (p => df => graft.ext.Clustering.dbscan(
      df, str(p, "id_col"), str(p, "x_col"), str(p, "y_col"),
      num(p, "eps"), num(p, "min_pts").toInt)),
    "boruvka_mst" -> (p => df => graft.ext.Graph.boruvkaMst(
      df, str(p, "src_col"), str(p, "dst_col"), str(p, "weight_col"))),
    "single_linkage" -> (p => df => graft.ext.Graph.singleLinkage(
      df, str(p, "src_col"), str(p, "dst_col"), str(p, "weight_col"),
      num(p, "threshold").toLong)),
    "reliability_diagram" -> (p => df => graft.ops.Evaluation
      .reliabilityDiagram(df, col(str(p, "score_ppm_col")),
        expr(str(p, "label_cond")), num(p, "n_bins").toInt)),
    "fairness_audit" -> (p => df => graft.ops.Evaluation.fairnessAudit(
      df, col(str(p, "group_col")), expr(str(p, "label_cond")),
      expr(str(p, "pred_cond")))),
    "split_conformal" -> (p => df => graft.ops.Evaluation.splitConformal(
      df, expr(str(p, "residual_expr")), col(str(p, "tie_col")),
      expr(str(p, "calib_cond")), num(p, "alpha_num").toInt,
      num(p, "alpha_den").toInt)),
    "dp_counts" -> (p => df => graft.ops.Privacy.dpCounts(
      df, col(str(p, "key_col")), num(p, "k").toInt)),
    "hodges_lehmann" -> (p => df => graft.ops.Aggregates.hodgesLehmann(
      df, strs(p, "keys").map(col), col(str(p, "value_col")),
      col(str(p, "tie_col")))),
    "median_of_means" -> (p => df => graft.ops.Aggregates.medianOfMeans(
      df, col(str(p, "value_col")), col(str(p, "bucket_key_col")),
      num(p, "k").toInt)),
    "randomized_response" -> (p => df => graft.ops.Privacy
      .randomizedResponse(df, strs(p, "keys").map(col),
        col(str(p, "id_col")), expr(str(p, "truth_cond")),
        num(p, "k").toInt)),
    "ar2_yule_walker" -> (p => df => graft.ops.TimeSeriesOps.ar2YuleWalker(
      df, strs(p, "keys").map(col), col(str(p, "order_col")),
      col(str(p, "value_col")))),
    "naive_bayes_classify" -> (p => df => graft.ext.TextAnalysis
      .naiveBayesClassify(df, col(str(p, "id_col")),
        col(str(p, "text_col")), col(str(p, "label_col")))),
    "plsa_topics" -> (p => df => graft.ext.TextAnalysis.plsa2Topics(
      df, col(str(p, "id_col")), col(str(p, "text_col")),
      num(p, "rounds").toInt, num(p, "top_k").toInt)),
    "betweenness_pivots" -> (p => df => graft.ext.Graph.betweennessPivots(
      df, str(p, "src_col"), str(p, "dst_col"),
      num(p, "num_pivots").toInt, num(p, "max_hops").toInt)),
    "cox_ph" -> (p => df => graft.ops.EventAnalytics.coxPh(
      df, col(str(p, "duration_col")), expr(str(p, "event_cond")),
      col(str(p, "x_col")), num(p, "iters").toInt)),
    "ransac_line" -> (p => df => graft.ops.Aggregates.ransacLine(
      df, col(str(p, "x_col")), col(str(p, "y_col")),
      num(p, "eps_num").toLong, num(p, "eps_den").toLong)),
    "mrmr_select" -> (p => df => graft.ops.Features.mrmrSelect(
      df, strs(p, "features").map(n => n -> col(n)),
      col(str(p, "target_col")), num(p, "select").toInt)),
    "pca_two" -> (p => df => graft.ext.Clustering.powerIterationTwo(
      df, num(p, "dims").toInt, num(p, "rounds").toInt)),
    "sinkhorn_plan" -> (p => df => graft.ext.Curation.sinkhornPlan(
      df, col(str(p, "cat_col")), expr(str(p, "is_a_cond")),
      num(p, "k").toInt, num(p, "rounds").toInt,
      numOpt(p, "eps_inv").map(_.toInt).getOrElse(1))),
    "forecast_cv_rolling" -> (p => df => graft.ops.TimeSeriesOps
      .forecastCvRolling(df, col(str(p, "t_col")), col(str(p, "v_col")),
        strs(p, "splits").map(_.toLong), num(p, "horizon").toInt)),
    "evalue" -> (p => df => graft.ops.Experimentation.eValue(
      df, expr(str(p, "exposure_cond")), expr(str(p, "outcome_cond")))),
    "sequential_patterns" -> (p => df => graft.ops.EventAnalytics
      .sequentialPatterns(df, strs(p, "seq_keys").map(col),
        col(str(p, "type_col")), strs(p, "order_cols").map(col),
        num(p, "min_support_ppm").toLong)),
    "dtw_similar_pairs" -> (p => df => graft.ops.TimeSeriesOps
      .dtwSimilarPairs(df, str(p, "key_col"), str(p, "block_col"),
        str(p, "seq_col"), num(p, "band").toInt, num(p, "top_k").toInt)),
    "huffman_code_lengths" -> (p => df => graft.ext.TextAnalysis
      .huffmanCodeLengths(df, col(str(p, "text_col")),
        num(p, "top_v").toInt)),
    "granger_lag1" -> (p => df => graft.ops.TimeSeriesOps.grangerLag1(
      df, col(str(p, "order_col")), col(str(p, "x_col")),
      col(str(p, "y_col")))),
    "d8_flow_accumulation" -> (p => df => graft.ops.SpatialOps
      .d8FlowAccumulation(df, col(str(p, "x_col")), col(str(p, "y_col")),
        col(str(p, "z_col")), num(p, "rounds").toInt)),
    "d8_watersheds" -> (p => df => graft.ops.SpatialOps
      .d8Watersheds(df, col(str(p, "x_col")), col(str(p, "y_col")),
        col(str(p, "z_col")), num(p, "rounds").toInt)),
    "cost_distance" -> (p => df => graft.ops.SpatialOps
      .costDistance(df, col(str(p, "x_col")), col(str(p, "y_col")),
        col(str(p, "cost_col")), expr(str(p, "source_cond")),
        num(p, "rounds").toInt)),
    "viewshed" -> (p => df => graft.ops.SpatialOps
      .viewshed(df, col(str(p, "x_col")), col(str(p, "y_col")),
        col(str(p, "z_col")), num(p, "obs_x").toLong,
        num(p, "obs_y").toLong, num(p, "height").toLong,
        num(p, "max_dist").toInt)),
    "rasterize_polygons" -> (p => df => graft.ops.SpatialOps
      .rasterizePolygons(df, col(str(p, "id_col")), col(str(p, "geom_col")),
        num(p, "origin_x"), num(p, "origin_y"),
        num(p, "scale_x"), num(p, "scale_y"),
        num(p, "width").toInt, num(p, "height").toInt)),
    "image_block_stats" -> (p => df => graft.ext.Multimodal
      .imageBlockStats(df, str(p, "id_col"), str(p, "payload_col"),
        num(p, "factor").toInt)),
    "audio_frame_stats" -> (p => df => graft.ext.Multimodal
      .audioFrameStats(df, str(p, "id_col"), str(p, "payload_col"),
        num(p, "frame_len").toInt)),
    "video_frame_sample" -> (p => df => graft.ext.Multimodal
      .videoFrameSample(df, str(p, "id_col"), str(p, "payload_col"),
        num(p, "stride").toInt, num(p, "max_frames").toInt)),
    "changepoints_exact" -> (p => df => df.withColumn(
      str(p, "out_col"), graft.ext.ChangepointsExact.changepointsExact(
        col(str(p, "series_col")), num(p, "penalty").toLong))),
    "scc" -> (p => df => graft.ext.Graph.stronglyConnectedComponents(
      df, str(p, "src_col"), str(p, "dst_col"))),
    // round 11
    "phrase_search" -> (p => df => graft.ext.Curation.phraseSearch(
      df, str(p, "text_col"), str(p, "id_col"),
      str(p, "phrase").split(" ").toSeq)),
    "proximity_search" -> (p => df => graft.ext.Curation.proximitySearch(
      df, str(p, "text_col"), str(p, "id_col"),
      str(p, "terms").split(" ").toSeq, num(p, "window").toInt)),
    // each entry runs the full low-point pass — a pipeline wanting
    // BOTH halves pays it twice (bounded by the audit-slice cap;
    // callers needing both should call cutVerticesAndBridges directly)
    "cut_vertices" -> (p => df => graft.ext.Graph.cutVerticesAndBridges(
      df, str(p, "src_col"), str(p, "dst_col"))._1),
    "bridges" -> (p => df => graft.ext.Graph.cutVerticesAndBridges(
      df, str(p, "src_col"), str(p, "dst_col"))._2),
    "chunk_passages" -> (p => df => graft.ext.Curation.chunkPassages(
      df, str(p, "text_col"), str(p, "id_col"),
      num(p, "window").toInt, num(p, "stride").toInt)),
    "unigram_segment_scores" -> (p => df => graft.ext.TextAnalysis
      .unigramSegmentScores(df, col(str(p, "text_col")),
        num(p, "max_piece_len").toInt, num(p, "min_count").toLong,
        num(p, "top_words").toInt)),
    "tokens_multilingual" -> (p => df => df.withColumn(str(p, "out_col"),
      graft.ext.TextAnalysis.tokensMultilingual(col(str(p, "text_col")),
        col(str(p, "lang_col"))))),
    "log_template" -> (p => df => df.withColumn(str(p, "out_col"),
      graft.ext.TextAnalysis.logTemplate(col(str(p, "msg_col"))))),
    "sentence_stats" -> (p => df => df.withColumn(str(p, "out_col"),
      graft.ext.TextAnalysis.sentenceStats(col(str(p, "text_col"))))),
    "largest_remainder_by_group" -> (p => df =>
      graft.ops.Aggregates.largestRemainderByGroup(df,
        strs(p, "group_cols").map(col), strs(p, "key_cols").map(col),
        col(str(p, "weight_col")), col(str(p, "total_col")))),
    "normalize_unicode" -> (p => df => df.withColumn(str(p, "out_col"),
      graft.ext.TextAnalysis.normalizeUnicodeScoped(col(str(p, "text_col"))))),
    "repair_line_wraps" -> (p => df => df.withColumn(str(p, "out_col"),
      graft.ext.TextAnalysis.repairLineWraps(col(str(p, "text_col"))))),
    "maxsim_rerank" -> (p => df => graft.ext.Similarity.maxsimRerank(
      df, col(str(p, "id_col")), col(str(p, "text_col")),
      strs(p, "query_ids").zip(strs(p, "query_texts")),
      num(p, "max_doc_tokens").toInt, num(p, "top_k").toInt)),
    "exact_dedup" -> (p => df => graft.ext.Dedup.exact(
      df, str(p, "text_col"), str(p, "id_col"))),
    // cache = false: a pipeline result's lifetime is unmanaged, so
    // there is no release point for an operator-registered cache
    "minhash_near_dups" -> (p => df => graft.ext.Dedup.minhashNearDuplicates(
      df, str(p, "text_col"), str(p, "id_col"),
      numOpt(p, "shingle_size").map(_.toInt).getOrElse(3),
      numOpt(p, "num_hashes").map(_.toInt).getOrElse(16),
      numOpt(p, "bands").map(_.toInt).getOrElse(4),
      numOpt(p, "threshold").getOrElse(0.5), cache = false)),
    // cache = false for the same unmanaged-lifetime reason
    "image_near_dups" -> (p => df => graft.ext.Multimodal.imageNearDuplicates(
      df, str(p, "id_col"), str(p, "payload_col"),
      numOpt(p, "max_distance").map(_.toInt).getOrElse(5), cache = false)),
    "audio_near_dups" -> (p => df => graft.ext.Multimodal.audioNearDuplicates(
      df, str(p, "id_col"), str(p, "payload_col"),
      numOpt(p, "max_distance").map(_.toInt).getOrElse(5), cache = false)),
    "quality_features" -> (p => df =>
      graft.ext.TextAnalysis.qualityFeatures(df, str(p, "text_col"))),
    "normalize_text" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse(str(p, "text_col")),
      graft.ext.TextAnalysis.normalizeText(col(str(p, "text_col"))))),
    "lang_id" -> (p => df => {
      val toksCol = "__toks_" + str(p, "text_col")
      df.withColumn(toksCol, graft.ext.TextAnalysis.tokens(col(str(p, "text_col"))))
        .withColumn(strOpt(p, "out_col").getOrElse("lang_pred"),
          graft.ext.TextAnalysis.langIdFromTokens(col(toksCol)))
        .drop(toksCol)
    }),
    "winnowing_fingerprints" -> (p => df =>
      graft.ext.TextAnalysis.winnowingFingerprints(df,
        str(p, "text_col"), str(p, "id_col"),
        num(p, "k").toInt, num(p, "w").toInt)),
    "hash_split" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse("split"),
      graft.ext.Curation.split(col(str(p, "text_col")),
        numOpt(p, "train_pct").map(_.toInt).getOrElse(80),
        numOpt(p, "val_pct").map(_.toInt).getOrElse(10)))),
    "cap_per_key" -> (p => df => graft.ext.Curation.capPerKey(
      df, col(str(p, "key")), strs(p, "order").map(sortExpr), num(p, "cap").toInt)),
    "stratified_sample" -> (p => df => {
      val rates = p.get("rates") match {
        case Some(JObj(m)) => m.map {
          case (k, JNum(v)) => (k, v.toInt)
          case (k, o) => sys.error(s"rate '$k' must be a number, got $o")
        }.toMap
        case None => Map.empty[String, Int]
        case other => sys.error(s"'rates' must be an object, got $other")
      }
      graft.ext.Curation.stratifiedSample(df, col(str(p, "key")),
        col(str(p, "text_col")), rates,
        numOpt(p, "default_pct").map(_.toInt).getOrElse(100))
    }),
    // cache = false: a pipeline result's lifetime is unmanaged, so
    // there is no release point for an operator-registered cache
    "unigram_logprob" -> (p => df => graft.ext.TextAnalysis.unigramLogProb(
      df, str(p, "text_col"), str(p, "id_col"), cache = false)),
    "tfidf_top_terms" -> (p => df => graft.ext.Curation.tfIdfTopTerms(
      df, str(p, "text_col"), str(p, "id_col"), num(p, "top_k").toInt,
      cache = false)),
    // round-4 corpus ops (E4/E7)
    "pagerank" -> (p => df => graft.ext.Graph.pageRank(
      df, str(p, "src_col"), str(p, "dst_col"),
      numOpt(p, "iters").map(_.toInt).getOrElse(3))),
    // cache = false: pipeline result lifetime is unmanaged (see above)
    "prefix_jaccard_pairs" -> (p => df => graft.ext.Dedup.prefixFilterJaccardPairs(
      df, str(p, "text_col"), str(p, "id_col"),
      numOpt(p, "shingle_size").map(_.toInt).getOrElse(3),
      numOpt(p, "t_num").map(_.toInt).getOrElse(1),
      numOpt(p, "t_den").map(_.toInt).getOrElse(2), cache = false)),
    "temperature_sample" -> (p => df => graft.ext.Curation.sqrtTemperatureSample(
      df, col(str(p, "key")), col(str(p, "text_col")))),
    "remove_duplicate_lines" -> (p => df => graft.ext.Curation.removeDuplicateLines(
      df, str(p, "text_col"), str(p, "id_col"), num(p, "min_doc_freq").toInt,
      cache = false)),
    "redact_pii" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse(str(p, "text_col")),
      graft.ext.TextAnalysis.redactPii(col(str(p, "text_col"))))),
    "repetition_signals" -> (p => df => graft.ext.TextAnalysis.repetitionSignals(
      df, str(p, "text_col"), str(p, "id_col"))),
    "bm25_scores" -> (p => df => graft.ext.Curation.bm25Scores(
      df, str(p, "text_col"), str(p, "id_col"), strs(p, "query_terms"),
      numOpt(p, "k1").getOrElse(1.2), numOpt(p, "b").getOrElse(0.75))),
    "decontaminate" -> (p => df => graft.ext.Curation.decontaminate(
      df, df.sparkSession.read.parquet(str(p, "benchmark_file")),
      str(p, "text_col"), str(p, "id_col"), num(p, "gram_size").toInt)),
    "strip_markup" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse(str(p, "text_col")),
      graft.ext.TextAnalysis.stripMarkup(col(str(p, "text_col"))))),
    "url_domain" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse("domain"),
      graft.ext.TextAnalysis.urlDomain(col(str(p, "url_col"))))),
    // incremental near-dup: the stored-corpus side reads from a file;
    // cache = false (unmanaged pipeline result lifetime, see above)
    "incremental_near_dups" -> (p => df => graft.ext.Dedup.minhashNearDuplicatesAgainst(
      df.sparkSession.read.parquet(str(p, "corpus_file")), df,
      str(p, "text_col"), str(p, "id_col"),
      numOpt(p, "shingle_size").map(_.toInt).getOrElse(3),
      numOpt(p, "num_hashes").map(_.toInt).getOrElse(16),
      numOpt(p, "bands").map(_.toInt).getOrElse(4),
      numOpt(p, "threshold").getOrElse(0.5), cache = false)),
    "token_budget_sample" -> (p => df => {
      val budgets = p.get("budgets") match {
        case Some(JObj(m)) => m.map {
          case (k, JNum(v)) => (k, v.toLong)
          case (k, o) => sys.error(s"budget '$k' must be a number, got $o")
        }.toMap
        case None => Map.empty[String, Long]
        case other => sys.error(s"'budgets' must be an object, got $other")
      }
      graft.ext.Curation.tokenBudgetSample(df, col(str(p, "key")),
        str(p, "text_col"), str(p, "id_col"), budgets,
        numOpt(p, "default_budget").map(_.toLong).getOrElse(Long.MaxValue))
    }),
    "pack_sequences" -> (p => df => graft.ext.Curation.packSequences(
      df, str(p, "text_col"), str(p, "id_col"),
      num(p, "seq_len").toInt, numOpt(p, "shards").map(_.toInt).getOrElse(64))),
    // near-dup pairs → duplicate clusters; cache = false (unmanaged
    // pipeline result lifetime, see above)
    "near_dup_components" -> (p => df => graft.ext.Graph.connectedComponents(
      graft.ext.Dedup.minhashNearDuplicates(
        df, str(p, "text_col"), str(p, "id_col"),
        numOpt(p, "shingle_size").map(_.toInt).getOrElse(3),
        numOpt(p, "num_hashes").map(_.toInt).getOrElse(16),
        numOpt(p, "bands").map(_.toInt).getOrElse(4),
        numOpt(p, "threshold").getOrElse(0.5), cache = false),
      "id_a", "id_b", cache = false)),
    // order-statistics / graph analytics (q125-q130) as pipeline citizens
    "skyline" -> (p => df => graft.ops.Dominance.skyline2D(
      df, str(p, "x_col"), str(p, "y_col"))),
    "qcut" -> (p => df => graft.ops.Binning.qcut(
      df, str(p, "column"), str(p, "tie_col"), num(p, "n").toInt)),
    "cusum_flags" -> (p => df => graft.ops.EventAnalytics.cusumFlags(
      df, str(p, "key_col"), str(p, "ts_col"), str(p, "tie_col"),
      str(p, "value_col"),
      numOpt(p, "c_num").map(_.toLong).getOrElse(2L),
      numOpt(p, "c_den").map(_.toLong).getOrElse(1L))),
    "triangle_counts" -> (p => df => graft.ext.Graph.triangleCounts(
      df, str(p, "src_col"), str(p, "dst_col"))),
    "last_touch_attribution" -> (p => df =>
      graft.ops.EventAnalytics.lastTouchAttribution(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "tie_col"),
        str(p, "type_col"), str(p, "conv_type"))),
    "twap" -> (p => df => graft.ops.TimeSeriesOps.twap(
      df, str(p, "key_col"), str(p, "ts_col"), str(p, "tie_col"),
      str(p, "value_col"))),
    "ohlc_bars" -> (p => df => graft.ops.TimeSeriesOps.ohlcBars(
      df, str(p, "ts_col"), str(p, "tie_col"), str(p, "value_col"),
      num(p, "bin_micros").toLong)),
    "pmi_collocations" -> (p => df => graft.ext.TextAnalysis.pmiCollocations(
      df, str(p, "text_col"),
      numOpt(p, "min_count").map(_.toInt).getOrElse(5),
      numOpt(p, "top_k").map(_.toInt).getOrElse(20))),
    "k_core" -> (p => df => graft.ext.Graph.kCore(
      df, str(p, "src_col"), str(p, "dst_col"),
      num(p, "k").toInt, numOpt(p, "rounds").map(_.toInt).getOrElse(8))),
    "sorted_neighborhood_pairs" -> (p => df =>
      graft.ops.EntityResolution.sortedNeighborhoodPairs(
        df, str(p, "sort_key_col"), str(p, "id_col"),
        numOpt(p, "window").map(_.toInt).getOrElse(4),
        numOpt(p, "max_dist").map(_.toInt).getOrElse(2))),
    // cache = false: pipeline result lifetime is unmanaged (see above)
    "containment_pairs" -> (p => df => graft.ext.Dedup.containmentPairs(
      df, str(p, "text_col"), str(p, "id_col"),
      numOpt(p, "shingle_size").map(_.toInt).getOrElse(3),
      numOpt(p, "t_num").map(_.toInt).getOrElse(3),
      numOpt(p, "t_den").map(_.toInt).getOrElse(4), cache = false)),
    "top_paths" -> (p => df => graft.ops.EventAnalytics.topPaths(
      df, str(p, "actor_col"), str(p, "ts_col"), str(p, "tie_col"),
      str(p, "type_col"), numOpt(p, "top_k").map(_.toInt).getOrElse(20))),
    "rolling_actives" -> (p => df => graft.ops.EventAnalytics.rollingActives(
      df, str(p, "actor_col"), str(p, "ts_col"),
      num(p, "window_bins").toInt, num(p, "bin_micros").toLong)),
    "gini_concentration" -> (p => df =>
      graft.ops.EventAnalytics.giniConcentration(
        df, str(p, "key_col"), str(p, "actor_col"))),
    "token_entropy" -> (p => df => graft.ext.TextAnalysis.tokenEntropy(
      df, str(p, "text_col"), str(p, "key_col"))),
    "cohort_value_curve" -> (p => df =>
      graft.ops.EventAnalytics.cohortValueCurve(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "value_col"),
        str(p, "type_col"), str(p, "conv_type"),
        numOpt(p, "max_days").map(_.toInt).getOrElse(7))),
    "pair_rules" -> (p => df => graft.ops.Associations.pairRules(
      df, str(p, "basket_col"), str(p, "item_col"),
      numOpt(p, "min_support").map(_.toLong).getOrElse(2L))),
    "weighted_median" -> (p => df => graft.ops.Aggregates.weightedMedian(
      df, strs(p, "keys").map(col), col(str(p, "value_col")),
      col(str(p, "weight_col")), strs(p, "tie_cols").map(col))),
    // df is the BASE snapshot; the change log reads from a file (the
    // decontaminate / incremental_near_dups two-input pattern)
    "apply_cdc" -> (p => df => graft.ops.Dimensions.applyCdc(
      df, df.sparkSession.read.parquet(str(p, "delta_file")),
      str(p, "key_col"), strs(p, "order").map(col), str(p, "op_col"),
      strOpt(p, "delete_op").getOrElse("D"))),
    "windowed_funnel" -> (p => df =>
      graft.ops.EventAnalytics.windowedFunnelReachTimes(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "type_col"),
        strs(p, "stages"), num(p, "within_seconds").toLong)),
    "weighted_quantile" -> (p => df => graft.ops.Aggregates.weightedQuantile(
      df, strs(p, "keys").map(col), col(str(p, "value_col")),
      col(str(p, "weight_col")), strs(p, "tie_cols").map(col),
      num(p, "q_num").toLong, num(p, "q_den").toLong)),
    "mann_whitney" -> (p => df => graft.ops.Aggregates.mannWhitneyU(
      df, col(str(p, "value_col")), col(str(p, "group_col")),
      str(p, "group_a"), str(p, "group_b"))),
    "chi_square" -> (p => df => graft.ops.Aggregates.chiSquare(
      df, col(str(p, "row_col")), col(str(p, "col_col")))),
    "ks_test" -> (p => df => graft.ops.Aggregates.ksTest(
      df, col(str(p, "value_col")), col(str(p, "group_col")),
      str(p, "group_a"), str(p, "group_b"))),
    // df is the EDGE list; seeds read from a file (two-input pattern)
    "bfs_hops" -> (p => df => graft.ext.Graph.bfsHops(
      df, str(p, "src_col"), str(p, "dst_col"),
      df.sparkSession.read.parquet(str(p, "seeds_file")),
      str(p, "seed_col"), num(p, "rounds").toInt)),
    "ewma" -> (p => df => graft.ops.TimeSeriesOps.ewmaInt(
      df, strs(p, "keys").map(col), col(str(p, "order_col")),
      col(str(p, "value_col")), num(p, "num").toLong, num(p, "den").toLong)),
    "largest_remainder" -> (p => df => graft.ops.Aggregates.largestRemainder(
      df, strs(p, "keys").map(col), col(str(p, "weight_col")),
      num(p, "total").toLong)),
    "benford" -> (p => df => graft.ops.Aggregates.benfordProfile(
      df, col(str(p, "value_col")))),
    "count_min_build" -> (p => df => graft.ext.Sketches.countMinBuild(
      df, col(str(p, "key_col")), num(p, "width").toInt,
      num(p, "depth").toInt)),
    // df is the SKETCH; probes read from a file (two-input pattern)
    "count_min_estimate" -> (p => df => graft.ext.Sketches.countMinEstimate(
      df, df.sparkSession.read.parquet(str(p, "probes_file")),
      col(str(p, "key_col")), num(p, "width").toInt, num(p, "depth").toInt)),
    "clamped_balance" -> (p => df =>
      graft.ops.TimeSeriesOps.clampedRunningBalance(
        df, strs(p, "keys").map(col), strs(p, "order").map(col),
        col(str(p, "delta_col")))),
    "position_attribution" -> (p => df =>
      graft.ops.EventAnalytics.positionAttribution(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "tie_col"),
        str(p, "type_col"), str(p, "conv_type"))),
    "skew_audit" -> (p => df => graft.ops.Aggregates.skewAudit(
      df, col(str(p, "key_col")))),
    "kaplan_meier" -> (p => df => graft.ops.EventAnalytics.kaplanMeier(
      df, col(str(p, "duration_col")), col(str(p, "event_col")))),
    "ndcg" -> (p => df => graft.ops.Ranking.ndcgAtK(
      df, col(str(p, "key_col")), strs(p, "order").map(col),
      col(str(p, "rel_col")), num(p, "k").toInt)),
    "global_row_number" -> (p => df => graft.ops.Ranking.globalRowNumber(
      df, strs(p, "order").map(col))),
    "kmeans" -> (p => df => graft.ext.Clustering.kMeansInt(
      df, str(p, "id_col"), str(p, "vec_col"),
      num(p, "k").toInt, num(p, "iters").toInt)),
    "correlation_matrix" -> (p => df => graft.ext.Clustering.correlationMatrix(
      df, str(p, "vec_col"), num(p, "dims").toInt)),
    "fingerprint" -> (p => df => graft.ops.Aggregates.datasetFingerprint(
      df, strs(p, "keys").map(col), strs(p, "columns"))),
    // df is side A; side B reads from a file (two-input pattern)
    "join_cardinality" -> (p => df => graft.ops.Aggregates.joinCardinality(
      df, col(str(p, "key_a")),
      df.sparkSession.read.parquet(str(p, "b_file")), col(str(p, "key_b")))),
    "rrf" -> (p => df => graft.ext.Curation.reciprocalRankFusion(
      Seq(df, df.sparkSession.read.parquet(str(p, "other_file"))),
      str(p, "id_col"), str(p, "rank_col"),
      numOpt(p, "k").map(_.toInt).getOrElse(60))),
    "hll_registers" -> (p => df => graft.ext.Sketches.hllRegisters(
      df, strs(p, "keys").map(col), col(str(p, "key_col")),
      num(p, "m").toInt)),
    // df is the REGISTER table (hll_registers output)
    "hll_estimate" -> (p => df => graft.ext.Sketches.hllEstimate(
      df, strs(p, "keys"), num(p, "m").toInt)),
    "bloom_build" -> (p => df => graft.ext.Sketches.bloomBuild(
      df, col(str(p, "key_col")), num(p, "bits").toInt, num(p, "k").toInt)),
    // df is the FILTER (bloom_build output); probes read from a file
    "bloom_probe" -> (p => df => graft.ext.Sketches.bloomProbe(
      df, df.sparkSession.read.parquet(str(p, "probes_file")),
      col(str(p, "key_col")), num(p, "bits").toInt, num(p, "k").toInt)),
    "holt" -> (p => df => graft.ops.TimeSeriesOps.holtInt(
      df, strs(p, "keys").map(col), col(str(p, "order_col")),
      col(str(p, "value_col")), num(p, "a_num").toLong,
      num(p, "a_den").toLong, num(p, "b_num").toLong,
      num(p, "b_den").toLong, num(p, "scale").toLong)),
    "readability" -> (p => df => graft.ext.TextAnalysis.readability(
      df, col(str(p, "text_col")))),
    "zone_map_audit" -> (p => df => graft.ops.Layout.zoneMapAudit(
      df, str(p, "layout"), expr(str(p, "chunk_expr")),
      col(str(p, "value_col")), num(p, "lo").toLong, num(p, "hi").toLong)),
    "auc" -> (p => df => graft.ops.Evaluation.aucExact(
      df, strs(p, "keys").map(col), expr(str(p, "score_expr")),
      expr(str(p, "label_expr")))),
    // df is the RUN (query_id, item_id, rank); truth pairs from a file
    "retrieval_eval" -> (p => df => graft.ops.Evaluation.retrievalEval(
      df, df.sparkSession.read.parquet(str(p, "truth_file")),
      num(p, "k").toInt)),
    "class_metrics" -> (p => df => graft.ops.Evaluation.classMetrics(
      df, col(str(p, "label_col")), col(str(p, "pred_col")))),
    "decile_lift" -> (p => df => graft.ops.Evaluation.decileLift(
      df, strs(p, "order").map(col), expr(str(p, "label_expr")),
      numOpt(p, "bins").map(_.toInt).getOrElse(10))),
    "kmv_sketch" -> (p => df => graft.ext.Sketches.kmvSketch(
      df, strs(p, "keys").map(col), col(str(p, "key_col")),
      num(p, "k").toInt)),
    // df is the SKETCH table (kmv_sketch output)
    "kmv_estimate" -> (p => df => graft.ext.Sketches.kmvEstimate(
      df, strs(p, "keys"), num(p, "k").toInt)),
    "seasonal_decompose" -> (p => df => graft.ops.TimeSeriesOps.seasonalDecompose(
      df, strs(p, "keys").map(col), expr(str(p, "season_expr")),
      col(str(p, "value_col")))),
    // df is holtInt's output frame
    "forecast_eval" -> (p => df => graft.ops.TimeSeriesOps.forecastEval(
      df, strs(p, "keys"), num(p, "scale").toLong)),
    "theil_sen" -> (p => df => graft.ops.Aggregates.theilSen(
      df, strs(p, "keys").map(col), col(str(p, "x_col")),
      col(str(p, "y_col")))),
    // df is the EDGE list; the seed set reads from a file
    "ppr" -> (p => df => graft.ext.Graph.personalizedPageRank(
      df, str(p, "src_col"), str(p, "dst_col"),
      df.sparkSession.read.parquet(str(p, "sources_file")),
      str(p, "source_id_col"),
      numOpt(p, "iters").map(_.toInt).getOrElse(3))),
    "geohash" -> (p => df => graft.ops.SpatialOps.withGeohash(
      df, col(str(p, "lat_col")), col(str(p, "lon_col")),
      num(p, "precision").toInt,
      strOpt(p, "out").getOrElse("geohash"))),
    "welch_t" -> (p => df => graft.ops.Aggregates.welchTTest(
      df, col(str(p, "value_col")), col(str(p, "group_col")),
      str(p, "group_a"), str(p, "group_b"))),
    "anova_f" -> (p => df => graft.ops.Aggregates.anovaF(
      df, col(str(p, "value_col")), col(str(p, "group_col")))),
    "ols2" -> (p => df => graft.ops.Aggregates.linearFit2Exact(
      df, strs(p, "keys").map(col), col(str(p, "x1_col")),
      col(str(p, "x2_col")), col(str(p, "y_col")))),
    "compaction_plan" -> (p => df => graft.ops.Layout.compactionPlan(
      df, col(str(p, "file_id_col")), col(str(p, "bytes_col")),
      num(p, "target").toLong)),
    "markov_accuracy" -> (p => df => graft.ops.EventAnalytics.markovAccuracy(
      df, col(str(p, "actor_col")), col(str(p, "ts_col")),
      col(str(p, "type_col")), col(str(p, "tie_col")))),
    "jackknife" -> (p => df => graft.ops.Aggregates.jackknifeMeanByGroup(
      df, col(str(p, "group_col")), expr(str(p, "value_expr")))),
    "adf" -> (p => df => graft.ops.Aggregates.adfTest(
      df, strs(p, "keys").map(col), col(str(p, "order_col")),
      col(str(p, "value_col")))),
    "target_encode_loo" -> (p => df => graft.ops.Features.targetEncodeLoo(
      df, col(str(p, "cat_col")), expr(str(p, "target_expr")))),
    "class_balance_cap" -> (p => df => graft.ops.Features.classBalanceCap(
      df, col(str(p, "class_col")), num(p, "ratio").toInt,
      strs(p, "order").map(col))),
    "class_balance_audit" -> (p => df => graft.ops.Features.classBalanceAudit(
      df, col(str(p, "class_col")), num(p, "ratio").toInt)),
    "co_occurrence" -> (p => df => graft.ops.Associations.coOccurrence(
      df, col(str(p, "basket_col")), col(str(p, "item_col")),
      num(p, "top_k").toInt)),
    "boilerplate_shingles" -> (p => df =>
      graft.ext.TextAnalysis.boilerplateShingles(
        df, col(str(p, "text_col")), col(str(p, "id_col")),
        num(p, "shingle_size").toInt, num(p, "min_df_ppm").toLong)),
    "vocab_growth" -> (p => df => graft.ext.TextAnalysis.vocabGrowth(
      df, graft.ext.Dedup.wordShingles(col(str(p, "text_col")),
        num(p, "shingle_size").toInt),
      col(str(p, "id_col")), num(p, "every").toLong)),
    "spearman" -> (p => df => graft.ops.Aggregates.spearmanExact(
      df, strs(p, "keys").map(col), expr(str(p, "x_expr")),
      expr(str(p, "y_expr")))),
    "kendall" -> (p => df => graft.ops.Aggregates.kendallTau(
      df, strs(p, "keys").map(col), expr(str(p, "x_expr")),
      expr(str(p, "y_expr")))),
    "cramers_v" -> (p => df => graft.ops.Aggregates.cramersV(
      df, col(str(p, "row_col")), col(str(p, "col_col")))),
    "odds_ratio" -> (p => df => graft.ops.Aggregates.oddsRatio(
      df, expr(str(p, "exposure_expr")), expr(str(p, "outcome_expr")))),
    "conformal" -> (p => df => graft.ops.Features.conformalInterval(
      df, col(str(p, "cat_col")), expr(str(p, "target_expr")),
      expr(str(p, "calib_expr")),
      numOpt(p, "alpha_num").map(_.toLong).getOrElse(1L),
      numOpt(p, "alpha_den").map(_.toLong).getOrElse(10L))),
    "log_rank" -> (p => df => graft.ops.EventAnalytics.logRank(
      df, col(str(p, "duration_col")), col(str(p, "event_col")),
      col(str(p, "group_col")), str(p, "group_a"))),
    "expect" -> (p => df => graft.ops.Expectations.validate(
      df, pairs(p, "rules").map { case (n, pred) =>
        graft.ops.Expectations.Rule(n, pred) })),
    // df is the correlation-matrix cell frame (correlation_matrix output)
    "power_iteration" -> (p => df => graft.ext.Clustering.powerIterationInt(
      df, num(p, "dims").toInt, num(p, "rounds").toInt)),
    "gini_split" -> (p => df => graft.ops.Features.giniSplit(
      df, expr(str(p, "feature_expr")), expr(str(p, "label_expr")))),
    "srm_check" -> (p => df => graft.ops.Aggregates.srmCheck(
      df, expr(str(p, "bucket_expr")), num(p, "k").toInt)),
    "cohens_d" -> (p => df => graft.ops.Aggregates.cohensD(
      df, col(str(p, "value_col")), col(str(p, "group_col")),
      str(p, "group_a"), str(p, "group_b"))),
    // round-4 batches 22-24: entity-resolution scoring, drift,
    // experimentation readouts, preference aggregation, communities
    "jaro_winkler" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse("jw"),
      graft.ext.JaroWinkler.jaroWinkler(
        col(str(p, "a_col")), col(str(p, "b_col"))))),
    "js_divergence" -> (p => df => graft.ext.TextAnalysis.jsDivergence(
      df, col(str(p, "text_col")), col(str(p, "slice_col")),
      str(p, "slice_a"), str(p, "slice_b"))),
    "mutual_information" -> (p => df => graft.ops.Features.mutualInformation(
      df, strOpt(p, "label").getOrElse("feature"),
      expr(str(p, "x_expr")), expr(str(p, "y_expr")))),
    "bh_discoveries" -> (p => df => graft.ops.Experimentation.bhDiscoveries(
      df, str(p, "group_col"), expr(str(p, "success_expr")),
      numOpt(p, "q_num").map(_.toInt).getOrElse(5),
      numOpt(p, "q_den").map(_.toInt).getOrElse(100))),
    "cuped" -> (p => df => graft.ops.Experimentation.cuped(
      df, str(p, "x_col"), str(p, "y_col"), str(p, "arm_col"))),
    "label_propagation" -> (p => df => graft.ext.Graph.labelPropagation(
      df, str(p, "src_col"), str(p, "dst_col"),
      numOpt(p, "iters").map(_.toInt).getOrElse(3))),
    "hits" -> (p => df => graft.ext.Graph.hits(
      df, str(p, "src_col"), str(p, "dst_col"),
      numOpt(p, "iters").map(_.toInt).getOrElse(2))),
    // df is the EDGE list; the partition reads from a file
    "modularity" -> (p => df => graft.ext.Graph.modularity(
      df, str(p, "src_col"), str(p, "dst_col"),
      df.sparkSession.read.parquet(str(p, "labels_file")),
      str(p, "node_col"), str(p, "community_col"))),
    "diff_in_diff" -> (p => df => graft.ops.Experimentation.diffInDiff(
      df, expr(str(p, "y_expr")), expr(str(p, "treated_expr")),
      expr(str(p, "post_expr")))),
    "mde" -> (p => df => graft.ops.Experimentation.mdeByStratum(
      df, col(str(p, "stratum_col")), expr(str(p, "success_expr")))),
    "bradley_terry" -> (p => df => graft.ops.Evaluation.bradleyTerry(
      df, col(str(p, "winner_col")), col(str(p, "loser_col")),
      numOpt(p, "iters").map(_.toInt).getOrElse(3))),
    "calibration" -> (p => df => graft.ops.Evaluation.calibrationBins(
      df, expr(str(p, "conf_ppm_expr")), expr(str(p, "label_expr")),
      numOpt(p, "bins").map(_.toInt).getOrElse(10))),
    "ips_value" -> (p => df => graft.ops.Experimentation.ipsPolicyValue(
      df, col(str(p, "logged_col")), col(str(p, "target_col")),
      col(str(p, "reward_col")), expr(str(p, "propensity_ppm_expr")))),
    "stratified_ate" -> (p => df => graft.ops.Experimentation.stratifiedAte(
      df, col(str(p, "stratum_col")), expr(str(p, "y_expr")),
      expr(str(p, "treated_expr")))),
    // round-4 batches 25-27: nonparametric tests, agreement, bandits,
    // link prediction, CF, LM scoring, JL compression, graph topology,
    // retrieval MAP
    "kruskal_wallis" -> (p => df => graft.ops.Aggregates.kruskalWallis(
      df, col(str(p, "value_col")), col(str(p, "group_col")))),
    "wilcoxon_signed_rank" -> (p => df =>
      graft.ops.Aggregates.wilcoxonSignedRank(
        df, col(str(p, "x_col")), col(str(p, "y_col")))),
    "mann_kendall" -> (p => df => graft.ops.Aggregates.mannKendall(
      df, col(str(p, "order_col")), col(str(p, "value_col")))),
    "pettitt" -> (p => df => graft.ops.Aggregates.pettitt(
      df, col(str(p, "order_col")), col(str(p, "value_col")))),
    "g_test" -> (p => df => graft.ops.Aggregates.gTest(
      df, col(str(p, "row_col")), col(str(p, "col_col")))),
    "cohens_kappa" -> (p => df => graft.ops.Evaluation.cohensKappa(
      df, expr(str(p, "rater_a_expr")), expr(str(p, "rater_b_expr")))),
    "krippendorff_alpha" -> (p => df =>
      graft.ops.Evaluation.krippendorffAlpha(
        df, expr(str(p, "rater_a_expr")), expr(str(p, "rater_b_expr")))),
    "ucb1" -> (p => df => graft.ops.Experimentation.ucb1(
      df, col(str(p, "arm_col")), expr(str(p, "reward_expr")))),
    "sequential_boundary" -> (p => df =>
      graft.ops.Experimentation.sequentialBoundary(
        df, expr(str(p, "look_expr")), expr(str(p, "arm_a_expr")),
        expr(str(p, "success_expr")))),
    "adamic_adar" -> (p => df => graft.ext.Graph.adamicAdar(
      df, col(str(p, "basket_col")), col(str(p, "item_col")),
      numOpt(p, "top_k").map(_.toInt).getOrElse(100))),
    "item_cosine" -> (p => df => graft.ops.Associations.itemCosine(
      df, col(str(p, "basket_col")), col(str(p, "item_col")),
      numOpt(p, "min_common").map(_.toLong).getOrElse(2L),
      numOpt(p, "top_k").map(_.toInt).getOrElse(100))),
    "assortativity" -> (p => df => graft.ext.Graph.assortativity(
      df, str(p, "src_col"), str(p, "dst_col"))),
    "clustering_coefficients" -> (p => df =>
      graft.ext.Graph.clusteringCoefficients(
        df, str(p, "src_col"), str(p, "dst_col"))),
    // df is the PROBE corpus; the model reads from a file
    // (two-input pattern, like modularity's labels_file)
    "kneser_ney_score" -> (p => df => graft.ext.TextAnalysis.kneserNeyScore(
      df.sparkSession.read.parquet(str(p, "model_file")), df,
      str(p, "text_col"), str(p, "id_col"))),
    "ngram_novelty" -> (p => df => graft.ext.TextAnalysis.ngramNovelty(
      df.sparkSession.read.parquet(str(p, "model_file")), df,
      str(p, "text_col"), str(p, "id_col"),
      numOpt(p, "n").map(_.toInt).getOrElse(3))),
    "rouge2" -> (p => df => graft.ext.TextAnalysis.rouge2(
      df, str(p, "pair_id_col"), str(p, "cand_col"), str(p, "ref_col"))),
    "jl_project" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse("projected"),
      graft.ext.Similarity.jlProject(col(str(p, "vec_col")),
        graft.ext.Similarity.jlSigns(num(p, "dim_in").toInt,
          num(p, "dim_out").toInt)))),
    // df is the RUNS frame; truth reads from a file
    "map_at_k" -> (p => df => graft.ops.Evaluation.mapAtK(
      df, df.sparkSession.read.parquet(str(p, "truth_file")),
      numOpt(p, "k").map(_.toInt).getOrElse(10))),
    // round-4 batch 28: related-samples/trend tests, whiteness,
    // concentration and spectrum fingerprints
    "cochran_q" -> (p => df => graft.ops.Aggregates.cochranQ(
      df, col(str(p, "block_col")), expr(str(p, "treatment_expr")),
      expr(str(p, "success_expr")))),
    "ljung_box" -> (p => df => graft.ops.Aggregates.ljungBox(
      df, col(str(p, "order_col")), col(str(p, "value_col")),
      numOpt(p, "lags").map(_.toInt).getOrElse(6))),
    "simpson_diversity" -> (p => df => graft.ops.Aggregates.simpsonDiversity(
      df, strs(p, "keys").map(col), col(str(p, "category_col")))),
    "theil_index" -> (p => df => graft.ops.Aggregates.theilIndex(
      df, col(str(p, "value_col")))),
    "cochran_armitage" -> (p => df => graft.ops.Aggregates.cochranArmitage(
      df, expr(str(p, "score_expr")), expr(str(p, "success_expr")))),
    "zipf_slope" -> (p => df => graft.ext.TextAnalysis.zipfSlope(
      df, str(p, "text_col"), numOpt(p, "top_n").map(_.toInt).getOrElse(200))),
    // round-4 batch 29: privacy release gates, tail/unseen-mass
    // estimators, sketch-quantile audit, mixture allocation
    "k_anonymity" -> (p => df => graft.ops.Privacy.kAnonymityAudit(
      df, strs(p, "quasi_ids").map(col), num(p, "k").toLong)),
    "l_diversity" -> (p => df => graft.ops.Privacy.lDiversityAudit(
      df, strs(p, "quasi_ids").map(col), col(str(p, "sensitive_col")),
      num(p, "l").toLong)),
    "hill_tail" -> (p => df => graft.ops.Aggregates.hillTailIndex(
      df, col(str(p, "value_col")),
      numOpt(p, "k").map(_.toInt).getOrElse(100))),
    "good_turing" -> (p => df => graft.ext.TextAnalysis.goodTuring(
      df, str(p, "text_col"))),
    "binned_quantiles" -> (p => df => graft.ext.Sketches.binnedQuantileAudit(
      df, col(str(p, "value_col")), num(p, "bin_width").toLong,
      strs(p, "levels_ppm").map(_.toLong))),
    "greedy_mixture" -> (p => df => graft.ext.Curation.greedyMixture(
      df, col(str(p, "source_col")), col(str(p, "tokens_col")),
      col(str(p, "quality_col")),
      numOpt(p, "budget_num").map(_.toLong).getOrElse(1L),
      numOpt(p, "budget_den").map(_.toLong).getOrElse(2L))),
    // round-4 batch 30: behavioral segmentation, SPC, variance
    // decomposition, relational density clustering, retention decay
    "rfm_segments" -> (p => df => graft.ops.EventAnalytics.rfmSegments(
      df, col(str(p, "actor_col")), col(str(p, "ts_col")),
      expr(str(p, "amount_cents_expr")))),
    "burstiness" -> (p => df => graft.ops.EventAnalytics.burstiness(
      df, col(str(p, "actor_col")), col(str(p, "ts_col")),
      numOpt(p, "min_gaps").map(_.toLong).getOrElse(10L))),
    "xmr_chart" -> (p => df => graft.ops.TimeSeriesOps.xmrChart(
      df, col(str(p, "order_col")), col(str(p, "value_col")))),
    "eta_squared" -> (p => df => graft.ops.Aggregates.etaSquared(
      df, col(str(p, "value_col")), col(str(p, "group_col")))),
    "grid_density_clusters" -> (p => df =>
      graft.ops.SpatialOps.gridDensityClusters(
        df, col(str(p, "x_col")), col(str(p, "y_col")),
        num(p, "cell_size"), num(p, "min_pts").toLong)),
    "retention_decay_fit" -> (p => df =>
      graft.ops.EventAnalytics.retentionDecayFit(
        df, str(p, "actor_col"), str(p, "ts_col"),
        numOpt(p, "max_days").map(_.toInt).getOrElse(14))),
    // batch 31 (q267-q272)
    "psi_drift" -> (p => df => graft.ops.Experimentation.psi(
      df, col(str(p, "bin_col")), col(str(p, "slice_col")),
      str(p, "ref_slice"), str(p, "cur_slice"),
      numOpt(p, "n_bins").map(_.toInt).getOrElse(10))),
    "fleiss_kappa" -> (p => df => graft.ops.Evaluation.fleissKappa(
      df, col(str(p, "item_col")), col(str(p, "category_col")),
      num(p, "n_raters").toInt)),
    "brier_decomposition" -> (p => df =>
      graft.ops.Evaluation.brierDecomposition(
        df, col(str(p, "conf_ppm_col")), col(str(p, "label_col")),
        numOpt(p, "bins").map(_.toInt).getOrElse(10))),
    "time_decay_attribution" -> (p => df =>
      graft.ops.EventAnalytics.timeDecayAttribution(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "tie_col"),
        str(p, "type_col"), str(p, "conv_type"),
        num(p, "half_life_seconds").toLong)),
    "hodges_lehmann" -> (p => df => graft.ops.Aggregates.hodgesLehmann(
      df, strs(p, "keys"), col(str(p, "value_col")))),
    "nelson_aalen" -> (p => df => graft.ops.EventAnalytics.nelsonAalen(
      df, col(str(p, "duration_col")), col(str(p, "event_col")))),
    // batch 32 (q273-q278)
    "friedman" -> (p => df => graft.ops.Aggregates.friedman(
      df, col(str(p, "block_col")), col(str(p, "treatment_col")),
      col(str(p, "value_col")))),
    "soundex_pairs" -> (p => df => graft.ops.EntityResolution.soundexPairs(
      df, str(p, "name_col"))),
    "heaps_fit" -> (p => df => graft.ext.TextAnalysis.heapsFit(
      df, graft.ext.Dedup.wordShingles(col(str(p, "text_col")),
        numOpt(p, "shingle_size").map(_.toInt).getOrElse(2)),
      col(str(p, "id_col")),
      numOpt(p, "every").map(_.toLong).getOrElse(25L))),
    "lorenz_curve" -> (p => df => graft.ops.Aggregates.lorenzCurve(
      df, col(str(p, "value_col")),
      numOpt(p, "n_bins").map(_.toInt).getOrElse(10))),
    "croston" -> (p => df => graft.ops.TimeSeriesOps.crostonInt(
      df, strs(p, "keys").map(col), col(str(p, "order_col")),
      col(str(p, "demand_col")),
      numOpt(p, "alpha_num").map(_.toLong).getOrElse(1L),
      numOpt(p, "alpha_den").map(_.toLong).getOrElse(5L),
      numOpt(p, "scale").map(_.toLong).getOrElse(1000L))),
    "tost_equivalence" -> (p => df => graft.ops.Aggregates.tostEquivalence(
      df, col(str(p, "value_col")), col(str(p, "group_col")),
      str(p, "group_a"), str(p, "group_b"), num(p, "margin").toLong)),
    // batch 33 (q279-q284)
    "page_hinkley" -> (p => df => graft.ops.TimeSeriesOps.pageHinkleyInt(
      df, strs(p, "keys").map(col), col(str(p, "order_col")),
      col(str(p, "value_col")),
      numOpt(p, "delta_micro").map(_.toLong).getOrElse(0L),
      num(p, "lambda_micro").toLong)),
    "binary_diagnostics" -> (p => df =>
      graft.ops.Evaluation.binaryDiagnostics(
        df, expr(str(p, "pred_cond")), expr(str(p, "label_cond")))),
    "k_truss" -> (p => df => graft.ext.Graph.kTruss(
      df, str(p, "src_col"), str(p, "dst_col"), num(p, "k").toInt,
      numOpt(p, "rounds").map(_.toInt).getOrElse(3))),
    "gumbel_fit" -> (p => df => graft.ops.Aggregates.gumbelFit(
      df, col(str(p, "block_col")), col(str(p, "value_col")),
      num(p, "threshold").toLong)),
    "category_mix_drift" -> (p => df =>
      graft.ops.EventAnalytics.categoryMixDrift(
        df, col(str(p, "period_col")), col(str(p, "category_col")))),
    "label_centroid_cosines" -> (p => df =>
      graft.ext.Clustering.labelCentroidCosines(
        df, col(str(p, "vec_col")), col(str(p, "label_col")))),
    // batch 34 (q285-q290)
    "wasserstein1" -> (p => df => graft.ops.Aggregates.wasserstein1(
      df, col(str(p, "value_col")), col(str(p, "slice_col")),
      str(p, "slice_a"), str(p, "slice_b"))),
    "abc_classification" -> (p => df =>
      graft.ops.Aggregates.abcClassification(
        df, col(str(p, "key_col")), col(str(p, "value_col")))),
    "anderson_darling" -> (p => df => graft.ops.Aggregates.andersonDarling(
      df, col(str(p, "value_col")))),
    "overdispersion_audit" -> (p => df =>
      graft.ops.Aggregates.overdispersionAudit(
        df, strs(p, "keys").map(col), col(str(p, "count_col")))),
    "eb_shrinkage" -> (p => df => graft.ops.Features.ebShrinkage(
      df, strs(p, "keys").map(col), expr(str(p, "success_cond")),
      numOpt(p, "min_n").map(_.toLong).getOrElse(20L))),
    "funnel_significance" -> (p => df =>
      graft.ops.EventAnalytics.funnelWithSignificance(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "type_col"),
        strs(p, "stages"))),
    // batch 35 (q291-q296)
    "acf_profile" -> (p => df => graft.ops.TimeSeriesOps.acfProfile(
      df, col(str(p, "order_col")), col(str(p, "value_col")),
      numOpt(p, "k_lags").map(_.toInt).getOrElse(6))),
    "keywords_chi2" -> (p => df => graft.ext.TextAnalysis.keywordsByChi2(
      df, col(str(p, "text_col")), col(str(p, "slice_col")),
      numOpt(p, "top_k").map(_.toInt).getOrElse(10))),
    "quantile_normalize" -> (p => df =>
      graft.ops.Aggregates.quantileNormalize(
        df, col(str(p, "value_col")), col(str(p, "slice_col")),
        str(p, "ref_slice"), str(p, "target_slice"))),
    "seasonality_strength" -> (p => df =>
      graft.ops.TimeSeriesOps.seasonalityStrength(
        df, strs(p, "keys").map(col), col(str(p, "season_col")),
        col(str(p, "value_col")))),
    "label_silhouette" -> (p => df => graft.ext.Clustering.labelSilhouette(
      df, col(str(p, "id_col")), col(str(p, "vec_col")),
      col(str(p, "label_col")))),
    "hellinger_binned" -> (p => df => graft.ops.Aggregates.hellingerBinned(
      df, col(str(p, "bin_col")), col(str(p, "slice_col")),
      str(p, "slice_a"), str(p, "slice_b"))),
    // batch 36 (q297-q302)
    "context_packing_audit" -> (p => df =>
      graft.ext.Curation.contextPackingAudit(
        df, col(str(p, "id_col")), col(str(p, "size_col")),
        num(p, "capacity").toLong)),
    "cluster_purity" -> (p => df => graft.ext.Curation.clusterPurity(
      df, col(str(p, "cluster_col")), col(str(p, "label_col")))),
    "source_overlap_matrix" -> (p => df =>
      graft.ext.Curation.sourceOverlapMatrix(
        df, col(str(p, "text_col")), col(str(p, "source_col")),
        numOpt(p, "shingle_size").map(_.toInt).getOrElse(3))),
    "source_health_profile" -> (p => df =>
      graft.ext.Curation.sourceHealthProfile(
        df, col(str(p, "source_col")), col(str(p, "text_col")),
        col(str(p, "lang_col")), col(str(p, "chars_col")))),
    "vocab_coverage" -> (p => df => graft.ext.TextAnalysis.vocabCoverage(
      df, col(str(p, "text_col")),
      strs(p, "thresholds_ppm").map(_.toLong))),
    "template_prefix_profile" -> (p => df =>
      graft.ext.TextAnalysis.templatePrefixProfile(
        df, col(str(p, "text_col")), col(str(p, "source_col")),
        numOpt(p, "k").map(_.toInt).getOrElse(3))),
    // batch 37 (q303-q308)
    "cronbach_alpha" -> (p => df => graft.ops.Aggregates.cronbachAlpha(
      df, col(str(p, "subject_col")), col(str(p, "item_col")),
      col(str(p, "value_col")), num(p, "n_items").toInt)),
    "partial_correlation" -> (p => df =>
      graft.ops.Aggregates.partialCorrelation(
        df, col(str(p, "x_col")), col(str(p, "y_col")),
        col(str(p, "z_col")))),
    "regression_influence" -> (p => df =>
      graft.ops.Aggregates.regressionInfluence(
        df, col(str(p, "id_col")), col(str(p, "x_col")),
        col(str(p, "y_col")),
        numOpt(p, "top_k").map(_.toInt).getOrElse(10))),
    "qn_scale" -> (p => df => graft.ops.Aggregates.qnScale(
      df, strs(p, "keys"), col(str(p, "value_col")))),
    "bland_altman" -> (p => df => graft.ops.Aggregates.blandAltman(
      df, col(str(p, "a_col")), col(str(p, "b_col")))),
    "rake_to_marginals" -> (p => df =>
      graft.ops.Experimentation.rakeToMarginals(
        df, col(str(p, "row_col")), col(str(p, "col_col")),
        col(str(p, "slice_col")), str(p, "ref_slice"), str(p, "cur_slice"),
        numOpt(p, "rounds").map(_.toInt).getOrElse(2))),
    // batch 38 (q309-q314)
    "hilbert_key" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse("hkey"),
      graft.ops.Layout.hilbertKey(col(str(p, "x_col")), col(str(p, "y_col")),
        num(p, "xmin"), num(p, "xmax"), num(p, "ymin"), num(p, "ymax"),
        numOpt(p, "bits").map(_.toInt).getOrElse(12)))),
    "capped_sessionize" -> (p => df =>
      graft.ops.EventAnalytics.cappedSessionize(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "tie_col"),
        num(p, "gap_seconds").toLong, num(p, "cap_seconds").toLong)),
    "transition_triples" -> (p => df =>
      graft.ops.EventAnalytics.topTransitionTriples(
        df, col(str(p, "actor_col")), col(str(p, "ts_col")),
        col(str(p, "tie_col")), col(str(p, "type_col")),
        numOpt(p, "top_k").map(_.toInt).getOrElse(20))),
    "mcnemar" -> (p => df => graft.ops.Aggregates.mcNemar(
      df, expr(str(p, "pred_a_cond")), expr(str(p, "pred_b_cond")),
      expr(str(p, "label_cond")))),
    "runs_test" -> (p => df => graft.ops.Aggregates.runsTest(
      df, col(str(p, "order_col")), expr(str(p, "flag_cond")))),
    "woe_encoding" -> (p => df => graft.ops.Features.woeEncoding(
      df, col(str(p, "category_col")), expr(str(p, "event_cond")))),
    // batch 39 (q314-q318)
    "ratio_metric_delta" -> (p => df =>
      graft.ops.Experimentation.ratioMetricDelta(
        df, col(str(p, "x_col")), col(str(p, "y_col")),
        col(str(p, "arm_col")))),
    "multi_contains" -> (p => df => df.withColumn(
      strOpt(p, "out_col").getOrElse("pattern_mask"),
      graft.ext.MultiContains.multiContains(
        col(str(p, "text_col")), strs(p, "patterns")))),
    "mmr_rerank" -> (p => df => graft.ext.Similarity.mmrRerank(
      df, str(p, "id_col"), str(p, "rel_col"), str(p, "vec_col"),
      num(p, "k").toInt,
      numOpt(p, "lam_num").map(_.toLong).getOrElse(7L),
      numOpt(p, "lam_den").map(_.toLong).getOrElse(10L))),
    "shapley_attribution" -> (p => df =>
      graft.ops.EventAnalytics.shapleyAttribution(
        df, str(p, "actor_col"), str(p, "ts_col"), str(p, "tie_col"),
        str(p, "type_col"), str(p, "conv_type"))),
    "bpe_train" -> (p => df => graft.ext.TextAnalysis.bpeTrain(
      df, col(str(p, "text_col")),
      numOpt(p, "merges").map(_.toInt).getOrElse(10))),
    // batch 40 (q319-q322)
    "isotonic_calibration" -> (p => df =>
      graft.ops.Evaluation.isotonicCalibration(
        df, expr(str(p, "bin_expr")), expr(str(p, "label_expr")))),
    "rake_keyphrases" -> (p => df => graft.ext.TextAnalysis.keyphrasesRake(
      df, col(str(p, "id_col")), col(str(p, "text_col")),
      strs(p, "stopwords"),
      numOpt(p, "top_k").map(_.toInt).getOrElse(20))),
    "hard_negatives" -> (p => df => graft.ext.Similarity.hardNegatives(
      df, str(p, "id_col"), str(p, "label_col"), str(p, "vec_col"),
      numOpt(p, "k").map(_.toInt).getOrElse(5))),
    // batch 41 (q323-q327)
    "cliffs_delta" -> (p => df => graft.ops.Aggregates.cliffsDelta(
      df, col(str(p, "value_col")), col(str(p, "group_col")),
      str(p, "group_a"), str(p, "group_b"))),
    "yuen_trimmed_t" -> (p => df => graft.ops.Aggregates.yuenTrimmedT(
      df, col(str(p, "value_col")), col(str(p, "group_col")),
      str(p, "group_a"), str(p, "group_b"),
      numOpt(p, "g_num").map(_.toLong).getOrElse(1L),
      numOpt(p, "g_den").map(_.toLong).getOrElse(5L))),
    "sprt" -> (p => df => graft.ops.Experimentation.sprt(
      df, expr(str(p, "look_expr")), expr(str(p, "success_expr")),
      num(p, "llr_success_micro").toLong, num(p, "llr_failure_micro").toLong,
      num(p, "upper_micro").toLong, num(p, "lower_micro").toLong)),
    "kish_neff" -> (p => df => graft.ops.Aggregates.kishNeff(
      df, col(str(p, "slice_col")), expr(str(p, "weight_expr")))),
    // batch 42 (q328-q330)
    "t_closeness" -> (p => df => graft.ops.Privacy.tClosenessPerClass(
      df, strs(p, "quasi_ids").map(col), expr(str(p, "sensitive_expr")))),
    "pass_at_k" -> (p => df => graft.ops.Evaluation.passAtK(
      df, expr(str(p, "task_expr")), expr(str(p, "correct_expr")),
      num(p, "k").toInt)),
    "rouge_l" -> (p => df => graft.ext.TextAnalysis.rougeL(
      df, str(p, "pair_id_col"), str(p, "cand_col"), str(p, "ref_col"))),
    // batch 43 (q331-q332)
    "padding_waste" -> (p => df => graft.ext.Curation.paddingWasteAudit(
      df, expr(str(p, "len_expr")), num(p, "bucket_width").toLong)),
    "bleu" -> (p => df => graft.ext.Curation.bleu(
      df, str(p, "pair_id_col"), str(p, "cand_col"), str(p, "ref_col"),
      numOpt(p, "max_n").map(_.toInt).getOrElse(2))),
    // batch 44 (q333-q335)
    "regression_discontinuity" -> (p => df =>
      graft.ops.Experimentation.regressionDiscontinuity(
        df, col(str(p, "running_col")), expr(str(p, "outcome_expr")),
        num(p, "cutoff").toLong, num(p, "bandwidth").toLong)),
    "horvitz_thompson" -> (p => df => graft.ops.Aggregates.horvitzThompson(
      df, col(str(p, "slice_col")), col(str(p, "value_col")),
      col(str(p, "prob_ppm_col")))),
    "code_quality" -> (p => df => graft.ext.TextAnalysis.codeQualitySignals(
      df, col(str(p, "id_col")), col(str(p, "text_col")))),
    "dawid_skene" -> (p => df => graft.ops.Evaluation.dawidSkene(
      df, col(str(p, "item_col")), col(str(p, "rater_col")),
      expr(str(p, "label_expr")),
      numOpt(p, "rounds").map(_.toInt).getOrElse(2))),
    // batch 46 (q338-q339)
    "qte" -> (p => df => graft.ops.Experimentation.quantileTreatmentEffects(
      df, col(str(p, "value_col")), col(str(p, "arm_col")),
      str(p, "arm_a"), str(p, "arm_b"),
      strs(p, "q_ppms").map(_.toLong))),
    "poisson_bootstrap_se" -> (p => df =>
      graft.ops.Aggregates.poissonBootstrapSE(
        df, col(str(p, "id_col")), expr(str(p, "value_expr")),
        numOpt(p, "n_reps").map(_.toInt).getOrElse(50))),
    // batch 47 (q340-q341)
    "covariate_balance" -> (p => df =>
      graft.ops.Experimentation.covariateBalance(
        df, col(str(p, "arm_col")), str(p, "arm_a"), str(p, "arm_b"),
        strs(p, "covariates").map(c => c -> col(c)))),
    "rmst" -> (p => df => graft.ops.EventAnalytics.rmst(
      df, col(str(p, "duration_col")), expr(str(p, "event_expr")),
      num(p, "tau").toLong)),
    // batch 48 (q342-q343)
    "doubly_robust_value" -> (p => df =>
      graft.ops.Experimentation.doublyRobustValue(
        df, expr(str(p, "match_expr")), col(str(p, "prop_ppm_col")),
        col(str(p, "reward_micro_col")), col(str(p, "qhat_target_col")),
        col(str(p, "qhat_logged_col")))),
    "confidence_sequence" -> (p => df =>
      graft.ops.Experimentation.confidenceSequence(
        df, expr(str(p, "look_expr")), expr(str(p, "value_expr")),
        numOpt(p, "alpha").getOrElse(0.05),
        numOpt(p, "rho").getOrElse(1.0)))
    // rank_biased_overlap takes TWO frames (run A and run B), which the
    // single-input pipeline op contract cannot express — query/API only
  ))
}
