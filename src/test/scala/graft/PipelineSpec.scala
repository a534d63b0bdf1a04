package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline._

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pipe = Pipeline("test")
    .addOperation(Operation("keep_recent", "filter", "condition" -> JStr("v > 1")))
    .addOperation(Operation("shape", "select",
      "columns" -> JArr(Vector(JStr("id"), JStr("v")))))

  private def data = Seq((1L, 1.0, "x"), (2L, 2.0, "y"), (3L, 3.0, "z")).toDF("id", "v", "s")

  test("C8: run folds ops into one lazy plan and validates") {
    val (out, validated) = pipe.run(data)
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.count() == 2)
    assert(validated.validated)
    validated.requireValidated() // no throw
  }

  test("C11: unvalidated pipeline guard throws") {
    intercept[graft.core.UnvalidatedPipeline] { pipe.requireValidated() }
  }

  test("X1: newest registry ops run end-to-end from serialized JSON specs") {
    // the kwargs plumbing is stringly-typed and otherwise exercised
    // only where a declared query uses the op — run each one here
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1

    val docs = Seq((1L, "alpha beta gamma delta", "s0"),
      (2L, "alpha beta gamma delta", "s0"),
      (3L, "epsilon zeta eta theta", "s1")).toDF("doc_id", "text", "source")
    val pairs = run("""{"pipe":"p","operations":[{"name":"pp","function":
      "prefix_jaccard_pairs","kwargs":{"text_col":"text","id_col":"doc_id",
      "shingle_size":1,"t_num":1,"t_den":2}}]}""", docs).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))

    val kept = run("""{"pipe":"p","operations":[{"name":"t","function":
      "temperature_sample","kwargs":{"key":"source","text_col":"text"}}]}""",
      docs).collect()
    assert(kept.nonEmpty && kept.length <= 3)

    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val ranks = run("""{"pipe":"p","operations":[{"name":"pr","function":
      "pagerank","kwargs":{"src_col":"a","dst_col":"b","iters":2}}]}""",
      edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))

    val media = Seq(
      (1L, graft.ext.Multimodal.syntheticBlockPng(0x0F0F00FF33CC55AAL)),
      (2L, graft.ext.Multimodal.syntheticBlockPng(0x0F0F00FF33CC55AAL ^ 3L)))
      .toDF("media_id", "payload")
    val imgPairs = run("""{"pipe":"p","operations":[{"name":"i","function":
      "image_near_dups","kwargs":{"id_col":"media_id","payload_col":"payload",
      "max_distance":3}}]}""", media).collect()
    assert(imgPairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))

    val wavs = Seq(
      (1L, graft.ext.Multimodal.syntheticBlockWav(0xA5A50F0F33CC55AAL)),
      (2L, graft.ext.Multimodal.syntheticBlockWav(0xA5A50F0F33CC55AAL ^ 5L)))
      .toDF("media_id", "payload")
    val audPairs = run("""{"pipe":"p","operations":[{"name":"a","function":
      "audio_near_dups","kwargs":{"id_col":"media_id","payload_col":"payload",
      "max_distance":3}}]}""", wavs).collect()
    assert(audPairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))

    // malformed group_agg fails with the typed message, not head-of-empty
    val e = intercept[RuntimeException] {
      run("""{"pipe":"p","operations":[{"name":"g","function":"group_agg",
        "kwargs":{"by":["source"]}}]}""", docs)
    }
    assert(e.getMessage.contains("group_agg requires"), e.getMessage)

    // order-statistics / graph ops (q125-q130 registry twins)
    val pts = Seq((1L, 1L, 10.0), (2L, 2L, 12.0), (3L, 3L, 11.0))
      .toDF("id", "x", "y")
    val sky = run("""{"pipe":"p","operations":[{"name":"s","function":
      "skyline","kwargs":{"x_col":"x","y_col":"y"}}]}""", pts)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(sky.toSeq == Seq(1L, 2L))

    val binned = run("""{"pipe":"p","operations":[{"name":"q","function":
      "qcut","kwargs":{"column":"y","tie_col":"id","n":3}}]}""", pts)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(binned == Map(1L -> 1, 3L -> 2, 2L -> 3))

    val tri = run("""{"pipe":"p","operations":[{"name":"t","function":
      "triangle_counts","kwargs":{"src_col":"a","dst_col":"b"}}]}""",
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")).count()
    assert(tri == 3)

    val core = run("""{"pipe":"p","operations":[{"name":"k","function":
      "k_core","kwargs":{"src_col":"a","dst_col":"b","k":2,"rounds":3}}]}""",
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")).count()
    assert(core == 3) // the triangle survives the 2-core; the pendant drops

    val snp = run("""{"pipe":"p","operations":[{"name":"s","function":
      "sorted_neighborhood_pairs","kwargs":{"sort_key_col":"name",
      "id_col":"rid","window":2,"max_dist":2}}]}""",
      Seq((1L, "alpha"), (2L, "alphX"), (3L, "zzzzz")).toDF("rid", "name"))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(snp.toSeq == Seq((2L, 1L))) // alphX sorts before alpha
  }

  test("X1: batch-7/8 registry ops run end-to-end from serialized JSON specs") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val obs = Seq(("A", 1.0, 1L, 1L), ("A", 2.0, 1L, 2L),
      ("B", 2.0, 1L, 3L), ("B", 3.0, 1L, 4L)).toDF("g", "v", "wt", "id")
    val wq = run("""{"pipe":"p","operations":[{"name":"w","function":
      "weighted_quantile","kwargs":{"keys":["g"],"value_col":"v",
      "weight_col":"wt","tie_cols":["id"],"q_num":1,"q_den":2}}]}""", obs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wq == Map("A" -> 1.0, "B" -> 2.0))

    val mw = run("""{"pipe":"p","operations":[{"name":"m","function":
      "mann_whitney","kwargs":{"value_col":"v","group_col":"g",
      "group_a":"A","group_b":"B"}}]}""", obs).collect().head
    assert(mw.getLong(2) == 1L) // u2_a from the spec's hand case

    val ks = run("""{"pipe":"p","operations":[{"name":"k","function":
      "ks_test","kwargs":{"value_col":"v","group_col":"g",
      "group_a":"A","group_b":"B"}}]}""", obs).collect().head
    assert(ks.getLong(2) == 2L && ks.getDouble(3) == 0.5)

    val chi = run("""{"pipe":"p","operations":[{"name":"c","function":
      "chi_square","kwargs":{"row_col":"g","col_col":"id"}}]}""", obs)
      .collect().head
    assert(chi.getLong(1) == 3L) // dof = (2-1)(4-1)

    val funnel = Seq((1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "buy")).toDF("u", "ts", "et")
    val f = run("""{"pipe":"p","operations":[{"name":"f","function":
      "windowed_funnel","kwargs":{"actor_col":"u","ts_col":"ts",
      "type_col":"et","stages":["view","buy"],"within_seconds":1800}}]}""",
      funnel).collect().head
    assert(!f.isNullAt(1) && !f.isNullAt(2))

    val ew = run("""{"pipe":"p","operations":[{"name":"e","function":
      "ewma","kwargs":{"keys":["g"],"order_col":"id","value_col":"wt",
      "num":1,"den":4}}]}""", obs)
    assert(ew.columns.toSeq == Seq("g", "order", "value", "ewma") &&
      ew.count() == 4)

    val lr = run("""{"pipe":"p","operations":[{"name":"l","function":
      "largest_remainder","kwargs":{"keys":["g"],"weight_col":"wt",
      "total":7}}]}""", obs)
      .collect().map(r => r.getLong(2)).sum
    assert(lr == 7L)

    val bf = run("""{"pipe":"p","operations":[{"name":"b","function":
      "benford","kwargs":{"value_col":"id"}}]}""", obs)
    assert(bf.count() == 9)

    // two-input ops: the secondary frame reads from a parquet file
    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    Seq((2L, "U", 1L, 22.0), (9L, "I", 1L, 99.0))
      .toDF("id", "op", "seq", "nv").write.parquet(s"$tmp/cdc")
    val snap = Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v")
    val cdc = run(s"""{"pipe":"p","operations":[
      {"name":"c","function":"apply_cdc","kwargs":{
        "delta_file":"$tmp/cdc","key_col":"id","order":["seq"],"op_col":"op"}},
      {"name":"m","function":"select","kwargs":{"columns":["id","v","nv"]}}]}""",
      snap)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) r.getDouble(1) else r.getDouble(2))).toMap
    assert(cdc == Map(2L -> 22.0, 3L -> 30.0, 9L -> 99.0))

    Seq(Tuple1(1L)).toDF("node").write.parquet(s"$tmp/seeds")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val hops = run(s"""{"pipe":"p","operations":[{"name":"h","function":
      "bfs_hops","kwargs":{"src_col":"a","dst_col":"b",
      "seeds_file":"$tmp/seeds","seed_col":"node","rounds":2}}]}""", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))

    val bal = run("""{"pipe":"p","operations":[{"name":"b","function":
      "clamped_balance","kwargs":{"keys":["g"],"order":["id"],
      "delta_col":"wt"}}]}""", obs)
    assert(bal.columns.contains("balance") && bal.count() == 4)

    val sa = run("""{"pipe":"p","operations":[{"name":"s","function":
      "skew_audit","kwargs":{"key_col":"g"}}]}""", obs).collect().head
    assert(sa.getLong(0) == 4L && sa.getLong(1) == 2L)

    val pa = run("""{"pipe":"p","operations":[{"name":"pa","function":
      "position_attribution","kwargs":{"actor_col":"u","ts_col":"ts",
      "tie_col":"et","type_col":"et","conv_type":"buy"}}]}""", funnel)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(pa == Map("view" -> 10000L))

    val km = run("""{"pipe":"p","operations":[{"name":"k","function":
      "kaplan_meier","kwargs":{"duration_col":"id","event_col":"wt"}}]}""",
      obs)
    assert(km.columns.toSeq == Seq("t", "n_risk", "d_events", "surv_ppm") &&
      km.count() == 4)

    val nd = run("""{"pipe":"p","operations":[{"name":"n","function":
      "ndcg","kwargs":{"key_col":"g","order":["id"],"rel_col":"wt",
      "k":10}}]}""", obs)
    assert(nd.columns.contains("ndcg") && nd.count() == 2)

    val gr = run("""{"pipe":"p","operations":[{"name":"g","function":
      "global_row_number","kwargs":{"order":["v","id"]}}]}""", obs)
      .select("row_num").as[Long].collect().sorted.toSeq
    assert(gr == Seq(1L, 2L, 3L, 4L))

    val vecs = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(9.0f, 9.0f)),
      (3L, Seq(0.1f, 0.1f))).toDF("vec_id", "embedding")
    val kmj = run("""{"pipe":"p","operations":[{"name":"k","function":
      "kmeans","kwargs":{"id_col":"vec_id","vec_col":"embedding",
      "k":2,"iters":1}}]}""", vecs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kmj(1L) == kmj(3L) && kmj(1L) != kmj(2L))

    val cmj = run("""{"pipe":"p","operations":[{"name":"c","function":
      "correlation_matrix","kwargs":{"vec_col":"embedding","dims":2}}]}""",
      vecs)
    assert(cmj.count() == 3)

    val fpj = run("""{"pipe":"p","operations":[{"name":"f","function":
      "fingerprint","kwargs":{"keys":["g"],"columns":["id","v"]}}]}""", obs)
    assert(fpj.columns.toSeq ==
      Seq("g", "n_rows", "sum_sig", "xor_sig") && fpj.count() == 2)

    obs.select(col("id").as("k2")).write.parquet(s"$tmp/bside")
    val jcj = run(s"""{"pipe":"p","operations":[{"name":"j","function":
      "join_cardinality","kwargs":{"key_a":"id","b_file":"$tmp/bside",
      "key_b":"k2"}}]}""", obs).collect().head
    assert(jcj.getLong(5) == 4L) // 4 ids, 1:1

    Seq(("a", 1L), ("b", 2L)).toDF("id", "rank").write.parquet(s"$tmp/listb")
    val rrfj = run(s"""{"pipe":"p","operations":[{"name":"r","function":
      "rrf","kwargs":{"other_file":"$tmp/listb","id_col":"id",
      "rank_col":"rank"}}]}""",
      Seq(("a", 1L), ("c", 2L)).toDF("id", "rank"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rrfj("a") == 32786L && rrfj("b") == 16129L) // 2x div61, div62

    keysDf.write.parquet(s"$tmp/probes")
    val cms = run(s"""{"pipe":"p","operations":[
      {"name":"b","function":"count_min_build","kwargs":{
        "key_col":"id","width":64,"depth":2}},
      {"name":"e","function":"count_min_estimate","kwargs":{
        "probes_file":"$tmp/probes","key_col":"id","width":64,"depth":2}}]}""",
      obs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cms.values.forall(_ >= 1L) && cms.size == 4)

    val hll = run("""{"pipe":"p","operations":[
      {"name":"r","function":"hll_registers","kwargs":{
        "keys":["g"],"key_col":"id","m":16}},
      {"name":"e","function":"hll_estimate","kwargs":{"keys":["g"],"m":16}}]}""",
      obs)
    assert(hll.columns.toSeq ==
      Seq("g", "registers_hit", "sum_scaled", "est_hll") && hll.count() == 2)

    val blm = run(s"""{"pipe":"p","operations":[
      {"name":"b","function":"bloom_build","kwargs":{
        "key_col":"id","bits":64,"k":2}},
      {"name":"pr","function":"bloom_probe","kwargs":{
        "probes_file":"$tmp/probes","key_col":"id","bits":64,"k":2}}]}""",
      obs).collect()
    // every probe key was inserted: all 2 hashes hit, verdict positive
    assert(blm.length == 4 && blm.forall(r => r.getLong(1) == 2L))

    val ho = run("""{"pipe":"p","operations":[{"name":"h","function":
      "holt","kwargs":{"keys":["g"],"order_col":"id","value_col":"wt",
      "a_num":1,"a_den":5,"b_num":1,"b_den":10,"scale":1000}}]}""", obs)
    assert(ho.columns.toSeq == Seq("g", "order", "value", "level_s",
      "trend_s", "forecast_s") && ho.count() == 4)

    val rd = run("""{"pipe":"p","operations":[{"name":"r","function":
      "readability","kwargs":{"text_col":"g"}}]}""", obs)
    assert(rd.columns.contains("flesch_milli") && rd.count() == 4)

    val zm = run("""{"pipe":"p","operations":[{"name":"z","function":
      "zone_map_audit","kwargs":{"layout":"nat","chunk_expr":"id div 2",
      "value_col":"id","lo":1,"hi":2}}]}""", obs).collect().head
    assert(zm.getString(0) == "nat" && zm.getLong(3) == 4L)

    // batch-13: evaluation + KMV ops
    val auc = run("""{"pipe":"p","operations":[{"name":"a","function":
      "auc","kwargs":{"keys":[],"score_expr":"id",
      "label_expr":"case when g = 'B' then 1 else 0 end"}}]}""", obs)
      .collect().head
    assert(auc.getAs[Double]("auc") == 1.0) // B holds the top ids

    val cm = run("""{"pipe":"p","operations":[{"name":"c","function":
      "class_metrics","kwargs":{"label_col":"g","pred_col":"g"}}]}""", obs)
      .collect()
    assert(cm.length == 2 && cm.forall(_.getAs[Long]("f1_ppm") == 1000000L))

    val dl = run("""{"pipe":"p","operations":[{"name":"d","function":
      "decile_lift","kwargs":{"order":["id"],"bins":2,
      "label_expr":"case when id >= 3 then 1 else 0 end"}}]}""", obs)
      .collect()
    assert(dl.length == 2 && dl.last.getAs[Long]("capture_ppm") == 1000000L)

    val kmv = run("""{"pipe":"p","operations":[
      {"name":"s","function":"kmv_sketch","kwargs":{
        "keys":["g"],"key_col":"id","k":8}},
      {"name":"e","function":"kmv_estimate","kwargs":{"keys":["g"],"k":8}}]}""",
      obs).collect()
    assert(kmv.length == 2 && kmv.forall(_.getAs[Long]("est_kmv") == 2L))

    Seq((1L, 10L), (1L, 11L)).toDF("query_id", "item_id")
      .write.parquet(s"$tmp/truth")
    val re = run(s"""{"pipe":"p","operations":[{"name":"r","function":
      "retrieval_eval","kwargs":{"truth_file":"$tmp/truth","k":5}}]}""",
      Seq((1L, 10L, 1), (1L, 99L, 2)).toDF("query_id", "item_id", "rank"))
      .collect().head
    assert(re.getAs[Long]("hits") == 1L && re.getAs[Long]("rr_ppm") == 1000000L)

    // batch-14: trend, seed-proximity and spatial-cell ops
    val sd = run("""{"pipe":"p","operations":[{"name":"s","function":
      "seasonal_decompose","kwargs":{"keys":[],"season_expr":"id % 2",
      "value_col":"id"}}]}""", obs)
    assert(sd.columns.contains("seasonal_c") && sd.count() == 4)

    val fe = run("""{"pipe":"p","operations":[{"name":"f","function":
      "forecast_eval","kwargs":{"keys":["g"],"scale":1}}]}""",
      Seq(("A", 1L, 5L, 4L), ("A", 2L, 6L, 5L))
        .toDF("g", "order", "value", "forecast_s"))
    assert(fe.count() == 1 && fe.head().getAs[Long]("n_eval") == 1L)

    val tsn = run("""{"pipe":"p","operations":[{"name":"t","function":
      "theil_sen","kwargs":{"keys":["g"],"x_col":"id","y_col":"id"}}]}""",
      obs).collect()
    assert(tsn.forall(_.getAs[Double]("slope") == 1.0))

    Seq(1L).toDF("nid").write.parquet(s"$tmp/ppr_seeds")
    val pr = run(s"""{"pipe":"p","operations":[{"name":"p","function":
      "ppr","kwargs":{"src_col":"id","dst_col":"wt",
      "sources_file":"$tmp/ppr_seeds","source_id_col":"nid","iters":2}}]}""",
      obs)
    assert(pr.columns.toSeq == Seq("node", "rank_ppm") && pr.count() >= 2)

    val gh = run("""{"pipe":"p","operations":[{"name":"g","function":
      "geohash","kwargs":{"lat_col":"v","lon_col":"v","precision":4}}]}""",
      obs)
    assert(gh.select("geohash").collect().forall(_.getString(0).length == 4))

    // batch-15: parametric stats, compaction, markov scoring
    val wt = run("""{"pipe":"p","operations":[{"name":"w","function":
      "welch_t","kwargs":{"value_col":"id","group_col":"g",
      "group_a":"A","group_b":"B"}}]}""", obs).collect().head
    assert(wt.getAs[Long]("n_a") == 2L && wt.getAs[Double]("t_stat") < 0.0)

    val af = run("""{"pipe":"p","operations":[{"name":"a","function":
      "anova_f","kwargs":{"value_col":"id","group_col":"g"}}]}""", obs)
      .collect().head
    assert(af.getAs[Long]("k") == 2L && af.getAs[Long]("n") == 4L)

    val o2 = run("""{"pipe":"p","operations":[{"name":"o","function":
      "ols2","kwargs":{"keys":["g"],"x1_col":"id","x2_col":"wt",
      "y_col":"id"}}]}""", obs)
    assert(o2.columns.toSeq == Seq("g", "n", "b1", "b2", "intercept"))

    val cp = run("""{"pipe":"p","operations":[{"name":"c","function":
      "compaction_plan","kwargs":{"file_id_col":"id","bytes_col":"wt",
      "target":2}}]}""", obs).collect()
    assert(cp.map(_.getAs[Long]("bytes")).sum == 4L)

    val ma = run("""{"pipe":"p","operations":[{"name":"m","function":
      "markov_accuracy","kwargs":{"actor_col":"g","ts_col":"id",
      "type_col":"g","tie_col":"id"}}]}""", obs)
    assert(ma.columns.contains("acc_ppm") && ma.count() == 2)
  }

  private def keysDf = {
    import spark.implicits._
    Seq(1L, 2L, 3L, 4L).toDF("id")
  }

  test("C2/C3: JSON round-trip is identity") {
    val json = pipe.toJson.render
    val back = Pipeline.fromJson(json)
    assert(back.name == pipe.name)
    assert(back.operations == pipe.operations)
    // and re-rendering is byte-stable
    assert(back.toJson.render == json)
  }

  test("C8: run writes the provenance spec JSON") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spec").toString
    pipe.run(data, specOut = Some(dir))
    val spec = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "test_pipe.json"))
    assert(Pipeline.fromJson(spec).operations.length == 2)
  }

  test("C4-C7: editors are immutable and invalidate") {
    val p0 = pipe.run(data)._2
    assert(p0.validated)
    val p1 = p0.addOperation(Operation("lim", "limit", "n" -> JNum(1)))
    assert(!p1.validated && p0.validated && p1.operations.length == 3)
    val p2 = p1.popOperation("lim")
    assert(p2.operations.map(_.name) == Vector("keep_recent", "shape"))
    val p3 = p1.moveOperation("lim", 0)
    assert(p3.operations.head.name == "lim")
    intercept[IllegalArgumentException] { p1.moveOperation("ghost", 0) }
    val p4 = p0.setKwarg("keep_recent", "condition", JStr("v > 2"))
    assert(p4.run(data)._1.count() == 1)
    // setKwarg on absent op: silent no-op (reference behavior)
    assert(p0.setKwarg("ghost", "k", JNull).operations == p0.operations)
  }

  test("C9: sweep runs one result per parameter value") {
    val res = pipe.sweep(data, "keep_recent", "condition",
      Seq(JStr("v > 0"), JStr("v > 2")))
    assert(res.map(_._2.count()) == Seq(3L, 1L))
  }

  test("X1: unknown operator raises UnknownFunction listing known ones") {
    val bad = Pipeline("p").addOperation(Operation("x", "not_an_op"))
    val e = intercept[graft.core.UnknownFunction] { bad.run(data) }
    assert(e.known.contains("filter"))
    assert(!e.getMessage.contains("Column")) // not a column error
  }

  test("X1: user-registered op works and spec stays serializable") {
    val reg = OpRegistry.default.register("double_v",
      _ => df => df.withColumn("v", col("v") * 2))
    val p = Pipeline("p").addOperation(Operation("d", "double_v"))
    val (out, _) = p.run(data, reg)
    assert(out.agg(sum("v")).head.getDouble(0) == 12.0)
    assert(p.toJson.render.contains("double_v"))
  }

  test("ops: interval_stats + dedup_first work from specs") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 4.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 6.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 23:00:00"), 100.0)
    ).toDF("id", "ts", "v")
    val p = Pipeline("iv").addOperation(Operation("stats", "interval_stats",
      "id_col" -> JStr("id"), "ts_col" -> JStr("ts"),
      "value_cols" -> JArr(Vector(JStr("v"))),
      "funcs" -> JArr(Vector(JStr("mean"))),
      "intervals" -> JArr(Vector(JArr(Vector(JStr("09:00:00"), JStr("17:00:00")))))))
    val (out, _) = p.run(ev)
    assert(out.head.getAs[Double]("mean_v_090000_170000") == 5.0)
  }

  test("ops: zonal_stats + raster_resample work from specs") {
    import graft.geo.Geo
    val dir = java.nio.file.Files.createTempDirectory("graft_zonal").toString
    // zones file: one rectangle (0.5,0.5)-(2.5,2.5)
    spark.range(1).select(lit(7L).as("zid"),
        Geo.stPolygon(expr("array(struct(0.5d as x, 0.5d as y), " +
          "struct(0.5d as x, 2.5d as y), struct(2.5d as x, 2.5d as y), " +
          "struct(2.5d as x, 0.5d as y))")).as("geometry"))
      .write.parquet(s"$dir/zones")
    val cells = spark.range(25).select(lit(1).cast("int").as("band"),
      (col("id") % 5).cast("double").as("x"),
      expr("CAST(id div 5 AS DOUBLE)").as("y"),
      ((col("id") % 5) + expr("id div 5") * 10 + 1).cast("double").as("value"))
    val pz = Pipeline("z").addOperation(Operation("zs", "zonal_stats",
      "zones_file" -> JStr(s"$dir/zones"), "zone_id_col" -> JStr("zid"),
      "funcs" -> JArr(Vector(JStr("count"))), "cell" -> JNum(4.0)))
    val (oz, _) = pz.run(cells)
    assert(oz.head.getAs[Long]("count_value") == 4L)
    val pr = Pipeline("r").addOperation(Operation("rs", "raster_resample",
      "origin_x" -> JNum(0.0), "origin_y" -> JNum(5.0),
      "scale_x" -> JNum(1.0), "scale_y" -> JNum(1.0), "factor" -> JNum(5.0)))
    val cells2 = spark.range(25).select(lit(1).cast("int").as("band"),
      ((col("id") % 5).cast("double") + 0.5).as("x"),
      (lit(5.0) - expr("CAST(id div 5 AS DOUBLE)") - 0.5).as("y"),
      col("id").cast("double").as("value"))
    val (or_, _) = pr.run(cells2)
    assert(or_.count() == 1 && or_.head.getAs[Long]("n_cells") == 25L)
    assert(or_.head.getAs[Double]("value") == 12.0) // mean of 0..24
  }

  test("ops: round-7 registry ops (dbscan, median_of_means, dp_counts) run from specs") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0),
      (4L, 1.0, 1.0), (8L, 9.0, 9.0)).toDF("id", "x", "y")
    val (db, _) = Pipeline("d").addOperation(Operation("c", "dbscan",
      "id_col" -> JStr("id"), "x_col" -> JStr("x"), "y_col" -> JStr("y"),
      "eps" -> JNum(1.5), "min_pts" -> JNum(4.0))).run(pts)
    assert(db.filter(col("role") === "core").count() == 4)
    val vals = (0L until 9L).map(i => (i, 10L)).toDF("id", "v")
    val (mm, _) = Pipeline("m").addOperation(Operation("m", "median_of_means",
      "value_col" -> JStr("v"), "bucket_key_col" -> JStr("id"),
      "k" -> JNum(3.0))).run(vals)
    assert(mm.head.getAs[Long]("mom_micro") == 10000000L)
    val (dp, _) = Pipeline("p").addOperation(Operation("p", "dp_counts",
      "key_col" -> JStr("id"), "k" -> JNum(2.0))).run(vals)
    assert(dp.count() == 9 && dp.columns.contains("noisy_n"))
  }

  test("ops: round-8 registry ops run from serialized JSON specs") {
    // randomized_response
    val units = (0L until 100L).map(i => (i, i % 4 == 0, "g")).toDF("id", "y", "g")
    val (rr, _) = Pipeline("r").addOperation(Operation("r",
      "randomized_response", "keys" -> JArr(Vector(JStr("g"))),
      "id_col" -> JStr("id"), "truth_cond" -> JStr("y"),
      "k" -> JNum(3.0))).run(units)
    assert(rr.head.getAs[Long]("pi_true_ppm") == 250000L)
    // ar2_yule_walker
    val series = (0 until 12).map(t => ("k", t.toLong, (t % 4 + 1).toLong))
      .toDF("g", "t", "v")
    val (ar, _) = Pipeline("a").addOperation(Operation("a",
      "ar2_yule_walker", "keys" -> JArr(Vector(JStr("g"))),
      "order_col" -> JStr("t"), "value_col" -> JStr("v"))).run(series)
    assert(ar.count() == 1 && ar.columns.contains("phi2"))
    // naive_bayes_classify
    val docs = Seq((1L, "aa aa", "p"), (2L, "bb bb", "n")).toDF("id", "text", "l")
    val (nb, _) = Pipeline("n").addOperation(Operation("n",
      "naive_bayes_classify", "id_col" -> JStr("id"),
      "text_col" -> JStr("text"), "label_col" -> JStr("l"))).run(docs)
    assert(nb.collect().forall(r =>
      r.getAs[String]("label_pred") == r.getAs[String]("label_true")))
    // sequential_patterns
    val ev = Seq((1L, 0L, "a"), (1L, 1L, "b"), (2L, 0L, "a"), (2L, 1L, "b"))
      .toDF("sid", "t", "e")
    val (sp, _) = Pipeline("s").addOperation(Operation("s",
      "sequential_patterns", "seq_keys" -> JArr(Vector(JStr("sid"))),
      "type_col" -> JStr("e"), "order_cols" -> JArr(Vector(JStr("t"))),
      "min_support_ppm" -> JNum(1000000.0))).run(ev)
    assert(sp.filter(col("len") === 2).count() == 1) // <a,b> in both
  }

  test("ops: corpus-curation ops compose from a JSON round-tripped spec") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "a"),
      (2L, "the cat sat on the mat", "a"),   // exact dup of 1
      (3L, "der hund und die katze sind da und da", "b"),
      (4L, "el perro y el gato por la casa con una manta", "b")
    ).toDF("doc_id", "text", "source")
    val p = Pipeline("curate")
      .addOperation(Operation("dedup", "exact_dedup",
        "text_col" -> JStr("text"), "id_col" -> JStr("doc_id")))
      .addOperation(Operation("keep", "filter", "condition" -> JStr("is_canonical")))
      .addOperation(Operation("lang", "lang_id", "text_col" -> JStr("text")))
      .addOperation(Operation("split", "hash_split", "text_col" -> JStr("text")))
      .addOperation(Operation("cap", "cap_per_key",
        "key" -> JStr("source"), "order" -> JArr(Vector(JStr("doc_id desc"))),
        "cap" -> JNum(1)))
    // the spec survives serialization (every op addressable by name)
    val rt = Pipeline.fromJson(p.toJson.render)
    val (out, _) = rt.run(docs)
    val rows = out.collect()
    // dedup kills 2; "doc_id desc" keeps the HIGHEST id per source
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(byId(1L) == "en" && byId(4L) == "es")
    assert(rows.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
  }
}

class SourcesSinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft_io").toString

  test("S2: openData reads CSV, falls back to JSON, errors with cascade detail") {
    val dir = tmpDir()
    val csv = s"$dir/a.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv), "a,b\n1,x\n2,y\n")
    val df = graft.io.Sources.openData(spark, csv)
    assert(df.columns.toSeq == Seq("a", "b") && df.count() == 2)

    val jsonf = s"$dir/a.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(jsonf),
      """{"a": 1, "nested": {"m": 5}}""" + "\n" + """{"a": 2, "nested": {"m": 6}}""")
    val dj = graft.io.Sources.openData(spark, jsonf)
    // dotted-path access = json_normalize analog (F11)
    assert(dj.select(col("nested.m")).as[Long].collect().sorted.toSeq == Seq(5L, 6L))

    val e = intercept[graft.core.DataIOError] {
      graft.io.Sources.openData(spark, s"$dir/missing.bin")
    }
    assert(e.getMessage.contains("csv") && e.getMessage.contains("json"))
  }

  test("S2: openData reads a generated xlsx (sheet 1, shared strings, type inference)") {
    // hand-built minimal xlsx: a zip with sheet1 + sharedStrings —
    // independent of the reader under test (no POI on either side)
    val dir = tmpDir()
    val path = s"$dir/book.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>id</t></si><si><t>name</t></si>""" +
      """<si><t>score</t></si><si><t>alice</t></si><si><t>bob</t></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""" +
      """<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>1.5</v></c></row>""" +
      """<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="s"><v>4</v></c><c r="C3"><v>2.5</v></c></row>""" +
      """<row r="4"><c r="A4"><v>3</v></c><c r="C4"><v>9</v></c></row>""" + // B4 missing
      """</sheetData></worksheet>""")
    zos.close()

    val df = graft.io.Sources.openData(spark, path)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("name").dataType == org.apache.spark.sql.types.StringType)
    assert(df.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alice" &&
      rows(0).getDouble(2) == 1.5)
    assert(rows(2).isNullAt(1) && rows(2).getDouble(2) == 9.0) // sparse cell → null
  }

  test("S3: openSensorRecords scrubs unnamed index columns (P11)") {
    val dir = tmpDir()
    val csv = s"$dir/rec.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      "Unnamed: 0,ts,m\n0,2024-01-01,1.5\n1,2024-01-02,2.5\n")
    val df = graft.io.Sources.openSensorRecords(spark, csv)
    assert(df.columns.toSeq == Seq("ts", "m"))
  }

  test("S4: openDirOfData unions by name with per-file id stamping (intended semantics)") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/s1.json"),
      """{"m": 1.0, "extra": "only_in_1"}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/s2.json"),
      """{"m": 2.0}""" + "\n" + """{"m": 3.0}""")
    val df = graft.io.Sources.openDirOfData(spark, dir, Some(Seq(10L, 20L)))
    assert(df.count() == 3)
    // file 2's rows stamped 20 (reference bug would stamp len(df1) everywhere)
    assert(df.filter(col("id_sensor") === 20L).count() == 2)
    // missing column null-filled by unionByName
    assert(df.filter(col("extra").isNull).count() == 2)
  }

  test("S6: writeSafe swallows sink failures and reports them") {
    val df = Seq((1, "a")).toDF("id", "s")
    val err = graft.io.Sinks.writeSafe(df, "/proc/definitely/not/writable", "parquet")
    assert(err.isDefined) // failure captured, no throw
    val dir = tmpDir()
    assert(graft.io.Sinks.writeSafe(df, s"$dir/ok", "json", singleFile = true).isEmpty)
    // shapefile sink needs a geometry column — failure swallowed, reported
    assert(graft.io.Sinks.writeSafe(df, s"$dir/x", "shapefile").get.contains("geometry"))
  }

  test("S6: KML sink writes a parseable document; WKT csv renders geometry") {
    import graft.geo.Geo
    val dir = tmpDir()
    val df = Seq((1L, 1.5, 2.5, "alpha & beta"), (2L, -3.0, 4.0, "<tag>"))
      .toDF("id", "x", "y", "label")
      .select(col("id"), Geo.stPoint(col("x"), col("y")).as("geometry"),
        col("label"))
    graft.io.Sinks.write(df, s"$dir/out.kml", "kml")
    val xml = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/out.kml"))
    // well-formed per the JDK parser, 2 placemarks, escaped attributes
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(doc.getElementsByTagName("Placemark").getLength == 2)
    assert(doc.getElementsByTagName("Point").getLength == 2)
    assert(xml.contains("1.5,2.5") && xml.contains("alpha &amp; beta"))
    // polygon rows close the ring explicitly (first vertex repeated)
    val poly = Seq(Tuple1(1L)).toDF("id").select(col("id"),
      Geo.stPolygon(array(
        struct(lit(0.0).as("x"), lit(0.0).as("y")),
        struct(lit(4.0).as("x"), lit(0.0).as("y")),
        struct(lit(4.0).as("x"), lit(3.0).as("y")))).as("geometry"))
    graft.io.Sinks.write(poly, s"$dir/poly.kml", "kml")
    val pxml = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/poly.kml"))
    assert(pxml.contains("0.0,0.0 4.0,0.0 4.0,3.0 0.0,0.0"))
    // wkt sink: geometry renders as a WKT string column in plain csv
    graft.io.Sinks.write(df, s"$dir/wkt", "wkt", singleFile = true)
    val back = spark.read.option("header", "true").csv(s"$dir/wkt")
      .orderBy("id").collect()
    assert(back(0).getAs[String]("geometry") == "POINT (1.5 2.5)")
  }

  test("S2/S6: ORC and parquet round-trip through sink + reader cascade") {
    val dir = tmpDir()
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0)).toDF("id", "s", "v")
    graft.io.Sinks.write(df, s"$dir/t.orc", "orc")
    val orc = graft.io.Sources.openData(spark, s"$dir/t.orc")
    assert(orc.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    graft.io.Sinks.write(df, s"$dir/t.parquet", "parquet")
    val pq = graft.io.Sources.openData(spark, s"$dir/t.parquet")
    assert(pq.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("S6: DBF guards — name-truncation collisions and record overflow fail loudly") {
    import graft.geo.Geo
    import graft.core.DataIOError
    val dir = tmpDir()
    // two attribute names identical in their first 10 ASCII bytes
    val collide = Seq((1.5, 2.0, "a", "b"))
      .toDF("x", "y", "measurement_alpha", "measurement_beta")
      .select(Geo.stPoint(col("x"), col("y")).as("geometry"),
        col("measurement_alpha"), col("measurement_beta"))
    val e1 = intercept[DataIOError] {
      graft.io.Shapefile.writePoints(collide, s"$dir/collide")
    }
    assert(e1.getMessage.contains("truncation"))
    // 260 max-width (254-byte) text columns overflow the 16-bit record length
    val wide = ("x" * 254, "pad")
    val base = Seq((0.0, 0.0, wide._1)).toDF("x", "y", "c0")
    val fat = (1 until 260).foldLeft(
      base.select(Geo.stPoint(col("x"), col("y")).as("geometry"), col("c0"))) {
      (d, i) => d.withColumn(s"c$i", col("c0"))
    }
    val e2 = intercept[DataIOError] {
      graft.io.Shapefile.writePoints(fat, s"$dir/fat")
    }
    assert(e2.getMessage.contains("record length"))
  }

  test("S6: shapefile sink writes a parseable .shp/.shx/.dbf point layer") {
    import graft.geo.Geo
    val dir = tmpDir()
    val df = Seq((1L, "alpha", 1.5, 2.0, 3.0), (2L, "bravo", -2.25, -4.0, 8.5))
      .toDF("id", "name", "v", "x", "y")
      .select(col("id"), col("name"), col("v"),
        Geo.stPoint(col("x"), col("y")).as("geometry"))
    graft.io.Sinks.write(df, s"$dir/pts", "ESRI Shapefile")

    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/pts.shp"))
    val bb = java.nio.ByteBuffer.wrap(shp)
    assert(bb.getInt(0) == 9994)                      // file code (BE)
    assert(bb.getInt(24) * 2 == shp.length)           // length in words
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(28) == 1000 && bb.getInt(32) == 1) // version, Point type
    assert(bb.getDouble(36) == -4.0 && bb.getDouble(44) == 3.0) // bbox xmin,ymin
    // record 1: 8-byte header then LE (type=1, x, y)
    assert(bb.getInt(100 + 8) == 1)
    assert(bb.getDouble(100 + 12) == 2.0 && bb.getDouble(100 + 20) == 3.0)

    val shx = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/pts.shx"))
    assert((shx.length - 100) / 8 == 2)               // 2 index records

    val dbf = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/pts.dbf"))
    val db = java.nio.ByteBuffer.wrap(dbf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(db.get(0) == 0x03.toByte && db.getInt(4) == 2) // dBase III, 2 records
    val headLen = db.getShort(8); val recLen = db.getShort(10)
    assert(headLen == 32 + 32 * 3 + 1)                // 3 attribute fields
    val rec1 = new String(dbf, headLen, recLen, "US-ASCII")
    assert(rec1.contains("1") && rec1.contains("alpha") && rec1.contains("1.500000"))
  }

  test("S6: shapefile sink writes a closed, clockwise polygon layer") {
    import graft.geo.Geo
    val dir = tmpDir()
    // input ring is COUNTER-clockwise (unit square CCW) and open — the
    // writer must close it and flip it to the spec's clockwise winding
    val df = Seq((7L, Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))))
      .toDF("id", "ring")
      .select(col("id"), Geo.stPolygon(
        expr("transform(ring, p -> struct(p._1 as x, p._2 as y))")).as("geometry"))
    assert(graft.io.Shapefile.write(df, s"$dir/poly") == 1) // kind-dispatch → polygon

    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/poly.shp"))
    val bb = java.nio.ByteBuffer.wrap(shp)
    assert(bb.getInt(0) == 9994 && bb.getInt(24) * 2 == shp.length)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(32) == 5)                          // Polygon type
    assert(bb.getDouble(36) == 0.0 && bb.getDouble(52) == 2.0) // file bbox
    // record content: type, box(4), numParts=1, numPoints=5, parts[0]=0
    val c = 100 + 8
    assert(bb.getInt(c) == 5)
    assert(bb.getInt(c + 36) == 1 && bb.getInt(c + 40) == 5 && bb.getInt(c + 44) == 0)
    val pts = (0 until 5).map(i =>
      (bb.getDouble(c + 48 + i * 16), bb.getDouble(c + 48 + i * 16 + 8)))
    assert(pts.head == pts.last, "ring must be explicitly closed")
    // clockwise: shoelace sum over the closed ring must be negative
    val shoelace = pts.zip(pts.tail).map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum
    assert(shoelace < 0, s"outer ring must be clockwise, shoelace=$shoelace")

    val shx = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/poly.shx"))
    assert((shx.length - 100) / 8 == 1)
    val sb = java.nio.ByteBuffer.wrap(shx) // BE index record
    assert(sb.getInt(100) == 50 && sb.getInt(104) * 2 == shp.length - 108)
  }

  test("S6: shapefile writes multi-part polygons — outer CW, holes CCW") {
    import graft.geo.Geo
    val dir = tmpDir()
    // record 1: 4x4 square (given CCW) with a CW-given unit hole — the
    // writer must flip BOTH; record 2: plain triangle, no holes
    val df = Seq(
      (1L,
        Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
        Seq(Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0)))),
      (2L,
        Seq((6.0, 0.0), (7.0, 0.0), (7.0, 1.0)),
        Seq.empty[Seq[(Double, Double)]]))
      .toDF("id", "ring", "holes_raw")
      .select(col("id"),
        Geo.stPolygon(expr("transform(ring, p -> struct(p._1 as x, p._2 as y))"))
          .as("geometry"),
        expr("transform(holes_raw, h -> transform(h, p -> struct(p._1 as x, p._2 as y)))")
          .as("holes"))
    assert(graft.io.Shapefile.writePolygonsWithHoles(df, s"$dir/holes", Some("holes")) == 2)

    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/holes.shp"))
    val bb = java.nio.ByteBuffer.wrap(shp)
    assert(bb.getInt(0) == 9994 && bb.getInt(24) * 2 == shp.length)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(32) == 5)
    // record 1: numParts=2, numPoints=10 (5+5 closed), parts=[0,5]
    val c = 100 + 8
    assert(bb.getInt(c) == 5)
    assert(bb.getInt(c + 36) == 2 && bb.getInt(c + 40) == 10)
    assert(bb.getInt(c + 44) == 0 && bb.getInt(c + 48) == 5)
    def ring(at: Int, k: Int) = (0 until k).map(i =>
      (bb.getDouble(at + i * 16), bb.getDouble(at + i * 16 + 8)))
    def shoelace(p: Seq[(Double, Double)]) =
      p.zip(p.tail).map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum
    val outer = ring(c + 52, 5); val hole = ring(c + 52 + 5 * 16, 5)
    assert(outer.head == outer.last && hole.head == hole.last)
    assert(shoelace(outer) < 0, s"outer must be CW: $outer")
    assert(shoelace(hole) > 0, s"hole must be CCW: $hole")
    assert(hole.forall { case (x, y) => x >= 1 && x <= 2 && y >= 1 && y <= 2 })
    // record 2 follows immediately: single part, closed triangle
    val c2 = c + (4 + 32 + 4 + 4 + 4 * 2 + 16 * 10) + 8 // rec-1 content + rec-2 header
    assert(bb.getInt(c2 + 36) == 1 && bb.getInt(c2 + 40) == 4)
  }

  test("S6: shapefile writes a polyline layer — open path, order kept") {
    import graft.geo.Geo
    val dir = tmpDir()
    // two open paths — kind-dispatch must pick PolyLine (type 3), keep
    // vertex order verbatim, and NOT close or rewind anything
    val df = Seq(
      (1L, Seq((0.0, 0.0), (2.0, 1.0), (4.0, 0.0))),
      (2L, Seq((5.0, 5.0), (6.0, 7.0))))
      .toDF("id", "path")
      .select(col("id"), Geo.stLineString(
        expr("transform(path, p -> struct(p._1 as x, p._2 as y))")).as("geometry"))
    assert(graft.io.Shapefile.write(df, s"$dir/line") == 2)

    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/line.shp"))
    val bb = java.nio.ByteBuffer.wrap(shp)
    assert(bb.getInt(0) == 9994 && bb.getInt(24) * 2 == shp.length)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(32) == 3)                           // PolyLine type
    assert(bb.getDouble(36) == 0.0 && bb.getDouble(44) == 0.0)
    assert(bb.getDouble(52) == 6.0 && bb.getDouble(60) == 7.0) // file bbox
    // record 1: type, box(4), numParts=1, numPoints=3, parts[0]=0
    val c = 100 + 8
    assert(bb.getInt(c) == 3)
    assert(bb.getInt(c + 36) == 1 && bb.getInt(c + 40) == 3 && bb.getInt(c + 44) == 0)
    val pts = (0 until 3).map(i =>
      (bb.getDouble(c + 48 + i * 16), bb.getDouble(c + 48 + i * 16 + 8)))
    assert(pts == Seq((0.0, 0.0), (2.0, 1.0), (4.0, 0.0)),
      s"vertex order must be preserved and the path left OPEN, got $pts")
    // record 2 follows: 2-point segment
    val c2 = c + (4 + 32 + 4 + 4 + 4 + 16 * 3) + 8
    assert(bb.getInt(c2) == 3)
    assert(bb.getInt(c2 + 36) == 1 && bb.getInt(c2 + 40) == 2)

    val shx = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/line.shx"))
    assert((shx.length - 100) / 8 == 2)
    val sb = java.nio.ByteBuffer.wrap(shx) // BE index records
    assert(sb.getInt(100) == 50)           // record 1 at byte 100
    assert(sb.getInt(104) * 2 == 4 + 32 + 4 + 4 + 4 + 16 * 3)
    // dbf carries the id attribute for both records
    val dbf = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/line.dbf"))
    val db = java.nio.ByteBuffer.wrap(dbf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(db.getInt(4) == 2)

    // a 1-vertex "path" is a typed error, not a corrupt record
    val bad = Seq((9L, Seq((1.0, 1.0)))).toDF("id", "path")
      .select(col("id"), Geo.stLineString(
        expr("transform(path, p -> struct(p._1 as x, p._2 as y))")).as("geometry"))
    val e = intercept[graft.core.DataIOError] {
      graft.io.Shapefile.write(bad, s"$dir/badline")
    }
    assert(e.getMessage.contains(">= 2"))
  }

  test("S6: shapefile rejects mixed-kind frames with a typed error") {
    import graft.geo.Geo
    import graft.core.DataIOError
    val dir = tmpDir()
    val mixed = Seq((0.0, 0.0)).toDF("x", "y")
      .select(Geo.stPoint(col("x"), col("y")).as("geometry"))
      .unionByName(Seq(1).toDF("i").select(Geo.stPolygon(
        expr("array(struct(0.0d as x, 0.0d as y), struct(1.0d as x, 0.0d as y), " +
          "struct(1.0d as x, 1.0d as y))")).as("geometry")))
    val e = intercept[DataIOError] { graft.io.Shapefile.write(mixed, s"$dir/mixed") }
    assert(e.getMessage.contains("single-type"))
    // a NULL geometry (outer-join artifact) gets the typed error, not an NPE
    val withNull = Seq((0.0, 0.0)).toDF("x", "y")
      .select(when(col("x") > 1, Geo.stPoint(col("x"), col("y"))).as("geometry"))
    val e2 = intercept[DataIOError] { graft.io.Shapefile.write(withNull, s"$dir/nullg") }
    assert(e2.getMessage.contains("NULL"))
  }

  test("S1: shapefile read — write→read round-trips points, lines, polygons") {
    import graft.geo.Geo
    val dir = tmpDir()
    // points + mixed attribute types (long / double / string / boolean)
    val pts = Seq((1L, "alpha", 1.5, true, 3.0, 4.0),
      (2L, "bravo", -2.25, false, -7.5, 0.125))
      .toDF("id", "name", "v", "flag", "x", "y")
      .select(col("id"), col("name"), col("v"), col("flag"),
        Geo.stPoint(col("x"), col("y")).as("geometry"))
    graft.io.Shapefile.writePoints(pts, s"$dir/rt_pts")
    val backP = graft.io.Shapefile.read(spark, s"$dir/rt_pts")
      .orderBy("id").collect()
    assert(backP.length == 2)
    val g0 = backP(0).getStruct(0)
    assert(g0.getString(0) == "point")
    assert(g0.getSeq[org.apache.spark.sql.Row](1).head == org.apache.spark.sql.Row(3.0, 4.0))
    assert(backP(0).getAs[Long]("id") == 1L &&
      backP(0).getAs[String]("name") == "alpha" &&
      backP(0).getAs[Double]("v") == 1.5 &&
      backP(0).getAs[Boolean]("flag"))
    assert(backP(1).getStruct(0).getSeq[org.apache.spark.sql.Row](1).head ==
      org.apache.spark.sql.Row(-7.5, 0.125))

    // polylines: vertex order verbatim
    val line = Seq((1L, Seq((0.0, 0.0), (2.0, 1.0), (4.0, 0.0))))
      .toDF("id", "path")
      .select(col("id"), Geo.stLineString(
        expr("transform(path, p -> struct(p._1 as x, p._2 as y))")).as("geometry"))
    graft.io.Shapefile.write(line, s"$dir/rt_line")
    val backL = graft.io.Shapefile.read(spark, s"$dir/rt_line").collect()(0)
    assert(backL.getStruct(0).getString(0) == "linestring")
    assert(backL.getStruct(0).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getDouble(0), r.getDouble(1))) == Seq((0.0, 0.0), (2.0, 1.0), (4.0, 0.0)))

    // polygons: a CW input ring round-trips verbatim (writer keeps CW,
    // reader strips the explicit closure)
    val poly = Seq((1L, Seq((0.0, 0.0), (0.0, 3.0), (4.0, 3.0), (4.0, 0.0))))
      .toDF("id", "ring")
      .select(col("id"), Geo.stPolygon(
        expr("transform(ring, p -> struct(p._1 as x, p._2 as y))")).as("geometry"))
    graft.io.Shapefile.write(poly, s"$dir/rt_poly")
    val backG = graft.io.Shapefile.read(spark, s"$dir/rt_poly").collect()(0)
    assert(backG.getStruct(0).getString(0) == "polygon")
    assert(backG.getStruct(0).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getDouble(0), r.getDouble(1))) ==
      Seq((0.0, 0.0), (0.0, 3.0), (4.0, 3.0), (4.0, 0.0)))
    // a multi-part (holed) polygon reads back its OUTER ring only
    val holed = Seq((1L,
      Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)),
      Seq(Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)))))
      .toDF("id", "ring", "holes")
      .select(col("id"), Geo.stPolygon(
        expr("transform(ring, p -> struct(p._1 as x, p._2 as y))")).as("geometry"),
        expr("transform(holes, h -> transform(h, p -> struct(p._1 as x, p._2 as y)))")
          .as("holes"))
    graft.io.Shapefile.writePolygonsWithHoles(holed, s"$dir/rt_holed", Some("holes"))
    val backH = graft.io.Shapefile.read(spark, s"$dir/rt_holed").collect()(0)
    assert(backH.getStruct(0).getSeq[org.apache.spark.sql.Row](1).length == 4)

    // missing file and non-shapefile bytes are typed errors
    val e1 = intercept[graft.core.DataIOError] {
      graft.io.Shapefile.read(spark, s"$dir/nope") }
    assert(e1.getMessage.contains("no such file"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/junk.shp"),
      Array.fill[Byte](200)(7))
    val e2 = intercept[graft.core.DataIOError] {
      graft.io.Shapefile.read(spark, s"$dir/junk") }
    assert(e2.getMessage.contains("9994"))
  }

  test("S1: openData routes .shp through the shapefile reader") {
    import graft.geo.Geo
    val dir = tmpDir()
    val pts = Seq((1L, 3.0, 4.0)).toDF("id", "x", "y")
      .select(col("id"), Geo.stPoint(col("x"), col("y")).as("geometry"))
    graft.io.Shapefile.writePoints(pts, s"$dir/route")
    val back = graft.io.Sources.openData(spark, s"$dir/route.shp")
    assert(back.columns.toSeq == Seq("geometry", "id"))
    assert(back.count() == 1)
  }

  test("S1: silent-data-loss shapes fail loudly (advisor r7)") {
    import java.nio.{ByteBuffer, ByteOrder}
    val dir = tmpDir()
    // hand-build a .shp: 100-byte header + ONE record
    def shpFile(name: String, shapeType: Int,
        content: ByteBuffer): String = {
      val c = content.array()
      val buf = ByteBuffer.allocate(100 + 8 + c.length)
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(0, 9994)
      buf.putInt(24, (100 + 8 + c.length) / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(28, 1000).putInt(32, shapeType)
      buf.position(100)
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(1).putInt(c.length / 2) // record 1 header
      buf.put(c)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/$name.shp"), buf.array())
      s"$dir/$name"
    }
    def multiPart(shapeType: Int,
        parts: Seq[Seq[(Double, Double)]]): ByteBuffer = {
      val nPts = parts.map(_.length).sum
      val c = ByteBuffer.allocate(4 + 32 + 8 + 4 * parts.length + 16 * nPts)
        .order(ByteOrder.LITTLE_ENDIAN)
      c.putInt(shapeType)
      c.putDouble(0).putDouble(0).putDouble(99).putDouble(99) // box
      c.putInt(parts.length).putInt(nPts)
      parts.scanLeft(0)(_ + _.length).init.foreach(c.putInt)
      parts.flatten.foreach { case (x, y) => c.putDouble(x).putDouble(y) }
      c
    }
    // multi-part PolyLine: whole parts would vanish — typed error
    val pl = shpFile("mpl", 3, multiPart(3,
      Seq(Seq((0.0, 0.0), (1.0, 1.0)), Seq((5.0, 5.0), (6.0, 6.0)))))
    val e1 = intercept[graft.core.DataIOError] {
      graft.io.Shapefile.read(spark, pl) }
    assert(e1.getMessage.contains("multi-part PolyLine"))

    // multipolygon: a SECOND CLOCKWISE (outer) ring — typed error
    val cw1 = Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
    val cw2 = cw1.map { case (x, y) => (x + 10, y) }
    val mp = shpFile("mpoly", 5, multiPart(5, Seq(cw1, cw2)))
    val e2 = intercept[graft.core.DataIOError] {
      graft.io.Shapefile.read(spark, mp) }
    assert(e2.getMessage.contains("outer ring"))

    // outer CW + interior CCW ring (a hole) stays the documented drop
    val hole = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    val ok = shpFile("holed", 5, multiPart(5, Seq(cw1, hole)))
    val g = graft.io.Shapefile.read(spark, ok).collect()(0).getStruct(0)
    assert(g.getString(0) == "polygon")
    assert(g.getSeq[org.apache.spark.sql.Row](1).length == 4) // outer, unclosed

    // DBF soft-delete flag: patch a written sidecar — typed error
    import graft.geo.Geo
    val pts = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0)).toDF("id", "x", "y")
      .select(col("id"), Geo.stPoint(col("x"), col("y")).as("geometry"))
    graft.io.Shapefile.writePoints(pts, s"$dir/del")
    val dbf = java.nio.file.Paths.get(s"$dir/del.dbf")
    val b = java.nio.file.Files.readAllBytes(dbf)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val headLen = bb.getShort(8) & 0xFFFF
    val recLen = bb.getShort(10) & 0xFFFF
    b(headLen + recLen) = 0x2A // mark record 1 deleted
    java.nio.file.Files.write(dbf, b)
    val e3 = intercept[graft.core.DataIOError] {
      graft.io.Shapefile.read(spark, s"$dir/del") }
    assert(e3.getMessage.contains("soft-delete"))
  }

  test("S1: mixed-case .Shp/.DBF sidecars resolve (advisor r7)") {
    import graft.geo.Geo
    val dir = tmpDir()
    val pts = Seq((7L, 3.0, 4.0)).toDF("id", "x", "y")
      .select(col("id"), Geo.stPoint(col("x"), col("y")).as("geometry"))
    graft.io.Shapefile.writePoints(pts, s"$dir/mx")
    def mv(from: String, to: String): Unit =
      java.nio.file.Files.move(java.nio.file.Paths.get(s"$dir/$from"),
        java.nio.file.Paths.get(s"$dir/$to"))
    mv("mx.shp", "mx.Shp"); mv("mx.dbf", "mx.DBF")
    val back = graft.io.Sources.openData(spark, s"$dir/mx.Shp")
    assert(back.columns.toSeq == Seq("geometry", "id"))
    assert(back.select("id").head().getLong(0) == 7L)
  }

  test("S1: GeoTIFF write→read round-trips the cell table exactly") {
    val dir = tmpDir()
    // 4x3 float raster, origin (100, 50) top-left corner, 2x2 pixels
    val vals = Array.tabulate(12)(i => (i * 3 + 1).toFloat / 4f)
    graft.io.GeoTiff.writeFloat(s"$dir/r.tif", 4, 3, vals,
      origin = (100.0, 50.0), scale = (2.0, 2.0))
    val cells = graft.io.GeoTiff.readCells(spark, s"$dir/r.tif")
      .orderBy("y", "x").collect()
    assert(cells.length == 12)
    assert(cells.forall(_.getInt(0) == 1))
    // first cell: center of pixel (0,0) = (101, 49), value 0.25
    val byXY = cells.map(r => ((r.getDouble(1), r.getDouble(2)), r.getDouble(3))).toMap
    assert(byXY((101.0, 49.0)) == 0.25)
    assert(byXY((103.0, 49.0)) == 1.0)       // pixel (1,0): (1*3+1)/4
    assert(byXY((101.0, 47.0)) == 3.25)      // pixel (0,1): (4*3+1)/4
    assert(byXY((107.0, 45.0)) == 8.5)       // pixel (3,2): (11*3+1)/4
    // extension routing through the cascade
    val routed = graft.io.Sources.openData(spark, s"$dir/r.tif")
    assert(routed.columns.toSeq == Seq("band", "x", "y", "value"))
    assert(routed.count() == 12)
    // a TRUNCATED BigTIFF header (magic 43, garbage IFD) fails with a
    // typed error naming the format, not an arbitrary buffer crash
    // (round 8: well-formed BigTIFF now decodes — GeoTiffCodecSpec)
    val junk = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put('I'.toByte).put('I'.toByte).putShort(43.toShort).putInt(8)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/big.tif"), junk.array())
    val e = intercept[graft.core.DataIOError] {
      graft.io.GeoTiff.readCells(spark, s"$dir/big.tif") }
    assert(e.getMessage.contains("BigTIFF"))
  }

  test("S2: multi-sheet xlsx workbooks are refused with a clear error") {
    val dir = tmpDir()
    // hand-build a zip with two worksheet entries
    val out = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/two.xlsx"))
    def add(name: String, body: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(body.getBytes("UTF-8")); out.closeEntry()
    }
    val sheetXml = """<?xml version="1.0"?><worksheet><sheetData>
      |<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
      |</sheetData></worksheet>""".stripMargin
    add("xl/worksheets/sheet1.xml", sheetXml)
    add("xl/worksheets/sheet2.xml", sheetXml)
    out.close()
    val e = intercept[graft.core.DataIOError] {
      graft.io.Sources.openXlsx(spark, s"$dir/two.xlsx") }
    assert(e.getMessage.contains("sheet 1 only"))
  }

  test("X1: jackknife registry op runs from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1
    val obs = Seq(("A", 1L), ("A", 3L), ("B", 5L), ("B", 7L)).toDF("g", "v")
    val jk = run("""{"pipe":"p","operations":[{"name":"j","function":
      "jackknife","kwargs":{"group_col":"g","value_expr":"v"}}]}""", obs)
      .collect().head
    assert(jk.getAs[Long]("g") == 2L && jk.getAs[Double]("mean") == 4.0)

    val adf = run("""{"pipe":"p","operations":[{"name":"a","function":
      "adf","kwargs":{"keys":["g"],"order_col":"v","value_col":"v"}}]}""",
      obs)
    assert(adf.columns.toSeq == Seq("g", "n", "gamma", "t_stat", "stationary"))

    // bitmap_distinct reaches pipelines through the named-agg registry
    val bd = run("""{"pipe":"p","operations":[{"name":"b","function":
      "group_agg","kwargs":{"by":["g"],"funcs":["bitmap_distinct"],
      "value_cols":["v"]}}]}""", obs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bd == Map("A" -> 2L, "B" -> 2L))
  }

  test("X1: batch-18 registry ops run from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1
    val obs = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "cat", "y")
    val te = run("""{"pipe":"p","operations":[{"name":"t","function":
      "target_encode_loo","kwargs":{"cat_col":"cat","target_expr":"y"}}]}""",
      obs)
    assert(te.columns.contains("loo_mean") && te.count() == 3)

    val ca = run("""{"pipe":"p","operations":[{"name":"c","function":
      "class_balance_audit","kwargs":{"class_col":"cat","ratio":1}}]}""", obs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ca == Map("a" -> 1L, "b" -> 1L))

    val cc = run("""{"pipe":"p","operations":[{"name":"c","function":
      "co_occurrence","kwargs":{"basket_col":"cat","item_col":"id",
      "top_k":5}}]}""", obs).collect()
    assert(cc.length == 1 && cc.head.getLong(2) == 1L)

    val docs = Seq((1L, "x y z"), (2L, "x y w")).toDF("doc_id", "text")
    val bp = run("""{"pipe":"p","operations":[{"name":"b","function":
      "boilerplate_shingles","kwargs":{"text_col":"text","id_col":"doc_id",
      "shingle_size":2,"min_df_ppm":900000}}]}""", docs).collect()
    assert(bp.map(_.getString(0)).toSet == Set("x y"))

    val vg = run("""{"pipe":"p","operations":[{"name":"v","function":
      "vocab_growth","kwargs":{"text_col":"text","id_col":"doc_id",
      "shingle_size":1,"every":10}}]}""", docs)
    assert(vg.columns.toSeq == Seq("docs_seen", "new_tokens", "vocab"))
  }

  test("X1: batch-19 registry ops run from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1
    val obs = Seq(("A", 1L, 1L, true), ("A", 2L, 8L, true),
      ("A", 3L, 27L, false), ("B", 1L, 2L, true), ("B", 2L, 1L, false))
      .toDF("g", "x", "y", "flag")
    val sp = run("""{"pipe":"p","operations":[{"name":"s","function":
      "spearman","kwargs":{"keys":["g"],"x_expr":"x","y_expr":"y"}}]}""", obs)
    assert(sp.columns.toSeq == Seq("g", "n", "rho"))
    val kd = run("""{"pipe":"p","operations":[{"name":"k","function":
      "kendall","kwargs":{"keys":["g"],"x_expr":"x","y_expr":"y"}}]}""", obs)
    assert(kd.columns.contains("tau_b"))
    val cv = run("""{"pipe":"p","operations":[{"name":"c","function":
      "cramers_v","kwargs":{"row_col":"g","col_col":"x"}}]}""", obs)
    assert(cv.columns.contains("cramers_v"))
    val or = run("""{"pipe":"p","operations":[{"name":"o","function":
      "odds_ratio","kwargs":{"exposure_expr":"flag",
      "outcome_expr":"y > 1"}}]}""", obs).head()
    assert(or.schema.fieldNames.contains("or_ppm"))
    val cf = run("""{"pipe":"p","operations":[{"name":"c","function":
      "conformal","kwargs":{"cat_col":"g","target_expr":"y",
      "calib_expr":"flag","alpha_num":1,"alpha_den":2}}]}""", obs)
    assert(cf.columns.contains("cover_ppm"))
  }

  test("X1: batch-20 registry ops run from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1
    val subj = Seq(("A", 1L, 1), ("B", 2L, 1)).toDF("g", "dur", "ev")
    val lr = run("""{"pipe":"p","operations":[{"name":"l","function":
      "log_rank","kwargs":{"duration_col":"dur","event_col":"ev",
      "group_col":"g","group_a":"A"}}]}""", subj).head()
    assert(lr.getAs[Double]("chi2") == 1.0)

    val ex = run("""{"pipe":"p","operations":[{"name":"e","function":
      "expect","kwargs":{"rules":[["pos","dur > 0"],["ev_set","ev = 1"]]}}]}""",
      subj).collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(ex == Map("pos" -> 1, "ev_set" -> 1))

    val corr = Seq((0, 0, 1.0), (0, 1, 0.5), (1, 1, 1.0)).toDF("i", "j", "corr")
    val pi = run("""{"pipe":"p","operations":[{"name":"p","function":
      "power_iteration","kwargs":{"dims":2,"rounds":3}}]}""", corr)
    assert(pi.columns.toSeq == Seq("j", "v_u", "lambda_u") && pi.count() == 2)
  }

  test("X1: batch-21 registry ops run from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1
    val obs = Seq(("A", 1L, 0), ("A", 2L, 0), ("B", 3L, 1), ("B", 4L, 1))
      .toDF("g", "x", "y")
    val gs = run("""{"pipe":"p","operations":[{"name":"g","function":
      "gini_split","kwargs":{"feature_expr":"x","label_expr":"y"}}]}""", obs)
      .head()
    assert(gs.getAs[Long]("split_value") == 2L)
    val sr = run("""{"pipe":"p","operations":[{"name":"s","function":
      "srm_check","kwargs":{"bucket_expr":"x % 2","k":2}}]}""", obs).head()
    assert(sr.getAs[Long]("k") == 2L && sr.getAs[Long]("n") == 4L)
    val cd = run("""{"pipe":"p","operations":[{"name":"c","function":
      "cohens_d","kwargs":{"value_col":"x","group_col":"g",
      "group_a":"A","group_b":"B"}}]}""", obs).head()
    assert(cd.getAs[Double]("cohens_d") < 0.0)
  }

  test("X1: batch-22-24 registry ops run from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1

    val jw = run("""{"pipe":"p","operations":[{"name":"j","function":
      "jaro_winkler","kwargs":{"a_col":"a","b_col":"b"}}]}""",
      Seq(("martha", "marhta")).toDF("a", "b")).head()
    assert(jw.getAs[Double]("jw") == 0.9611111111111111)

    val docs = Seq(("a", "x y"), ("b", "x z")).toDF("lang", "text")
    val jsd = run("""{"pipe":"p","operations":[{"name":"d","function":
      "js_divergence","kwargs":{"text_col":"text","slice_col":"lang",
      "slice_a":"a","slice_b":"b"}}]}""", docs).head()
    assert(jsd.getAs[Long]("vocab_union") == 3L)

    val mi = run("""{"pipe":"p","operations":[{"name":"m","function":
      "mutual_information","kwargs":{"x_expr":"x","y_expr":"y",
      "label":"f"}}]}""",
      Seq((0L, 0L), (1L, 1L)).toDF("x", "y")).head()
    assert(mi.getAs[String]("feature") == "f" && mi.getAs[Long]("n") == 2L)

    val cup = run("""{"pipe":"p","operations":[{"name":"c","function":
      "cuped","kwargs":{"x_col":"x","y_col":"y","arm_col":"arm"}}]}""",
      Seq((100L, 200L, 0L), (200L, 400L, 0L), (100L, 210L, 1L),
        (200L, 390L, 1L)).toDF("x", "y", "arm"))
    assert(cup.count() == 2)

    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val lp = run("""{"pipe":"p","operations":[{"name":"l","function":
      "label_propagation","kwargs":{"src_col":"src","dst_col":"dst",
      "iters":3}}]}""", edges)
    assert(lp.count() == 6)

    val hits = run("""{"pipe":"p","operations":[{"name":"h","function":
      "hits","kwargs":{"src_col":"src","dst_col":"dst","iters":1}}]}""",
      Seq((1L, 10L), (2L, 10L)).toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hits(10L) == 1000000L)

    val labDir = java.nio.file.Files.createTempDirectory("graft_mod").toString
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 2L))
      .toDF("node", "community").write.mode("overwrite")
      .parquet(s"$labDir/labels")
    val mod = run(s"""{"pipe":"p","operations":[{"name":"q","function":
      "modularity","kwargs":{"src_col":"src","dst_col":"dst",
      "labels_file":"$labDir/labels","node_col":"node",
      "community_col":"community"}}]}""", edges).head()
    assert(mod.getAs[Long]("q_num") == 70L && mod.getAs[Long]("q_den") == 196L)

    val orders = Seq((200L, 1, 0), (500L, 1, 1), (100L, 0, 0), (300L, 0, 1))
      .toDF("y", "t", "p")
    val did = run("""{"pipe":"p","operations":[{"name":"d","function":
      "diff_in_diff","kwargs":{"y_expr":"y","treated_expr":"t = 1",
      "post_expr":"p = 1"}}]}""", orders).head()
    assert(did.getAs[Double]("did") == 1.0)

    val mde = run("""{"pipe":"p","operations":[{"name":"m","function":
      "mde","kwargs":{"stratum_col":"s","success_expr":"y = 1"}}]}""",
      Seq(("A", 1), ("A", 0), ("A", 0), ("A", 0)).toDF("s", "y")).head()
    assert(mde.getAs[Double]("p") == 0.25)

    val bt = run("""{"pipe":"p","operations":[{"name":"b","function":
      "bradley_terry","kwargs":{"winner_col":"w","loser_col":"l"}}]}""",
      Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)).toDF("w", "l"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("strength_u")).toMap
    assert(bt(1L) == 1500000L && bt(2L) == 500000L)

    val cal = run("""{"pipe":"p","operations":[{"name":"c","function":
      "calibration","kwargs":{"conf_ppm_expr":"conf","label_expr":"y",
      "bins":10}}]}""",
      Seq((100000L, 0), (100000L, 1)).toDF("conf", "y")).head()
    assert(cal.getAs[Long]("bin") == 1L && cal.getAs[Long]("rate_ppm") == 500000L)

    val ips = run("""{"pipe":"p","operations":[{"name":"i","function":
      "ips_value","kwargs":{"logged_col":"a","target_col":"pi",
      "reward_col":"r","propensity_ppm_expr":"p"}}]}""",
      Seq((1L, 1L, 1L, 500000L)).toDF("a", "pi", "r", "p")).head()
    assert(ips.getAs[Long]("value_ppm") == 2000000L)

    val ate = run("""{"pipe":"p","operations":[{"name":"a","function":
      "stratified_ate","kwargs":{"stratum_col":"s","y_expr":"y",
      "treated_expr":"t"}}]}""",
      Seq(("A", 300L, true), ("A", 100L, false)).toDF("s", "y", "t")).head()
    assert(ate.getAs[Long]("ate_micro") == 2000000L)

    val bh = run("""{"pipe":"p","operations":[{"name":"b","function":
      "bh_discoveries","kwargs":{"group_col":"g","success_expr":"y = 1"}}]}""",
      (Seq.fill(20)((1L, 1)) ++ Seq.fill(20)((2L, 0))).toDF("g", "y"))
    assert(bh.count() == 2)
  }

  test("X1: batch-39-43 registry ops run from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1

    val rd = run("""{"pipe":"p","operations":[{"name":"r","function":
      "ratio_metric_delta","kwargs":{"x_col":"x","y_col":"y",
      "arm_col":"arm"}}]}""",
      Seq((1L, 2L, "a"), (2L, 2L, "a"), (1L, 4L, "a")).toDF("x", "y", "arm"))
      .head()
    assert(rd.getAs[Double]("ratio") == 2.0)

    val mc = run("""{"pipe":"p","operations":[{"name":"m","function":
      "multi_contains","kwargs":{"text_col":"t",
      "patterns":["he","she"]}}]}""",
      Seq("ushers").toDF("t")).head()
    assert(mc.getAs[Long]("pattern_mask") == 3L)

    val iso = run("""{"pipe":"p","operations":[{"name":"i","function":
      "isotonic_calibration","kwargs":{"bin_expr":"b",
      "label_expr":"y = 1"}}]}""",
      (Seq.tabulate(4)(i => (0L, if (i < 3) 1 else 0)) ++
        Seq.tabulate(4)(i => (1L, if (i < 1) 1 else 0))).toDF("b", "y"))
      .orderBy("bin").collect()
    assert(iso.map(_.getAs[Long]("fit_ppm")).toSeq ==
      Seq(500000L, 500000L))

    val rk = run("""{"pipe":"p","operations":[{"name":"r","function":
      "rake_keyphrases","kwargs":{"id_col":"id","text_col":"t",
      "stopwords":["of"],"top_k":3}}]}""",
      Seq((1L, "deep learning of deep networks")).toDF("id", "t"))
      .collect()
    assert(rk.length == 2)

    val bp = run("""{"pipe":"p","operations":[{"name":"b","function":
      "bpe_train","kwargs":{"text_col":"t","merges":1}}]}""",
      Seq("low low").toDF("t")).head()
    assert(bp.getAs[String]("lhs") == "l" && bp.getAs[String]("rhs") == "o")

    val hn = run("""{"pipe":"p","operations":[{"name":"h","function":
      "hard_negatives","kwargs":{"id_col":"id","label_col":"l",
      "vec_col":"v","k":1}}]}""",
      Seq((1L, 0L, Array(1.0f, 0.0f)), (2L, 1L, Array(0.9f, 0.1f)))
        .toDF("id", "l", "v")).collect()
    assert(hn.length == 2) // each anchor gets its one cross-label negative

    val cd = run("""{"pipe":"p","operations":[{"name":"c","function":
      "cliffs_delta","kwargs":{"value_col":"v","group_col":"g",
      "group_a":"A","group_b":"B"}}]}""",
      Seq(("A", 1L), ("B", 2L)).toDF("g", "v")).head()
    assert(cd.getAs[Double]("delta") == -1.0)

    val sp = run("""{"pipe":"p","operations":[{"name":"s","function":
      "sprt","kwargs":{"look_expr":"lk","success_expr":"y = 1",
      "llr_success_micro":3,"llr_failure_micro":-1,
      "upper_micro":5,"lower_micro":-5}}]}""",
      Seq((1L, 1), (1L, 1)).toDF("lk", "y")).head()
    assert(sp.getAs[String]("decision") == "reject_h0")

    val kn = run("""{"pipe":"p","operations":[{"name":"k","function":
      "kish_neff","kwargs":{"slice_col":"s","weight_expr":"w"}}]}""",
      Seq(("x", 5L), ("x", 5L)).toDF("s", "w")).head()
    assert(kn.getAs[Double]("n_eff") == 2.0)

    val tc = run("""{"pipe":"p","operations":[{"name":"t","function":
      "t_closeness","kwargs":{"quasi_ids":["q"],
      "sensitive_expr":"v"}}]}""",
      Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L)).toDF("q", "v"))
      .collect()
    assert(tc.forall(_.getAs[Long]("t_ppm") == 0L))

    val pk = run("""{"pipe":"p","operations":[{"name":"p","function":
      "pass_at_k","kwargs":{"task_expr":"t","correct_expr":"ok",
      "k":1}}]}""",
      Seq((1L, true), (1L, false)).toDF("t", "ok"))
      .filter(col("task").isNotNull).head()
    assert(pk.getAs[Long]("pass_nano") == 500000000L)

    val rl = run("""{"pipe":"p","operations":[{"name":"r","function":
      "rouge_l","kwargs":{"pair_id_col":"id","cand_col":"c",
      "ref_col":"r"}}]}""",
      Seq((1L, "a b", "a b")).toDF("id", "c", "r")).head()
    assert(rl.getAs[Long]("lcs") == 2L)

    val pw = run("""{"pipe":"p","operations":[{"name":"w","function":
      "padding_waste","kwargs":{"len_expr":"l","bucket_width":32}}]}""",
      Seq(10L, 20L).toDF("l")).filter(col("bucket").isNotNull).head()
    assert(pw.getAs[Long]("padded_sum") == 40L)

    val bl = run("""{"pipe":"p","operations":[{"name":"b","function":
      "bleu","kwargs":{"pair_id_col":"id","cand_col":"c",
      "ref_col":"r"}}]}""",
      Seq((1L, "a b", "a b")).toDF("id", "c", "r")).head()
    assert(bl.getAs[Long]("bleu_nano") == 1000000000L)
  }

  test("X1: batch-25-27 registry ops run from JSON") {
    def run(json: String, df: org.apache.spark.sql.DataFrame) =
      Pipeline.fromJson(json).run(df)._1

    val kw = run("""{"pipe":"p","operations":[{"name":"k","function":
      "kruskal_wallis","kwargs":{"value_col":"v","group_col":"g"}}]}""",
      Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L), ("C", 5L), ("C", 6L))
        .toDF("g", "v")).head()
    assert(kw.getAs[Long]("k") == 3L && kw.getAs[Double]("h") == 4.571428)

    val wsr = run("""{"pipe":"p","operations":[{"name":"w","function":
      "wilcoxon_signed_rank","kwargs":{"x_col":"x","y_col":"y"}}]}""",
      Seq((0L, 1L), (2L, 0L), (0L, 3L), (0L, 4L)).toDF("x", "y")).head()
    assert(wsr.getAs[Long]("w2_plus") == 16L)

    val mk = run("""{"pipe":"p","operations":[{"name":"m","function":
      "mann_kendall","kwargs":{"order_col":"t","value_col":"v"}}]}""",
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("t", "v")).head()
    assert(mk.getAs[Long]("s") == 6L)

    val pt = run("""{"pipe":"p","operations":[{"name":"p","function":
      "pettitt","kwargs":{"order_col":"t","value_col":"v"}}]}""",
      Seq((1L, 1L), (2L, 1L), (3L, 5L), (4L, 5L)).toDF("t", "v")).head()
    assert(pt.getAs[Long]("t_star") == 2L)

    val gt = run("""{"pipe":"p","operations":[{"name":"g","function":
      "g_test","kwargs":{"row_col":"r","col_col":"c"}}]}""",
      (Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("b", "y"))).toDF("r", "c"))
      .head()
    assert(gt.getAs[Double]("g") == 5.545176)

    val ck = run("""{"pipe":"p","operations":[{"name":"c","function":
      "cohens_kappa","kwargs":{"rater_a_expr":"a","rater_b_expr":"b"}}]}""",
      (Seq.fill(4)(("k", "k")) ++ Seq.fill(3)(("d", "d")) ++
        Seq.fill(2)(("k", "d")) ++ Seq(("d", "k"))).toDF("a", "b")).head()
    assert(ck.getAs[Double]("kappa") == 0.4)

    val ka = run("""{"pipe":"p","operations":[{"name":"k","function":
      "krippendorff_alpha","kwargs":{"rater_a_expr":"a",
      "rater_b_expr":"b"}}]}""",
      Seq(("k", "k"), ("k", "d"), ("d", "d"), ("d", "d")).toDF("a", "b"))
      .head()
    assert(ka.getAs[Long]("de_num") == 30L)

    val ucb = run("""{"pipe":"p","operations":[{"name":"u","function":
      "ucb1","kwargs":{"arm_col":"arm","reward_expr":"r = 1"}}]}""",
      (Seq.fill(2)(("a", 1)) ++ Seq.fill(2)(("a", 0)) ++ Seq(("b", 1)))
        .toDF("arm", "r")).orderBy("ucb_rank").head()
    assert(ucb.getAs[String]("arm") == "b")

    val sb = run("""{"pipe":"p","operations":[{"name":"s","function":
      "sequential_boundary","kwargs":{"look_expr":"lk",
      "arm_a_expr":"arm = 'A'","success_expr":"y = 1"}}]}""",
      Seq((1, "A", 1), (1, "A", 0), (1, "B", 0), (1, "B", 0))
        .toDF("lk", "arm", "y")).head()
    // unrounded pinned IEEE z (the q186 discipline)
    assert(sb.getAs[Double]("z") == 0.5 / math.sqrt(0.25 * 0.75 * 1.0))

    val aa = run("""{"pipe":"p","operations":[{"name":"a","function":
      "adamic_adar","kwargs":{"basket_col":"b","item_col":"i",
      "top_k":5}}]}""",
      Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L)).toDF("b", "i")).head()
    assert(aa.getAs[Long]("n_common") == 2L)

    val ic = run("""{"pipe":"p","operations":[{"name":"i","function":
      "item_cosine","kwargs":{"basket_col":"b","item_col":"i",
      "min_common":2,"top_k":5}}]}""",
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L))
        .toDF("b", "i")).head()
    assert(ic.getAs[Long]("n_common") == 2L)

    val as = run("""{"pipe":"p","operations":[{"name":"a","function":
      "assortativity","kwargs":{"src_col":"s","dst_col":"d"}}]}""",
      Seq((1L, 2L), (2L, 3L)).toDF("s", "d")).head()
    assert(as.getAs[Double]("r") == -1.0)

    val cc = run("""{"pipe":"p","operations":[{"name":"c","function":
      "clustering_coefficients","kwargs":{"src_col":"s","dst_col":"d"}}]}""",
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d"))
    assert(cc.count() == 3)

    val tmp = java.nio.file.Files.createTempDirectory("graft_reg27").toString
    Seq((10L, "a b c")).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/model")
    val kn = run(s"""{"pipe":"p","operations":[{"name":"k","function":
      "kneser_ney_score","kwargs":{"model_file":"$tmp/model",
      "text_col":"text","id_col":"doc_id"}}]}""",
      Seq((1L, "a b x")).toDF("doc_id", "text")).head()
    assert(kn.getAs[Long]("n_bigrams") == 2L)

    val nv = run(s"""{"pipe":"p","operations":[{"name":"n","function":
      "ngram_novelty","kwargs":{"model_file":"$tmp/model",
      "text_col":"text","id_col":"doc_id","n":2}}]}""",
      Seq((1L, "a b z")).toDF("doc_id", "text")).head()
    assert(nv.getAs[Long]("n_unseen") == 1L) // "a b" seen, "b z" not

    val rg = run("""{"pipe":"p","operations":[{"name":"r","function":
      "rouge2","kwargs":{"pair_id_col":"pid","cand_col":"c",
      "ref_col":"f"}}]}""",
      Seq((1L, "a b c", "a b d")).toDF("pid", "c", "f")).head()
    assert(rg.getAs[Long]("overlap") == 1L)

    val jp = run("""{"pipe":"p","operations":[{"name":"j","function":
      "jl_project","kwargs":{"vec_col":"v","dim_in":4,"dim_out":2}}]}""",
      Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")).head()
    assert(jp.getSeq[Double](jp.fieldIndex("projected")).length == 2)

    Seq((1L, 10L)).toDF("query_id", "item_id").write.mode("overwrite")
      .parquet(s"$tmp/truth")
    val mp = run(s"""{"pipe":"p","operations":[{"name":"m","function":
      "map_at_k","kwargs":{"truth_file":"$tmp/truth","k":5}}]}""",
      Seq((1L, 10L, 1L)).toDF("query_id", "item_id", "rank")).head()
    assert(mp.getAs[Double]("ap") == 1.0)

    val cq = run("""{"pipe":"p","operations":[{"name":"c","function":
      "cochran_q","kwargs":{"block_col":"b","treatment_expr":"t",
      "success_expr":"true"}}]}""",
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L), (3L, 3L))
        .toDF("b", "t")).head()
    assert(cq.getAs[Double]("q") == 3.0)

    val lb = run("""{"pipe":"p","operations":[{"name":"l","function":
      "ljung_box","kwargs":{"order_col":"t","value_col":"v","lags":2}}]}""",
      Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L)).toDF("t", "v")).head()
    assert(lb.getAs[Double]("q") == 7.5)

    val sd = run("""{"pipe":"p","operations":[{"name":"s","function":
      "simpson_diversity","kwargs":{"keys":["k"],"category_col":"c"}}]}""",
      Seq(("s1", "a"), ("s1", "b")).toDF("k", "c")).head()
    assert(sd.getAs[Long]("n_categories") == 2L)

    val th = run("""{"pipe":"p","operations":[{"name":"t","function":
      "theil_index","kwargs":{"value_col":"x"}}]}""",
      Seq(2L, 2L).toDF("x")).head()
    assert(th.getAs[Double]("theil") == 0.0) // equal values → no inequality

    val ca = run("""{"pipe":"p","operations":[{"name":"c","function":
      "cochran_armitage","kwargs":{"score_expr":"w",
      "success_expr":"y = 1"}}]}""",
      (Seq.fill(2)((1L, 1)) ++ Seq.fill(8)((1L, 0)) ++
        Seq.fill(8)((2L, 1)) ++ Seq.fill(2)((2L, 0))).toDF("w", "y")).head()
    assert(ca.getAs[Double]("chi2_trend") == 7.2)

    val zs = run("""{"pipe":"p","operations":[{"name":"z","function":
      "zipf_slope","kwargs":{"text_col":"text","top_n":3}}]}""",
      Seq("a a a a b b c").toDF("text")).head()
    assert(zs.getAs[Long]("n_terms") == 3L)

    val kan = run("""{"pipe":"p","operations":[{"name":"k","function":
      "k_anonymity","kwargs":{"quasi_ids":["nat","seg"],"k":2}}]}""",
      Seq(("n1", "A"), ("n1", "A"), ("n2", "B")).toDF("nat", "seg")).head()
    assert(kan.getAs[Long]("k_min") == 1L)

    val ld = run("""{"pipe":"p","operations":[{"name":"l","function":
      "l_diversity","kwargs":{"quasi_ids":["qi"],"sensitive_col":"s",
      "l":2}}]}""",
      Seq(("g1", "x"), ("g1", "y"), ("g2", "x")).toDF("qi", "s")).head()
    assert(ld.getAs[Long]("l_min") == 1L)

    val ht = run("""{"pipe":"p","operations":[{"name":"h","function":
      "hill_tail","kwargs":{"value_col":"x","k":3}}]}""",
      Seq(16L, 8L, 4L, 2L, 1L).toDF("x")).head()
    assert(ht.getAs[Long]("x_tail") == 2L)

    val gtu = run("""{"pipe":"p","operations":[{"name":"g","function":
      "good_turing","kwargs":{"text_col":"text"}}]}""",
      Seq("a a b c").toDF("text")).head()
    assert(gtu.getAs[Long]("p0_ppm") == 500000L)

    val bqa = run("""{"pipe":"p","operations":[{"name":"b","function":
      "binned_quantiles","kwargs":{"value_col":"x","bin_width":5,
      "levels_ppm":["500000"]}}]}""",
      (1L to 10L).toDF("x")).head()
    assert(bqa.getAs[Long]("binned_q") == 9L)

    val gm = run("""{"pipe":"p","operations":[{"name":"g","function":
      "greedy_mixture","kwargs":{"source_col":"s","tokens_col":"t",
      "quality_col":"q","budget_num":1,"budget_den":2}}]}""",
      Seq(("A", 60L, 9L), ("B", 40L, 5L)).toDF("s", "t", "q"))
    assert(gm.orderBy("source").head().getAs[Long]("alloc_tokens") == 50L)

    def t30(s: String) = java.sql.Timestamp.valueOf(s)
    val rfm = run("""{"pipe":"p","operations":[{"name":"r","function":
      "rfm_segments","kwargs":{"actor_col":"c","ts_col":"t",
      "amount_cents_expr":"cents"}}]}""",
      Seq((1L, t30("2024-01-01 10:00:00"), 100L),
        (2L, t30("2024-01-05 10:00:00"), 300L)).toDF("c", "t", "cents"))
    assert(rfm.count() == 2)

    val bu = run("""{"pipe":"p","operations":[{"name":"b","function":
      "burstiness","kwargs":{"actor_col":"u","ts_col":"t",
      "min_gaps":2}}]}""",
      Seq((7L, t30("2024-01-01 10:00:00")), (7L, t30("2024-01-01 10:01:00")),
        (7L, t30("2024-01-01 10:02:00"))).toDF("u", "t")).head()
    assert(bu.getAs[Double]("b") == -1.0)

    val xc = run("""{"pipe":"p","operations":[{"name":"x","function":
      "xmr_chart","kwargs":{"order_col":"tt","value_col":"v"}}]}""",
      Seq((1L, 10L), (2L, 10L), (3L, 30L)).toDF("tt", "v"))
    assert(xc.count() == 3)

    val es = run("""{"pipe":"p","operations":[{"name":"e","function":
      "eta_squared","kwargs":{"value_col":"v","group_col":"g"}}]}""",
      Seq(("a", 1L), ("a", 1L), ("b", 3L), ("b", 3L)).toDF("g", "v")).head()
    assert(es.getAs[Double]("eta_sq") == 1.0)

    val gd = run("""{"pipe":"p","operations":[{"name":"g","function":
      "grid_density_clusters","kwargs":{"x_col":"x","y_col":"y",
      "cell_size":1,"min_pts":2}}]}""",
      Seq((0.5, 0.5), (0.6, 0.6)).toDF("x", "y"))
    assert(gd.count() == 1)

    val rdf = run("""{"pipe":"p","operations":[{"name":"r","function":
      "retention_decay_fit","kwargs":{"actor_col":"user_id",
      "ts_col":"ts","max_days":14}}]}""",
      Seq((1L, t30("2024-01-01 10:00:00")), (1L, t30("2024-01-02 10:00:00")),
        (2L, t30("2024-01-01 11:00:00"))).toDF("user_id", "ts")).head()
    assert(rdf.getAs[Long]("n_days") == 1L)
  }
}
