package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

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

  /** q493 — E5: image BOX-DOWNSAMPLE (the brief's "resize" op) over
    * REAL PNG payloads: one 32×32 deterministic-gradient PNG per
    * nation key (encoded AND decoded through the JDK codec — PNG is
    * lossless, so pixels round-trip exactly), cut into 8×8 blocks,
    * mean luminance per block as one integer `div`. The oracle never
    * sees a PNG: it replays the generator formula
    * v(x,y) = (x·31 + y·17 + id·7) mod 256 over the pixel lattice —
    * decode+downsample must agree with pure arithmetic bit-for-bit. */
  val q493 = Declared(
    "q493_image_block_stats", "E5",
    (s, dir) => {
      val png = udf((id: Long) => graft.ext.Multimodal.syntheticPng(32, 32, id))
      val media = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").cast("long").as("id"))
        .withColumn("payload", png(col("id")))
      graft.ext.Multimodal.imageBlockStats(media, "id", "payload", factor = 8)
        .select(col("media_id"), col("bx"), col("by"), col("n_px"),
          expr("sum_rgb div (3 * n_px)").as("mean_lum"))
        .orderBy(col("media_id"), col("by"), col("bx"))
    },
    Some("""WITH px AS (
           |  SELECT CAST(n.n_nationkey AS BIGINT) AS media_id,
           |    x.x AS x, y.y AS y,
           |    (x.x * 31 + y.y * 17 + CAST(n.n_nationkey AS BIGINT) * 7) % 256 AS v
           |  FROM nation n
           |  CROSS JOIN (SELECT unnest(range(0, 32)) AS x) x
           |  CROSS JOIN (SELECT unnest(range(0, 32)) AS y) y)
           |SELECT media_id, x // 8 AS bx, y // 8 AS by,
           |  CAST(count(*) AS BIGINT) AS n_px,
           |  CAST(sum(3 * v) AS BIGINT) // (3 * CAST(count(*) AS BIGINT))
           |    AS mean_lum
           |FROM px GROUP BY 1, 2, 3
           |ORDER BY media_id, by, bx""".stripMargin),
    "Decode + block sums run scan-side per payload (one UDF, no " +
      "shuffle before the per-image explode); blocks shuffle only into " +
      "the caller's aggregation. At 100 TB of images this is the " +
      "mapInPandas shape with a JVM codec — embarrassingly parallel, " +
      "payload-local.")

  /** q494 — E5: audio FRAME FEATURES over REAL WAV/PCM payloads: one
    * 1000-sample deterministic triangle wave per nation key, 200-sample
    * frames, exact integer energy Σs² and strict zero-crossing count
    * per frame. The oracle replays the generator formula
    * s(i) = ((i·k) mod 2048 − 1024)·16, k = 7 + id mod 5 — the VAD
    * readout with no float anywhere. */
  val q494 = Declared(
    "q494_audio_frame_stats", "E5",
    (s, dir) => {
      val wav = udf((id: Long) =>
        graft.ext.Multimodal.syntheticWav(1000, 8000, id))
      val media = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").cast("long").as("id"))
        .withColumn("payload", wav(col("id")))
      graft.ext.Multimodal.audioFrameStats(media, "id", "payload",
          frameLen = 200)
        .orderBy(col("media_id"), col("frame"))
    },
    Some("""WITH smp AS (
           |  SELECT CAST(n.n_nationkey AS BIGINT) AS media_id, i.i AS i,
           |    ((i.i * (7 + CAST(n.n_nationkey AS BIGINT) % 5)) % 2048
           |      - 1024) * 16 AS s
           |  FROM nation n
           |  CROSS JOIN (SELECT unnest(range(0, 1000)) AS i) i),
           |lagged AS (
           |  SELECT media_id, i // 200 AS frame, s,
           |    CASE WHEN i % 200 > 0 AND
           |      lag(s) OVER (PARTITION BY media_id ORDER BY i) * s < 0
           |      THEN 1 ELSE 0 END AS zc
           |  FROM smp)
           |SELECT media_id, frame, CAST(count(*) AS BIGINT) AS n_samples,
           |  CAST(sum(s * s) AS BIGINT) AS sum_sq,
           |  CAST(sum(zc) AS BIGINT) AS zero_crossings
           |FROM lagged GROUP BY 1, 2
           |ORDER BY media_id, frame""".stripMargin),
    "RIFF parse + frame sums are one scan-side UDF per payload; " +
      "frames explode locally. Same payload-local map shape as q493 — " +
      "the 100 TB audio screen is a pure map stage.")

  /** q495 — E5: video FRAME-SAMPLE over REAL animated GIFs: one
    * (3 + id mod 3)-frame constant-gray animation per nation key,
    * every 2nd frame up to 3 sampled, exact per-frame mean luminance
    * (constant v = 40 + (id·7 mod 100) + f·16 — GIF is palette-exact
    * for constant frames, so decode ≡ formula). The thumbnail-strip
    * cut of a video-corpus pipeline. */
  val q495 = Declared(
    "q495_video_frame_sample", "E5",
    (s, dir) => {
      val gif = udf((id: Long) => graft.ext.Multimodal.syntheticGif(
        8, 6, frames = 3 + (id % 3).toInt, seed = id))
      val media = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").cast("long").as("id"))
        .withColumn("payload", gif(col("id")))
      graft.ext.Multimodal.videoFrameSample(media, "id", "payload",
          stride = 2, maxFrames = 3)
        .select(col("media_id"), col("frame_idx"), col("n_frames"),
          col("n_px"), expr("sum_rgb div (3 * n_px)").as("mean_lum"))
        .orderBy(col("media_id"), col("frame_idx"))
    },
    Some("""WITH v AS (
           |  SELECT CAST(n.n_nationkey AS BIGINT) AS media_id,
           |    3 + CAST(n.n_nationkey AS BIGINT) % 3 AS n_frames,
           |    f.f AS frame_idx
           |  FROM nation n
           |  CROSS JOIN (SELECT unnest([0, 2, 4]) AS f) f
           |  WHERE f.f < 3 + CAST(n.n_nationkey AS BIGINT) % 3)
           |SELECT media_id, frame_idx, n_frames,
           |  CAST(48 AS BIGINT) AS n_px,
           |  40 + (media_id * 7) % 100 + frame_idx * 16 AS mean_lum
           |FROM v ORDER BY media_id, frame_idx""".stripMargin),
    "Frame decode + sums are payload-local (one UDF per video, sampled " +
      "frames only — the stride/maxFrames dials bound the fan-out); no " +
      "shuffle until the caller aggregates. The H.264-class codec swap " +
      "changes the reader call, not this plan.")

  /** q496 — A-ts/X3: EXACT CHANGEPOINT DETECTION (optimal
    * partitioning, the PELT family's exact parent) over per-user daily
    * spend series — 28 January days, cent-exact, segment cost
    * Σx² − (Σx)² div len on long prefix sums, penalty 2·10⁹ per cut,
    * argmin ties to the smallest split. One native codegen kernel call
    * per user ([[graft.ext.ChangepointsExact]]); the oracle replays the
    * whole DP per user in a recursive CTE carrying the F and cut-count
    * lists (the q480/q330 list-fold device), so cost AND cut count are
    * bit-checked. */
  val q496 = {
    val PEN = 2000000000L
    Declared(
      "q496_changepoints", "A-ts,X3",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("ts") >= lit("2024-01-01").cast("timestamp") &&
            col("ts") < lit("2024-01-29").cast("timestamp"))
          .select(col("user_id"), dayofmonth(col("ts")).as("d"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        val prof = ev.groupBy(col("user_id"), col("d"))
          .agg(sum(col("cents")).as("v"))
          .groupBy(col("user_id"))
          .agg(map_from_entries(collect_list(
            struct(col("d"), col("v")))).as("m"))
          .select(col("user_id"),
            transform(sequence(lit(1), lit(28)),
              d => coalesce(element_at(col("m"), d), lit(0L))).as("prof"))
        prof.select(col("user_id"),
            graft.ext.ChangepointsExact.changepointsExact(
              col("prof"), PEN).as("cp"))
          .select(col("user_id"), lit(28L).as("n_points"),
            (size(col("cp")) - 1).cast("long").as("n_changepoints"),
            element_at(col("cp"), 1).as("total_cost"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH RECURSIVE ev AS (
          |  SELECT user_id, CAST(day(ts) AS INT) AS d,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events
          |  WHERE ts >= TIMESTAMP '2024-01-01'
          |    AND ts < TIMESTAMP '2024-01-29'),
          |ds AS (SELECT user_id, d, sum(cents) AS v FROM ev GROUP BY 1, 2),
          |users AS (SELECT DISTINCT user_id FROM ev),
          |grid AS (
          |  SELECT u.user_id, g.d FROM users u CROSS JOIN
          |    (SELECT CAST(x AS INT) AS d FROM generate_series(1, 28) t(x)) g),
          |prof AS MATERIALIZED (
          |  SELECT g.user_id, list(coalesce(ds.v, 0) ORDER BY g.d) AS p
          |  FROM grid g LEFT JOIN ds ON ds.user_id = g.user_id AND ds.d = g.d
          |  GROUP BY 1),
          |pre AS MATERIALIZED (
          |  SELECT user_id,
          |    list_transform(range(0, 29), i ->
          |      CAST(coalesce(list_sum(p[1:i]), 0) AS BIGINT)) AS s,
          |    list_transform(range(0, 29), i ->
          |      CAST(coalesce(list_sum(list_transform(p[1:i], x -> x * x)), 0)
          |        AS BIGINT)) AS ss
          |  FROM prof),
          |dp(t, user_id, f, cnt) AS (
          |  SELECT 0, user_id, [CAST(-$PEN AS BIGINT)], [CAST(0 AS BIGINT)]
          |  FROM pre
          |  UNION ALL
          |  SELECT q.t + 1, q.user_id,
          |    list_append(q.f, list_min(q.vals)),
          |    list_append(q.cnt,
          |      q.cnt[list_position(q.vals, list_min(q.vals))] +
          |      CASE WHEN list_position(q.vals, list_min(q.vals)) > 1
          |        THEN 1 ELSE 0 END)
          |  FROM (
          |    SELECT d.t, d.user_id, d.f, d.cnt,
          |      list_transform(range(0, d.t + 1), sgm ->
          |        d.f[sgm + 1]
          |        + ((p.ss[d.t + 2] - p.ss[sgm + 1])
          |           - ((p.s[d.t + 2] - p.s[sgm + 1])
          |              * (p.s[d.t + 2] - p.s[sgm + 1])) // (d.t + 1 - sgm))
          |        + $PEN) AS vals
          |    FROM dp d JOIN pre p ON p.user_id = d.user_id
          |    WHERE d.t < 28) q)
          |SELECT user_id, CAST(28 AS BIGINT) AS n_points,
          |  CAST(cnt[29] AS BIGINT) AS n_changepoints,
          |  CAST(f[29] AS BIGINT) AS total_cost
          |FROM dp WHERE t = 28 ORDER BY user_id""".stripMargin),
      "The series is calendar-bounded per key (28 points), the DP runs " +
        "as ONE static codegen call per user inside the agg stage's " +
        "span, and keys partition freely — the segmentation screen " +
        "(regime shifts, drift windows) at 100 TB is a map over the " +
        "user rollup. The O(n²) kernel is cache-resident at calendar " +
        "lengths; PELT pruning is the documented scale path if series " +
        "ever outgrow the calendar.")
  }

  /** q497 — E-graph: STRONGLY CONNECTED COMPONENTS of the directed
    * prop-k transition graph (per-user consecutive events, k < 60 —
    * the capped audit-slice contract the operator enforces), labels by
    * min mutual-reachability partner via pointer-doubled closure. The
    * oracle computes the same closure with a recursive CTE and the
    * same mutual grouping. */
  val q497 = Declared(
    "q497_scc_transitions", "E-graph,W1",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") < 60)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val edges = ev.withColumn("nk", lead(col("k"), 1).over(w))
        .filter(col("nk").isNotNull && col("nk") =!= col("k"))
        .select(col("k").as("src"), col("nk").as("dst"))
      graft.ext.Graph.stronglyConnectedComponents(edges, "src", "dst")
        .orderBy(col("node"))
    },
    Some("""WITH RECURSIVE ev AS (
           |  SELECT user_id, ts, event_id,
           |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           |  FROM events
           |  WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 60),
           |tr AS (
           |  SELECT user_id, k,
           |    lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nk
           |  FROM ev),
           |edges AS MATERIALIZED (
           |  SELECT DISTINCT k AS u, nk AS v FROM tr
           |  WHERE nk IS NOT NULL AND nk <> k),
           |nodes AS MATERIALIZED (
           |  SELECT DISTINCT u AS n
           |  FROM (SELECT u FROM edges UNION ALL SELECT v FROM edges) t(u)),
           |reach(u, v) AS (
           |  SELECT n, n FROM nodes
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v)
           |SELECT r1.u AS node, CAST(min(r1.v) AS BIGINT) AS scc_id
           |FROM reach r1 JOIN reach r2 ON r2.u = r1.v AND r2.v = r1.u
           |GROUP BY 1 ORDER BY node""".stripMargin),
    "Each doubling round is ONE mid-keyed equi-join + distinct (path " +
      "horizon doubles per round — 6 rounds cover diameter 64); the " +
      "operator REFUSES > 100k nodes because the closure is O(n·reach) " +
      "pairs by nature — SCC at 100 TB is asked of bounded entity " +
      "graphs (category maps, service topologies), and the cap makes " +
      "the quadratic contract explicit instead of a silent cliff.")

  /** q498 — E4: EXACT unigram-vocabulary VITERBI SEGMENTATION (the
    * SentencePiece-unigram shape with an integer objective): substring
    * vocabulary (len ≤ 4, weighted count ≥ 5) over the documents
    * corpus, top-200 words segmented by the Σcnt·64 − |pieces| DP,
    * word-length rollup of the optimal scores. The oracle rebuilds the
    * vocabulary and replays every word's DP in a recursive CTE
    * carrying the F-list (the q496 device), so each optimum is
    * bit-checked. */
  val q498 = Declared(
    "q498_unigram_segmentation", "E4",
    (s, dir) => graft.ext.TextAnalysis.unigramSegmentScores(
        Tables.documents(s, dir), col("text"),
        maxPieceLen = 4, minCount = 5L, topWords = 200)
      .orderBy(col("word_len")),
    Some("""WITH RECURSIVE words AS MATERIALIZED (
           |  SELECT w AS word, count(*) AS wc
           |  FROM (SELECT unnest(list_filter(
           |      regexp_split_to_array(lower(text), '\s+'),
           |      x -> x <> '' AND length(x) <= 30)) AS w FROM documents)
           |  GROUP BY 1),
           |grid AS (
           |  SELECT s.s, e.e
           |  FROM (SELECT unnest(range(1, 31)) AS s) s
           |  CROSS JOIN (SELECT unnest(range(1, 31)) AS e) e
           |  WHERE e.e >= s.s AND e.e <= s.s + 3),
           |pieces AS MATERIALIZED (
           |  SELECT p, CAST(sum(wc) AS BIGINT) AS cnt FROM (
           |    SELECT w.wc, substring(w.word, g.s, g.e - g.s + 1) AS p
           |    FROM words w JOIN grid g
           |      ON g.s <= length(w.word) AND g.e <= length(w.word))
           |  GROUP BY 1 HAVING sum(wc) >= 5),
           |top AS MATERIALIZED (
           |  SELECT word, wc FROM words ORDER BY wc DESC, word LIMIT 200),
           |cand AS MATERIALIZED (
           |  SELECT c.word, c.s, c.e,
           |    coalesce(p.cnt, 0) * 64 - 1 AS contrib
           |  FROM (
           |    SELECT t.word, g.s, g.e,
           |      substring(t.word, g.s, g.e - g.s + 1) AS p
           |    FROM top t JOIN grid g
           |      ON g.s <= length(t.word) AND g.e <= length(t.word)) c
           |  LEFT JOIN pieces p ON p.p = c.p
           |  WHERE p.cnt IS NOT NULL OR c.s = c.e),
           |cend AS MATERIALIZED (
           |  SELECT word, e, list({'s': s, 'c': contrib}) AS cl
           |  FROM cand GROUP BY 1, 2),
           |dp(pos, word, f) AS (
           |  SELECT 0, word, [CAST(0 AS BIGINT)] FROM top
           |  UNION ALL
           |  SELECT d.pos + 1, d.word,
           |    list_append(d.f, list_max(list_transform(ce.cl, x ->
           |      d.f[x.s] + x.c)))
           |  FROM dp d JOIN cend ce
           |    ON ce.word = d.word AND ce.e = d.pos + 1
           |  WHERE d.pos < length(d.word))
           |SELECT CAST(length(d.word) AS BIGINT) AS word_len,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(t.wc) AS BIGINT) AS total_wc,
           |  CAST(sum(d.f[length(d.word) + 1]) AS BIGINT) AS sum_score
           |FROM dp d JOIN top t ON t.word = d.word
           |WHERE d.pos = length(d.word)
           |GROUP BY 1 ORDER BY word_len""".stripMargin),
    "Vocabulary = one explode + piece-keyed agg with map-side combine; " +
      "candidates attach by a piece equi-join; each word's DP is one " +
      "kernel call over its ≤ len·4 candidate list. The tokenizer-" +
      "vocabulary screen of a 100 TB corpus never touches pair space — " +
      "cost is corpus-linear plus a topWords-bounded DP stage.")

  /** q500 — E3+: LATE-INTERACTION MaxSim reranking (ColBERT scoring
    * shape) with the exact md5-digit token embedding: three literal
    * queries against the documents corpus, shared-token candidate
    * gate, 16-token doc windows, top-5 per query. The oracle rebuilds
    * the embedding from md5 hex digits and replays the
    * Σ max ⟨qv, dv⟩ double aggregation. */
  val q500 = Declared(
    "q500_maxsim_rerank", "E3+",
    (s, dir) => graft.ext.Similarity.maxsimRerank(
        Tables.documents(s, dir), col("doc_id"), col("text"),
        queries = Seq(("q1", "fast table scan"),
          ("q2", "stream join window"), ("q3", "vector hash merge")),
        maxDocTokens = 16, topK = 5)
      .orderBy(col("query_id"), col("rank")),
    Some("""WITH q(query_id, qtext) AS (VALUES
           |    ('q1', 'fast table scan'), ('q2', 'stream join window'),
           |    ('q3', 'vector hash merge')),
           |qt AS MATERIALIZED (
           |  SELECT query_id, tok FROM (
           |    SELECT query_id,
           |      unnest(regexp_split_to_array(lower(qtext), '\s+')) AS tok
           |    FROM q)
           |  WHERE tok <> ''),
           |dt AS MATERIALIZED (
           |  SELECT doc_id, tok FROM (
           |    SELECT doc_id,
           |      unnest(regexp_split_to_array(lower(text), '\s+')) AS tok,
           |      unnest(range(1, len(regexp_split_to_array(lower(text), '\s+'))
           |        + 1)) AS pos
           |    FROM documents)
           |  WHERE tok <> '' AND pos <= 16),
           |cand AS MATERIALIZED (
           |  SELECT DISTINCT qt.query_id, dt.doc_id
           |  FROM qt JOIN dt ON dt.tok = qt.tok),
           |pairs AS (
           |  SELECT c.query_id, c.doc_id, qt.tok AS qtok,
           |    CAST(list_sum(list_transform(range(1, 9), j ->
           |      (strpos('0123456789abcdef', substr(md5(qt.tok), CAST(j AS INT), 1)) - 9)
           |      * (strpos('0123456789abcdef', substr(md5(dt.tok), CAST(j AS INT), 1)) - 9)))
           |      AS BIGINT) AS dot
           |  FROM cand c
           |  JOIN qt ON qt.query_id = c.query_id
           |  JOIN dt ON dt.doc_id = c.doc_id),
           |best AS (
           |  SELECT query_id, doc_id, qtok, max(dot) AS b
           |  FROM pairs GROUP BY 1, 2, 3),
           |score AS (
           |  SELECT query_id, doc_id, CAST(sum(b) AS BIGINT) AS maxsim
           |  FROM best GROUP BY 1, 2)
           |SELECT query_id,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY maxsim DESC, doc_id) AS BIGINT) AS rank,
           |  doc_id, maxsim
           |FROM score
           |QUALIFY rank <= 5
           |ORDER BY query_id, rank""".stripMargin),
    "The candidate gate is a token equi-join (swap in the q79 BM25 or " +
      "q58 IVF gate at scale); scoring is |cand|·|q|·16 exact-long " +
      "dots inside one codegen span, then two keyed aggs and a " +
      "per-query TakeOrdered. The modern reranker shape with no UDF " +
      "and no float anywhere.")

  /** q501 — E7: scoped UNICODE NORMALIZATION over the corpus — each
    * document decorated with a deterministic unicode suffix (full-width
    * ASCII, curly quotes/dashes/ellipsis, ligatures, zero-width chars,
    * NBSP — one variant per doc_id mod 5), normalized by the
    * translate/replace chain, per-language length/change audit. The
    * oracle interpolates the SAME mapping literals
    * ([[graft.ext.TextAnalysis.FullWidthSrc]] etc.) so the chains are
    * byte-identical by construction. */
  val q501 = {
    import graft.ext.TextAnalysis._
    val decos = Seq(
      "ｆｕｌｌ　ｗｉｄｔｈ！",
      "“curly” – dash …",
      "ﬁrst ﬂow",
      "zero​width nb",
      "plain ascii")
    val sqlDecos = decos.map(d => s"'$d'").mkString("[", ", ", "]")
    // SQL single-quoted literal with quotes doubled (QuoteDashDst
    // contains ASCII ' and ")
    def sqlLit(v: String): String = "'" + v.replace("'", "''") + "'"
    Declared(
      "q501_unicode_normalize", "E7,F1-F8",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("__deco", concat(col("text"), lit(" "),
            element_at(array(decos.map(lit): _*),
              (col("doc_id") % 5).cast("int") + 1)))
          .withColumn("__norm", normalizeUnicodeScoped(col("__deco")))
        docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("__deco"))).as("len_before"),
            sum(length(col("__norm"))).as("len_after"),
            sum(when(col("__norm") =!= col("__deco"), 1L).otherwise(0L))
              .as("n_changed"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH deco AS (
           |  SELECT lang,
           |    text || ' ' || ($sqlDecos)[CAST(doc_id % 5 AS INT) + 1] AS d
           |  FROM documents),
           |norm AS (
           |  SELECT lang, d,
           |    regexp_replace(regexp_replace(regexp_replace(
           |      translate(translate(translate(translate(d,
           |        '$ZeroWidthChars', ''),
           |        '$SpaceLikeChars', '  '),
           |        ${sqlLit(QuoteDashSrc)}, ${sqlLit(QuoteDashDst)}),
           |        ${sqlLit(FullWidthSrc)}, ${sqlLit(FullWidthDst)}),
           |      '…', '...', 'g'), 'ﬁ', 'fi', 'g'),
           |      'ﬂ', 'fl', 'g') AS n
           |  FROM deco)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(length(d)) AS BIGINT) AS len_before,
           |  CAST(sum(length(n)) AS BIGINT) AS len_after,
           |  CAST(sum(CASE WHEN n <> d THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_changed
           |FROM norm GROUP BY 1 ORDER BY lang""".stripMargin),
      "A pure scan-side translate/replace chain — zero exchanges " +
        "before the language rollup, codegen end to end. The " +
        "pre-tokenization cleanup of a 100 TB web corpus is a map " +
        "stage; the mapping tables are plan literals, not data.")
  }

  /** q502 — E7: LINE-WRAP REPAIR (PDF/OCR text cleanup) — documents
    * decorated with hyphen-break / single-newline / paragraph-break
    * suffixes (doc_id mod 4), repaired by the dehyphenate + sentinel
    * newline chain, per-language audit of lengths and surviving
    * newlines. */
  val q502 = Declared(
    "q502_linewrap_repair", "E7,F1-F8",
    (s, dir) => {
      import graft.ext.TextAnalysis._
      val decos = Seq("exam-\nple text", "para one\n\npara two",
        "line one\nline two", "tail-\nwind\nrow end")
      val docs = Tables.documents(s, dir)
        .withColumn("__deco", concat(col("text"), lit(" "),
          element_at(array(decos.map(lit): _*),
            (col("doc_id") % 4).cast("int") + 1)))
        .withColumn("__fix", repairLineWraps(col("__deco")))
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("__fix"))).as("len_after"),
          sum(length(col("__fix")) -
            length(regexp_replace(col("__fix"), "\n", "")))
            .as("newlines_left"),
          sum(when(col("__fix") =!= col("__deco"), 1L).otherwise(0L))
            .as("n_changed"))
        .orderBy(col("lang"))
    },
    Some("""WITH deco AS (
           |  SELECT lang, text || ' ' ||
           |    (['exam-' || chr(10) || 'ple text',
           |      'para one' || chr(10) || chr(10) || 'para two',
           |      'line one' || chr(10) || 'line two',
           |      'tail-' || chr(10) || 'wind' || chr(10) || 'row end'
           |     ])[CAST(doc_id % 4 AS INT) + 1] AS d
           |  FROM documents),
           |fix AS (
           |  SELECT lang, d,
           |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(d,
           |      '([\p{L}0-9])-\n([\p{L}0-9])', '\1\2', 'g'),
           |      '\n\n', chr(1), 'g'),
           |      '\n', ' ', 'g'),
           |      chr(1), chr(10) || chr(10), 'g') AS f
           |  FROM deco)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(length(f)) AS BIGINT) AS len_after,
           |  CAST(sum(length(f) - length(replace(f, chr(10), ''))) AS BIGINT)
           |    AS newlines_left,
           |  CAST(sum(CASE WHEN f <> d THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_changed
           |FROM fix GROUP BY 1 ORDER BY lang""".stripMargin),
    "Same shape as q501: scan-side regex/replace chain, one language " +
      "rollup. The sentinel device (protect \\n\\n, collapse \\n, " +
      "restore) sidesteps RE2's missing lookaround on BOTH engines " +
      "with identical left-to-right all-occurrences semantics.")

  /** q503 — E7: rule-based SENTENCE SPLIT stats — every 'table' token
    * promoted to a sentence boundary ('table' → 'table.', both
    * engines), sentences = non-empty spans between [.!?]+ runs,
    * per-language rollup of counts/lengths. The splitter corpora run
    * before sentence-level dedup and packing. */
  val q503 = Declared(
    "q503_sentence_split", "E7",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("__d", regexp_replace(col("text"), "table", "table."))
        .withColumn("__st", graft.ext.TextAnalysis.sentenceStats(col("__d")))
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__st.n_sentences")).as("n_sentences"),
          sum(col("__st.sum_chars")).as("sum_chars"),
          max(col("__st.max_chars")).as("max_sent_chars"))
        .orderBy(col("lang"))
    },
    Some("""WITH st AS (
           |  SELECT lang,
           |    list_filter(regexp_split_to_array(
           |      regexp_replace(text, 'table', 'table.', 'g'),
           |      '[.!?]+\s*'), x -> x <> '') AS parts
           |  FROM documents)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(len(parts)) AS BIGINT) AS n_sentences,
           |  CAST(sum(coalesce(list_sum(
           |    list_transform(parts, x -> length(x))), 0)) AS BIGINT)
           |    AS sum_chars,
           |  CAST(max(coalesce(list_max(
           |    list_transform(parts, x -> length(x))), 0)) AS BIGINT)
           |    AS max_sent_chars
           |FROM st GROUP BY 1 ORDER BY lang""".stripMargin),
    "Scan-side split/filter/fold column ops (no UDF), one language " +
      "rollup — the sentence screen is a map stage at any scale.")

  /** q504 — E4/A1: TEMPERATURE-SAMPLED corpus mixing (the mT5 α = 1/2
    * scheme, Xue et al. 2021 — public literature): per (lang, source)
    * token counts, weights = ⌊√tokens⌋ (one correctly-rounded sqrt of
    * an exact integer — bit-identical across engines), and a
    * 1,000,000-token budget split by largest-remainder apportionment,
    * so Σ alloc ≡ budget exactly. */
  val q504 = Declared(
    "q504_temperature_mixing", "E4,A1",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("lang"), col("source"),
          size(filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
            .cast("long").as("__t"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("__t")).as("tokens"))
        .withColumn("__w",
          floor(sqrt(col("tokens").cast("double"))).cast("long"))
      graft.ops.Aggregates.largestRemainder(toks,
          Seq(col("lang"), col("source")), col("__w"), total = 1000000L)
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH toks AS (
           |  SELECT lang, source,
           |    CAST(sum(len(list_filter(regexp_split_to_array(lower(text),
           |      '\s+'), x -> x <> ''))) AS BIGINT) AS tokens
           |  FROM documents GROUP BY 1, 2),
           |w AS (
           |  SELECT lang, source,
           |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS weight
           |  FROM toks),
           |sc AS (
           |  SELECT lang, source, weight,
           |    CAST(sum(weight) OVER () AS BIGINT) AS W,
           |    CAST(1000000 * weight AS BIGINT) AS num
           |  FROM w),
           |fl AS (
           |  SELECT lang, source, weight, W, num // W AS fl,
           |    num - (num // W) * W AS rem
           |  FROM sc),
           |lf AS (
           |  SELECT *, 1000000 - CAST(sum(fl) OVER () AS BIGINT) AS leftn,
           |    row_number() OVER (ORDER BY rem DESC, lang, source) AS rn
           |  FROM fl)
           |SELECT lang, source, weight,
           |  CAST(fl + CASE WHEN rn <= leftn THEN 1 ELSE 0 END AS BIGINT)
           |    AS alloc
           |FROM lf ORDER BY lang, source""".stripMargin),
    "One corpus scan into a (lang, source) rollup; the apportionment " +
      "windows run over that rollup only. The sampling-rate table a " +
      "multilingual 100 TB mix is built from — exact by construction, " +
      "no drift off the budget.")

  /** q505 — A-ts/A1: HIERARCHICAL FORECAST RECONCILIATION (top-down
    * proportional, Athanasopoulos et al., the standard hierarchy
    * method): region-level 1996 order totals split across nations by
    * 1995 nation weights via PER-GROUP largest remainder — Σ over a
    * region's nations ≡ the region total, a theorem of the
    * apportionment. New grouped op: every window partitions on the
    * region, so there is NO single-partition frame at any scale. */
  val q505 = Declared(
    "q505_forecast_reconcile", "A-ts,A1",
    (s, dir) => {
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey"), col("n_regionkey"))
      val o = s.read.parquet(s"$dir/orders.parquet")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_regionkey").as("region"),
          col("n_nationkey").as("nation"), year(col("o_orderdate")).as("y"))
      val w = o.filter(col("y") === 1995)
        .groupBy(col("region"), col("nation"))
        .agg(count(lit(1)).as("__w"))
      val tot = o.filter(col("y") === 1996)
        .groupBy(col("region")).agg(count(lit(1)).as("__tot"))
      graft.ops.Aggregates.largestRemainderByGroup(
          w.join(tot, Seq("region")),
          groupKeys = Seq(col("region")), keys = Seq(col("nation")),
          weightCol = col("__w"), totalCol = col("__tot"))
        .orderBy(col("region"), col("nation"))
    },
    Some("""WITH o AS (
           |  SELECT n.n_regionkey AS region, n.n_nationkey AS nation,
           |    year(o.o_orderdate) AS y
           |  FROM orders o
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
           |w AS (
           |  SELECT region, nation, CAST(count(*) AS BIGINT) AS weight
           |  FROM o WHERE y = 1995 GROUP BY 1, 2),
           |t AS (
           |  SELECT region, CAST(count(*) AS BIGINT) AS total
           |  FROM o WHERE y = 1996 GROUP BY 1),
           |sc AS (
           |  SELECT w.region, w.nation, w.weight, t.total,
           |    CAST(sum(w.weight) OVER (PARTITION BY w.region) AS BIGINT) AS W,
           |    CAST(t.total * w.weight AS BIGINT) AS num
           |  FROM w JOIN t ON t.region = w.region),
           |fl AS (
           |  SELECT *, num // greatest(W, 1) AS fl,
           |    num - (num // greatest(W, 1)) * W AS rem
           |  FROM sc),
           |lf AS (
           |  SELECT *,
           |    total - CAST(sum(fl) OVER (PARTITION BY region) AS BIGINT)
           |      AS leftn,
           |    row_number() OVER (PARTITION BY region
           |      ORDER BY rem DESC, nation) AS rn
           |  FROM fl)
           |SELECT region, nation, weight, total,
           |  CAST(fl + CASE WHEN rn <= leftn THEN 1 ELSE 0 END AS BIGINT)
           |    AS alloc
           |FROM lf ORDER BY region, nation""".stripMargin),
    "The fact scan collapses at the (region, nation, year) grain; " +
      "apportionment windows PARTITION BY region — hierarchies shard " +
      "freely, no global frame anywhere. The reconciliation step of " +
      "any hierarchical forecasting pipeline, exact to the unit.")

  /** q506 — J-asof: DIRECTIONAL AS-OF JOIN with tolerance (the full
    * pandas merge_asof surface): every click event matched to its
    * backward / forward / nearest error event within 10 minutes, per
    * direction match counts and the exact µs gap mass. The oracle
    * replays the union+window construction (IGNORE NULLS running
    * last/first over the same (ts, side) orderings, the same
    * tolerance gate, ties → backward). */
  val q506 = Declared(
    "q506_asof_directed", "J-asof,J4",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"))
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("err_id"))
      val out = Seq("backward", "forward", "nearest").map { d =>
        graft.ops.TimeSeriesOps.asofJoinDirected(l, r, "user_id", "ts",
            Seq("err_id"), direction = d,
            toleranceMicros = 600L * 1000000L)
          .agg(count(lit(1)).as("n_clicks"),
            count(col("asof_err_id")).as("n_matched"),
            sum(abs(unix_micros(col("ts")) - unix_micros(col("asof_ts"))))
              .as("gap_us"))
          .select(lit(d).as("direction"), col("n_clicks"),
            col("n_matched"), col("gap_us"))
      }.reduce(_ unionByName _)
      out.orderBy(col("direction"))
    },
    Some("""WITH l AS (
           |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
           |r AS (
           |  SELECT user_id, ts FROM events WHERE event_type = 'error'),
           |u AS (
           |  SELECT user_id, ts, 1 AS side, CAST(NULL AS TIMESTAMP) AS rts
           |  FROM l
           |  UNION ALL
           |  SELECT user_id, ts, 0, ts FROM r),
           |w AS (
           |  SELECT user_id, ts, side,
           |    last_value(rts IGNORE NULLS) OVER (PARTITION BY user_id
           |      ORDER BY ts, side
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS brts,
           |    first_value(rts IGNORE NULLS) OVER (PARTITION BY user_id
           |      ORDER BY ts, side DESC
           |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS frts
           |  FROM u),
           |g AS (
           |  SELECT user_id, ts,
           |    CASE WHEN brts IS NOT NULL AND
           |      abs(epoch_us(ts) - epoch_us(brts)) <= 600000000
           |      THEN brts END AS b,
           |    CASE WHEN frts IS NOT NULL AND
           |      abs(epoch_us(ts) - epoch_us(frts)) <= 600000000
           |      THEN frts END AS f
           |  FROM w WHERE side = 1),
           |n AS (
           |  SELECT user_id, ts, b, f,
           |    CASE WHEN b IS NULL THEN f
           |         WHEN f IS NULL THEN b
           |         WHEN epoch_us(ts) - epoch_us(b)
           |           <= epoch_us(f) - epoch_us(ts) THEN b
           |         ELSE f END AS near
           |  FROM g),
           |agg AS (
           |  SELECT 'backward' AS direction, count(*) AS n_clicks,
           |    count(b) AS n_matched,
           |    sum(abs(epoch_us(ts) - epoch_us(b))) AS gap_us FROM n
           |  UNION ALL
           |  SELECT 'forward', count(*), count(f),
           |    sum(abs(epoch_us(ts) - epoch_us(f))) FROM n
           |  UNION ALL
           |  SELECT 'nearest', count(*), count(near),
           |    sum(abs(epoch_us(ts) - epoch_us(near))) FROM n)
           |SELECT direction, CAST(n_clicks AS BIGINT) AS n_clicks,
           |  CAST(n_matched AS BIGINT) AS n_matched,
           |  CAST(gap_us AS BIGINT) AS gap_us
           |FROM agg ORDER BY direction""".stripMargin),
    "One shuffle + one sort per key timeline — the two running windows " +
      "share the exchange; never a range-condition nested loop. The " +
      "sensor/trade enrichment join at 100 TB keys on the entity and " +
      "scales with the timeline, not the pair space.")

  /** q507 — A5/W1: ACTIVITY-GAP analysis (the coverage COMPLEMENT of
    * q98's interval merge): each user's events padded to 5-minute
    * activity intervals, merged by the running-max-end island device,
    * then the GAPS between consecutive merged intervals — per user the
    * gap count, total idle µs and max idle µs. The outage/idle readout
    * of sensor coverage auditing. */
  val q507 = Declared(
    "q507_interval_gaps", "A5,W1",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pad = 300L * 1000000L // 5 min in µs
      val iv = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("__b"),
          (unix_micros(col("ts")) + pad).as("__e"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("__b"), col("__e"))
      val islands = iv
        .withColumn("__maxe", max(col("__e")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("__new",
          when(col("__maxe").isNull || col("__b") > col("__maxe"), 1L)
            .otherwise(0L))
        .withColumn("__isl", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__isl"))
        .agg(min(col("__b")).as("beg"), max(col("__e")).as("end"))
      val wl = Window.partitionBy(col("user_id")).orderBy(col("beg"))
      islands
        .withColumn("__nxt", lead(col("beg"), 1).over(wl))
        .withColumn("__gap", col("__nxt") - col("end"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          count(col("__gap")).as("n_gaps"),
          coalesce(sum(col("__gap")), lit(0L)).as("idle_us"),
          coalesce(max(col("__gap")), lit(0L)).as("max_idle_us"))
        .orderBy(col("user_id"))
    },
    Some("""WITH iv AS (
           |  SELECT user_id, epoch_us(ts) AS b,
           |    epoch_us(ts) + 300000000 AS e
           |  FROM events),
           |mk AS (
           |  SELECT user_id, b, e,
           |    max(e) OVER (PARTITION BY user_id ORDER BY b, e
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
           |  FROM iv),
           |isl AS (
           |  SELECT user_id, b, e,
           |    CAST(sum(CASE WHEN maxe IS NULL OR b > maxe THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY user_id ORDER BY b, e
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS g
           |  FROM mk),
           |merged AS (
           |  SELECT user_id, g, min(b) AS beg, max(e) AS e
           |  FROM isl GROUP BY 1, 2),
           |gaps AS (
           |  SELECT user_id, e,
           |    lead(beg) OVER (PARTITION BY user_id ORDER BY beg) - e AS gap
           |  FROM merged)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
           |  CAST(count(gap) AS BIGINT) AS n_gaps,
           |  CAST(coalesce(sum(gap), 0) AS BIGINT) AS idle_us,
           |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_idle_us
           |FROM gaps GROUP BY 1 ORDER BY user_id""".stripMargin),
    "All three windows partition on the user — one shuffle, one sort " +
      "per key timeline, rollup output. The complement read of the " +
      "q98 merge: outage auditing at 100 TB is the same single " +
      "exchange as sessionization.")

  /** q508 — S2+: FIXED-WIDTH text ingest (the COBOL/mainframe leg) —
    * a formula fixture laid out at fixed character offsets (id 6,
    * name 12 right-padded, qty 8, price 10 with 2dp, flag 1), read by
    * `openFixedWidth`, including a SHORT line (null tail columns) and
    * a junk-cast line (null long). The oracle replays the formula
    * plus the two edge rows. */
  val q508 = Declared(
    "q508_fixed_width_ingest", "S2+",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q508").toString
      def pad(v: String, n: Int): String = v.padTo(n, ' ')
      def lpad6(v: Long): String = {
        val t = v.toString; " " * (6 - t.length) + t
      }
      val lines = (0 until 120).map { i =>
        val price = String.format(java.util.Locale.ROOT, "%10.2f",
          Double.box((i * 7 % 90) + 0.25))
        lpad6(i.toLong) + pad(s"item$i", 12) + pad((i % 13).toString, 8) +
          price + (if (i % 3 == 0) "Y" else "N")
      } :+ (lpad6(999L) + "short") :+ // short: columns past 'name' null
        (lpad6(998L) + pad("badnumber", 12) + pad("notanum", 8) +
          pad("x.yz", 10) + "Z") // junk casts -> null qty/price
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/fw.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
      graft.io.Sources.openFixedWidth(s, s"$tmp/fw.txt", Seq(
          ("id", 1, 6, "long"), ("name", 7, 12, "string"),
          ("qty", 19, 8, "long"), ("price", 27, 10, "double"),
          ("flag", 37, 1, "string")))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"),
          sum(col("price")).as("sum_price"),
          count(col("id")).as("n_id"))
        .orderBy(col("flag"))
    },
    Some("""WITH r AS (
           |  SELECT i, i % 13 AS qty, (i * 7 % 90) + 0.25 AS price,
           |    CASE WHEN i % 3 = 0 THEN 'Y' ELSE 'N' END AS flag
           |  FROM generate_series(0, 119) t(i)),
           |base AS (
           |  SELECT flag, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(qty) AS BIGINT) AS sum_qty,
           |    sum(price) AS sum_price, CAST(count(*) AS BIGINT) AS n_id
           |  FROM r GROUP BY 1),
           |edge AS (
           |  -- short line: flag NULL, id 999, all else null;
           |  -- junk line: flag 'Z', id 998, qty/price null
           |  SELECT NULL AS flag, CAST(1 AS BIGINT) AS n,
           |    CAST(NULL AS BIGINT) AS sum_qty, CAST(NULL AS DOUBLE)
           |      AS sum_price, CAST(1 AS BIGINT) AS n_id
           |  UNION ALL
           |  SELECT 'Z', 1, NULL, NULL, 1)
           |SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM edge)
           |ORDER BY flag""".stripMargin),
    "It IS a text file: HDFS line splits parallelize it like any log, " +
      "and the column carving is a scan-side substring projection — " +
      "codegen, no UDF. The mainframe-extract edge of a lakehouse " +
      "migration at any scale.")

  /** q509 — T3+: DYNAMIC-GAP streaming session windows — error events
    * session under a 30-minute inactivity gap, everything else under
    * 10 minutes, in ONE `session_window(ts, gapCol)` stateful operator
    * keyed on (user, class). Batch oracle: per-class gaps-and-islands
    * with the same >= boundary convention and last-event + gap ends,
    * sealed a day before max event time. */
  val q509 = Declared(
    "q509_stream_dynamic_sessions", "T3+,T4",
    (s, dir) => {
      TimeSeries.streamEventsToTable(s, dir, "q509", mode = "append")(ev =>
        graft.streaming.StreamOps.sessionStatsDynamicGap(
          ev.withColumn("cls",
            when(col("event_type") === "error", lit("error"))
              .otherwise(lit("other"))),
          "ts", Seq("user_id", "cls"),
          gapCol = when(col("cls") === "error", lit("30 minutes"))
            .otherwise(lit("10 minutes")),
          watermark = "1 hour"))
        .filter(col("session_end") < lit("2024-01-30 00:00:00").cast("timestamp"))
        .orderBy(col("user_id"), col("cls"), col("session_start"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_id, ts,
           |    CASE WHEN event_type = 'error' THEN 'error' ELSE 'other' END
           |      AS cls,
           |    CASE WHEN event_type = 'error' THEN 1800000000
           |         ELSE 600000000 END AS gap
           |  FROM events),
           |marked AS (
           |  SELECT user_id, cls, ts, event_id, gap,
           |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= gap
           |         THEN 1 ELSE 0 END AS new_sess
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id, cls
           |    ORDER BY ts ASC, event_id ASC)),
           |numbered AS (
           |  SELECT user_id, cls, ts, gap,
           |    CAST(sum(new_sess) OVER (PARTITION BY user_id, cls
           |      ORDER BY ts ASC, event_id ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS session_no
           |  FROM marked)
           |SELECT min(ts) AS session_start,
           |  max(ts) + to_microseconds(max(gap)) AS session_end,
           |  user_id, cls, count(*) AS n_events
           |FROM numbered
           |GROUP BY user_id, cls, session_no
           |HAVING max(ts) + to_microseconds(max(gap))
           |  < TIMESTAMP '2024-01-30 00:00:00'
           |ORDER BY user_id, cls, session_start""".stripMargin),
    "One stateful operator holds BOTH session policies — state keys on " +
      "(user, class) and the gap column is evaluated per row, so adding " +
      "a policy is a CASE arm, not a second stream. Same watermark " +
      "eviction and shuffle shape as q103.")

  /** q510 — E7: MULTILINGUAL tokenization — zh documents decorated
    * with a deterministic CJK snippet tokenize as character BIGRAMS of
    * non-space runs (the delimiter-free-script IR fallback), everything
    * else on whitespace; per-language token counts and distinct-token
    * counts. One scan, rule picked per row by the lang column. */
  val q510 = {
    val snip = "深度学习 模型训练" // two runs: 4 chars + 4 chars
    Declared(
      "q510_multilingual_tokens", "E7",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("__t",
            when(col("lang") === "zh", concat(col("text"), lit(" " + snip)))
              .otherwise(col("text")))
          .withColumn("__toks", graft.ext.TextAnalysis.tokensMultilingual(
            col("__t"), col("lang")))
        docs.select(col("lang"), explode(col("__toks")).as("tok"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("n_distinct"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH d AS (
           |  SELECT lang,
           |    CASE WHEN lang = 'zh' THEN text || ' $snip' ELSE text END AS t
           |  FROM documents),
           |runs AS (
           |  SELECT lang,
           |    list_filter(regexp_split_to_array(lower(t), '\\s+'),
           |      x -> x <> '') AS rs
           |  FROM d),
           |toks AS (
           |  SELECT lang, unnest(CASE WHEN lang IN ('zh', 'ja', 'ko')
           |    THEN flatten(list_transform(rs, r ->
           |      CASE WHEN length(r) = 1 THEN [r]
           |        ELSE list_transform(range(1, length(r)),
           |          i -> substring(r, CAST(i AS INT), 2)) END))
           |    ELSE rs END) AS tok
           |  FROM runs)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
           |  CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
           |FROM toks GROUP BY 1 ORDER BY lang""".stripMargin),
      "Tokenization stays scan-side (split/transform/flatten column " +
        "ops); the per-row language dispatch costs one when(). The " +
        "mixed-script corpus tokenizes in ONE pass at any scale — no " +
        "per-language job fan-out.")
  }

  /** q511 — E7/E6: LOG TEMPLATE MINING — event rows rendered as log
    * lines (type, id, latency, user, a hex token), masked to templates
    * by the deterministic UUID/HEX/IP/digit-run chain, template
    * rollup = the miner. The observability reflex of every ops
    * pipeline, exact and engine-replayable. */
  val q511 = Declared(
    "q511_log_templates", "E7,E6",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("__msg", concat(
          col("event_type"), lit(" id="), col("event_id"),
          lit(" took "), floor(col("value") * 10).cast("long"), lit("ms"),
          lit(" user="), col("user_id"),
          lit(" trace="), md5(col("event_id").cast("string"))))
        .withColumn("__tpl", graft.ext.TextAnalysis.logTemplate(col("__msg")))
      ev.groupBy(col("__tpl").as("template"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("template"))
    },
    Some("""WITH msg AS (
           |  SELECT user_id,
           |    event_type || ' id=' || event_id || ' took ' ||
           |    CAST(CAST(floor(value * 10) AS BIGINT) AS VARCHAR) || 'ms' ||
           |    ' user=' || user_id || ' trace=' ||
           |    md5(CAST(event_id AS VARCHAR)) AS m
           |  FROM events),
           |tpl AS (
           |  SELECT user_id,
           |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(m,
           |      '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
           |      '<UUID>', 'g'),
           |      '\b[0-9a-fA-F]{8,}\b', '<HEX>', 'g'),
           |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
           |      '<IP>', 'g'),
           |      '[0-9]+', '<N>', 'g') AS template
           |  FROM msg)
           |SELECT template, CAST(count(*) AS BIGINT) AS n,
           |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM tpl GROUP BY 1 ORDER BY template""".stripMargin),
    "Masking is one scan-side regexp chain; the miner is a " +
      "template-keyed agg with map-side combine — vocabulary-bounded " +
      "output. 100 TB of logs reduce to their templates in one pass, " +
      "the shape every observability pipeline runs first.")

  val all: Seq[Declared] = Seq(q491, q493, q494, q495, q496, q497, q498,
    q500, q501, q502, q503, q504, q505, q506, q507, q508, q509, q510,
    q511)
}
