package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline evaluation metrics — the measurement side of a training-data
  * pipeline: did the quality score actually separate good from bad
  * (AUC, lift), did retrieval return the right neighbours (P@k / R@k /
  * MRR), did the classifier's per-class errors stay balanced
  * (precision/recall/F1)? The reference has no evaluation layer at all
  * (its pipelines end at aggregation — `/root/reference/src/
  * data_preprocessing.py` ends in buffer stats); these are the ops a
  * user curating 100 TB of training data runs right after every gate
  * in `graft.ext.Curation` to know whether the gate worked.
  *
  * Exactness discipline (see SURVEY §7.5): every decision quantity is
  * integer — doubled ranks for AUC (the [[Aggregates.mannWhitneyU]]
  * trick), ppm quotients via integer `div` for ratios — so a second
  * engine reproduces each metric bit-for-bit, not approximately. */
object Evaluation {

  // by-design plan-hazard documentation (Guardrails.expect): the lift
  // windows run over the |bins|-row decile rollup (globalRowNumber does
  // the fact-scale ranking) — bounded by the bin count.
  graft.plans.Guardrails.expect("single_partition_window",
    "cum_n, cum_pos", "decileLift: |bins|-row cumulative rollup",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__tn, __tp", "decileLift: 1-row totals over the bin rollup",
    "k-literal")
  graft.plans.Guardrails.expect("single_partition_window",
    "__d, __c", "rankBiasedOverlap: depth-bounded prefix cumsum (D rows)",
    "k-literal")


  private val d38 = "decimal(38,0)"

  /** A-stat — exact ROC AUC of a score against a binary label, per
    * group: the probability a random positive outranks a random
    * negative. Kept integral with DOUBLED pair counts,
    *   u2 = Σ_s pos_s · (2·negBelow_s + neg_s)  = 2·#(pos>neg) + #ties,
    * accumulated over the DISTINCT-SCORE rollup (never the fact
    * table), so AUC = u2 / (2·n_pos·n_neg) is one IEEE division of
    * exact integers. Groups with no positives or no negatives get
    * auc null (undefined, not 0). Returns
    * (…groups, n_pos, n_neg, u2, auc).
    *
    * Scale: one (group, score) agg with map-side combine → a
    * rollup-sized ordered window partitioned by group → a group-sized
    * final agg. Shuffle volume ≤ |groups|·|distinct scores|. */
  def aucExact(df: DataFrame, groupKeys: Seq[Column], scoreCol: Column,
      labelCol: Column): DataFrame = {
    val base = df.select(groupKeys :+ scoreCol.as("__s") :+
      labelCol.cast("long").as("__y"): _*)
    val gNames = base.columns.dropRight(2).toSeq
    val perS = base.groupBy((gNames :+ "__s").map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col("__y")).as("__pos"))
      .withColumn("__neg", col("__cnt") - col("__pos"))
    val w = if (gNames.isEmpty) Window.orderBy(col("__s"))
      else Window.partitionBy(gNames.map(col): _*).orderBy(col("__s"))
    val negBelow = coalesce(sum(col("__neg")).over(
      w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val grouped =
      if (gNames.isEmpty) perS.withColumn("__nb", negBelow).groupBy()
      else perS.withColumn("__nb", negBelow).groupBy(gNames.map(col): _*)
    grouped
      .agg(sum(col("__pos")).cast("long").as("n_pos"),
        sum(col("__neg")).cast("long").as("n_neg"),
        sum(col("__pos").cast(d38) *
          (lit(2) * col("__nb") + col("__neg")).cast(d38)).cast("long").as("u2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast("double") /
            (lit(2).cast(d38) * col("n_pos").cast(d38) * col("n_neg").cast(d38))
              .cast("double")))
  }

  /** A-stat — per-query retrieval quality of a ranked run against a
    * relevance set: hits@k, precision@k, recall@k and the reciprocal
    * rank, all in exact ppm (integer `div`). `runs` is
    * (query_id, item_id, rank) with rank 1-based and ≤ k per query;
    * `truth` is the relevant (query_id, item_id) pairs (its per-query
    * count is the recall denominator — items never retrieved still
    * count against recall). Queries present in `truth` but absent
    * from `runs` surface with zero hits; recall_ppm is null when a
    * query has no relevant items at all.
    *
    * Scale: one equi-join runs⋈truth on (query, item) + two
    * query-keyed aggs — run-sized, never corpus-sized; the truth
    * rollup is reused for both the join and the denominators. */
  def retrievalEval(runs: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val r = runs.select(col("query_id"), col("item_id"), col("rank"))
      .filter(col("rank") <= k)
    val t = truth.select(col("query_id"), col("item_id"))
    val nRel = t.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val hits = r.join(t, Seq("query_id", "item_id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("hits"), min(col("rank")).as("__first"))
    nRel.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("__first"), lit(0L)).as("first_hit_rank"))
      .withColumn("prec_ppm", expr(s"1000000 * hits div $k"))
      .withColumn("rec_ppm",
        when(col("n_rel") > 0, expr("1000000 * hits div n_rel")))
      .withColumn("rr_ppm",
        when(col("first_hit_rank") > 0,
          expr("1000000 div first_hit_rank")).otherwise(lit(0L)))
  }

  /** A-stat — Mean-Average-Precision companion to [[retrievalEval]]:
    * per query, AP@k = Σ_{i≤k, hit at i} P@i / min(|rel|, k) — the
    * rank-sensitive retrieval quality number (a hit at rank 1 counts
    * full, at rank k barely). Each hit's P@i = hits_so_far/i is
    * micro-quantized (one IEEE division of exact integers per HIT), so
    * the per-query sum is a plain long aggregation; the final division
    * is a pinned finish. Queries with no relevant items report ap
    * null. Returns (query_id, n_rel, hits, ap).
    *
    * Scale: the cumulative-hits window partitions by query over the
    * top-k run rows (≤ k per query) — never the corpus; truth joins
    * as a left-semi mark on (query, item). */
  def mapAtK(runs: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val r = runs.select(col("query_id"), col("item_id"), col("rank"))
      .filter(col("rank") <= k)
    val t = truth.select(col("query_id"), col("item_id"))
    val nRel = t.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val marked = r.join(t.withColumn("__rel", lit(1L)),
        Seq("query_id", "item_id"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
      .withColumn("__hits_i", sum(col("__rel")).over(
        Window.partitionBy(col("query_id")).orderBy(col("rank"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__term_u", when(col("__rel") === 1,
        round(lit(1e6) * col("__hits_i").cast("double") /
          col("rank").cast("double"), 0).cast("long")).otherwise(0L))
    val perQ = marked.groupBy(col("query_id"))
      .agg(sum(col("__rel")).as("hits"), sum(col("__term_u")).as("__apsum"))
    nRel.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(col("n_rel") > 0, round(
          coalesce(col("__apsum"), lit(0L)).cast("double") /
            least(col("n_rel"), lit(k.toLong)).cast("double") / 1e6, 6))
          .as("ap"))
  }

  /** A-stat — per-class precision / recall / F1 of a multiclass
    * prediction, in exact ppm: the per-class readout of the q47
    * confusion matrix. F1 avoids the harmonic-mean float entirely via
    * the identity F1 = 2·tp / (2·tp + fp + fn) — one integer `div` in
    * ppm. Classes are the UNION of observed labels and predictions
    * (a class never predicted still shows recall; a hallucinated
    * class shows precision 0); metrics with a zero denominator are
    * null. Returns (class, n_true, n_pred, tp, fp, fn, prec_ppm,
    * rec_ppm, f1_ppm).
    *
    * Scale: one (label, pred) agg — confusion-sized — then two
    * |classes|-row rollups joined back; never data-sized. */
  def classMetrics(df: DataFrame, labelCol: Column,
      predCol: Column): DataFrame = {
    val cells = df.groupBy(labelCol.as("__l"), predCol.as("__p"))
      .agg(count(lit(1)).as("__n"))
    val byTrue = cells.groupBy(col("__l").as("class"))
      .agg(sum(col("__n")).as("n_true"))
    val byPred = cells.groupBy(col("__p").as("class"))
      .agg(sum(col("__n")).as("n_pred"))
    val tp = cells.filter(col("__l") === col("__p"))
      .select(col("__l").as("class"), col("__n").as("tp"))
    byTrue.join(byPred, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("prec_ppm",
        when(col("n_pred") > 0, expr("1000000 * tp div n_pred")))
      .withColumn("rec_ppm",
        when(col("n_true") > 0, expr("1000000 * tp div n_true")))
      .withColumn("f1_ppm",
        when(col("tp") + col("fp") + col("fn") > 0,
          expr("2000000 * tp div (2 * tp + fp + fn)")))
  }

  /** A-stat — cumulative gains / lift table: rank the population by a
    * score (descending, under a caller-supplied TOTAL tie-break
    * order), cut it into `nBins` equal-frequency bins by the EXACT
    * distributed global rank ([[Ranking.globalRowNumber]] — no
    * single-partition window), and report per bin how much of the
    * positive class the top of the ranking captures:
    *   capture_ppm = 10⁶ · cum_pos div total_pos,
    *   lift_ppm    = 10⁶ · cum_pos·N div (cum_n·total_pos)
    * (lift 10⁶ = no better than random). The "would sorting by this
    * quality score concentrate the good documents?" audit. Returns
    * (bin, n, n_pos, cum_n, cum_pos, capture_ppm, lift_ppm).
    *
    * Scale: the fact table is touched once (range repartition + local
    * sort); windows run over the nBins-row rollup. */
  def decileLift(df: DataFrame, orderCols: Seq[Column], labelCol: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    // orderCols may be sort orders (.desc) — rank over the full frame
    // rather than projecting them (sort expressions don't project).
    // __total rides in from the offsets rollup of the ranking itself —
    // NOT an unbounded window over the fact table (that was a
    // SinglePartition exchange of every row, the exact hazard this
    // module documents against).
    val withN = Ranking.globalRowNumberWithTotal(
      df.withColumn("__y", labelCol.cast("long")), orderCols,
      totalCol = Some("__total"))
      .withColumn("bin", expr(s"(row_num - 1) * $nBins div __total"))
    val bins = withN.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val n = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .withColumn("__tn", sum(col("n")).over(n))
      .withColumn("__tp", sum(col("n_pos")).over(n))
      .withColumn("capture_ppm",
        when(col("__tp") > 0, expr("1000000 * cum_pos div __tp")))
      .withColumn("lift_ppm",
        when(col("__tp") > 0,
          // IntegralDivide on decimal(38,0) operands → exact BIGINT
          expr("(cast(1000000 as decimal(38,0)) * cum_pos * __tn)" +
            " div (cast(cum_n as decimal(38,0)) * __tp)")))
      .drop("__tn", "__tp")
  }

  /** Calibration audit (reliability bins + expected calibration
    * error; Naeini et al. AAAI'15 popularized ECE — public
    * literature): does a confidence score MEAN what it says? Bin rows
    * by confidence (ppm, `bins` equal-width bins of [0, 1]), compare
    * each bin's mean confidence against its realized positive rate,
    * and weight the absolute gaps into one number. The standard audit
    * of quality/filter scores before they gate a corpus, and of LLM
    * judge confidences before they route data.
    *
    * Fully integer: confidence arrives in exact ppm, bin means and
    * rates are integer `div` quotients, ECE is the count-weighted
    * integer gap sum — bit-identical on any engine/partitioning.
    *
    * Returns one row per non-empty bin: (bin, n, mean_conf_ppm,
    * rate_ppm, gap_ppm, ece_ppm) — ece_ppm is the dataset-level
    * constant repeated per row.
    *
    * Scale: one bin-keyed agg over the fact table (map-side combine,
    * ≤ `bins` groups) + a broadcast-back of the scalar ECE. */
  def calibrationBins(df: DataFrame, confPpmCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need >= 2 bins")
    val binned = df.select(
        confPpmCol.cast("long").as("__conf"),
        labelCol.cast("long").as("__y"))
      .withColumn("bin",
        expr(s"least(${bins - 1}L, (__conf * $bins) div 1000000L)"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(col("__conf")).as("__sc"),
        sum(col("__y")).as("__sy"))
      .withColumn("mean_conf_ppm", expr("__sc div n"))
      .withColumn("rate_ppm", expr("(__sy * 1000000L) div n"))
      .withColumn("gap_ppm", abs(col("mean_conf_ppm") - col("rate_ppm")))
      .localCheckpoint() // ≤ bins rows; read by the ECE rollup + output
    val ece = binned.agg(
      expr("sum(n * gap_ppm) div sum(n)").as("ece_ppm"))
    binned.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("mean_conf_ppm"), col("rate_ppm"),
        col("gap_ppm"), col("ece_ppm"))
  }

  /** Bradley-Terry strength estimation (Bradley & Terry 1952; the
    * minorization-maximization update from Hunter 2004 — public
    * literature) over pairwise win/loss records: the aggregation step
    * that turns "A beat B" preference data — LLM judge votes, arena
    * battles, interleaving clicks — into a single strength ranking.
    *   p_i ← w_i / Σ_j n_ij / (p_i + p_j)
    *
    * Determinism contract: strengths live in integer micro-units;
    * each round's pair term is `round(n·10¹² / (p_i+p_j))` (one
    * correctly-rounded double divide of integer-valued operands —
    * identical on any engine), summed as integers, and the update is
    * an exact integral divide. Fixed `iters` rounds, no convergence
    * test — the whole trajectory replays bit-for-bit in an
    * unrolled-CTE oracle.
    *
    * Returns (item, games, wins, strength_u, share_ppm) — share is
    * strength normalized over items.
    *
    * Scale: the game log reduces once to the pair matrix (bounded by
    * items², usually far sparser); every round is pair-matrix-sized —
    * two item-keyed joins + one item-keyed sum. 10⁹ games over 10³
    * items iterate on ≤ 10⁶ pair rows regardless of log size. */
  def bradleyTerry(games: DataFrame, winnerCol: Column, loserCol: Column,
      iters: Int = 3, unit: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val g = games.select(winnerCol.cast("long").as("__w"),
      loserCol.cast("long").as("__l")).filter(col("__w") =!= col("__l"))
    // collapse the game log ONCE to directed pair counts — wins and
    // the undirected matrix both derive from it, so the (possibly
    // join-heavy) game generation upstream is evaluated exactly once
    val dp = g.groupBy(col("__w"), col("__l")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val np = dp.select(least(col("__w"), col("__l")).as("i"),
        greatest(col("__w"), col("__l")).as("j"), col("__c"))
      .groupBy(col("i"), col("j")).agg(sum(col("__c")).as("n"))
      .localCheckpoint() // pair matrix: read twice per round
    val wins = dp.groupBy(col("__w").as("item")).agg(sum(col("__c")).as("wins"))
    val items = np.select(explode(array(
        struct(col("i").as("item"), col("n")),
        struct(col("j").as("item"), col("n")))).as("e"))
      .select(col("e.item").as("item"), col("e.n").as("n"))
      .groupBy(col("item")).agg(sum(col("n")).as("games"))
      .join(wins, Seq("item"), "left")
      .select(col("item"), col("games"), coalesce(col("wins"), lit(0L)).as("wins"))
      .localCheckpoint() // node-sized; read every round + at finish
    // The per-round strength frame is ITEM-sized while np is PAIR-sized
    // (up to items²): broadcasting the former keeps the pair matrix
    // from being re-shuffled twice per round (opt guide §3.1 — the
    // checkpoint erased the stats that would have let Catalyst choose
    // this itself). Count-gated on the already-materialized items frame
    // (the q497 discipline): above the gate — strengths too big to
    // ship — every join falls back to the sort-merge plan unchanged.
    val broadcastable = items.count() <= graft.core.Gates.BcastRowsMax
    def side(df: DataFrame): DataFrame = if (broadcastable) broadcast(df) else df
    var p = items.select(col("item"), lit(unit).as("p_u"))
    var r = 0
    while (r < iters) {
      val d = np
        .join(side(p.select(col("item").as("i"), col("p_u").as("__pi"))), "i")
        .join(side(p.select(col("item").as("j"), col("p_u").as("__pj"))), "j")
        .withColumn("__d", round(col("n").cast("double") * 1e12 /
          greatest(lit(1L), col("__pi") + col("__pj")).cast("double"), 0)
          .cast("long"))
      val dsum = d.select(explode(array(
          struct(col("i").as("item"), col("__d")),
          struct(col("j").as("item"), col("__d")))).as("e"))
        .select(col("e.item").as("item"), col("e.__d").as("__d"))
        .groupBy(col("item"))
        .agg(sum(col("__d").cast("decimal(38,0)")).as("__D"))
      p = items.join(side(dsum), Seq("item"))
        .select(col("item"),
          expr("(cast(wins as decimal(38,0)) * 1000000000000)" +
            " div greatest(cast(1 as decimal(38,0)), __D)").as("p_u"))
        .localCheckpoint() // node-sized round snapshot
      r += 1
    }
    val tot = p.agg(sum(col("p_u").cast("decimal(38,0)")).as("__tot"))
    items.join(side(p), Seq("item")).crossJoin(broadcast(tot))
      .select(col("item"), col("games"), col("wins"),
        col("p_u").as("strength_u"),
        expr("(cast(p_u as decimal(38,0)) * 1000000)" +
          " div greatest(cast(1 as decimal(38,0)), __tot)").as("share_ppm"))
  }

  /** A-stat — Cohen's κ inter-rater agreement over two nominal label
    * columns: chance-corrected agreement, THE metric for deciding
    * whether two annotation passes (two labeling prompts, a heuristic
    * vs a model, two human raters) agree beyond what marginal label
    * frequencies force. Cleared of fractions,
    *   κ = (N·Σ_l o_ll − Σ_l r_l·c_l) / (N² − Σ_l r_l·c_l),
    * all exact DECIMAL(38,0); κ, p_o, p_e are pinned IEEE finishes of
    * the same exact operands. Returns one row:
    * (n, n_agree, p_o, p_e, kappa).
    *
    * Scale: one (a, b) contingency agg with map-side combine, two
    * label-sized marginal rollups of IT, a scalar finish — the fact
    * table is read once, shuffled at contingency grain. */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val obs = df.groupBy(raterA.as("__a"), raterB.as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rm = obs.groupBy(col("__a")).agg(sum(col("__o")).as("__ra"))
    val cm = obs.groupBy(col("__b")).agg(sum(col("__o")).as("__cb"))
    val pe = rm.join(cm, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra").cast(d38) * col("__cb").cast(d38)),
        lit(0).cast(d38)).cast(d38).as("__rc"))
    val agree = obs.agg(sum(col("__o")).cast(d38).as("__n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__o"))), lit(0L))
        .cast(d38).as("__d"))
    agree.crossJoin(broadcast(pe))
      .select(col("__n").cast("long").as("n"),
        col("__d").cast("long").as("n_agree"),
        round(col("__d").cast("double") / col("__n").cast("double"), 6)
          .as("p_o"),
        round(col("__rc").cast("double") /
          (col("__n") * col("__n")).cast("double"), 6).as("p_e"),
        round((col("__n") * col("__d") - col("__rc")).cast("double") /
          (col("__n") * col("__n") - col("__rc")).cast("double"), 6)
          .as("kappa"))
  }

  /** A-stat — Krippendorff's α (nominal, two raters with abstentions;
    * Krippendorff, "Content Analysis", public literature): the
    * agreement coefficient that HANDLES MISSING RATINGS — units where
    * either rater abstained (null) drop from the pairable set, and
    * chance agreement comes from the pooled value distribution of the
    * remaining ratings, not per-rater marginals (the κ difference).
    * With two raters every pairable unit contributes the two ordered
    * rating pairs, so
    *   α = 1 − (n−1)·D_o / (n² − Σ_v n_v²),  D_o = 2·#disagreeing units
    * with n = 2·#pairable units and n_v pooled value counts — all
    * exact integers, one IEEE finish. Returns one row:
    * (n_units, n_values, do_num, de_num, alpha).
    *
    * Scale: one unit-grain projection, one value-sized rollup of the
    * pooled ratings, a scalar finish. */
  def krippendorffAlpha(df: DataFrame, raterA: Column,
      raterB: Column): DataFrame = {
    val pairable = df.select(raterA.as("__a"), raterB.as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val pooled = pairable.select(col("__a").as("__v"))
      .unionAll(pairable.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__nv"))
    val vals = pooled.agg(count(lit(1)).as("n_values"),
      sum(col("__nv")).cast(d38).as("__n"),
      sum(col("__nv").cast(d38) * col("__nv").cast(d38)).cast(d38).as("__sq"))
    val dis = pairable.agg(count(lit(1)).as("n_units"),
      (sum(when(col("__a") =!= col("__b"), 1L).otherwise(0L)) * 2)
        .cast(d38).as("__do"))
    dis.crossJoin(broadcast(vals))
      .select(col("n_units"), col("n_values"),
        col("__do").cast("long").as("do_num"),
        (col("__n") * col("__n") - col("__sq")).cast("long").as("de_num"),
        round(lit(1.0) - ((col("__n") - 1) * col("__do")).cast("double") /
          (col("__n") * col("__n") - col("__sq")).cast("double"), 6)
          .as("alpha"))
  }

  /** A-stat — Fleiss' kappa (Fleiss, Psych. Bulletin 1971 — public
    * literature): chance-corrected agreement when EVERY item is rated
    * by the same number `nRaters` of (anonymous, interchangeable)
    * raters — the multi-rater generalization [[cohensKappa]]'s two-rater
    * contingency can't express. Items with a rating count ≠ nRaters
    * are dropped (the classic estimator is undefined for them).
    *   P̄  = (Σ_ij n_ij² − N·n) / (N·n·(n−1))
    *   P̄e = Σ_j c_j² / (N·n)²       κ = (P̄ − P̄e) / (1 − P̄e)
    * Everything up to the readout is exact DECIMAL(38,0) integer
    * arithmetic (fraction-cleared as in [[graft.ops.Aggregates.cochranQ]]);
    * the three reported ratios are single correctly-rounded double
    * divisions of identical integer operands on any engine. All raters
    * agreeing on one category for every item → P̄e = 1 → null kappa
    * (0/0), the [[graft.ops.Aggregates.linearFit2Exact]] singular
    * convention. Returns one row:
    * (n_items, n_raters, p_bar, p_e, kappa).
    *
    * Scale: an item-grain size filter (semi-join), one (item, category)
    * cell agg and two bounded rollups — map-side combine end to end;
    * nothing wider than the cell frame ever shuffles. */
  def fleissKappa(ratings: DataFrame, itemCol: Column, categoryCol: Column,
      nRaters: Int): DataFrame = {
    require(nRaters >= 2, "fleissKappa needs >= 2 raters per item")
    val d38 = "decimal(38,0)"
    val sized = ratings.groupBy(itemCol.as("__i"))
      .agg(count(lit(1)).as("__nr"))
      .filter(col("__nr") === nRaters)
      .select(col("__i"))
    val kept = ratings.select(itemCol.as("__i"), categoryCol.as("__cat"))
      .join(sized, Seq("__i"), "left_semi")
    val s2 = kept.groupBy(col("__i"), col("__cat"))
      .agg(count(lit(1)).as("__nij"))
      .agg(sum(col("__nij").cast(d38) * col("__nij").cast(d38)).cast(d38)
        .as("__s2"), count_distinct(col("__i")).cast(d38).as("__ni"))
    val sc2 = kept.groupBy(col("__cat")).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c").cast(d38) * col("__c").cast(d38)).cast(d38)
        .as("__sc2"))
    val nn = col("__ni") * nRaters
    val pbarNum = (col("__s2") - nn).cast(d38)
    val pbarDen = (nn * (nRaters - 1)).cast(d38)
    val nn2 = (nn * nn).cast(d38)
    s2.crossJoin(broadcast(sc2))
      .select(col("__ni").cast("long").as("n_items"),
        lit(nRaters.toLong).as("n_raters"),
        round(pbarNum.cast("double") / pbarDen.cast("double"), 6).as("p_bar"),
        round(col("__sc2").cast("double") / nn2.cast("double"), 6).as("p_e"),
        when((nn2 - col("__sc2")) =!= lit(0).cast(d38), round(
          (pbarNum * nn2 - pbarDen * col("__sc2")).cast("double") /
            (pbarDen * (nn2 - col("__sc2"))).cast("double"), 6))
          .as("kappa"))
  }

  /** A-stat — Murphy decomposition of the Brier score (Murphy, J.
    * Applied Meteorology 1973 — public literature) over K confidence
    * bins: BRIER ≈ RELIABILITY − RESOLUTION + UNCERTAINTY, i.e.
    *   REL = Σ_k n_k(conf̄_k − rate_k)²/N   (calibration error — want 0)
    *   RES = Σ_k n_k(rate_k − ȳ)²/N        (discrimination — want big)
    *   UNC = ȳ(1 − ȳ)                      (irreducible base rate)
    * — the readout that tells you whether a judge score is bad because
    * it's MISCALIBRATED (fixable by remapping, q227's ECE view) or
    * because it doesn't SEPARATE classes at all (not fixable without a
    * better judge). Complements [[calibrationBins]] on the same input.
    *
    * Determinism contract: the exact Brier sum and all bin stats are
    * integers; bin means are ppm-QUANTIZED (integral div — documented
    * ≤1 ppm bias vs the rational form) before the squared-gap sums, so
    * every engine computes identical DECIMAL(38,0) terms. All outputs
    * in ppm² microprobability units (1e12 = probability 1).
    * Returns one row: (n, y_bar_ppm, brier_ppm2, reliability_ppm2,
    * resolution_ppm2, uncertainty_ppm2).
    *
    * Scale: one K-group agg over the fact table with map-side combine
    * + two passes over the K-row rollup. */
  def brierDecomposition(df: DataFrame, confPpmCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need >= 2 bins")
    val d38 = "decimal(38,0)"
    val diff = col("__conf") - col("__y") * 1000000L
    val binned = df.select(confPpmCol.cast("long").as("__conf"),
        labelCol.cast("long").as("__y"))
      .withColumn("__bin",
        expr(s"least(${bins - 1}L, (__conf * $bins) div 1000000L)"))
      .groupBy(col("__bin")).agg(
        count(lit(1)).as("__n"), sum(col("__conf")).as("__sc"),
        sum(col("__y")).as("__sy"),
        sum(diff.cast(d38) * diff.cast(d38)).cast(d38).as("__sq"))
      .withColumn("__mc", expr("__sc div __n"))
      .withColumn("__r", expr("(__sy * 1000000L) div __n"))
      .localCheckpoint() // ≤ bins rows; totals + both gap sums read it
    // names stay DISJOINT from binned's even case-insensitively — Spark
    // resolves case-insensitively, so __N vs __n would be ambiguous
    val tot = binned.agg(sum(col("__n")).as("__tn"), sum(col("__sy")).as("__tsy"),
      sum(col("__sq")).cast(d38).as("__tsq"))
      .withColumn("__ybar", expr("(__tsy * 1000000L) div __tn"))
    binned.crossJoin(broadcast(tot))
      .agg(max(col("__tn")).as("__n2"), max(col("__ybar")).as("__yb"),
        max(col("__tsq")).as("__sq2"),
        sum(col("__n").cast(d38) * (col("__mc") - col("__r")).cast(d38) *
          (col("__mc") - col("__r")).cast(d38)).cast(d38).as("__rel"),
        sum(col("__n").cast(d38) * (col("__r") - col("__ybar")).cast(d38) *
          (col("__r") - col("__ybar")).cast(d38)).cast(d38).as("__res"))
      // integral div (truncating), NOT decimal '/', which Spark rounds
      // half-up at result scale and would disagree with the oracle's //
      .select(col("__n2").as("n"), col("__yb").as("y_bar_ppm"),
        expr("__sq2 div __n2").as("brier_ppm2"),
        expr("__rel div __n2").as("reliability_ppm2"),
        expr("__res div __n2").as("resolution_ppm2"),
        (col("__yb") * (lit(1000000L) - col("__yb"))).as("uncertainty_ppm2"))
  }

  /** A-stat/ML — one-pass binary-classifier diagnostics from boolean
    * (prediction, label) pairs: the 2×2 confusion cells plus the
    * derived rates a class-imbalanced eval actually needs —
    * sensitivity, specificity, Youden's J (J = sens + spec − 1,
    * Youden 1950), balanced accuracy and Matthews correlation (MCC,
    * Matthews 1975; all public literature). Plain accuracy and F1 both
    * mislead at skewed base rates; MCC is the one single number that
    * doesn't.
    *
    * Exactness: cells are one conditional-sum agg; rates are ppm
    * integral quotients; MCC's numerator tp·tn − fp·fn is exact
    * DECIMAL(38,0) and the denominator is ONE sqrt of an exact
    * product — a pinned two-op double finish. Degenerate margins
    * (any factor zero) → null MCC, the 0/0 convention. Returns one
    * row: (tp, fp, fn, tn, sens_ppm, spec_ppm, youden_j_ppm,
    * balanced_acc_ppm, mcc). */
  def binaryDiagnostics(df: DataFrame, predCond: Column,
      labelCond: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.agg(
      sum(when(predCond && labelCond, 1L).otherwise(0L)).as("tp"),
      sum(when(predCond && !labelCond, 1L).otherwise(0L)).as("fp"),
      sum(when(!predCond && labelCond, 1L).otherwise(0L)).as("fn"),
      sum(when(!predCond && !labelCond, 1L).otherwise(0L)).as("tn"))
    val den = (col("tp") + col("fp")).cast(d38) *
      (col("tp") + col("fn")).cast(d38) *
      (col("tn") + col("fp")).cast(d38) * (col("tn") + col("fn")).cast(d38)
    cells
      .withColumn("sens_ppm", expr("(tp * 1000000L) div (tp + fn)"))
      .withColumn("spec_ppm", expr("(tn * 1000000L) div (tn + fp)"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        col("sens_ppm"), col("spec_ppm"),
        (col("sens_ppm") + col("spec_ppm") - 1000000L).as("youden_j_ppm"),
        expr("(sens_ppm + spec_ppm) div 2L").as("balanced_acc_ppm"),
        when(den =!= lit(0).cast(d38), round(
          (col("tp").cast(d38) * col("tn").cast(d38) -
            col("fp").cast(d38) * col("fn").cast(d38)).cast("double") /
            sqrt(den.cast("double")), 6)).as("mcc"))
  }

  /** pass@k — the unbiased estimator from the code-generation
    * evaluation literature (Chen et al., "Evaluating Large Language
    * Models Trained on Code", 2021 — public):
    *   pass@k = 1 − C(n−c, k)/C(n, k)
    * per task with n samples and c correct, estimated WITHOUT the
    * biased "any of first k" shortcut. The binomial ratio evaluates
    * as the ordered product Π_{i=0..k−1} (n−c−i)/(n−i) — an
    * index-order IEEE fold both engines replay identically (the q44
    * fold discipline); a task with n−c < k has some factor ≤ 0,
    * clamped to product 0 → pass@k = 1 exactly.
    *
    * Per task: (task, n, c, pass_nano). The corpus mean is the
    * integer average of the nano-quantized per-task values —
    * reduce-order-independent. Tasks with n < k are EXCLUDED (the
    * estimator is undefined); the summary counts them.
    * Returns per task plus one '(all)' summary row (task = null):
    * (task, n, c, pass_nano).
    *
    * Scale: one task-grain agg with map-side combine; the fold is k
    * scalar steps per TASK row, not per sample. */
  def passAtK(df: DataFrame, taskCol: Column, correctCond: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val perTask = df.groupBy(taskCol.cast("long").as("task")).agg(
      count(lit(1)).as("n"),
      sum(when(correctCond, 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= k)
      .withColumn("__prod", expr(
        s"""aggregate(sequence(0, ${k - 1}),
           |  CAST(1.0 AS DOUBLE),
           |  (acc, i) -> CASE WHEN n - c - i <= 0 THEN CAST(0.0 AS DOUBLE)
           |    ELSE acc * (CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE))
           |    END)""".stripMargin))
      .withColumn("pass_nano",
        round((lit(1.0) - col("__prod")) * 1e9, 0).cast("long"))
      .select(col("task"), col("n"), col("c"), col("pass_nano"))
      .localCheckpoint() // task grain; summary + output read it
    val summary = perTask.agg(
      lit(null).cast("long").as("task"),
      count(lit(1)).as("n"), // n = number of SCORED tasks in the summary
      sum(col("c")).as("c"),
      expr("sum(pass_nano) div count(1)").as("pass_nano"))
    perTask.unionByName(summary)
  }

  /** RANK-BIASED OVERLAP (Webber, Moffat & Zobel, TOIS 2010 — public
    * literature), truncated at `depth`: similarity of two RANKED lists
    * with geometric top-weighting,
    *   RBO@D = (1−p) · Σ_{d=1..D} p^{d−1} · |A_d ∩ B_d| / d
    * — the ranking-regression readout (did the new retriever/ranker
    * actually change what users see?) where Kendall/Spearman weight
    * rank 1 and rank 1000 equally.
    *
    * Determinism contract: prefix-intersection sizes x_d come from the
    * exact identity x_d = #{items in both runs with max(rank_A,
    * rank_B) ≤ d} (a rollup over m = max rank + a cumulative sum —
    * never D passes); each depth's weight (1−p)·p^{d−1} is a LITERAL
    * double baked per depth (the shortest-repr round trip makes the
    * oracle's literals bit-identical), each term nano-quantizes after
    * one pinned multiply-divide, and the sum is integer. Returns one
    * row: (depth, n_common, rbo_nano).
    *
    * Scale: one equi-join of the two runs on the item id + a
    * depth-bounded rollup; D is a constant. */
  def rankBiasedOverlap(runA: DataFrame, runB: DataFrame, idCol: String,
      rankCol: String, p: Double, depth: Int): DataFrame = {
    require(p > 0 && p < 1, "p in (0,1)")
    require(depth >= 1 && depth <= 100, "depth in [1, 100]")
    val a = runA.select(col(idCol).as("__id"), col(rankCol).as("__ra"))
      .filter(col("__ra") <= depth)
    val b = runB.select(col(idCol).as("__id"), col(rankCol).as("__rb"))
      .filter(col("__rb") <= depth)
    val m = a.join(b, "__id")
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
      .groupBy(col("__m")).agg(count(lit(1)).as("__c"))
    // x_d for every d in 1..depth via a densified frame + cumsum
    val spark = runA.sparkSession
    val frame = spark.range(1, depth + 1).select(col("id").as("__d"))
    val xd = frame.join(m, col("__m") === col("__d"), "left")
      .select(col("__d"), coalesce(col("__c"), lit(0L)).as("__c"))
      .withColumn("__x", sum(col("__c")).over(
        Window.orderBy(col("__d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val weights = (1 to depth)
      .map(d => d.toLong -> (1 - p) * math.pow(p, d - 1)).toMap
    val wExpr = weights.foldLeft(lit(0.0)) { case (acc, (d, w)) =>
      when(col("__d") === d, lit(w)).otherwise(acc)
    }
    xd.withColumn("__term_nano", round(
        wExpr * col("__x").cast("double") / col("__d").cast("double") * 1e9,
        0).cast("long"))
      .agg(lit(depth.toLong).as("depth"),
        max(col("__x")).as("n_common"),
        sum(col("__term_nano")).as("rbo_nano"))
  }

  /** Per-depth literal weights of [[rankBiasedOverlap]] rendered for
    * oracle SQL: `CASE d WHEN 1 THEN <w1> ... END` with shortest-repr
    * doubles (parse back bit-identical in any engine). */
  def rboWeightCase(p: Double, depth: Int, dCol: String): String =
    (1 to depth).map { d =>
      s"WHEN $d THEN ${(1 - p) * math.pow(p, d - 1)}"
    }.mkString(s"CASE $dCol ", " ", " END")

  /** DAWID–SKENE annotator-truth inference (Dawid & Skene, JRSS-C
    * 1979 — public literature), binary-label form with a FIXED number
    * of EM rounds: from (item, rater, label) annotations, jointly
    * estimate each rater's error rates and each item's posterior true
    * label — the principled replacement for majority vote when raters
    * (human or LLM judges) differ in reliability; a consistent judge
    * outvotes three noisy ones.
    *
    * Determinism contract: ENTIRELY exact integers. Posteriors live
    * in ppm; per-rater rates α = P(say 1 | true 1), β = P(say 1 |
    * true 0) are single floor divisions of exact ppm-weighted sums
    * (add-one-ppm smoothing keeps every rate in (0, 10⁶)); the E-step
    * likelihood products are exact DECIMAL(38,0) folds over each
    * item's ≤ 4 annotations (the posterior division multiplies the
    * product by another 10⁶, so 10⁶^(k+2) must fit 10³⁸ → k ≤ 4 —
    * enforced), folded in (rater, label) sort order. Two rounds of
    * the same integer pipeline → bit-identical on any engine or
    * partitioning. Returns per rater:
    * (rater, n_annotations, alpha_ppm, beta_ppm) — the item
    * posteriors drive the estimates internally.
    *
    * Scale: each round is one item-keyed join + two rater-keyed aggs
    * with map-side combine; `rounds` is a constant. The annotation
    * table is the fact table; everything else is rater/item grain. */
  def dawidSkene(annotations: DataFrame, itemCol: Column, raterCol: Column,
      labelCond: Column, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 4, "rounds in [1, 4]")
    val ann = annotations.select(itemCol.as("__i"), raterCol.as("__r"),
      when(labelCond, 1L).otherwise(0L).as("__l"))
      .localCheckpoint() // fact grain; every round reads it
    val nRatersMax = ann.groupBy(col("__i")).agg(count(lit(1)).as("__k"))
      .agg(max(col("__k"))).head().getLong(0)
    require(nRatersMax <= 4,
      s"dawidSkene exact-integer form supports <= 4 raters per item " +
        s"(got $nRatersMax): 10^6^(k+2) must fit DECIMAL(38,0)")
    // majority-vote soft init: posterior ppm = share of 1-labels
    var post = ann.groupBy(col("__i"))
      .agg(expr("(1000000L * sum(__l)) div count(1)").as("__p"))
      .localCheckpoint()
    var rates: DataFrame = null
    var round = 0
    while (round < rounds) {
      // M-step: rater rates from current posteriors (ppm-weighted,
      // add-one-ppm smoothed)
      rates = ann.join(post, "__i")
        .groupBy(col("__r"))
        .agg(count(lit(1)).as("n_annotations"),
          sum(when(col("__l") === 1, col("__p")).otherwise(0L)).as("__a_num"),
          sum(col("__p")).as("__a_den"),
          sum(when(col("__l") === 1, lit(1000000L) - col("__p"))
            .otherwise(0L)).as("__b_num"),
          sum(lit(1000000L) - col("__p")).as("__b_den"))
        .withColumn("alpha_ppm",
          expr("(1000000L * (__a_num + 1)) div (__a_den + 2)"))
        .withColumn("beta_ppm",
          expr("(1000000L * (__b_num + 1)) div (__b_den + 2)"))
        .localCheckpoint()
      // class prior from posteriors
      val prior = post.agg(
        expr("sum(__p) div count(1)").as("__pi")).head().getLong(0)
      // E-step: per item, exact decimal likelihood fold in
      // (rater, label) order
      val d38 = "decimal(38,0)"
      post = ann.join(broadcast(rates.select(col("__r"),
          col("alpha_ppm").as("__al"), col("beta_ppm").as("__be"))), "__r")
        .groupBy(col("__i"))
        .agg(sort_array(collect_list(struct(col("__r"), col("__l"),
          col("__al"), col("__be")))).as("__obs"))
        .withColumn("__n1", expr(
          s"""aggregate(__obs, CAST($prior AS $d38),
             |  (acc, x) -> acc * CAST(CASE WHEN x.__l = 1 THEN x.__al
             |    ELSE 1000000 - x.__al END AS $d38))""".stripMargin))
        .withColumn("__n0", expr(
          s"""aggregate(__obs, CAST(${1000000L - prior} AS $d38),
             |  (acc, x) -> acc * CAST(CASE WHEN x.__l = 1 THEN x.__be
             |    ELSE 1000000 - x.__be END AS $d38))""".stripMargin))
        .withColumn("__p", expr(
          "CAST((1000000 * __n1) div (__n1 + __n0) AS BIGINT)"))
        .select(col("__i"), col("__p"))
        .localCheckpoint()
      round += 1
    }
    // final M-step readout from the last posteriors
    ann.join(post, "__i")
      .groupBy(col("__r").as("rater"))
      .agg(count(lit(1)).as("n_annotations"),
        sum(when(col("__l") === 1, col("__p")).otherwise(0L)).as("__a_num"),
        sum(col("__p")).as("__a_den"),
        sum(when(col("__l") === 1, lit(1000000L) - col("__p"))
          .otherwise(0L)).as("__b_num"),
        sum(lit(1000000L) - col("__p")).as("__b_den"))
      .withColumn("alpha_ppm",
        expr("(1000000L * (__a_num + 1)) div (__a_den + 2)"))
      .withColumn("beta_ppm",
        expr("(1000000L * (__b_num + 1)) div (__b_den + 2)"))
      .select(col("rater"), col("n_annotations"), col("alpha_ppm"),
        col("beta_ppm"))
  }

  /** ISOTONIC calibration via pool-adjacent-violators (Ayer et al.
    * 1955; Barlow et al. 1972 — public literature): fit the best
    * NON-DECREASING success-rate curve over ordered score bins — the
    * non-parametric calibration map (Zadrozny & Elkan, KDD'02) that
    * [[calibrationBins]] measures the need for. Where Platt scaling
    * assumes a sigmoid, PAV assumes only monotonicity.
    *
    * Determinism contract: the fact table rolls up ONCE to per-bin
    * (n, pos) integers; PAV runs on that rollup with pool-rate
    * comparisons as EXACT cross-multiplications (pos_a·n_b vs
    * pos_b·n_a — no division until the readout), so the unique
    * isotonic solution is bit-independent of merge order; the oracle
    * reaches the same pools by repeatedly merging the first adjacent
    * violator (the PAV solution is unique, so any merge order
    * converges to it). The readout divides once:
    * fit_ppm = (10⁶·pool_pos) div pool_n.
    * Returns per input bin: (bin, n, pos, pool_lo, pool_hi, fit_ppm).
    *
    * Scale: the fact pass is one bin-keyed agg with map-side combine;
    * PAV itself runs on the ≤|bins| rollup COLLECTED to the driver
    * (the kriging/ucb bounded regime — bins is a parameter, not data
    * volume). */
  def isotonicCalibration(df: DataFrame, binCol: Column,
      labelCond: Column): DataFrame = {
    val rolled = df.groupBy(binCol.cast("long").as("bin")).agg(
      count(lit(1)).as("n"),
      sum(when(labelCond, 1L).otherwise(0L)).as("pos"))
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(rolled.nonEmpty, "isotonicCalibration: empty input")
    // classic stack PAV, exact integer rate comparisons
    final case class Pool(lo: Long, hi: Long, n: Long, pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    rolled.foreach { case (b, n, pos) =>
      stack += Pool(b, b, n, pos)
      // merge while the previous pool's rate EXCEEDS the new one's
      // (violates non-decreasing): pos_prev·n_new > pos_new·n_prev
      var merging = true
      while (merging && stack.length >= 2) {
        val top = stack(stack.length - 1)
        val prev = stack(stack.length - 2)
        if (prev.pos * top.n > top.pos * prev.n) {
          stack.remove(stack.length - 1)
          stack(stack.length - 1) =
            Pool(prev.lo, top.hi, prev.n + top.n, prev.pos + top.pos)
        } else merging = false
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    stack.toSeq.flatMap { p =>
      rolled.filter(r => r._1 >= p.lo && r._1 <= p.hi).map { case (b, n, pos) =>
        (b, n, pos, p.lo, p.hi, 1000000L * p.pos / p.n)
      }
    }.toDF("bin", "n", "pos", "pool_lo", "pool_hi", "fit_ppm")
  }
  graft.plans.Guardrails.expect("single_partition_window",
    "__rc, item", "recListMetrics: exposure rank over the item rollup",
    "vocabulary")

  /** eval/recsys — recommendation-LIST health metrics (Castells,
    * Hurley & Vargas, RecSys Handbook ch. 26 "Novelty and Diversity"):
    * accuracy metrics (MAP q248, NDCG q164, ERR q417) say nothing
    * about what the list does to the CATALOG —
    *   coverage  = distinct recommended items / catalog size
    *   novelty   = mean self-information −ln(pop_i/Σpop) of recs
    *   exposure Gini = concentration of recommendation slots over
    *                   items (1 → the list always shows the same few)
    * — the popularity-bias dashboard. Novelty is micro-nat quantized
    * per ITEM over LAPLACE-SMOOTHED popularity (+1 pseudo-interaction
    * per catalog item: pop' = pop+1, total' = Σpop + |catalog|), so a
    * never-interacted item carries FINITE MAXIMAL self-information
    * ln(total'/1) rather than 0 — cold items are the most novel, and
    * an unsmoothed convention would bias novelty DOWN exactly when
    * the list surfaces fresh catalog; the Gini uses the exact
    * sorted-rank identity
    * Σ(2i−n−1)·c_(i) / (n·Σc) over the item-exposure rollup. Returns
    * ONE row: (n_users, n_recs, distinct_items, coverage_ppm,
    * avg_novelty_micro, exposure_gini).
    *
    * Scale: rec lists are user-bounded (k per user); all three
    * metrics run on the ITEM rollup of the rec table — one agg + one
    * bounded rank window. Popularity joins in broadcast-sized. */
  def recListMetrics(recs: DataFrame, userCol: Column, itemCol: Column,
      interactions: DataFrame, popItemCol: Column,
      catalogSize: Long): DataFrame = {
    require(catalogSize >= 1, "catalogSize >= 1")
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val r = recs.select(userCol.as("__u"), itemCol.cast("long").as("item"))
      .localCheckpoint()
    val pop = interactions.select(popItemCol.cast("long").as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("__pop"))
    val popTot = pop.agg(sum(col("__pop")).as("__pt"))
    // the exposure rank rides on the rollup BEFORE the checkpoint so
    // the single-partition window sits structurally over the Aggregate
    // (a window over the checkpoint's LogicalRDD loses the provable
    // rollup bound — Guardrails.verifyWindowClaims); same work, the
    // checkpoint still collapses the dual consumption below
    val exposure = r.groupBy(col("item")).agg(count(lit(1)).as("__rc"))
      .withColumn("__i", row_number().over(
        Window.orderBy(col("__rc"), col("item"))))
      .localCheckpoint()
    val novelty = exposure.join(pop, Seq("item"), "left")
      .crossJoin(broadcast(popTot))
      .withColumn("__mnat", floor(
        log((coalesce(col("__pt"), lit(0L)).cast("double") + catalogSize.toDouble) /
          (coalesce(col("__pop"), lit(0L)).cast("double") + 1.0))
          * 1e6 + 0.5).cast("long"))
      .agg(sum(col("__rc").cast(d38) * col("__mnat").cast(d38)).cast(d38)
        .as("__nsum"), sum(col("__rc")).as("__nr"))
    val gini = exposure.agg(count(lit(1)).as("__ni"),
        sum(col("__rc")).as("__sc"),
        sum((col("__i").cast(d38) * 2 - 1) * col("__rc").cast(d38))
          .cast(d38).as("__gnum"))
      .select(col("__ni"), col("__sc"),
        // Σ(2i−1)c = 2Σic − Σc  ⇒  G = (Σ(2i−1)c − n·Σc)/(n·Σc)
        ((col("__gnum") - col("__ni").cast(d38) * col("__sc"))
          .cast("double") /
          (col("__ni").cast(d38) * col("__sc")).cast("double"))
          .as("__g"))
    val users = r.agg(countDistinct(col("__u")).as("n_users"),
      count(lit(1)).as("n_recs"))
    users.crossJoin(broadcast(novelty)).crossJoin(broadcast(gini))
      .select(col("n_users"), col("n_recs"),
        col("__ni").as("distinct_items"),
        expr(s"(__ni * 1000000L) div ${catalogSize}L").as("coverage_ppm"),
        expr("cast(__nsum div __nr as long)").as("avg_novelty_micro"),
        round(col("__g"), 6).as("exposure_gini"))
  }

  /** eval — RELIABILITY DIAGRAM of a ppm-scaled score against a binary
    * label (the calibration readout behind ECE — Guo et al., ICML'17
    * "On Calibration of Modern Neural Networks", public literature):
    * equal-width score bins; per bin the count, positives, mean score
    * (confidence) and positive rate (accuracy), plus the bin's
    * N-weighted |accuracy − confidence| mass in ppm·N units so
    * ECE_ppm = (Σ gap_mass) div N is one exact integer division for
    * the caller. Scores land in bin min(score·nBins div 10⁶, nBins−1)
    * — pure integer arithmetic, no float boundary anywhere. Returns
    * per occupied bin: (bin, n, pos, conf_ppm, acc_ppm, gap_mass).
    *
    * Scale: ONE bin-keyed agg with map-side combine; the result is
    * ≤ nBins rows. */
  def reliabilityDiagram(df: DataFrame, scorePpmCol: Column,
      labelCond: Column, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins >= 1")
    df.select(scorePpmCol.cast("long").as("__s"),
        when(labelCond, 1L).otherwise(0L).as("__y"))
      .select(least(expr(s"(__s * ${nBins}L) div 1000000L"),
        lit(nBins - 1).cast("long")).as("bin"), col("__s"), col("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        sum(col("__s")).as("__ssum"))
      .select(col("bin"), col("n"), col("pos"),
        expr("__ssum div n").as("conf_ppm"),
        expr("(pos * 1000000L) div n").as("acc_ppm"),
        abs(col("pos") * lit(1000000L) - col("__ssum")).as("gap_mass"))
  }

  /** eval — SPLIT-CONFORMAL interval calibration (Vovk et al.;
    * Angelopoulos & Bates 2021 tutorial — public literature): from a
    * CALIBRATION slice's absolute residuals, the conformal quantile
    *   q̂ = the k-th smallest residual, k = ⌈(n_c+1)·(1−α)⌉
    * guarantees ≥ 1−α coverage of |y−ŷ| ≤ q̂ on exchangeable data; the
    * EVAL slice's observed coverage then audits the guarantee.
    * α = alphaNum/alphaDen; residuals are integers (cents/micro), so
    * the order statistic and both counts are exact. When n_c is too
    * small for the guarantee (k > n_c), q̂ and coverage are null.
    * Returns ONE row: (n_calib, n_eval, qhat, coverage_ppm).
    *
    * Scale: the order statistic is [[Ranking.globalRowNumber]] (range
    * repartition + offset rollup — never a single-partition window
    * over the calibration slice); everything else is two aggs and a
    * 1-row broadcast. */
  def splitConformal(df: DataFrame, residualCol: Column, tieCol: Column,
      isCalib: Column, alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      "alpha in (0,1)")
    val base = df.select(residualCol.cast("long").as("__r"),
      tieCol.as("__tie"), isCalib.cast("boolean").as("__c"))
    val calib = base.filter(col("__c"))
    val nC = calib.agg(count(lit(1)).as("__nc"))
    val ranked = graft.ops.Ranking
      .globalRowNumber(calib, Seq(col("__r"), col("__tie")))
    // k-th smallest via the integer crossing test:
    //   row_num ≥ ⌈(nc+1)(den−num)/den⌉ ⟺ row_num·den ≥ (nc+1)(den−num)
    val qhat = ranked.crossJoin(broadcast(nC))
      .filter(col("row_num") * alphaDen >=
        (col("__nc") + 1) * (alphaDen - alphaNum))
      .agg(min(col("__r")).as("qhat"))
    base.filter(!col("__c"))
      .crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("__r") <= col("qhat"), 1L).otherwise(0L)).as("__cov"),
        first(col("qhat")).as("qhat"))
      .crossJoin(broadcast(nC))
      .select(col("__nc").as("n_calib"), col("n_eval"), col("qhat"),
        when(col("qhat").isNotNull && col("n_eval") > 0,
          expr("(__cov * 1000000L) div n_eval")).as("coverage_ppm"))
  }

  /** eval/fairness — group FAIRNESS AUDIT of a binary classifier
    * (Hardt, Price & Srebro, NeurIPS'16 "Equality of Opportunity" —
    * public literature): per group, the selection rate (demographic
    * parity), TPR (equal opportunity) and FPR (equalized odds), each
    * as one exact ppm integer, plus the group's gap to the OVERALL
    * rate — reference-free, so adding a group never changes another
    * group's row. Degenerate groups (no positives / no negatives)
    * yield null TPR/FPR rather than garbage. Returns per group:
    * (group, n, sel_ppm, tpr_ppm, fpr_ppm, sel_gap_ppm).
    *
    * Scale: one group-keyed agg + a 1-row overall broadcast. The
    * pre-training-data equity readout run on every curated slice. */
  def fairnessAudit(df: DataFrame, groupCol: Column, labelCond: Column,
      predCond: Column): DataFrame = {
    val base = df.select(groupCol.as("group"),
      when(labelCond, 1L).otherwise(0L).as("__y"),
      when(predCond, 1L).otherwise(0L).as("__p"))
    val per = base.groupBy(col("group")).agg(
      count(lit(1)).as("n"),
      sum(col("__p")).as("__sel"),
      sum(col("__y")).as("__pos"),
      sum(col("__y") * col("__p")).as("__tp"),
      sum((lit(1L) - col("__y")) * col("__p")).as("__fp"))
    val overall = base.agg(
      (sum(col("__p")) * 1000000L).as("__allsel"), count(lit(1)).as("__alln"))
    per.crossJoin(broadcast(overall))
      .select(col("group"), col("n"),
        expr("(__sel * 1000000L) div n").as("sel_ppm"),
        when(col("__pos") > 0,
          expr("(__tp * 1000000L) div __pos")).as("tpr_ppm"),
        when(col("n") - col("__pos") > 0,
          expr("(__fp * 1000000L) div (n - __pos)")).as("fpr_ppm"),
        (expr("(__sel * 1000000L) div n") -
          expr("__allsel div __alln")).as("sel_gap_ppm"))
  }
}
