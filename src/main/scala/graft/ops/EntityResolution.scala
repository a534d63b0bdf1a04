package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood entity resolution (Hernández & Stolfo, SIGMOD
  * '95 — public literature): the OTHER classic blocking family next to
  * q108's prefix blocking. Sort all records by a fuzzy sort key; only
  * records within `window` positions of each other are candidate
  * pairs; an exact edit-distance verify decides. Catches what prefix
  * blocking misses (typos in the first characters move a record only
  * a few sort positions, not out of the block).
  */
object EntityResolution {

  /** Candidate pairs within `window` positions of the (sortKey, id)
    * total order, verified by thresholded levenshtein ≤ maxDist.
    * Returns (id_a, id_b, key_a, key_b, distance) with id_a's row
    * ranked before id_b's.
    *
    * The global rank comes from [[Ranking.globalRowNumber]] (range
    * repartition + bounded offset rollup — no single-partition
    * window); the neighborhood is an offset explode + equi-join on
    * the rank, so the pair space is |rows|·window, never |rows|².
    * Levenshtein's banded DP (3-arg form, −1 past the bound)
    * early-exits at width maxDist. */
  def sortedNeighborhoodPairs(df: DataFrame, sortKeyCol: String, idCol: String,
      window: Int, maxDist: Int): DataFrame = {
    require(window >= 1 && maxDist >= 0, "window >= 1, maxDist >= 0")
    val ranked = Ranking.globalRowNumber(df, Seq(col(sortKeyCol), col(idCol)))
      .select(col("row_num"), col(sortKeyCol).as("__key"), col(idCol).as("__id"))
    val right = ranked.select(col("row_num").as("__rn2"),
      col("__key").as("__key2"), col("__id").as("__id2"))
    ranked
      .withColumn("__rn2", explode(sequence(col("row_num") + 1,
        col("row_num") + window)))
      .join(right, Seq("__rn2"))
      .withColumn("distance", expr(s"levenshtein(__key, __key2, $maxDist)"))
      .filter(col("distance") >= 0)
      .select(col("__id").as("id_a"), col("__id2").as("id_b"),
        col("__key").as("key_a"), col("__key2").as("key_b"), col("distance"))
  }

  /** American Soundex code (NARA standard — public knowledge) as a
    * PORTABLE column expression: first letter + 3 digits, consonant
    * classes B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6,
    * H/W transparent (same-class consonants separated only by h/w
    * collapse), vowels separate (they don't), zero-padded. The classic
    * phonetic blocking key: name variants that SOUND alike get the same
    * code, which prefix/edit-distance blocking both miss ("Ashcraft" ≡
    * "Ashcroft" ≡ A261).
    *
    * Deliberately NOT Spark's built-in `soundex()` — that's a JVM
    * intrinsic an oracle engine can't replay. This chain is six
    * regexp_replaces + one translate, written token-for-token
    * identically in oracle SQL (literal patterns only: no backrefs, no
    * lookahead — the RE2 ∩ Java-regex portable subset, the q72/q85
    * discipline). Null/empty/non-alphabetic input → null code. */
  def soundexCode(nameCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val a = regexp_replace(upper(nameCol), "[^A-Z]", "")
    // consonant classes to digits, vowels+Y to the separator marker A;
    // H and W pass through for the transparency rule
    val b = translate(a, "BFPVCGJKQSXZDTLMNRAEIOUY",
      "111122222222334556AAAAAA")
    // H/W vanish FIRST so same-class runs they separated become
    // adjacent; vowels stay so runs they separate do NOT collapse
    val c = regexp_replace(b, "[HW]", "")
    val collapsed = (1 to 6).foldLeft(c) { (s, d) =>
      regexp_replace(s, s"$d$d+", d.toString)
    }
    val e = regexp_replace(collapsed, "A", "")
    // if the first letter is a coded consonant, its own (collapsed)
    // leading digit is dropped — rule 3 merges following same-class
    // letters into the retained first LETTER
    val rest = when(substring(b, 1, 1).between("1", "6"),
      e.substr(lit(2), length(e))).otherwise(e)
    when(length(a) > 0,
      concat(substring(a, 1, 1), rpad(substring(rest, 1, 3), 3, "0")))
  }

  /** Phonetic candidate pairs: distinct values of `nameCol` that share
    * a Soundex code but differ as strings — the blocking join itself.
    * Returns (code, name_a, name_b) with name_a < name_b. The pair
    * space is Σ per-code |bucket|² over the DISTINCT-NAME dictionary —
    * dictionary grain, never the fact table (the q108 altitude). */
  def soundexPairs(df: DataFrame, nameCol: String): DataFrame = {
    val dict = df.select(col(nameCol).as("__name")).distinct()
      .withColumn("code", soundexCode(col("__name")))
      .filter(col("code").isNotNull)
      .localCheckpoint() // dictionary grain; both join sides read it
    dict.select(col("code"), col("__name").as("name_a"))
      .join(dict.select(col("code"), col("__name").as("name_b")), Seq("code"))
      .filter(col("name_a") < col("name_b"))
  }

  /** FELLEGI–SUNTER record-linkage weights (Fellegi & Sunter, JASA
    * 1969 — the probabilistic-linkage standard): from LABELED candidate
    * pairs, estimate per comparison field
    *   m = P(agree | match),  u = P(agree | non-match)
    * and the log-odds match weights
    *   w_agree = ln(m/u),  w_disagree = ln((1−m)/(1−u))
    * — the scoring table that turns field agreements into a principled
    * match score (sum the weights, threshold), replacing ad-hoc
    * "2 of 3 fields agree" rules in the q108/q135 ER pipelines.
    *
    * Determinism contract: counts are exact (add-one smoothing keeps
    * every probability in (0,1) with NO epsilon); m/u land as exact
    * ppm integers; each log runs on the two pinned ppm ratios and
    * nano-quantizes (the q308/psi device), so weights hash-match.
    * Returns per field: (field, n_match, n_unmatch, agree_m, agree_u,
    * m_ppm, u_ppm, w_agree_nano, w_disagree_nano).
    *
    * Scale: one pass over the labeled pair set per field list — a
    * single agg with map-side combine; fields are literal columns. */
  def fellegiSunter(pairs: DataFrame, matchCond: org.apache.spark.sql.Column,
      fields: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    val aggs = fields.flatMap { case (name, cond) => Seq(
      sum(when(matchCond && cond, 1L).otherwise(0L)).as(s"__am_$name"),
      sum(when(!matchCond && cond, 1L).otherwise(0L)).as(s"__au_$name"))
    } ++ Seq(
      sum(when(matchCond, 1L).otherwise(0L)).as("__nm"),
      sum(when(!matchCond, 1L).otherwise(0L)).as("__nu"))
    val g = pairs.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    fields.map { case (name, _) =>
      g.select(
        lit(name).as("field"),
        col("__nm").as("n_match"), col("__nu").as("n_unmatch"),
        col(s"__am_$name").as("agree_m"), col(s"__au_$name").as("agree_u"),
        expr(s"(1000000L * (__am_$name + 1)) div (__nm + 2)").as("m_ppm"),
        expr(s"(1000000L * (__au_$name + 1)) div (__nu + 2)").as("u_ppm"))
    }.reduce(_ unionByName _)
      .withColumn("w_agree_nano", round(
        (log(col("m_ppm").cast("double")) - log(col("u_ppm").cast("double")))
          * 1e9, 0).cast("long"))
      .withColumn("w_disagree_nano", round(
        (log(lit(1000000.0) - col("m_ppm").cast("double")) -
          log(lit(1000000.0) - col("u_ppm").cast("double"))) * 1e9, 0)
        .cast("long"))
  }
}
