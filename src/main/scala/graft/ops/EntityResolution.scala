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
}
