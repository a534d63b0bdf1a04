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
}
