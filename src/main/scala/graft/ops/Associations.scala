package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant, VLDB'94 —
  * public literature): for item pairs co-occurring in ≥ `minSupport`
  * baskets, the directional rules x→y with
  *   confidence = n_xy / n_x   and   lift = n_xy·N / (n_x·n_y).
  * Both are quotients of exact integer counts — the same IEEE double
  * on any engine — so no probability estimate ever needs a log or an
  * accumulation-order caveat.
  */
object Associations {

  /** Pair rules over (basket, item) rows. Returns one row per ordered
    * rule (x→y and y→x for each qualifying pair): (item_x, item_y,
    * n_xy, n_x, confidence, lift).
    *
    * Scale: baskets dedup to (basket, item) first; pair generation is
    * a basket-keyed self-join bounded by per-basket item counts (the
    * classic k² per basket, not |items|²); item frequencies join on
    * the item id — Zipf-skewed on staples, AQE-split. The support
    * threshold prunes BEFORE the frequency joins. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport >= 1")
    val bi = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val n = bi.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__N"))
    val freq = bi.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val pairs = bi.select(col("__b"), col("__i").as("__x"))
      .join(bi.select(col("__b"), col("__i").as("__y")), "__b")
      .filter(col("__x") < col("__y"))
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minSupport)
    // both rule directions from each unordered pair
    val rules = pairs.select(col("__x"), col("__y"), col("n_xy"))
      .unionByName(pairs.select(col("__y").as("__x"), col("__x").as("__y"),
        col("n_xy")))
    rules
      .join(freq.select(col("__i").as("__x"), col("__n").as("n_x")), "__x")
      .join(freq.select(col("__i").as("__y"), col("__n").as("__ny")), "__y")
      .crossJoin(broadcast(n))
      .select(col("__x").as("item_x"), col("__y").as("item_y"),
        col("n_xy"), col("n_x"),
        (col("n_xy").cast("double") / col("n_x")).as("confidence"),
        // widen BEFORE multiplying: long*long wraps past 9.2e18 and
        // would rank a staple pair's lift negative; decimals can't wrap
        ((col("n_xy").cast("decimal(38,0)") * col("__N")).cast("double") /
          (col("n_x").cast("decimal(38,0)") * col("__ny")).cast("double"))
          .as("lift"))
  }

  /** E2+/graph — bipartite co-occurrence projection: project the
    * (basket, item) relation onto an item-item edge list weighted by
    * shared-basket count — the item graph behind co-purchase recsys
    * and co-citation analysis. Each basket of size k contributes
    * k·(k−1)/2 pairs, so fan-out is bounded by the basket-size cap the
    * caller's domain implies (a TPC-H order holds <= 7 line items),
    * never by catalog size. Returns (item_a, item_b, weight) for the
    * top `topK` edges under (weight desc, item_a, item_b).
    *
    * Scale: distinct + one basket-keyed self-equi-join + a pair-keyed
    * agg with map-side combine; TakeOrdered handles the top-k. Skewed
    * giant baskets are the hazard — cap basket size upstream (q64's
    * domain-cap pattern) before projecting. */
  def coOccurrence(df: DataFrame, basketCol: Column, itemCol: Column,
      topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val base = df.select(basketCol.as("__b"), itemCol.as("__i")).distinct()
    val a = base.toDF("__b", "item_a")
    val b = base.toDF("__b", "item_b")
    a.join(b, "__b").filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("weight"))
      .orderBy(col("weight").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** E2+/ML — item-item cosine similarity over binary (basket, item)
    * incidence — the memory-based collaborative-filtering kernel
    * (Sarwar et al., "Item-based collaborative filtering", WWW'01 —
    * public literature). With binary ratings the dot product is the
    * shared-basket count and the norm is √degree, so
    *   cos(a,b) = n_ab / (√n_a·√n_b)
    * is one pinned IEEE expression over exact integers, reported
    * ppm-rounded. `minCommon` prunes noise pairs BEFORE the degree
    * joins; returns the top `topK` under (cosine desc, item_a, item_b):
    * (item_a, item_b, n_common, n_a, n_b, cos_ppm).
    *
    * Scale: same basket-keyed self-join shape as [[coOccurrence]] —
    * pair space Σ k², never |items|²; degrees join on item id
    * (Zipf-skewed staples → AQE skew-split); TakeOrdered serves the
    * top-k with per-partition heaps. */
  def itemCosine(df: DataFrame, basketCol: Column, itemCol: Column,
      minCommon: Long, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val base = df.select(basketCol.as("__b"), itemCol.as("__i")).distinct()
    val deg = base.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val a = base.toDF("__b", "item_a")
    val b = base.toDF("__b", "item_b")
    a.join(b, "__b").filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      .join(deg.select(col("__i").as("item_a"), col("__n").as("n_a")), "item_a")
      .join(deg.select(col("__i").as("item_b"), col("__n").as("n_b")), "item_b")
      .withColumn("cos_ppm", round(col("n_common").cast("double") /
        (sqrt(col("n_a").cast("double")) * sqrt(col("n_b").cast("double"))) *
        1e6, 0).cast("long"))
      .select(col("item_a"), col("item_b"), col("n_common"), col("n_a"),
        col("n_b"), col("cos_ppm"))
      .orderBy(col("cos_ppm").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
