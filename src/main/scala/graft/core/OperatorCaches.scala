package graft.core

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic lifetime for operator-internal `.cache()`s.
  *
  * Near-dup / kNN operators cache bounded intermediates (minhash
  * signatures, shingle sets, candidate pairs) that BOTH sides of a
  * self-join read — aliasing defeats ReuseExchange, so without the
  * cache each side recomputes the sketch. The operator cannot
  * unpersist before its (lazy) result is materialized by the caller,
  * so every such cache is registered here instead: callers in
  * long-lived sessions release them with [[releaseAll]] after
  * consuming the result, rather than reaching for
  * `spark.catalog.clearCache()` (which also clobbers caches the user
  * owns). `graft.Bench` / `graft.Verify` release between queries.
  *
  * Sessions are weakly keyed: a stopped/collected session drops its
  * registry entry with it.
  */
object OperatorCaches {
  private val registry =
    new java.util.WeakHashMap[SparkSession, mutable.Buffer[DataFrame]]()

  /** Cache `df` (MEMORY_AND_DISK) and register it for release. */
  def cached(df: DataFrame): DataFrame = registry.synchronized {
    registry.computeIfAbsent(df.sparkSession, _ => mutable.Buffer.empty) += df
    df.cache()
  }

  /** Unpersist every operator cache registered against `spark`.
    * Safe to call while results are still un-materialized — Spark
    * recomputes from lineage — but the intended point is after the
    * caller has collected/written what it needs. */
  def releaseAll(spark: SparkSession): Unit = registry.synchronized {
    Option(registry.remove(spark)).getOrElse(Nil)
      .foreach(_.unpersist(blocking = false))
  }

  /** Number of live registered caches (test/diagnostic surface). */
  def registeredCount(spark: SparkSession): Int = registry.synchronized {
    Option(registry.get(spark)).map(_.size).getOrElse(0)
  }
}
