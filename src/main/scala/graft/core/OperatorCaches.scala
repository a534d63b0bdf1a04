package graft.core

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic lifetime for operator-internal `.cache()`s.
  *
  * Near-dup / kNN / TF-IDF operators cache bounded intermediates
  * (minhash signatures, shingle sets, candidate pairs, exploded
  * tokens) that two-plus differently-keyed consumers read — aliasing
  * defeats ReuseExchange, so without the cache each consumer recomputes
  * the sketch. The operator cannot unpersist before its (lazy) result
  * is materialized by the caller, so every such cache is registered
  * here instead: callers in long-lived sessions release them with
  * [[releaseAll]] after consuming the result, rather than reaching for
  * `spark.catalog.clearCache()` (which also clobbers caches the user
  * owns). `graft.Bench` / `graft.Verify` release between queries.
  *
  * Entries are held strongly (a weak map would race GC and make
  * release nondeterministic — and a Dataset value would pin its own
  * session key anyway); instead, entries belonging to STOPPED sessions
  * are purged on every registry access, so a session that ends without
  * releaseAll costs at most one stale entry until the next call.
  */
object OperatorCaches {
  private val registry = mutable.Map.empty[SparkSession, mutable.Buffer[DataFrame]]

  private def purgeStopped(): Unit =
    registry.filterInPlace((s, _) => !s.sparkContext.isStopped)

  /** Cache `df` (MEMORY_AND_DISK) and register it for release. */
  def cached(df: DataFrame): DataFrame = registry.synchronized {
    purgeStopped()
    registry.getOrElseUpdate(df.sparkSession, mutable.Buffer.empty) += df
    df.cache()
  }

  /** [[cached]] when `cond`, the plan untouched otherwise — for
    * operators whose callers may have no release point (pipeline
    * registry results with unmanaged lifetimes pass cond = false). */
  def cachedIf(cond: Boolean, df: DataFrame): DataFrame =
    if (cond) cached(df) else df

  /** Unpersist every operator cache registered against `spark`.
    * Safe to call while results are still un-materialized — Spark
    * recomputes from lineage — but the intended point is after the
    * caller has collected/written what it needs. */
  def releaseAll(spark: SparkSession): Unit = registry.synchronized {
    purgeStopped()
    registry.remove(spark).getOrElse(mutable.Buffer.empty)
      .foreach(_.unpersist(blocking = false))
  }

  /** Number of live registered caches (test/diagnostic surface). */
  def registeredCount(spark: SparkSession): Int = registry.synchronized {
    purgeStopped()
    registry.get(spark).map(_.size).getOrElse(0)
  }
}
