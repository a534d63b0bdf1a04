package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY on a fixed thread pool (Spark local mode
  * schedules concurrent jobs fine; every query's plan construction and
  * write is independent — streaming rows stage into per-call unique
  * temp dirs, the one temp view is query-unique, OperatorCaches is
  * synchronized). Rationale: the driver's correctness artifact came
  * back EMPTY in rounds 6-7, correlating with suite growth past ~350
  * queries — the sequential dump ran ~6.5 min at sf0.01 because each
  * tiny query underutilizes the executor (task-count ≪ cores, per-job
  * scheduling latency dominates). Concurrent submission fills the
  * cores with independent jobs and cuts the wall time several-fold,
  * restoring headroom under any driver-side time budget.
  *
  * Operator caches are released at BATCH BARRIERS (not per query, as
  * the sequential version did): releaseAll mid-flight is correctness-
  * safe (Spark recomputes from lineage) but would waste the very reuse
  * the caches exist for; a barrier every `batch` completions bounds
  * pinned blocks to one batch's worth. */
object Verify {
  def main(args: Array[String]): Unit = {
    // usage: Verify <sfDir> <outDir> [queryName ...] — names filter the
    // run (dev loop); the driver passes none and gets every query
    val Seq(sfDir, outDir, rest @ _*) = args.toSeq
    val only = rest.toSet
    // a typo'd filter name would silently produce an empty run and let
    // a dev-loop gate pass vacuously — fail fast instead
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")} — " +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    // same tuned config as Bench/production (AQE etc.). Shuffle
    // partitions are pinned LOW (8) rather than = cpus: at sf0.01 each
    // query's shuffles carry a few thousand rows, so extra partitions
    // are pure task overhead — cross-query concurrency, not per-query
    // fan-out, is what fills the cores here. Set AFTER configure() so
    // the tuned default of 32 doesn't override it (last write wins).
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", math.min(cpus, 8))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    val nThreads = sys.env.get("SPARK_GRAFT_VERIFY_THREADS").map(_.toInt)
      .getOrElse(math.max(2, math.min(cpus, 12)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    try {
      // batches of 2×threads: a release barrier after each bounds the
      // memory held by operator caches while still letting queries
      // that share a cached intermediate (e.g. the q444/q445 gram
      // cache) land in the same batch often enough to reuse it
      names.grouped(2 * nThreads).foreach { batch =>
        val tasks = batch.map { name =>
          pool.submit(new Runnable {
            def run(): Unit =
              try SparkEntry.queries(name)(spark, sfDir).coalesce(1)
                .write.mode("overwrite").parquet(s"$outDir/$name")
              catch { case e: Throwable =>
                System.err.println(s"[verify] $name failed: ${e.getMessage}")
              }
          })
        }
        tasks.foreach(_.get())
        graft.core.OperatorCaches.releaseAll(spark)
        spark.catalog.clearCache()
      }
    } finally pool.shutdown()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the FULL declared-query list: check.py's rows-only fallback is
    // restricted to names in here minus the oracle map, so a stale
    // parquet dir from a renamed/removed query can never be silently
    // folded into the artifact as "rows-only by design"
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      SparkEntry.queries.keys.toSeq.sorted
        .map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
