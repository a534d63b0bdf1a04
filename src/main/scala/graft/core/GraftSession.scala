package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 128 GiB box) but every setting is the one we'd ship to a real
  * cluster: AQE on (runtime coalesce + skew-join handling), shuffle
  * partitions sized to the parallelism actually available rather than
  * the 200 default, UTC session time zone for deterministic timestamp
  * semantics vs the oracle.
  */
object GraftSession {

  /** Apply graft's standard configuration to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")

  /** Local session for tests / tools — carries the full extension set
    * (native SQL functions + the Guardrails plan audit), exactly as a
    * cluster session launched with
    * `--conf spark.sql.extensions=graft.GraftExtensions` would. */
  def local(cores: String = "*", appName: String = "graft"): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName)
        .withExtensions(new graft.GraftExtensions)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
