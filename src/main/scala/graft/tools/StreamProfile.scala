package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Dev tool (opt round 12, VERDICT r11 item 5): break down where a
  * streaming replay row's wall-clock goes — plan construction + start,
  * the single availableNow-style micro-batch (with Spark's own
  * durationMs split: queryPlanning / getBatch / addBatch / walCommit /
  * commitOffsets / triggerExecution), and stop/teardown — so the
  * streaming family's per-query floor is justified (or attacked) with
  * numbers instead of prose.
  *
  * Mirrors the q57 (stateful window agg) and q78 (stream-stream join)
  * shapes of `queries.TimeSeries.streamEventsToTable` exactly,
  * including the 8-partition state scope.
  *
  * `runMain graft.tools.StreamProfile [sfDir]` */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-streamprofile"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val path = s"$dir/events.parquet"
    val rawSchema = spark.read.parquet(path).schema

    def profile(tag: String, mode: String)(
        transform: DataFrame => DataFrame): Unit = {
      val stage = java.nio.file.Files.createTempDirectory(s"graft_${tag}_prof")
      try {
        java.nio.file.Files.createSymbolicLink(
          stage.resolve("events.parquet"),
          java.nio.file.Paths.get(path).toAbsolutePath)
        val t0 = System.nanoTime()
        val raw = spark.readStream.schema(rawSchema).parquet(stage.toString)
        val ev =
          if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          else if (rawSchema("ts").dataType ==
              org.apache.spark.sql.types.TimestampNTZType)
            raw.withColumn("ts",
              col("ts").cast(org.apache.spark.sql.types.TimestampType))
          else raw
        val qname = s"${tag}_prof_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        val q =
          try transform(ev).writeStream.format("memory").queryName(qname)
            .outputMode(mode).start()
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        val t1 = System.nanoTime()
        q.processAllAvailable()
        val t2 = System.nanoTime()
        val progress = q.recentProgress.toSeq
        q.stop(); q.awaitTermination(10000)
        val t3 = System.nanoTime()
        val rows = spark.table(qname).count()
        println(f"[streamprofile] $tag: build+start=${(t1 - t0) / 1e9}%.3f s " +
          f"drain=${(t2 - t1) / 1e9}%.3f s stop=${(t3 - t2) / 1e9}%.3f s " +
          f"batches=${progress.size} rows=$rows")
        progress.foreach { p =>
          println(s"[streamprofile]   batch=${p.batchId} " +
            s"durationMs=${p.durationMs} inRows=${p.numInputRows} " +
            s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
            s"stateCommitMs=${p.stateOperators.map(_.commitTimeMs).mkString(",")}")
        }
      } finally {
        java.nio.file.Files.deleteIfExists(stage.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(stage)
      }
    }

    // run each shape twice: run 1 pays session/codegen warm-up, run 2 is
    // the per-query marginal cost the bench actually measures
    for (i <- 1 to 2) {
      profile(s"q57shape_run$i", "complete")(ev =>
        graft.streaming.StreamOps.intervalStats(
          ev, "ts", "user_id", "value", Seq(("09:00:00", "17:00:00"))))
      profile(s"q78shape_run$i", "append") { ev =>
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("l_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("r_ts"))
        graft.streaming.StreamOps.streamStreamJoin(
          clicks, purchases, "user_id", "l_ts", "r_ts",
          watermark = "3650 days", within = "30 minutes")
          .select(col("user_id"), col("click_id"), col("purchase_id"))
      }
    }
    spark.stop()
  }
}
