package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming variants (SURVEY.md §2.9, T1-T6) of the batch
  * time-series operators. The reference is batch-only; its
  * directory-of-JSONs ingestion (src/data_preprocessing.py:429-442) and
  * clock-time interval aggregation (:563-585) are the batch shadows of
  * T1/T2.
  *
  * Documented batch/streaming divergence (T4): a watermark DROPS late
  * rows that batch would keep — callers choose the delay; tests pin
  * both the on-time path and the late-drop.
  */
object StreamOps {

  /** T1 — file-arrival ingestion: stream a directory of JSON or parquet
    * files with an explicit schema (streaming requires one). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
      format: String = "json"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)

  /** T2 — tumbling (slide = None) or sliding windowed stats per key,
    * with optional watermark (T4). One shuffle on (window, key); state
    * store size is bounded by watermark horizon × key cardinality. */
  def windowedStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, window: String, slide: Option[String] = None,
      watermark: Option[String] = None): DataFrame = {
    val wm = watermark.map(events.withWatermark(tsCol, _)).getOrElse(events)
    val win = slide match {
      case Some(s) => org.apache.spark.sql.functions.window(col(tsCol), window, s)
      case None => org.apache.spark.sql.functions.window(col(tsCol), window)
    }
    wm.groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as(s"sum_$valueCol"),
        avg(col(valueCol)).as(s"mean_$valueCol"),
        max(col(valueCol)).as(s"max_$valueCol"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col(s"sum_$valueCol"), col(s"mean_$valueCol"),
        col(s"max_$valueCol"))
  }

  /** T3 — session windows (gap-based), the streaming twin of the batch
    * sessionize query (q25). */
  def sessionStats(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col(keyCol), col("n_events"))

  /** Streaming twin of A5 (batch `TimeSeriesOps.intervalStats`):
    * per-key, per-hour-of-day-interval conditional aggregation. Hour
    * intervals aren't event-time windows — they recur daily — so this
    * is a running aggregate per key (complete/update output), exactly
    * the reference's semantics applied to an unbounded stream. */
  def intervalStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, intervals: Seq[(String, String)]): DataFrame = {
    val aggs = intervals.flatMap { case (b, e) =>
      val tag = s"${b.replace(":", "")}_${e.replace(":", "")}"
      val pred = graft.ops.TimeSeriesOps.hourIntervalPredicate(col(tsCol), b, e)
      Seq(
        sum(when(pred, col(valueCol))).as(s"sum_${valueCol}_$tag"),
        count(when(pred, col(valueCol))).as(s"count_${valueCol}_$tag"))
    }
    events.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** T5 — stateful dedup by key within the watermark horizon. */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** T6 — parquet sink with checkpoint (exactly-once file sink). */
  def parquetSink(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)

  /** T6 — stream-static enrichment: join each micro-batch back to a
    * static dimension (the reference's J1 join-stats-to-sensors step);
    * foreachBatch gives the batch DataFrame API inside the stream. */
  def enrichedSink(stats: DataFrame, static: DataFrame, joinKey: String,
      path: String, checkpoint: String): DataStreamWriter[Row] =
    stats.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.join(broadcast(static), Seq(joinKey), "left")
          .write.mode("append").parquet(path)
      }

  /** Drive a query over all currently-available input then stop —
    * the synchronous test/replay harness. */
  def runOnce(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(10000)
  }
}
