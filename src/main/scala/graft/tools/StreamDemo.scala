package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.streaming.StreamOps

/** End-to-end streaming replay over the real events table: batch rows
  * are split into arrival chunks on disk, streamed back through the
  * T1→T2(+T4)→T6 pipeline, and the result is compared to the batch
  * equivalent. Usage: StreamDemo <sfDir> <workDir> */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args
    val spark = GraftSession.local("8", "stream-demo")
    import spark.implicits._

    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "value")
    // replay: 3 arrival chunks
    events.filter(col("event_id") % 3 === 0).write.mode("overwrite").json(s"$workDir/in")
    events.filter(col("event_id") % 3 === 1).write.mode("append").json(s"$workDir/in")
    events.filter(col("event_id") % 3 === 2).write.mode("append").json(s"$workDir/in")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))

    val stream = StreamOps.fileStream(spark, s"$workDir/in", schema)
    val agg = StreamOps.windowedStats(stream, "ts", "user_id", "value",
      "6 hours", watermark = Some("1 hour"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win").start()
    StreamOps.runOnce(q)

    val streamed = spark.table("win")
    val batch = events.groupBy(window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val sCount = streamed.agg(sum("n")).head().getLong(0)
    val bCount = batch.agg(sum("n")).head().getLong(0)
    println(s"streamed_rows=${streamed.count()} batch_groups=${batch.count()}")
    println(s"streamed_events=$sCount batch_events=$bCount match=${sCount == bCount}")
    spark.stop()
  }
}
