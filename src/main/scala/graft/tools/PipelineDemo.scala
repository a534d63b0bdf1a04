package graft.tools

import graft.core.{GraftSession, Tables}
import graft.io.Sinks
import graft.pipeline._

/** End-to-end demo of the pipeline framework: author a spec, JSON
  * round-trip it, run it over the events table, sink the result.
  * Usage: PipelineDemo <sfDir> <outDir> */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("8", "pipeline-demo")

    val spec = Pipeline("evening_stats")
      .addOperation(Operation("window", "date_range_filter",
        "ts_col" -> JStr("ts"), "beg" -> JStr("2024-01-05"), "end" -> JStr("2024-01-25")))
      .addOperation(Operation("stats", "interval_stats",
        "id_col" -> JStr("user_id"), "ts_col" -> JStr("ts"),
        "value_cols" -> JArr(Vector(JStr("value"))),
        "funcs" -> JArr(Vector(JStr("mean"), JStr("std"), JStr("count"))),
        "intervals" -> JArr(Vector(
          JArr(Vector(JStr("09:00:00"), JStr("17:00:00"))),
          JArr(Vector(JStr("22:00:00"), JStr("05:00:00")))))))
      .addOperation(Operation("order", "order_by", "columns" -> JArr(Vector(JStr("user_id")))))

    // JSON round-trip before running — proves the spec codec on a real pipeline
    val roundTripped = Pipeline.fromJson(spec.toJson.render)
    val (result, validated) = roundTripped.run(
      Tables.events(spark, sfDir), specOut = Some(outDir))
    validated.requireValidated()

    result.show(10, truncate = false)
    println(s"rows=${result.count()} cols=${result.columns.mkString(",")}")
    Sinks.writeSafe(result, s"$outDir/evening_stats.parquet", "parquet", singleFile = true)
    spark.stop()
  }
}
