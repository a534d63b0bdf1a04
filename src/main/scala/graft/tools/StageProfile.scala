package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** Dev tool (opt round 12, VERDICT r11 items 7-8): per-STAGE metrics for
  * a declared query — duration, task count, input records/bytes, shuffle
  * read/write bytes and records — so the pair-space / floor claims of
  * the deferred 1.9-2.6 s rows are confirmed or attacked with numbers
  * instead of prose. One warm-up run (codegen/JIT), then one profiled
  * run; stages are listed in completion order.
  *
  * `runMain graft.tools.StageProfile <sfDir> <queryName> [...]` */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-stageprofile"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(id: Int, name: String, tasks: Int, ms: Long,
      inRec: Long, inMB: Double, srRec: Long, srMB: Double,
      swRec: Long, swMB: Double)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.add(St(si.stageId,
          si.name.split('\n').head.take(60), si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.inputMetrics.recordsRead, m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.recordsRead,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.recordsWritten,
          m.shuffleWriteMetrics.bytesWritten / 1e6))
      }
    }

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.OperatorCaches.releaseAll(spark); spark.catalog.clearCache()
      dt
    }

    names.foreach { name =>
      run(name) // warm-up, unprofiled
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val dt = run(name)
      spark.sparkContext.removeSparkListener(listener)
      println(f"========== $name: ${dt}%.3f s ==========")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"ms"}%7s ${"inRec"}%9s " +
        f"${"inMB"}%8s ${"shRdRec"}%9s ${"shRdMB"}%8s ${"shWrRec"}%9s ${"shWrMB"}%8s  name")
      import scala.jdk.CollectionConverters._
      val all = stages.asScala.toSeq.sortBy(_.id)
      all.foreach { s =>
        println(f"${s.id}%6d ${s.tasks}%5d ${s.ms}%7d ${s.inRec}%9d " +
          f"${s.inMB}%8.1f ${s.srRec}%9d ${s.srMB}%8.1f ${s.swRec}%9d " +
          f"${s.swMB}%8.1f  ${s.name}")
      }
      println(f"[stageprofile] $name stages=${all.size} " +
        f"stage_ms_sum=${all.map(_.ms).sum} wall=${dt}%.3f s " +
        f"shuffleRdMB=${all.map(_.srMB).sum}%.1f shuffleWrMB=${all.map(_.swMB).sum}%.1f")
    }
    spark.stop()
  }
}
