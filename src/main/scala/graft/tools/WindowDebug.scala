package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import graft.core.GraftSession

/** Dev tool: print the child-node chain under every empty-partition
  * Window of a query's optimized logical plan — triage input for the
  * hardened single_partition_window structural audit.
  * Usage: WindowDebug <sfDir> <queryName> [...] */
object WindowDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]").appName("graft-windbg"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan
      plan.foreachUp {
        case w: Window if w.partitionSpec.isEmpty =>
          println(s"-- Window(${w.windowExpressions.map(_.name).mkString(",")})")
          var cur: LogicalPlan = w.child
          var d = 0
          while (d < 12) {
            println(s"   ${"  " * d}${cur.nodeName} maxRows=${cur.maxRows} " +
              s"out=${cur.output.map(_.name).take(6).mkString(",")}")
            if (cur.children.size == 1) { cur = cur.children.head; d += 1 }
            else {
              cur.children.foreach(c => println(s"   ${"  " * (d + 1)}child: " +
                s"${c.nodeName} maxRows=${c.maxRows} " +
                s"out=${c.output.map(_.name).take(6).mkString(",")}"))
              d = 12
            }
          }
        case _ =>
      }
    }
    spark.stop()
  }
}
