package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Drop the table AND its warehouse location (a failed earlier run can
    * leave an orphan directory that blocks CREATE TABLE). */
  private def reset(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = java.nio.file.Paths.get("spark-warehouse", t)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }

  test("E6: same-bucketed tables join with NO shuffle exchange (co-located join)") {
    reset("bkt_a", "bkt_b")
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 8)
    Bucketing.writeBucketed(b, "bkt_b", "k", 8)
    // disable broadcast so the large×large (sort-merge) strategy is planned —
    // that's the regime bucketing exists for
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
      // groupBy on the bucket key also skips the exchange
      val agg = spark.table("bkt_b").groupBy("k").agg(sum("vb"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
  }

  test("E6: mismatched bucket counts fall back to a correct (shuffled) join") {
    reset("bkt_c", "bkt_d")
    val a = (1L to 100L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_c", "k", 4)
    Bucketing.writeBucketed(b, "bkt_d", "k", 6)
    val joined = Bucketing.bucketedJoin(spark, "bkt_c", "bkt_d", "k")
    assert(joined.count() == 100) // correctness regardless of layout
    spark.sql("DROP TABLE IF EXISTS bkt_c")
    spark.sql("DROP TABLE IF EXISTS bkt_d")
  }
}
