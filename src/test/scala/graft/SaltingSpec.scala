package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Salting

class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed data: key "hot" holds 90% of rows
  private def skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")

  test("E6: salted aggregate equals plain aggregate on skewed data") {
    val salted = Salting.saltedAggregate(skewed, "k", 8, Seq("v"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count("v").as("c"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("E6: salted join equals plain join, row-for-row") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val salted = Salting.saltedJoin(skewed, dim, "k", 4)
      .groupBy("k", "label").agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))
      .orderBy("k").collect().toSeq
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k", "label").agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("salt spreads the hot key across sub-keys (phase-1 group count)") {
    val phase1Groups = skewed
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(8)))
      .groupBy("k", "__salt").count()
      .filter(col("k") === "hot").count()
    assert(phase1Groups > 1, "hot key must split across salts")
  }
}
