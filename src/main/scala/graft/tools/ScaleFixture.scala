package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Dev tool — build an N×-scale fixture from an existing sf dir to
  * spot-check the 100×-scale claims in SCALING.md (SCALE_SPOT.md):
  * union N key-offset copies of the heavy tables so per-key structure
  * stays realistic while fact volume multiplies.
  *
  * Copy semantics (deliberate, per table):
  *  - lineitem/orders: orderkey offset per copy (new orders), part/
  *    supp/cust keys KEPT — entity sets stay fixed, interactions
  *    multiply (the real shape of more fact data), and audit-slice
  *    graphs (q432's partkey≤400, q384's supplier-part) see an N×
  *    scan over the same graph — exactly the scan-vs-state split the
  *    scaling notes claim.
  *  - events: user_id offset per copy — N× independent actors, so
  *    sessionization/state parallelism scales with data.
  *  - documents: doc_id offset; copies >0 get a copy-tag token
  *    appended so near-dup candidate load grows N× without collapsing
  *    into giant exact-dup clusters.
  *  - embeddings: vec_id offset, vectors kept — ANN cells grow N×.
  *
  * `runMain graft.tools.ScaleFixture <srcSfDir> <outDir> [factor=10]` */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1)
    val n = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-scale-fixture"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(i => per(df, i)).reduce(_ unionByName _)

    // the driver's testdata layout is ONE parquet FILE per table (not a
    // directory) — the streaming replay harness symlinks `<t>.parquet`
    // into its staging dir and the file-stream source does not recurse
    // into a symlinked directory; match the layout exactly
    def writeSingleFile(df: DataFrame, target: String): Unit = {
      val tmp = target + "__dir"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = java.nio.file.Paths.get(tmp)
      val part = java.nio.file.Files.list(dir).iterator()
      var found: java.nio.file.Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) found = p
      }
      require(found != null, s"no part file under $tmp")
      val tgt = java.nio.file.Paths.get(target)
      java.nio.file.Files.deleteIfExists(tgt)
      java.nio.file.Files.move(found, tgt)
      java.nio.file.Files.list(dir).iterator().forEachRemaining(p =>
        java.nio.file.Files.delete(p))
      java.nio.file.Files.delete(dir)
    }

    val orders = Tables.orders(spark, src)
    val oOff = 1L + orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    writeSingleFile(copies(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * oOff))
    }, s"$out/orders.parquet")

    val li = Tables.lineitem(spark, src)
    writeSingleFile(copies(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * oOff))
    }, s"$out/lineitem.parquet")

    val ev = Tables.events(spark, src)
    val uOff = 1L + ev.agg(max(col("user_id"))).collect()(0).getLong(0)
    val eOff = 1L + ev.agg(max(col("event_id"))).collect()(0).getLong(0)
    writeSingleFile(copies(ev) { (d, i) =>
      d.withColumn("user_id", col("user_id") + lit(i * uOff))
        .withColumn("event_id", col("event_id") + lit(i * eOff))
    }, s"$out/events.parquet")

    val docs = Tables.documents(spark, src)
    val dOff = 1L + docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    writeSingleFile(copies(docs) { (d, i) =>
      val tagged =
        if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" copytag$i")))
          .withColumn("n_chars", col("n_chars") + lit(s" copytag$i".length.toLong))
      tagged.withColumn("doc_id", col("doc_id") + lit(i * dOff))
    }, s"$out/documents.parquet")

    val emb = Tables.embeddings(spark, src)
    val vOff = 1L + emb.agg(max(col("vec_id"))).collect()(0).getLong(0)
    writeSingleFile(copies(emb) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * vOff))
    }, s"$out/embeddings.parquet")

    // small dimension tables copy through unchanged
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      writeSingleFile(spark.read.parquet(s"$src/$t.parquet"), s"$out/$t.parquet")
    }
    println(s"[scale-fixture] wrote ${n}x of $src to $out")
    spark.stop()
  }
}
