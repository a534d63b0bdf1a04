package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Plan-shape regressions: properties of the PHYSICAL plan that keep
  * the engine honest at 100 TB — filter/column pushdown into the
  * parquet scan, and single evaluation of named expensive expressions.
  * (Value-correctness lives in the oracle gate; these pin the plans.) */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("extended"))

  test("q02's filter and projection reach the parquet scan") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val plan = planString(SparkEntry.queries("q02_filter_project")(spark, dir))
    assert(plan.contains("PushedFilters: ["), "filters must push into the scan")
    assert(!plan.contains("PushedFilters: []"), "pushed filter list must be non-empty")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"),
      s"scan must prune unused columns, got: $readSchema")
  }

  test("langIdFromTokens over a named token column tokenizes once per row") {
    val df = Seq("the cat and the dog of it", "der hund und die katze").toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(TextAnalysis.langIdFromTokens(col("toks")).as("pred"))
    val physical = df.queryExecution.executedPlan.toString
    val splits = "split\\(".r.findAllIn(physical).length
    assert(splits <= 1, s"token split must not be inlined per filter; saw $splits")
    // and the semantics still hold
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de"))
  }

  test("cosine scoring uses the native array_dot expression, not an interpreted fold") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val plan = planString(SparkEntry.queries("q44_cosine_topk")(spark, dir))
    assert(plan.contains("array_dot"),
      "the E3 hot kernel must stay on the codegen ArrayDotProduct expression")
  }

  test("winnowing runs in ONE doc-keyed exchange (count + sliding min share the sort)") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y z w v u t s")).toDF("doc_id", "text")
    val out = TextAnalysis.winnowingFingerprints(docs, "text", "doc_id", k = 4, w = 4)
    val physical = out.queryExecution.executedPlan.toString
    // both window functions partition on the doc id — one shuffle, one sort
    val exchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(physical).length
    assert(exchanges <= 1, s"winnowing must not re-shuffle between windows; saw $exchanges:\n$physical")
  }

  test("tfidf keeps the corpus size as a 1-row broadcast, never a shuffle join") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = graft.ext.Curation.tfIdfTopTerms(docs, "text", "doc_id", 2)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastNestedLoopJoin") || physical.contains("BroadcastExchange"),
      "the N-docs scalar must broadcast")
    assert(!physical.contains("CartesianProduct"), "no cartesian for the 1-row N join")
  }

  test("bm25 broadcasts df and corpus stats; no cartesian anywhere") {
    val docs = Seq((1L, "a b a"), (2L, "b c d")).toDF("doc_id", "text")
    val out = graft.ext.Curation.bm25Scores(docs, "text", "doc_id", Seq("a", "b"))
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastExchange") || physical.contains("BroadcastNestedLoopJoin"),
      "df/stats sides must broadcast")
    assert(!physical.contains("CartesianProduct"),
      "the 1-row stats join must never plan a cartesian")
  }

  test("decontaminate prefilters scan-side and never plans a cartesian") {
    val bench = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val corpus = Seq((2L, "a b c d e f g h stolen")).toDF("doc_id", "text")
    val out = graft.ext.Curation.decontaminate(corpus, bench, "text", "doc_id", 8)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      "gram matching must stay an equi-join")
    assert(physical.contains("LeftSemi"),
      "exact verification must be a semi-join (bloom false positives die there)")
  }

  test("exact-sum linear fit is ONE hash aggregate (one exchange, no joins)") {
    val df = Seq(("a", 1, 2), ("a", 2, 4), ("b", 3, 5)).toDF("k", "x", "y")
    val out = graft.ops.Aggregates.linearFitExact(df, Seq(col("k")), col("x"), col("y"))
    val physical = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges == 1, s"five sums must ride one agg pass; saw $exchanges exchanges")
    assert(!physical.contains("Join"), "closed-form fit needs no join")
  }

  test("sequence packing runs in one shard-keyed window exchange") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i")).toDF("doc_id", "text")
    val out = graft.ext.Curation.packSequences(docs, "text", "doc_id", 4, 2)
    val physical = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges <= 1, s"cum/seq/offset must share the shard window sort; saw $exchanges")
  }

  test("markup stripping and URL extraction stay scan-side (zero exchanges)") {
    val docs = Seq((1L, "<p>hi &amp; bye</p>", "https://A.example/x?u=1"))
      .toDF("doc_id", "t", "url")
    val out = docs.select(
      TextAnalysis.stripMarkup(col("t")).as("cleaned"),
      TextAnalysis.urlHost(lower(col("url"))).as("host"),
      TextAnalysis.urlDomain(lower(col("url"))).as("domain"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"per-row text extraction must not shuffle:\n$physical")
  }

  test("quality gate is one scan-side projection (zero exchanges, no UDF)") {
    val docs = Seq((1L, "the cat sat"), (2L, "### $$$")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityGate(docs, "text", "doc_id")
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"the keep decision must not shuffle:\n$physical")
    assert(!physical.contains("BatchEvalPython") && !physical.contains("ScalaUDF"),
      "gate rules must stay codegen'd column expressions")
  }

  test("the q119 curation capstone's composed plan stays equi-join-only") {
    // the component rounds are localCheckpoint'd (their plans are pinned
    // by the LSH/graph specs); this pins the visible composed plan:
    // gate → dedup joins → cluster join → split agg, no pair space
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val physical = SparkEntry.queries("q119_corpus_e2e")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      "no stage of the composed pipeline may materialize a pair space")
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "no unkeyed join anywhere in the composed plan")
  }

  test("prefix-filter join generates candidates via shingle equi-joins, never a cartesian") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val out = graft.ext.Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
      shingleSize = 2, tNum = 1, tDen = 2, cache = false)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      "the pair space must come from the prefix-shingle equi-join")
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "no unkeyed all-pairs comparison anywhere in the plan")
  }

  test("incremental near-dup joins corpus and batch on band keys, never a cartesian") {
    val corpus = Seq((1L, "a b c d e f"), (2L, "g h i j k l")).toDF("doc_id", "text")
    val fresh = Seq((10L, "a b c d e f x")).toDF("doc_id", "text")
    val out = graft.ext.Dedup.minhashNearDuplicatesAgainst(corpus, fresh,
      "text", "doc_id", shingleSize = 3, numHashes = 16, bands = 16, threshold = 0.8,
      cache = false)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      "candidate generation must stay a band-key equi-join")
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "no unkeyed corpus×batch pairing anywhere in the plan")
  }

  test("adaptive kNN with a small position set plans a broadcast, not a cartesian") {
    val sensors = (1 to 20).map(i => (i.toLong, (i % 5).toDouble, (i / 5).toDouble))
      .toDF("id_sensor", "x", "y")
    val features = (1 to 50).map(j => (j.toLong, (j % 10).toDouble, (j % 7).toDouble, j.toDouble))
      .toDF("feature_id", "x", "y", "v")
    val out = graft.ops.SpatialOps.knnAggregate(sensors, features, 3,
      Seq("mean"), Seq("v"), "feature_id")
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastNestedLoopJoin"),
      "small position set must broadcast")
    assert(!physical.contains("CartesianProduct"),
      "pair generation must never plan a cartesian product")
  }

  test("skyline's ordered window runs on the per-x rollup, never the fact table") {
    val df = (1 to 100).map(i => (i.toLong, (i % 13).toLong, (i % 7).toDouble))
      .toDF("id", "x", "y")
    val out = graft.ops.Dominance.skyline2D(df, "x", "y")
    val physical = out.queryExecution.executedPlan.toString
    // the fact side re-enters via a broadcast join; the only sort feeds
    // the rollup window
    assert(physical.contains("BroadcastHashJoin") ||
      physical.contains("BroadcastExchange"),
      s"rollup must broadcast back to the fact table:\n$physical")
    assert("Window ".r.findAllIn(physical).length <= 1,
      "exactly one window (the rollup prefix max)")
  }

  test("globalRowNumber ranks via range repartition, not a single-partition window") {
    val df = (1 to 200).map(i => (i.toLong, (i * 37 % 101).toDouble)).toDF("id", "v")
    // the checkpoint inside globalRowNumber hides the rank stage from
    // the final plan — assert on the pre-materialization frame, where
    // the range exchange and the pid-partitioned window must live
    val ranked = graft.ops.Ranking.rankedWithPid(df, Seq(col("v"), col("id")))
    val physical = ranked.queryExecution.executedPlan.toString
    assert(physical.contains("rangepartitioning"),
      s"rank must range-repartition:\n$physical")
    // the data-row window must partition on the pid — the only
    // single-partition stage allowed is the |partitions|-row offset
    // rollup on the broadcast side
    assert(physical.contains("windowspecdefinition(__pid"),
      s"the per-row window must partition on __pid:\n$physical")
    // and the final assembly joins the offsets back via broadcast
    val out = graft.ops.Ranking.globalRowNumber(df, Seq(col("v"), col("id")))
    val outPlan = out.queryExecution.executedPlan.toString
    assert(outPlan.contains("BroadcastHashJoin"),
      s"offsets must broadcast back:\n$outPlan")
  }

  test("interval overlap join plans cell equi-joins, never a cartesian/nested loop") {
    val mk = (1 to 30).map(i => (i.toLong % 3, i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"),
      java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:30:00")))
    val a = mk.toDF("k", "id", "s", "e")
    val out = graft.ops.TimeSeriesOps.intervalOverlapJoin(
      a, a, "k", "id", "s", "e", 1800000000L)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"),
      s"overlap join must stay an equi-join on (key, cell):\n$physical")
  }

  test("E6: Guardrails audit fires on each hazard class and stays quiet on clean plans") {
    import graft.plans.Guardrails
    val big = spark.range(100000).toDF("id")       // beyond the bounded-side threshold
    val dim = spark.range(2000).toDF("k")

    // clean plan: equi-join + partitioned window + final orderBy
    Guardrails.drain()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id") % 10).orderBy(col("id"))
    big.join(dim, col("id") === col("k"))
      .withColumn("rn", row_number().over(w))
      .orderBy(col("id")).collect()
    val clean = Guardrails.drain()
    assert(clean.isEmpty, s"clean plan flagged: $clean")

    // cartesian join between two unbounded sides
    big.crossJoin(dim).count()
    assert(Guardrails.drain().exists(_.kind == "cartesian_join"))

    // but an aggregate (bounded) broadcast side is NOT flagged
    big.crossJoin(dim.agg(max(col("k")).as("mx"))).count()
    assert(!Guardrails.drain().exists(_.kind == "cartesian_join"))

    // single-partition window
    val wg = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    big.withColumn("rn", row_number().over(wg)).collect()
    assert(Guardrails.drain().exists(_.kind == "single_partition_window"))

    // mid-plan global sort (sort feeding an aggregation, not the result)
    big.orderBy(col("id")).groupBy(col("id") % 7).count().collect()
    assert(Guardrails.drain().exists(_.kind == "global_sort"))

    // final presentation ORDER BY alone is not a hazard
    big.groupBy(col("id") % 7).count().orderBy(col("count")).collect()
    assert(!Guardrails.drain().exists(_.kind == "global_sort"))
  }

  test("E6: verifyWindowClaims re-flags a name-matched claim whose window " +
      "actually sits over the fact table (the round-9 decileLift hole)") {
    import graft.plans.Guardrails
    // large enough that Range's maxRows exceeds the structural bound
    val big = spark.range(2000000).toDF("id")
    val wg = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    // a MISLABELED claim: the marker matches the window's columns by
    // name, but the window runs over the raw fact frame — exactly how
    // the round-9 decileLift regression hid from the name-only audit
    Guardrails.expect("single_partition_window", "__bogus_total, id",
      "test: deliberately mislabeled fact-table window", "k-literal")
    val df = big.withColumn("__bogus_total", count(lit(1)).over(
      wg.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)))
    Guardrails.drain(); Guardrails.drainExpected()
    val opt = df.queryExecution.optimizedPlan
    // name-matching alone would suppress it...
    assert(Guardrails.drainExpected().nonEmpty,
      "the mislabeled claim should match by name (that is the hole)")
    // ...but the structural pass on the FINAL plan re-flags it
    val flagged = Guardrails.verifyWindowClaims(opt)
    assert(flagged.exists(_.detail.contains("structurally unverified")),
      s"mislabeled claim not re-flagged: $flagged")

    // and a LEGITIMATE rollup window with a matching claim passes the
    // structural check (Aggregate under the window)
    Guardrails.expect("single_partition_window", "__bogus_total, digit",
      "test: legitimate 9-row digit rollup", "k-literal")
    val wd = org.apache.spark.sql.expressions.Window.orderBy(col("digit"))
    val rollup = big.groupBy((col("id") % 9).as("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__bogus_total", sum(col("n")).over(
        wd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
    assert(Guardrails.verifyWindowClaims(
      rollup.queryExecution.optimizedPlan).isEmpty)
  }

  test("E6: repartition-before-materialize does NOT survive into later " +
      "joins (Spark 4.1) — pins why the graph loops skip it") {
    // Measured fact the iterative graph ops' materialization choice
    // rests on: under AQE, neither localCheckpoint (LogicalRDD reports
    // UnknownPartitioning) nor a cached repartition reliably carries
    // its hash layout into a later equi-join — the join re-shuffles
    // BOTH sides. So pre-partitioning the per-round edge list buys
    // nothing here; the loops keep plain localCheckpoint (eager,
    // lineage-truncating, GC-scoped). If Spark ever starts preserving
    // the layout, this test fails and the loops should revisit
    // repartition-before-materialize for the per-round join savings.
    val n = spark.sessionState.conf.numShufflePartitions
    val base = spark.range(10000)
      .select((col("id") % 100).as("src"), (col("id") % 37).as("dst"))
    val frontier = spark.range(50)
      .select(col("id").as("src"), lit(1L).as("v"))
    // force the shuffle-join shape (a tiny frontier would broadcast and
    // prove nothing about the big side's layout)
    val ckpt = base.repartition(n, col("src")).localCheckpoint()
    val j = ckpt.join(frontier.hint("shuffle_hash"), "src")
    j.collect()
    // an executed adaptive plan prints "current" AND "initial" sections
    // — count the final (first) section only
    val finalSection = j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(src") &&
        l.contains("ENSURE_REQUIREMENTS"))
    assert(exchanges == 2, "localCheckpoint now preserves partitioning? " +
      "revisit repartition-before-checkpoint in graft.ext.Graph loops")
  }
}
