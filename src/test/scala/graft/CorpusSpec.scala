package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Curation, Graph, TextAnalysis}

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("E2: components collapse transitive chains to the min label") {
    // two components: a 4-chain (no 1-4 edge) and a disjoint pair
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("a", "b")
    val out = Graph.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("E2: a long path converges within the round budget (pointer doubling)") {
    val n = 40 // path 0-1-2-...-40: diameter >> log2 rounds
    val edges = (0 until n).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val out = Graph.connectedComponents(edges, "a", "b").collect()
    assert(out.length == n + 1 && out.forall(_.getLong(1) == 0L))
  }

  test("E2: bounded fast path is stack-safe on a worst-case descending chain") {
    // advisor r7: a path graph collected in DESCENDING-id order builds
    // an O(n)-deep parent chain under union-by-min-label; a recursive
    // find() overflowed the driver stack right at the 200k fast-path
    // threshold. 99,999 edges → 199,998 symmetrized rows, just under
    // the 200k bound, so this exercises the driver union-find; the
    // descending sort makes every union hang the new node off the
    // deep end of the chain.
    val n = 99999
    val edges = (n to 1 by -1).map(i => (i.toLong, i - 1L)).toDF("a", "b")
    val out = Graph.connectedComponents(edges, "a", "b")
    assert(out.count() == n + 1L)
    assert(out.filter(col("component") =!= 0L).isEmpty)
  }

  test("E2: self-loops, duplicate and reversed edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)).toDF("a", "b")
    val out = Graph.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("E2: dedupClusters keeps exactly one canonical per component") {
    val edges = Seq((5L, 9L), (9L, 7L), (3L, 2L)).toDF("id_a", "id_b")
    val out = Graph.dedupClusters(edges, "id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byComp = out.groupBy(_._2)
    assert(byComp.keySet == Set(5L, 2L))
    byComp.foreach { case (comp, rows) =>
      assert(rows.count(_._3) == 1 && rows.find(_._3).get._1 == comp)
    }
  }

  test("E2+: pageRank matches the hand-computed 2-iteration path graph") {
    // path 1-2-3 undirected; degrees 1,2,1; unit 1e6, damping 85/100.
    // iter1: r = (575000, 1850000, 575000)
    // iter2: r = (936250, 1127500, 936250)    (integer floor division)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graph.pageRank(edges, "a", "b", iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("E2+: pageRank ranks a star's hub above its spokes") {
    val edges = (1L to 8L).map(i => (0L, i)).toDF("a", "b")
    val out = Graph.pageRank(edges, "a", "b", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 8L).forall(i => out(0L) > out(i)))
    assert((1L to 8L).map(out).distinct.size == 1) // spokes symmetric
  }

  test("E2+: pageRank is bit-identical under different partitionings") {
    // the operator's whole claim: integer micro-unit arithmetic makes
    // the result independent of accumulation order / cluster layout
    val edges = (0 until 120)
      .map(i => ((i * 7919 % 40).toLong, (i * 104729 % 40).toLong))
      .filter(e => e._1 != e._2).toDF("a", "b")
    def run(parts: Int) = Graph.pageRank(edges.repartition(parts), "a", "b", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("E2+: katzCentrality — hand chain and 2-cycle recursions, no degree discount") {
    // chain 1→2→3 at α = 1/2: k(1) stays 1e6; k(2) fixes at 1.5e6;
    // k(3) climbs 1.5e6 → 1.75e6 and holds (3-hop truncation)
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val k = Graph.katzCentrality(chain, "s", "d", iters = 3,
        alphaNum = 50, alphaDen = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k(1L) == 1000000L && k(2L) == 1500000L && k(3L) == 1750000L)
    // 2-cycle: both nodes climb 1.5e6 → 1.75e6 → 1.875e6
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val kc = Graph.katzCentrality(cyc, "s", "d", iters = 3,
        alphaNum = 50, alphaDen = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kc(1L) == 1875000L && kc(2L) == 1875000L)
  }
  test("E2+: richClub — hub clique vs periphery hand counts") {
    // K4 clique on {1,2,3,4} (deg 3+1=4 for node 1... plus spokes):
    // spokes 5,6 hang off nodes 1,2 -> deg(1)=deg(2)=4, deg(3)=deg(4)=3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (2L, 6L)).toDF("s", "d")
    val out = Graph.richClub(edges, "s", "d", Seq(0, 2, 3))
      .collect().map(r => r.getLong(0) -> r).toMap
    // k=0: all 6 nodes, 8 edges: phi = 16/30
    assert(out(0L).getAs[Long]("n_rich") == 6L)
    assert(out(0L).getAs[Long]("e_rich") == 8L)
    assert(math.abs(out(0L).getAs[Double]("phi") - 16.0 / 30.0) < 1e-12)
    // k=2: the K4 nodes (deg >= 3): 6 internal edges -> phi = 1.0
    assert(out(2L).getAs[Long]("n_rich") == 4L)
    assert(out(2L).getAs[Long]("e_rich") == 6L)
    assert(out(2L).getAs[Double]("phi") == 1.0)
    // k=3: only nodes 1,2 (deg 4): the 1-2 edge -> phi = 1.0
    assert(out(3L).getAs[Long]("n_rich") == 2L)
    assert(out(3L).getAs[Long]("e_rich") == 1L)
  }

  test("E2+: attackTolerance — removing the star hub shatters the graph") {
    // star: hub 0 with 6 spokes, plus a 2-path appendix 7-8
    val edges = ((1L to 6L).map(i => (0L, i)) :+ ((7L, 8L))).toDF("s", "d")
    val out = Graph.attackTolerance(edges, "s", "d", Seq(0, 1))
      .collect().map(r => r.getLong(0) -> r).toMap
    // intact: 9 nodes, largest component 7 (hub+spokes)
    assert(out(0L).getAs[Long]("n_nodes_left") == 9L)
    assert(out(0L).getAs[Long]("largest_cc") == 7L)
    assert(out(0L).getAs[Long]("share_ppm") == 7000000L / 9L)
    // remove the single highest-degree node (the hub): spokes
    // disconnect entirely (no surviving edges touch them) — only the
    // 7-8 pair remains edge-connected
    assert(out(1L).getAs[Long]("n_nodes_left") == 2L)
    assert(out(1L).getAs[Long]("n_edges_left") == 1L)
    assert(out(1L).getAs[Long]("largest_cc") == 2L)
    assert(out(1L).getAs[Long]("share_ppm") == 1000000L)
  }

  test("E2+: boruvkaMst — hand MST on a weighted house graph") {
    // nodes 1-5; the unique MST is {1-2:1, 2-3:2, 3-4:3, 4-5:4}
    // (5-1:10 and 2-4:9 are cycle-heavy; parallel 1-2:7 loses to 1)
    val edges = Seq(
      (1L, 2L, 1L), (2L, 1L, 7L), (2L, 3L, 2L), (3L, 4L, 3L),
      (4L, 5L, 4L), (5L, 1L, 10L), (2L, 4L, 9L)).toDF("u", "v", "w")
    val mst = Graph.boruvkaMst(edges, "u", "v", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mst == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 5L, 4L)),
      s"got $mst")
    // a disconnected graph yields a spanning FOREST (one tree per part)
    val forest = Graph.boruvkaMst(
      (Seq((1L, 2L, 5L), (10L, 11L, 6L), (11L, 12L, 7L), (10L, 12L, 8L)))
        .toDF("u", "v", "w"), "u", "v", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(forest == Set((1L, 2L), (10L, 11L), (11L, 12L)))
  }

  test("E2+: boruvkaMst fails loudly on non-integral weights (advisor r7)") {
    // a silent cast-to-long would truncate 0.9 -> 0 and return a WRONG
    // MST for double-valued distances; the micro-unit contract is
    // enforced with a raise_error, mirroring checkedLong on node ids
    val edges = Seq((1L, 2L, 0.9), (2L, 3L, 2.0)).toDF("u", "v", "w")
    val e = intercept[Exception] {
      Graph.boruvkaMst(edges, "u", "v", "w").collect() }
    assert(e.getMessage.contains("integral"))
    // integral-valued doubles pass (cast does not change the value)
    val ok = Graph.boruvkaMst(
      Seq((1L, 2L, 3.0), (2L, 3L, 1.0)).toDF("u", "v", "w"), "u", "v", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ok == Set((1L, 2L, 3L), (2L, 3L, 1L)))
  }

  test("ML: singleLinkage — threshold cut yields the dendrogram's clusters") {
    // chain 1-2-3 with weights 1,2; far pair 8-9 weight 1; bridge 3-8
    // weight 50: at threshold 10 -> clusters {1,2,3}, {8,9}
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (8L, 9L, 1L),
      (3L, 8L, 50L)).toDF("u", "v", "w")
    val out = Graph.singleLinkage(edges, "u", "v", "w", threshold = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(8L) == 8L && out(9L) == 8L)
    // at threshold 50 everything merges
    val all = Graph.singleLinkage(edges, "u", "v", "w", 50L)
      .collect().map(_.getLong(1)).toSet
    assert(all == Set(1L))
    // at threshold 0 every node is a singleton cluster of itself
    val none = Graph.singleLinkage(edges, "u", "v", "w", 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none.forall { case (n, c) => n == c })
  }

  test("E2+: betweennessPivots — exact on a path; sigma-split diamond quantizes") {
    // path 1-2-3-4-5, ALL nodes as pivots, horizon covers the diameter:
    // classic directed-pair betweenness (each unordered pair twice)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val bc = Graph.betweennessPivots(path, "u", "v",
        numPivots = 5, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bc(1L) == 0L && bc(5L) == 0L)
    assert(bc(2L) == 6000000L && bc(4L) == 6000000L) // δ sums = 6
    assert(bc(3L) == 8000000L)                        // 2·2·2 crossings
    // diamond 1-2, 1-3, 2-4, 3-4: two shortest 1→4 paths split sigma;
    // every node brokers exactly half of two paths → bc = 1e6 each
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val dbc = Graph.betweennessPivots(diamond, "u", "v",
        numPivots = 4, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dbc == Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L, 4L -> 1000000L), dbc.toString)
    // duplicate + reversed edges collapse: sigma counts paths, not edges
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L)).toDF("u", "v")
    val nbc = Graph.betweennessPivots(noisy, "u", "v",
        numPivots = 5, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nbc(3L) == 8000000L, nbc.toString)
    // single pivot = source-1 dependencies only: on the path from node
    // 1, δ(2) = 3, δ(3) = 2, δ(4) = 1, endpoints 0
    val one = Graph.betweennessPivots(path, "u", "v",
        numPivots = 1, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 3000000L, 3L -> 2000000L,
      4L -> 1000000L, 5L -> 0L), one.toString)
  }
}

class CorpusCurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("E7: removeDuplicateLines drops boilerplate, keeps order, drops empty docs") {
    val docs = Seq(
      (1L, "header\nunique one\nfooter"),
      (2L, "header\nunique two\nfooter"),
      (3L, "header\nunique three\nfooter"),
      (4L, "header\nfooter") // all lines are boilerplate
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicateLines(docs, "text", "doc_id", minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unique one", 2L -> "unique two", 3L -> "unique three"))
  }

  test("E7: removeDuplicateLines preserves multi-line order by position") {
    val docs = Seq(
      (1L, "common\nalpha\ncommon\nbeta\ngamma"),
      (2L, "common\nother\ncommon")
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicateLines(docs, "text", "doc_id", minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha\nbeta\ngamma" && out(2L) == "other")
  }

  test("E7: bm25 ranks the term-denser doc higher; termless docs absent") {
    val docs = Seq(
      (1L, "spark spark spark query engine"),
      (2L, "spark row scan filter merge"),
      (3L, "totally unrelated words here none")
    ).toDF("doc_id", "text")
    val out = Curation.bm25Scores(docs, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) > out(2L) && out(2L) > 0.0)
  }

  test("E7: bm25 matches an independently computed 2-doc hand case") {
    val docs = Seq((1L, "a b c d"), (2L, "a a b b")).toDF("doc_id", "text")
    val out = Curation.bm25Scores(docs, "text", "doc_id", Seq("a"), k1 = 1.2, b = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=2, df=2, dl=4=avgdl for both docs: idf = ln(1 + 0.5/2.5)
    val idf = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
    def score(tf: Int) =
      math.round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 4 / 4.0)) * 1e6) / 1e6
    assert(out(1L) == score(1) && out(2L) == score(2))
  }

  test("E7: bucket-written postings serve a term lookup without a postings-side shuffle") {
    val docs = Seq((1L, "spark query engine spark"), (2L, "row scan spark filter"))
      .toDF("doc_id", "text")
    val postings = Curation.buildPostings(docs, "text", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_postings").toString
    val table = "postings_spec"
    postings.write.bucketBy(8, "term").sortBy("term")
      .option("path", s"$dir/postings").mode("overwrite").saveAsTable(table)
    try {
      val indexed = spark.table(table).filter(col("term").isin("spark", "scan"))
      val scored = Curation.bm25FromPostings(indexed, "doc_id", Seq("spark", "scan"),
        stats = Curation.postingsStats(spark.table(table), "doc_id"))
      val physical = scored.queryExecution.executedPlan.toString
      // the dfreq agg over bucketed postings needs no exchange before it
      assert(!physical.contains("Exchange hashpartitioning(term"),
        s"term-keyed work must ride the bucket layout:\n$physical")
      // and the index path scores exactly what the scan path scores
      val direct = Curation.bm25Scores(docs, "text", "doc_id", Seq("spark", "scan"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaIndex = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaIndex == direct)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("E7: token-budget sampling keeps prefix-by-hash until the budget, overshooting <= 1 doc") {
    // hash = length(text) gives a controlled deterministic order:
    // doc 1 (1 token) < doc 2 (2 tokens) < doc 3 (3) < doc 4 (4)
    val docs = Seq(
      (1L, "a", "s"), (2L, "b b", "s"), (3L, "c c c", "s"), (4L, "d d d d", "s"),
      (5L, "x x x x x", "t")
    ).toDF("doc_id", "text", "src")
    val out = Curation.tokenBudgetSample(docs, col("src"), "text", "doc_id",
      budgets = Map("s" -> 4L), defaultBudget = 1L, hash = c => length(c))
      .select("doc_id", "cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // s: cum = 1, 3, 6, 10 → kept while cum-n < 4: docs 1 (0), 2 (1), 3 (3); doc 4 (6) dropped
    // t: doc 5 starts at 0 < 1 → kept (overshoot bounded by one doc)
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 6L, 5L -> 5L))
  }

  test("E4: group-keyed split never straddles a group across splits") {
    // q101's leakage contract: hashing the GROUP key means every doc of
    // a source lands in exactly one split, under any doc-level shard
    val docs = (1 to 200).map(i => (i.toLong, s"doc $i", s"host${i % 23}"))
      .toDF("doc_id", "text", "source")
    val out = docs
      .select(Curation.split(col("source"), 60, 20, graft.ext.Dedup.md5Hash60)
        .as("split"), col("source"))
      .groupBy(col("source"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .collect()
    assert(out.length == 23 && out.forall(_.getLong(1) == 1L))
  }

  test("E7: token budget law — kept tokens never exceed budget + last doc's length") {
    val docs = (1 to 40).map(i => (i.toLong, ("w " * (1 + i % 7)).trim, s"s${i % 3}"))
      .toDF("doc_id", "text", "src")
    val out = Curation.tokenBudgetSample(docs, col("src"), "text", "doc_id",
      budgets = Map("s0" -> 10L, "s1" -> 15L), defaultBudget = 5L)
      .groupBy(col("src")).agg(sum(col("n_tokens")).as("tot"), max(col("n_tokens")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val budget = Map("s0" -> 10L, "s1" -> 15L).withDefaultValue(5L)
    out.foreach { case (src, (tot, mx)) =>
      assert(tot <= budget(src) + mx, s"$src kept $tot tokens for budget ${budget(src)}")
      assert(tot > 0)
    }
  }

  test("E7: sequence packing assigns (shard, seq, offset) by running token count") {
    val docs = Seq(
      (1L, "a a a"), (2L, "b b b b"), (3L, "c c"), (4L, "d d d d d")
    ).toDF("doc_id", "text") // lengths 3, 4, 2, 5 — hash=length orders 3,1,2,4
    val out = Curation.packSequences(docs, "text", "doc_id",
      seqLen = 4, nShards = 1, hash = c => length(c))
      .select("doc_id", "shard", "seq_in_shard", "offset_in_seq").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // order by length: doc3 (2 toks, start 0), doc1 (3, start 2), doc2 (4, start 5), doc4 (5, start 9)
    assert(out(3L) == ((0L, 0L, 0L)))
    assert(out(1L) == ((0L, 0L, 2L)))
    assert(out(2L) == ((0L, 1L, 1L)))
    assert(out(4L) == ((0L, 2L, 1L)))
  }

  test("E7: decontaminate finds planted overlap and nothing else; bloom ≡ exact") {
    val bench = Seq(
      (100L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then one two three four five six seven eight stolen"),
      (2L, "completely clean document with no benchmark overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, bench, "text", "doc_id", gramSize = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 contains bench tokens 1..8 → exactly one shared 8-gram
    assert(out == Map(1L -> 1L))
    // a sabotaged sketch (tiny capacity, high fpp → many false positives)
    // must produce the SAME result: the exact semi-join kills them
    val noisy = Curation.decontaminate(corpus, bench, "text", "doc_id",
      gramSize = 8, expectedItems = 8, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noisy == out)
  }

  test("E7: maxCoverageSources — greedy picks by marginal gain, stops when dry") {
    val docs = Seq((1L, "s1", "a b c"), (2L, "s2", "c d"), (3L, "s3", "a b"))
      .toDF("doc_id", "source", "text")
    val out = Curation.maxCoverageSources(docs, "text", "source", k = 3)
      .collect()
    // s1 covers {a,b,c}; s2 adds {d}; s3 adds nothing -> greedy stops
    assert(out.length == 2)
    assert(out(0).getAs[String]("source") == "s1")
    assert(out(0).getAs[Long]("gain") == 3L)
    assert(out(1).getAs[String]("source") == "s2")
    assert(out(1).getAs[Long]("gain") == 1L)
    assert(out(1).getAs[Long]("cumulative_coverage") == 4L)
  }
}

class IngestionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ext.Dedup

  test("E2: incremental dedup flags new near-dups of the corpus, never corpus pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup INSIDE corpus
      (3L, "completely unrelated corpus document about spark plans")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog now"), // near-dup of 1/2
      (11L, "entirely novel text with no corpus overlap at all")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashNearDuplicatesAgainst(corpus, fresh, "text", "doc_id",
      shingleSize = 2, numHashes = 16, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the intra-corpus 1~2 dup must NOT appear; both corpus copies pair with 10
    assert(out == Set((1L, 10L), (2L, 10L)))
  }

  test("E4: stripMarkup removes script blocks, tags and entities; keeps text") {
    val df = Seq((1L,
      "<html><p class=\"a\">Hello &amp; welcome</p><script>var x=1;</script> <b>ok</b></html>"))
      .toDF("doc_id", "text")
    val out = df.select(TextAnalysis.stripMarkup(col("text"))).head.getString(0)
    assert(out == "Hello & welcome ok")
  }

  test("E4: url host/domain extraction; non-URLs yield empty strings") {
    val df = Seq("https://sub.news.example/path?q=1", "not a url").toDF("u")
    val out = df.select(TextAnalysis.urlHost(col("u")).as("h"),
      TextAnalysis.urlDomain(col("u")).as("d")).collect()
    assert(out(0).getString(0) == "sub.news.example" && out(0).getString(1) == "news.example")
    assert(out(1).getString(0) == "" && out(1).getString(1) == "")
  }

  test("E7: canonicalizeUrl — variants of one resource share one key") {
    val urls = Seq(
      "https://site.example/p/1?q=2",
      "HTTPS://SITE.Example:443/p/1?utm_source=feed&q=2",
      "https://site.example//p//1/?q=2&utm_campaign=x#top",
      "https://site.example:443/p/1?ref=tw&q=2#frag")
    val out = urls.toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u"))).as[String].collect()
    assert(out.toSet == Set("https://site.example/p/1?q=2"))
  }

  test("E7: canonicalizeUrl — param sort, tracking-only query, bare host, non-URL") {
    val cases = Seq(
      "http://h.example?b=2&a=1"            -> "http://h.example/?a=1&b=2",
      "https://h.example/x?utm_source=only" -> "https://h.example/x",
      "http://h.example:80"                 -> "http://h.example/",
      "not a url"                           -> "")
    val out = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("E4: qualityGate — each rule fires on its own failure mode") {
    val good = "the quick brown fox jumps over a lazy dog and then runs back " +
      "to the barn for some rest in it" // 21 words, all alpha, stopwords present
    val df = Seq(
      (1L, good),                                   // keep
      (2L, "tiny doc"),                             // rule_len fails
      (3L, good + " ### $$$ !!! ??? *** ### $$$ !!! ??? ***"), // alpha 23/33 < 0.8
      (4L, ("zzzzzzzzzzzzzzzzzzzz " * 25).trim))    // mean len 20 > 10; no stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityGate(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    def flags(i: Int) = (out(i).getAs[Boolean]("rule_len"),
      out(i).getAs[Boolean]("rule_word_len"), out(i).getAs[Boolean]("rule_alpha"),
      out(i).getAs[Boolean]("rule_stop"), out(i).getAs[Boolean]("keep"))
    assert(flags(0) == (true, true, true, true, true))
    assert(flags(1) == (false, true, true, false, false))
    assert(flags(2) == (true, true, false, true, false))
    assert(flags(3) == (true, false, true, false, false))
    // the signals behind doc 1's verdict, hand-computed
    assert(out(0).getAs[Int]("n_words") == 21)
    assert(out(0).getAs[Int]("stop_hits") == 8) // the×2, a, and, to, for, in, it
  }
}

class TextSignalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("E4: redactPii replaces emails, IPs and phones; counts match") {
    val df = Seq(
      (1L, "reach me at jane.doe@example.com or 10.0.0.7 or 555-0142 thanks"),
      (2L, "no pii in this row at all")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("red"),
      TextAnalysis.piiCount(col("text"), "email").as("e"),
      TextAnalysis.piiCount(col("text"), "ipv4").as("i"),
      TextAnalysis.piiCount(col("text"), "phone").as("p"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) == ("reach me at <EMAIL> or <IP> or <PHONE> thanks", 1, 1, 1))
    assert(out(2L) == ("no pii in this row at all", 0, 0, 0))
  }

  test("E4: mixed-case emails are still redacted (real corpora aren't lowercase)") {
    val df = Seq((1L, "Contact Jane.Doe@Example.COM today")).toDF("doc_id", "text")
    val out = df.select(TextAnalysis.redactPii(col("text"))).head.getString(0)
    assert(out == "Contact <EMAIL> today")
  }

  test("E4: version-like dotted numbers with word chars attached stay intact") {
    val df = Seq((1L, "released v1.2.3.4suffix and kept")).toDF("doc_id", "text")
    // trailing word char means no \b after the last octet — not an IP
    val out = df.select(TextAnalysis.redactPii(col("text"))).head.getString(0)
    assert(out == "released v1.2.3.4suffix and kept")
  }

  test("E4: repetition signals on a hand-computed doc") {
    val df = Seq(
      (1L, "a a a b"),   // 4 tokens, top a=3, distinct 2; bigrams: aa,aa,ab → top 2/3
      (2L, "x y z w"),   // no repetition
      (3L, "solo")       // single token: no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4L, 0.75, 0.5, 2.0 / 3)))
    assert(out(2L) == ((4L, 0.25, 0.0, 1.0 / 3)))
    assert(out(3L) == ((1L, 1.0, 0.0, 0.0)))
  }

  test("E4: bigramLogProb ranks a scrambled twin below its well-ordered source") {
    // three near-identical well-ordered docs establish the model;
    // doc 10 is doc 1 reversed — same unigrams, broken bigrams
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat"),
      (10L, "mat the on sat cat the")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 10L))
    assert(out(10L)._1 == 5L) // 6 tokens → 5 bigrams
    assert(out(10L)._2 < out(1L)._2, s"scrambled ${out(10L)} must score below ${out(1L)}")
    assert(out(10L)._2 < out(2L)._2 && out(10L)._2 < out(3L)._2)
  }

  test("E4: readability — hand-computed Flesch milli-points; empty-doc guards") {
    val df = Seq(
      (1L, "The cat sat. It ran!"), // W=5 S=2 Y=5
      (2L, "")                      // all guards floor to 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, col("text"))
      .select("doc_id", "words", "sentences", "syllables", "flesch_milli", "band")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    // 206835 − (1015·5) div 2 − (84600·5) div 5 = 206835 − 2537 − 84600
    assert(out(1L) == ((5L, 2L, 5L, 119698L, "very_easy")))
    // 206835 − 1015 − 84600 = 121220
    assert(out(2L) == ((1L, 1L, 1L, 121220L, "very_easy")))
    // dense prose scores lower than simple prose: many-syllable words
    val hard = Seq((3L, "Incomprehensibility characterizes bureaucratization"))
      .toDF("doc_id", "text")
    val h = TextAnalysis.readability(hard, col("text"))
      .select("flesch_milli").head.getLong(0)
    assert(h < 0L, s"polysyllabic one-sentence doc must score negative, got $h")
  }

  test("E2+: personalizedPageRank — seed proximity beats symmetric centrality") {
    import spark.implicits._
    // barbell: 1-2-3 and 4-5-6 joined 3-4; seed {1}. By symmetry plain
    // pageRank ranks (1,6), (2,5), (3,4) equally; PPR must break every
    // pair toward the seed side.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val seeds = Seq(1L).toDF("id")
    val ppr = Graph.personalizedPageRank(edges, "a", "b", seeds, "id", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr(1L) > ppr(6L) && ppr(2L) > ppr(5L) && ppr(3L) > ppr(4L))
    // teleporting to EVERY node degenerates to plain pageRank exactly
    val allNodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val asPlain = Graph.personalizedPageRank(edges, "a", "b", allNodes, "id",
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Graph.pageRank(edges, "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asPlain == plain)
  }

  test("E4: boilerplateShingles finds the planted repeated span, ppm-exact") {
    val docs = (1L to 20L).map { i =>
      val body = s"unique$i words here number$i"
      // the span 'all rights reserved' rides on 60% of docs
      (i, if (i % 5 != 0) s"$body all rights reserved" else body)
    }.toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateShingles(docs, col("text"),
      col("doc_id"), shingleSize = 2, minDfPpm = 500000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("df_ppm")).toMap
    // 'words here' rides on EVERY doc (the fixture's own template)
    assert(out.keySet == Set("all rights", "rights reserved", "words here"))
    assert(out("words here") == 1000000L)
    assert(out("all rights") == 800000L && out("rights reserved") == 800000L)
  }

  test("E4: vocabGrowth — first-occurrence curve, cumulative and saturating") {
    val docs = Seq(
      (0L, "a b"), (1L, "a c"),          // checkpoint 10: a, b, c (+bigrams n/a at size 1)
      (12L, "d"), (13L, "a"),            // checkpoint 20: d
      (25L, "e f"))                      // checkpoint 30 -> clamped to n_docs
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs,
      TextAnalysis.tokens(col("text")), col("doc_id"), every = 10L)
      .orderBy("docs_seen").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("new_tokens"), r.getAs[Long]("vocab")))
    assert(out.toSeq == Seq((5L, 3L, 3L), (5L, 1L, 4L), (5L, 2L, 6L)))
  }

  test("E4: keywordsByChi2 — exclusive tokens top their slice, shared " +
      "tokens score zero") {
    val docs = Seq((1L, "apple common", "en"), (2L, "banane common", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.keywordsByChi2(docs, col("text"), col("lang"),
      topK = 1)
      .collect().map(r => r.getAs[String]("slice") ->
        (r.getAs[String]("token"), r.getAs[Double]("chi2"))).toMap
    // 2×2 cells (1,0,1,2): χ² = 4·(2−0)²/(1·3·2·2) = 4/3
    assert(out("en") == (("apple", 1.333333)))
    assert(out("de") == (("banane", 1.333333)))
  }

  test("E4: heapsFit — a linear vocabulary curve fits beta 1, K 1 exactly") {
    // 50 docs, each contributing exactly one NEW token → V(n) = n at
    // every checkpoint → ln-ln OLS gives slope 1, intercept 0
    val docs = (0L until 50L).map(i => (i, s"w$i")).toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(docs, TextAnalysis.tokens(col("text")),
      col("doc_id"), every = 25L).head()
    assert(r.getAs[Long]("n_points") == 2L)
    assert(r.getAs[Double]("beta") == 1.0)
    assert(r.getAs[Double]("ln_k") == 0.0)
    assert(r.getAs[Double]("k") == 1.0)
  }

  test("E4: heapsFit — sublinear growth fits beta below 1") {
    // second half of the corpus adds half as many new tokens per doc:
    // checkpoints (25, 25) and (50, 37) → beta = ln(37/25)/ln 2 < 1
    val docs = ((0L until 25L).map(i => (i, s"w$i")) ++
      (25L until 50L).map(i =>
        (i, if (i % 2 == 0) s"w${i}" else "w0"))).toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(docs, TextAnalysis.tokens(col("text")),
      col("doc_id"), every = 25L).head()
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.5 && beta < 0.7)
  }
}