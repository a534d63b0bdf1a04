package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E2+ — distributed connected components over a pair graph: the
  * clustering step a dedup pipeline runs AFTER candidate generation
  * (MinHash/SimHash/embedding near-dup pairs are edges; a component is
  * a duplicate cluster; the min doc id is its canonical document).
  * The reference's dedup surface stops at pair emission — transitive
  * closure is the Spark-gap operator that turns pairs into keep/drop
  * decisions (A ~ B ~ C must collapse to ONE kept doc even when A ~ C
  * was never emitted as a pair).
  *
  * Algorithm: iterative min-label propagation with path shortcutting.
  * Each round does
  *   1. neighbor step — comp(v) := min(comp(v), min over edges (v,u)
  *      of comp(u)); one equi-join keyed on node id + one aggregation;
  *   2. shortcut step — comp(v) := comp(comp(v)); pointer doubling, so
  *      a chain of length L converges in O(log L) rounds instead of
  *      O(L) (the large-star/small-star recurrence from Kiveris et al.,
  *      "Connected Components in MapReduce and Beyond", SoCC'14 —
  *      public literature).
  * The loop is driver-side but each iteration's work is a pure
  * distributed plan; the only driver-visible value per round is ONE
  * aggregated change count. Labels are localCheckpoint'd each round —
  * without it the plan doubles per iteration and Catalyst analysis,
  * not the data, becomes the bottleneck.
  *
  * Scale: every join/agg keys on node id or label — uniform content
  * hashes when nodes are dedup doc ids. Near-dup graphs are
  * overwhelmingly small-diameter (duplicate clusters), so rounds ≈ 2-3;
  * the shortcut step bounds pathological chains at O(log n) rounds.
  */
object Graph {

  /** E2+/reliability — CUT VERTICES (articulation points) and BRIDGES
    * of an undirected graph in one Tarjan low-point pass (Hopcroft &
    * Tarjan 1973, public literature): the single-points-of-failure
    * readout for service-dependency / data-lineage graphs. A vertex is
    * a cut vertex iff removing it splits its component; an edge is a
    * bridge iff removing it does.
    *
    * AUDIT-SLICE CONTRACT (the q497 SCC discipline, stricter): the
    * low-point DFS has NO bounded-round exact distributed formulation
    * — published distributed alternatives are label-propagation
    * approximations with different semantics — so this operator is
    * driver-side by design and REFUSES above 100k nodes / 500k edges
    * rather than pretending to shard. Reliability questions are asked
    * of bounded dependency graphs; cap the node set upstream.
    *
    * Parallel edges and self-loops are removed first (simple-graph
    * semantics: a doubled edge is never a bridge — that is a property
    * of the MULTIgraph, and this operator documents the simple-graph
    * view). Returns (cutVertices: (node), bridges: (u, v) with u < v). */
  def cutVerticesAndBridges(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(checkedLong(col(srcCol)).as("a"),
        checkedLong(col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    // the fence runs DISTRIBUTED, before any collect (the SCC
    // discipline) — a fact-scale edge frame must refuse, not OOM the
    // driver on the way to the refusal
    val nEdges = e.count()
    require(nEdges <= 500000,
      s"cutVerticesAndBridges is an audit-slice operator (driver " +
        s"low-point DFS): $nEdges edges exceed 500000 — cap the graph " +
        "upstream")
    val nNodes = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n"))).distinct().count()
    require(nNodes <= 100000,
      s"cutVerticesAndBridges is an audit-slice operator (driver " +
        s"low-point DFS): $nNodes nodes exceed 100000 — cap the graph " +
        "upstream")
    val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    val nodeSet = scala.collection.mutable.TreeSet.empty[Long]
    pairs.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.ArrayBuffer.empty) += u
      nodeSet += u; nodeSet += v
    }
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    val cuts = scala.collection.mutable.Set.empty[Long]
    val bridges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var counter = 0
    nodeSet.foreach { root =>
      if (!index.contains(root)) {
        var rootChildren = 0
        // frames: (node, iterator over neighbors)
        val frames = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Iterator[Long])]
        index(root) = counter; low(root) = counter; counter += 1
        frames += ((root, adj(root).iterator))
        while (frames.nonEmpty) {
          val (x, it) = frames.last
          var descended = false
          while (it.hasNext && !descended) {
            val w = it.next()
            if (!index.contains(w)) {
              parent(w) = x
              if (x == root) rootChildren += 1
              index(w) = counter; low(w) = counter; counter += 1
              frames += ((w, adj(w).iterator))
              descended = true
            } else if (parent.get(x).contains(w)) {
              // tree edge back to parent — skipped ONCE; further
              // sightings would be parallel edges, already dedup'd
              ()
            } else if (index(w) < low(x)) low(x) = index(w)
          }
          if (!descended) {
            frames.remove(frames.length - 1)
            if (frames.nonEmpty) {
              val p = frames.last._1
              if (low(x) < low(p)) low(p) = low(x)
              if (low(x) > index(p))
                bridges += ((math.min(p, x), math.max(p, x)))
              if (p != root && low(x) >= index(p)) cuts += p
            }
          }
        }
        if (rootChildren >= 2) cuts += root
      }
    }
    (cuts.toSeq.sorted.toDF("node"),
      bridges.toSeq.sorted.toDF("u", "v"))
  }

  /** Node-id cast that FAILS on non-numeric ids instead of silently
    * nulling them away (a string-keyed edge list through the registry
    * surface would otherwise read as "no triangles / empty core"). */
  private def checkedLong(c: Column): Column =
    when(c.isNotNull && c.cast("long").isNull,
      raise_error(lit("graph ops require numeric node ids — hash string " +
        "ids (xxhash64) upstream"))).otherwise(c.cast("long"))

  /** Pin a frame that an ITERATIVE loop equi-joins on `key` every
    * round: one hash exchange + one in-partition sort paid ONCE, then
    * localCheckpoint'd — the LogicalRDD KEEPS the checkpointed plan's
    * outputPartitioning and outputOrdering (the measured symClosed /
    * betweennessPivots device), so each round's sort-merge join
    * consumes it exchange-free and sort-free. Opt guide §2.4 ("two
    * operations keyed the same way can share one exchange") / §3.1
    * (stats erasure defeats the planner). An earlier draft of this
    * round pinned via `.cache()` instead: the InMemoryRelation's
    * columnar encode at build + per-round decode cost MORE than the
    * saved exchanges at 2-3-iteration depths (q223 +1.0, q398 +0.4
    * normalized seconds in the batch-1 bench) — checkpointed
    * UnsafeRows are read back as-is. */
  private def pinByKey(df: DataFrame, key: String): DataFrame =
    // explicit width (the q467 symClosed lesson): without it AQE
    // coalesces the pinned frame to a handful of partitions and
    // every later round runs under-parallelized
    df.repartition(df.sparkSession.sparkContext.defaultParallelism,
        col(key))
      .sortWithinPartitions(key)
      .localCheckpoint()

  /** Node-count gate below which an iterative loop BROADCASTS its
    * node-sized per-round frame (ranks/labels/scores) instead of
    * sort-merge-joining it against the edge list: the edge list is
    * then only ever SCANNED — zero per-round edge exchanges (guide
    * §3.1; the checkpoint erased the stats that would have let
    * Catalyst pick this itself, and the measured q226 bradleyTerry
    * win is exactly this shape). ~2M (node, long) rows ≈ tens of MB
    * framed — inside every broadcast comfort zone. Above the gate the
    * loop falls back to [[pinByKey]]-layout sort-merge joins, which is
    * also the 100 TB shape once node frames outgrow broadcast.
    * Value shared across operators via [[graft.core.Gates]]. */
  private val BcastNodeMax = graft.core.Gates.BcastRowsMax

  /** Driver-side union-find with min-label roots, used by the bounded
    * fast paths below. `find` is ITERATIVE (walk to the root, then a
    * second pass path-compresses) — union-by-min-label can build an
    * O(n)-deep parent chain (e.g. a path graph whose edges arrive in
    * descending-id order), and a recursive find would overflow the
    * driver stack right at the fast-path threshold. Every node passed
    * to `find` is registered, so `labels` covers all touched nodes. */
  private final class MinLabelUnionFind {
    private val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      if (!parent.contains(x)) { parent(x) = x; return x }
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (c != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(u: Long, v: Long): Unit = {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    /** (node, min-label root) for every node ever passed to find/union. */
    def labels: Seq[(Long, Long)] =
      parent.keys.toSeq.map(x => (x, find(x)))
  }

  /** Connected components of the undirected graph given by `edges`
    * (one row per edge; direction ignored; self-loops and duplicate
    * edges are harmless). Returns one row per node that appears in at
    * least one edge: (node, component), where `component` is the
    * MINIMUM node id reachable from `node` — a deterministic canonical
    * label independent of partitioning and iteration order. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, cache: Boolean = true): DataFrame = {
    // symmetrize in ONE pass over `edges` (explode of the two
    // directions) — a self-union would evaluate the upstream pair
    // generator (often a whole LSH pipeline) once per branch before
    // the cache exists. Duplicate/self edges survive; min() absorbs
    // them. Every round's neighbor step re-reads `sym`, so it MUST be
    // materialized: cache = false callers (no release point) get a
    // localCheckpoint — eager, lineage-truncated, GC-scoped blocks —
    // rather than paying the whole edge pipeline once per round. The
    // truncated lineage costs nothing extra here: `labels` is
    // localCheckpoint'd unconditionally below, so the loop already has
    // the restart-on-executor-loss profile either way.
    val symPlan = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val sym =
      // cache=true: pin in the layout of the per-round neighbor join
      // (keyed on dst) so iterations re-shuffle only the node-sized
      // label frame, never the edge list (guide §2.4); the one-time
      // exchange is also what a 100 TB run wants. cache=false callers
      // (no release point) keep the plain eager checkpoint.
      if (cache) pinByKey(symPlan, "dst")
      else symPlan.localCheckpoint()

    // BOUNDED fast path (the knnAggregate adaptive-regime discipline):
    // a small edge list pays the iterative loop's per-round job
    // latency for nothing — a driver union-find produces the IDENTICAL
    // min-label result in one collect. The threshold is a row count on
    // the already-materialized frame (one cheap job); duplicate-pair
    // generators stay distributed. At 100 TB the near-dup pair lists
    // that reach this operator are usually ≪ fact volume anyway — the
    // distributed loop below remains the unbounded-scale path.
    val symCount = sym.count()
    if (symCount <= 200000L) {
      val uf = new MinLabelUnionFind
      sym.collect().foreach(r => uf.union(r.getLong(0), r.getLong(1)))
      val spark = edges.sparkSession
      import spark.implicits._
      return uf.labels.toDF("node", "component")
    }

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // 1. neighbor min: smallest label among self and direct neighbors
      val nbrMin = sym.join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(min(col("comp")).as("nbr_comp"))
      val stepped = labels.withColumnRenamed("comp", "prev")
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("prev"),
          least(col("prev"), coalesce(col("nbr_comp"), col("prev"))).as("comp"))
      // 2. shortcut: follow the label's own label (pointer doubling);
      // the round's previous label rides along so convergence costs no
      // extra join — the checkpointed frame answers it directly
      val byComp = stepped.select(col("node").as("comp"), col("comp").as("comp2"))
      val shortcut = stepped.join(byComp, Seq("comp"), "left")
        .select(col("node"), col("prev"), coalesce(col("comp2"), col("comp")).as("comp"))
        .localCheckpoint() // truncate lineage; plan size stays constant per round
      // ONE scalar reaches the driver per round: the change count
      val changes = shortcut.filter(col("comp") =!= col("prev")).count()
      labels = shortcut.select(col("node"), col("comp"))
      converged = changes == 0
      iter += 1
    }
    labels.select(col("node"), col("comp").as("component"))
  }

  /** E2+/ML — BORŮVKA minimum spanning forest (Borůvka 1926; the
    * parallel MST algorithm of choice — each round every component
    * grabs its lightest outgoing edge, components at least halve, so
    * O(log |V|) rounds): THE missing Spark primitive behind
    * single-linkage clustering (cut the forest at a distance
    * threshold — or drop the k−1 heaviest edges for k clusters),
    * network-design cost floors, and bottleneck ("minimax") paths.
    * Ties are broken by the TOTAL order (w, a, b), which is
    * equivalent to distinct weights, so the forest is unique and a
    * replay on any engine must produce the identical edge set.
    * Returns the forest edges: (a, b, w) with a < b.
    *
    * Scale: each round is two node-keyed label joins + one
    * min-struct agg per component + a COMPONENT-level contraction
    * (frames shrink at least geometrically); the edge list is
    * checkpointed once. No cartesian, no global sort; ONE scalar
    * (remaining cross-edge count) reaches the driver per round. */
  def boruvkaMst(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, maxRounds: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    // weights get the same loud-cast treatment as node ids: a silent
    // cast-to-long truncates fractional distances toward zero and
    // returns a WRONG forest/clustering with no error. Integer
    // micro-units (scale doubles by 1e6 upstream) are the contract.
    val wRaw = col(weightCol)
    val wLong = wRaw.cast("long")
    val checkedWeight =
      when(wRaw.isNotNull && (wLong.isNull || wLong.cast("double") =!= wRaw.cast("double")),
        raise_error(concat(lit("boruvkaMst/singleLinkage weights must be " +
          "integral (micro-unit contract: scale doubles upstream) — got "),
          wRaw.cast("string")))).otherwise(wLong)
    val e0 = edges.select(
        least(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("a"),
        greatest(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("b"),
        checkedWeight.as("w"))
      .filter(col("a") =!= col("b"))
      // the (w, a, b) total order needs ONE row per undirected edge:
      // keep the lightest parallel edge
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
      .localCheckpoint()
    var comp = e0.select(explode(array(col("a"), col("b"))).as("node"))
      .distinct().withColumn("comp", col("node"))
      .localCheckpoint()
    var mst = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType))))
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val lab = e0
        .join(comp.select(col("node").as("a"), col("comp").as("__ca")), "a")
        .join(comp.select(col("node").as("b"), col("comp").as("__cb")), "b")
        .filter(col("__ca") =!= col("__cb"))
        .localCheckpoint() // read by the count + both pick sides
      if (lab.isEmpty) done = true
      else {
        // every component picks its lexicographically-least (w, a, b)
        // outgoing edge; an edge picked from either side joins the forest
        val pick = lab.select(col("__ca").as("__c"),
            struct(col("w"), col("a"), col("b"),
              col("__ca"), col("__cb")).as("__e"))
          .unionByName(lab.select(col("__cb").as("__c"),
            struct(col("w"), col("a"), col("b"),
              col("__ca"), col("__cb")).as("__e")))
          .groupBy(col("__c")).agg(min(col("__e")).as("__e"))
        val chosen = pick
          .select(col("__e.a").as("a"), col("__e.b").as("b"),
            col("__e.w").as("w"), col("__e.__ca").as("__ca"),
            col("__e.__cb").as("__cb"))
          .dropDuplicates("a", "b")
          .localCheckpoint()
        mst = mst.unionByName(chosen.select(col("a"), col("b"), col("w")))
          .localCheckpoint()
        // contract: merge the chosen component pairs. The contraction
        // graph has ≤ one edge PER COMPONENT — it shrinks at least
        // geometrically round over round — so it falls under a bounded
        // driver union-find almost immediately (the knnAggregate
        // adaptive-regime discipline: same result, none of the nested
        // CC loop's per-round job latency); genuinely huge first
        // rounds take the distributed CC path.
        val compPairs = chosen.select(col("__ca"), col("__cb"))
        val mapping =
          if (chosen.count() <= 100000L) {
            val uf = new MinLabelUnionFind
            compPairs.collect().foreach(r => uf.union(r.getLong(0), r.getLong(1)))
            import spark.implicits._
            broadcast(uf.labels.toDF("comp", "__new")) // bounded: ≤ 100k rows
          } else connectedComponents(compPairs, "__ca", "__cb", cache = false)
            .withColumnRenamed("node", "comp")
            .withColumnRenamed("component", "__new")
        comp = comp
          .join(mapping, Seq("comp"), "left")
          .select(col("node"), coalesce(col("__new"), col("comp")).as("comp"))
          .localCheckpoint()
      }
      round += 1
    }
    mst
  }

  /** ML — SINGLE-LINKAGE clusters from the Borůvka forest: cut every
    * forest edge heavier than `threshold` and return the resulting
    * components over all nodes of `edges` (singletons keep their own
    * id) — dendrogram-free single linkage at one exact threshold.
    * Returns (node, cluster). */
  def singleLinkage(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, threshold: Long): DataFrame = {
    val mst = boruvkaMst(edges, srcCol, dstCol, weightCol)
      .filter(col("w") <= threshold)
    val nodes = edges.select(explode(array(
        checkedLong(col(srcCol)), checkedLong(col(dstCol)))).as("node"))
      .distinct()
    val comp = connectedComponents(mst, "a", "b", cache = false)
    nodes.join(comp, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("cluster"))
  }

  /** Dedup clustering in one call: near-dup pairs (any generator) →
    * components → per-node canonical flag (`node == component`, i.e.
    * the minimum doc id of its duplicate cluster is kept). */
  def dedupClusters(pairs: DataFrame, idA: String, idB: String): DataFrame =
    connectedComponents(pairs, idA, idB)
      .withColumn("is_canonical", col("node") === col("component"))

  /** Fixed-point integer PageRank over the UNDIRECTED graph given by
    * `edges` (each edge contributes both directions; duplicate edges
    * collapse). `iters` damped rounds from a uniform start:
    *
    *   r_0(v)     = unit                     (unit = 1.0 in micro-units)
    *   r_{k+1}(v) = base + (num · Σ_{u∈N(v)} r_k(u) div deg(u)) div den
    *   base       = unit − (num · unit) div den
    *
    * ALL arithmetic is 64-bit integer with explicit floor division
    * (`div`), so the result is bit-identical under any partitioning,
    * accumulation order, executor count — and any engine: long sums
    * commute exactly, unlike the textbook double formulation whose low
    * bits depend on reduce order. Precision loss per division is
    * < 1 micro-unit per neighbor, irrelevant for ranking.
    *
    * Scale: the symmetrized edge list is localCheckpoint'd once and
    * re-read each round; a round is ONE equi-join keyed on node id and
    * ONE aggregation keyed on the destination — both uniform-key
    * shuffles (no per-iteration driver traffic at all; the iteration
    * count is fixed, not convergence-tested). Rounds chain as one lazy
    * plan; ranks are checkpointed every 8th round, which bounds plan
    * depth for deep runs without paying a |nodes|-row materialization
    * per round on shallow ones. Link analysis like
    * this is the crawl-frontier prioritizer of a web-scale corpus
    * pipeline: rank mass ≈ how reachable a host/doc is.
    *
    * Returns one row per node: (node, rank_ppm) with rank in
    * micro-units (1 000 000 = the uniform start mass). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampNum: Int = 85, dampDen: Int = 100,
      unit: Long = 1000000L,
      bcastNodeMax: Long = BcastNodeMax): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must satisfy 0 <= num <= den")
    val sym = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    // ONE materialization of the edge list; the per-round join
    // strategy is then ADAPTIVE on the node count (BcastNodeMax):
    // below the gate every round broadcasts the node-sized
    // contribution frame and the edge list is only scanned; above it
    // the pinByKey layout makes each round's sort-merge join
    // exchange-free and sort-free on the edge side (guide §2.4/§3.1)
    val symM = sym.localCheckpoint()
    val deg = symM.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    val bcast = deg.count() <= bcastNodeMax
    val symP = if (bcast) symM else pinByKey(symM, "src")
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val base = unit - (dampNum.toLong * unit) / dampDen
    var ranks = deg.withColumn("rank_ppm", lit(unit))
    var i = 0
    while (i < iters) {
      // every node keeps its own degree alongside its rank, so the
      // contribution r div deg is a scan-side projection, not a join
      val contrib = ranks.select(col("node").as("src"),
        expr("rank_ppm div deg").as("c"))
      val inflow = symP.join(side(contrib), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("inflow"))
      ranks = deg.join(side(inflow), Seq("node"), "left")
        .select(col("node"), col("deg"),
          expr(s"${base}L + (${dampNum}L * coalesce(inflow, 0L)) div ${dampDen}L")
            .as("rank_ppm"))
      // rounds chain linearly (each rank frame feeds exactly the next
      // round), so a shallow fixed loop runs fastest as ONE lazy plan —
      // materializing every round would pay |nodes| writes × iters.
      // Checkpoint periodically only to bound plan depth for deep runs.
      if ((i + 1) % 8 == 0 && i < iters - 1) ranks = ranks.localCheckpoint()
      i += 1
    }
    ranks.select(col("node"), col("rank_ppm"))
  }

  /** Katz centrality (Katz 1953) over the DIRECTED edge list, by the
    * fixed-round integer recursion
    *   k_0(v)     = unit
    *   k_{t+1}(v) = unit + (num · Σ_{u→v} k_t(u)) div den
    * — the attenuation-weighted path count Σ_p α^|p| with α = num/den
    * truncated at `iters` hops, β = unit. Unlike PageRank there is NO
    * degree normalization: a node is central when many central nodes
    * POINT AT it, whatever their out-degree — the "influence" reading
    * (who endorses you) vs PageRank's "random surfer" reading. All
    * arithmetic is truncating 64-bit integer, so results are
    * bit-identical across partitionings and engines. num/den must
    * keep α below the reciprocal spectral radius for the infinite sum
    * to mean anything; at fixed small `iters` any α < 1 is safe.
    *
    * Returns one row per node: (node, katz_ppm).
    *
    * Scale: same contract as [[pageRank]] — per round ONE dst-keyed
    * aggregation and ONE node-keyed left join against the
    * checkpointed edge list; fixed rounds, no driver traffic. */
  def katzCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, alphaNum: Int = 20, alphaDen: Int = 100,
      unit: Long = 1000000L,
      bcastNodeMax: Long = BcastNodeMax): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(alphaDen > 0 && alphaNum >= 0 && alphaNum < alphaDen,
      "attenuation must satisfy 0 <= num < den")
    // ONE materialization; adaptive per-round strategy (see pageRank):
    // below BcastNodeMax broadcast the node-sized rank frame (edge
    // list only scanned), above it pin the edge layout once
    val eM = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct().localCheckpoint()
    val nodes = eM.select(col("src").as("node"))
      .union(eM.select(col("dst").as("node"))).distinct().localCheckpoint()
    val bcast = nodes.count() <= bcastNodeMax
    val e = if (bcast) eM else pinByKey(eM, "src")
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    var ranks = nodes.withColumn("katz_ppm", lit(unit))
    var i = 0
    while (i < iters) {
      val inflow = e.join(
          side(ranks.select(col("node").as("src"), col("katz_ppm").as("k"))),
          "src")
        .groupBy(col("dst").as("node")).agg(sum(col("k")).as("inflow"))
      ranks = nodes.join(side(inflow), Seq("node"), "left")
        .select(col("node"),
          expr(s"${unit}L + (${alphaNum}L * coalesce(inflow, 0L)) " +
            s"div ${alphaDen}L").as("katz_ppm"))
      if ((i + 1) % 8 == 0 && i < iters - 1) ranks = ranks.localCheckpoint()
      i += 1
    }
    ranks.select(col("node"), col("katz_ppm"))
  }

  /** Personalized PageRank: identical fixed-round integer recursion to
    * [[pageRank]], but the teleport mass returns ONLY to the `sources`
    * node set — rank becomes proximity-to-S instead of global
    * centrality (Page et al. 1999 §6 "personalized" vector, public
    * literature). The seed-expansion primitive of corpus curation:
    * seed S with known-good domains/docs, rank the rest by how much
    * S-mass flows to them, keep the top. Source nodes start at `unit`,
    * all others at 0; each round
    *   rank = 1[S]·(unit − d·unit) + d·inflow,
    * all truncating-long arithmetic, so the result is bit-identical
    * under any partitioning and against an unrolled-CTE oracle.
    *
    * Scale: same contract as [[pageRank]] — one node-keyed equi-join +
    * one dst-keyed agg per round, fixed rounds, no driver traffic; the
    * source flag is a broadcast of |S| rows. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, sourceIdCol: String, iters: Int = 3,
      dampNum: Int = 85, dampDen: Int = 100,
      unit: Long = 1000000L,
      bcastNodeMax: Long = BcastNodeMax): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must satisfy 0 <= num <= den")
    val sym = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    // ONE materialization; adaptive per-round strategy (see pageRank)
    val symM = sym.localCheckpoint()
    val flag = sources.select(col(sourceIdCol).cast("long").as("node"))
      .distinct().withColumn("__s", lit(1L)).localCheckpoint()
    val deg = symM.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .join(broadcast(flag), Seq("node"), "left")
      .withColumn("__s", coalesce(col("__s"), lit(0L)))
      .localCheckpoint()
    val bcast = deg.count() <= bcastNodeMax
    val symP = if (bcast) symM else pinByKey(symM, "src")
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val base = unit - (dampNum.toLong * unit) / dampDen
    var ranks = deg.withColumn("rank_ppm", col("__s") * unit)
    var i = 0
    while (i < iters) {
      val contrib = ranks.select(col("node").as("src"),
        expr("rank_ppm div deg").as("c"))
      val inflow = symP.join(side(contrib), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("inflow"))
      ranks = deg.join(side(inflow), Seq("node"), "left")
        .select(col("node"), col("deg"), col("__s"),
          expr(s"__s * ${base}L + (${dampNum}L * coalesce(inflow, 0L)) div ${dampDen}L")
            .as("rank_ppm"))
      if ((i + 1) % 8 == 0 && i < iters - 1) ranks = ranks.localCheckpoint()
      i += 1
    }
    ranks.select(col("node"), col("rank_ppm"))
  }

  /** Per-node triangle counts of the undirected simple graph given by
    * `edges` (self-loops and duplicate/mirror edges collapse). Returns
    * one row per node appearing in ≥1 triangle: (node, n_triangles).
    *
    * Algorithm: DEGREE-ORDERED edge orientation (Chiba–Nishizeki /
    * the MapReduce formulation of Suri & Vassilvitskii, WWW'11 —
    * public literature): orient every edge from its (degree, id)-
    * smaller endpoint to the larger; enumerate wedges b←a→c with
    * b ≺ c from each source a; a wedge closes into a triangle iff the
    * oriented edge b→c exists. Each triangle is emitted EXACTLY once
    * (at its ≺-smallest vertex), so the per-node counts are
    * orientation-invariant — an id-ordered oracle must agree.
    *
    * Scale: orientation caps every out-degree at O(√m) on any graph
    * (a high-degree hub is always the wedge TARGET, never the fan-out
    * source), so the wedge join — the one potentially quadratic step —
    * generates Σ out-deg² = O(m^1.5) rows worst case instead of
    * Σ deg² (unbounded under skew). All joins are node-keyed
    * equi-joins. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges.select(
        least(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("u"),
        greatest(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = canon.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    // ≺ = (degree, id) lexicographic; orient from ≺-smaller endpoint
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      when(uFirst, col("dv")).otherwise(col("du")).as("db"))
    // wedges b←a→c with (db,b) ≺ (dc,c); close against oriented b→c
    val e2 = oriented.select(col("a"), col("b").as("c"), col("db").as("dc"))
    val wedges = oriented.join(e2, Seq("a"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val triangles = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    triangles.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Multi-source BFS hop distance over the undirected graph given by
    * `edges`, `rounds` FIXED relaxation rounds: dist(v) starts at 0 on
    * the seed set and ∞ (absent) elsewhere; each round does
    *   dist(v) := min(dist(v), 1 + min over neighbors u of dist(u))
    * simultaneously for every node. After r rounds the result is the
    * EXACT hop distance for every node within r hops of a seed (absent
    * beyond) — integer min/plus state, so bit-identical under any
    * partitioning, and an engine unrolling the same rounds as chained
    * CTEs must agree exactly even before convergence. The reachability
    * layer of contamination tracing ("everything within k links of a
    * flagged host") and blast-radius queries.
    *
    * Scale: each round is ONE node-keyed equi-join (frontier side is
    * only the nodes with a finite label, never |V|) + ONE dst-keyed min
    * agg + ONE full-outer label merge — uniform keys, zero per-round
    * driver traffic; rounds chain as one lazy plan with periodic
    * checkpoints bounding depth. Returns (node, dist) for reached
    * nodes only. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int,
      driverEdgeMax: Long = BcastNodeMax): DataFrame = {
    // DRIVER BFS KERNEL under an edge-count gate (opt round 12, VERDICT
    // r11 item 2 — the PowerKernel / union-find audit-slice discipline):
    // below the gate the whole layered loop is 2·rounds stages of pure
    // local-mode latency over a frame that fits comfortably on the
    // driver (≤1M distinct (long,long) rows ≈ 16 MB — the broadcast
    // comfort zone; gate expressed on the 2× exploded-sym count for
    // continuity with the distributed layout it replaces). Integer
    // min-plus state is bit-identical under any evaluation order, so a
    // driver BFS replays the distributed loop exactly (spec-pinned in
    // OptR12Spec). The count is one cheap job on the checkpointed
    // distinct edge list — which the kernel path collects DIRECTLY
    // (half the rows of sym; both directions are mirrored in the
    // adjacency build), skipping the explode+repartition+checkpoint
    // pass entirely. The distributed log-depth loop stays the
    // above-gate / 100 TB path.
    val e0 = edgesDistinct(edges, srcCol, dstCol)
    if (e0.count() * 2 <= driverEdgeMax) {
      val seedRows = seeds.select(checkedLong(col(seedCol)).as("node"))
        .distinct().collect()
      val (nullSeeds, realSeeds) = seedRows.partition(_.isNullAt(0))
      val dist = BfsKernel.run(BfsKernel.adjacencyUndirected(e0.collect()),
        realSeeds.map(_.getLong(0)), rounds)
      val spark = edges.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dist",
          org.apache.spark.sql.types.LongType)))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](
        dist.size + nullSeeds.length)
      dist.foreach { case (n, d) =>
        rows.add(org.apache.spark.sql.Row(n, d)) }
      // a NULL seed row survives the distributed loop untouched (the
      // join never matches it) — replicate it verbatim
      nullSeeds.foreach(_ => rows.add(org.apache.spark.sql.Row(null, 0L)))
      spark.createDataFrame(rows, schema)
    } else bfsFromSym(symFromDistinct(e0), seeds, seedCol, rounds)
  }

  /** Deduped directed edge list, checkpointed — the gate probe AND the
    * collect source of the driver BFS kernel (HALF the rows of the
    * exploded sym), and the materialized base the distributed sym
    * builds from above the gate. */
  private def edgesDistinct(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    // distinct BEFORE the 2x explode: half the shuffle width. An input
    // carrying both (a,b) and (b,a) leaves a duplicate pair in sym —
    // harmless to BFS (candidates are deduped per round), not worth a
    // second full-width shuffle to remove
    edges.select(checkedLong(col(srcCol)).as("src"),
        checkedLong(col(dstCol)).as("dst"))
      .distinct()
      .localCheckpoint()

  /** Symmetrized, checkpointed edge list from [[edgesDistinct]] output —
    * built ONCE and shared when several BFS sweeps run over the same
    * graph (the above-gate distributed layout). */
  private def symFromDistinct(e0: DataFrame): DataFrame =
    e0.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // src-keyed at FULL width before the checkpoint (the q467
      // lesson): LogicalRDD preserves this partitioning, so every
      // round's frontier join reuses it — without the explicit count
      // AQE coalesces the frame to ~4 partitions and the per-round
      // probe runs 8x under-parallelized
      .repartition(e0.sparkSession.sparkContext.defaultParallelism,
        col("src"))
      .localCheckpoint() // re-read every round

  /** LAYERED frontier BFS (round-8 rewrite of the min-plus full-label
    * relaxation): round k joins the edge list against only the nodes
    * DISCOVERED at round k−1 (the frontier), not every labeled node —
    * by the BFS layer property the candidates not yet labeled are
    * exactly the distance-k layer, so the result is bit-identical to
    * running all `rounds` min-plus relaxations. Two wins the old shape
    * could not have: the sym-side join probe shrinks to frontier size
    * (AQE broadcast-joins the late tiny frontiers at any realistic
    * layer skew), and an EMPTY layer proves the fixed point — the
    * remaining rounds are identities, so the loop exits early with the
    * identical answer (the fixed-rounds purity contract holds: same
    * input → same output, rounds still caps the horizon). */
  private def bfsFromSym(sym: DataFrame, seeds: DataFrame,
      seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val seed = seeds.select(checkedLong(col(seedCol)).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var labels = seed
    var frontier = seed.select(col("node"))
    var k = 0L
    var done = false
    while (k < rounds && !done) {
      k += 1
      val next = sym.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(labels, Seq("node"), "left_anti")
      // rounds chain LAZILY (one job covers several rounds); every
      // third round — and the last — materializes the frontier, bounds
      // plan depth, and tests the empty-layer fixed point. Per-round
      // actions would dominate wall time at local stage latency.
      if (k == rounds || k % 3 == 0) {
        val nextCp = next.localCheckpoint()
        if (nextCp.isEmpty) done = true
        else {
          labels = labels.unionByName(nextCp.withColumn("dist", lit(k)))
            .localCheckpoint()
          frontier = nextCp
        }
      } else {
        labels = labels.unionByName(next.withColumn("dist", lit(k)))
        frontier = next
      }
    }
    labels
  }

  /** E2+ — k-PIVOT, HOP-BOUNDED BETWEENNESS CENTRALITY (Brandes 2001
    * "A faster algorithm for betweenness centrality", JMS; pivot
    * sampling per Brandes & Pich 2007 — public literature): who sits
    * on the shortest paths — the broker-node signal behind influence
    * ranking and cut-vertex triage. Exact Brandes from each of the
    * `numPivots` smallest node ids (deterministic pivot set), paths
    * truncated at `maxHops` (the q155/q384 horizon contract: fixed
    * bounds keep the operator a pure function of the input; hops must
    * cover the diameter for the untruncated answer).
    *
    *   forward:  σ_s(v) = Σ_{u ∈ pred_s(v)} σ_s(u)   (layered BFS,
    *             path counts as exact DECIMAL(38,0) sums)
    *   backward: δ_s(v) = Σ_{w: v ∈ pred_s(w)}
    *               ⌊σ_s(v)·(10⁶ + δ_s(w)) / σ_s(w)⌋  (ppm-quantized
    *             dependency accumulation, level by level descending)
    *   bc(v)   = Σ_s δ_s(v)  over v ≠ s, in ppm
    *
    * The floor-per-contribution quantization makes every δ an exact
    * integer — the trajectory is bit-identical under any partitioning
    * and replayable by a second engine (the q100/q401 device); it
    * under-counts each contribution by < 1 ppm, the price of exact
    * replay. Self-loops drop; duplicate and reversed input edges
    * collapse (σ must count paths, not edge multiplicity). Returns
    * every graph node: (node, bc_ppm) — bc_ppm fits BIGINT for path
    * counts up to ~10¹² per pivot (document-scale graphs; the σ state
    * itself is DECIMAL(38,0)).
    *
    * Scale: state is (pivots × reached nodes); each forward round is
    * one frontier-keyed join + grouped σ sum, each backward level one
    * level-keyed join — all hash on the node key, no windows, no
    * driver loops over data. Pivot count is the precision/cost dial
    * (Brandes-Pich: a few hundred pivots suffice at web scale). */
  def betweennessPivots(edges: DataFrame, srcCol: String, dstCol: String,
      numPivots: Int, maxHops: Int,
      driverEdgeMax: Long = BcastNodeMax): DataFrame = {
    require(numPivots >= 1 && numPivots <= 256, "numPivots in [1, 256]")
    require(maxHops >= 1 && maxHops <= 8, "maxHops in [1, 8]")
    val d38 = "decimal(38,0)"
    def floorDiv(num: Column, den: Column): Column =
      ((num - pmod(num, den)) / den).cast(d38)
    // canonical undirected edge set: (a,b)/(b,a) collapse, self-loops
    // drop — sigma counts PATHS, so edge multiplicity must not inflate it.
    // Checkpointed: it is the kernel gate probe AND (above the gate) the
    // base the symmetrized layout builds from.
    val canon = edges.select(checkedLong(col(srcCol)).as("a"),
        checkedLong(col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    // DRIVER BRANDES KERNEL under an edge gate AND a pivots×edges work
    // gate (opt round 12, VERDICT r11 item 4; the q384/q155 BFS-kernel
    // discipline): at sf-bench scale the 2·maxHops forward stages and
    // maxHops−1 backward levels are pure local-mode stage latency over
    // a bounded frame. All σ/δ state is exact BigInt (≡ decimal(38,0))
    // with the identical truncating divides and the identical ANSI
    // error surface (core.AnsiNum) — spec-pinned bit-identical to the
    // distributed loop in OptR12Spec. The distributed plan below runs
    // unchanged above the gate (the 100 TB shape).
    val canonCount = canon.count()
    if (canonCount * 2 <= driverEdgeMax &&
        canonCount * numPivots <= 4 * driverEdgeMax) {
      return BrandesKernel.run(edges.sparkSession, canon.collect(),
        numPivots, maxHops)
    }
    // hash-partition the edge set on src ONCE before checkpointing:
    // LogicalRDD preserves the checkpointed plan's output partitioning,
    // so every forward round's frontier join and the DAG build reuse it
    // and shuffle only the (pivot-bounded) frontier/label side — without
    // this, each of the ~2·maxHops stages re-shuffles the full edge set
    // (the dominant term of the local-mode stage floor measured in
    // SCALE_SPOT.md; on a cluster, the saved exchange is network-bound).
    // Explicit partition COUNT, not just key: AQE's size-based coalesce
    // targets ~64 MB/partition, which parks the 1-2M-row iterative
    // frames on 4-10 partitions — fine for IO, 4-8× under-parallelized
    // for the decimal-dense σ/δ arithmetic every round re-reads (probe:
    // dag landed on 4 partitions, each backward level ran on 4 cores).
    val nPar = edges.sparkSession.sparkContext.defaultParallelism
    val sym = canon.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(nPar, col("src"))
      .localCheckpoint() // re-read every forward round and backward level
    val pivots = sym.select(col("src")).distinct()
      .orderBy(col("src")).limit(numPivots)
      .select(col("src").as("s")) // numPivots rows riding on checkpointed sym
    // ---- forward: layered BFS carrying exact path counts ------------
    // Only each LAYER checkpoints; the label set is a lazy union of
    // checkpointed layers (cheap scans), so a round costs one shuffle
    // stage, not three materializations.
    // The frontier and the accumulated label set are BROADCAST into each
    // round's joins while their checkpoint-known row counts stay small
    // (maybeBcast below): the src-partitioned edge set is then never
    // re-shuffled and the anti-join costs no exchange on the grouped
    // side. Counts come free from the per-layer checkpoints (the same
    // action that used to be the isEmpty probe).
    val bcastMaxRows = 4000000L // ~hundreds of MB of (s, node, σ, δ)
    def maybeBcast(df: DataFrame, rows: Long): DataFrame =
      if (rows <= bcastMaxRows) broadcast(df) else df
    val seed = pivots.select(col("s"), col("s").as("node"),
      lit(0L).as("dist"), lit(1).cast(d38).as("sigma")).localCheckpoint()
    val layers = scala.collection.mutable.ArrayBuffer(seed)
    val layerRows = scala.collection.mutable.ArrayBuffer(seed.count())
    def labels = layers.reduce(_ unionByName _)
    var frontier = seed
    var l = 0
    var done = false
    while (l < maxHops && !done) {
      l += 1
      val next = sym.join(maybeBcast(
          frontier.withColumnRenamed("node", "src"), layerRows.last), "src")
        .groupBy(col("s"), col("dst").as("node"))
        .agg(sum(col("sigma")).cast(d38).as("sigma"))
        .join(maybeBcast(labels.select(col("s"), col("node")),
          layerRows.sum), Seq("s", "node"), "left_anti")
        .withColumn("dist", lit(l.toLong))
        .select(col("s"), col("node"), col("dist"), col("sigma"))
        .localCheckpoint()
      val n = next.count() // cached read; doubles as the fixed-point probe
      if (n == 0L) done = true // empty layer = fixed point
      else {
        layers += next
        layerRows += n
        frontier = next
      }
    }
    // ---- backward: ppm dependency accumulation, deepest level first --
    // Per-LEVEL pair chains instead of one materialized global DAG: the
    // parent→child constraint dw = dv + 1 is carried by CONSTRUCTION
    // (level frames are disjoint), so level lev's pairs are just
    // layer(lev) ⋈ edges ⋈ layer(lev+1) — nothing is checkpointed
    // between levels except the (node-sized) δ frames that feed the
    // next level. The child side (labels ⋈ δ of one level) is
    // BROADCAST when its checkpoint-known row count is small — the
    // standard adaptive strategy, decided from exact counts the layer
    // checkpoints already hold: the per-DAG-edge candidate set then
    // never shuffles at all (map-side join over the src-partitioned
    // edge set + map-side partial δ agg). Degrades to plain shuffle
    // joins past the threshold, so giant-frontier graphs stay safe.
    val deltas = scala.collection.mutable.Map.empty[Int, DataFrame]
    // level 0 is skipped: its δ lands only on the pivots themselves,
    // which the v ≠ s exclusion below filters out anyway
    ((maxHops - 1) to 1 by -1).foreach { lev =>
      if (lev + 1 < layers.length) {
        val parents = layers(lev).select(col("s"),
          col("node").as("src"), col("sigma").as("sigv"))
        val childBase = layers(lev + 1).select(col("s"),
          col("node").as("w"), col("sigma").as("sigw"))
        val children = (deltas.get(lev + 1) match {
          case Some(d) => childBase.join(d.select(col("s"),
            col("node").as("w"), col("delta").as("dw")), Seq("s", "w"),
            "left")
          case None => childBase.withColumn("dw", lit(null).cast(d38))
        }).withColumnRenamed("s", "__cs") // disambiguate vs parents' s
        // IntegralDivide, not the pmod-floor: both operands are
        // non-negative (σ ≥ 1, δ ≥ 0) so floor ≡ truncation ≡ the
        // oracle's `//`, and `div` is ONE decimal op per pair where the
        // pmod form costs five — this runs once per DAG edge, the
        // backward pass's hot loop. The long result is safe by the same
        // contract as the output: bc_ppm itself is delivered as a long
        // (ANSI raises loudly on genuine overflow rather than wrapping).
        val delta = sym
          .join(maybeBcast(parents, layerRows(lev)), "src")
          .join(maybeBcast(children, layerRows(lev + 1)),
            col("dst") === col("w") && col("s") === col("__cs"))
          .withColumn("__num", col("sigv") * (lit(1000000).cast(d38) +
            coalesce(col("dw"), lit(0).cast(d38))))
          .withColumn("__contrib", expr("__num div sigw"))
          .groupBy(col("s"), col("src").as("node"))
          .agg(sum(col("__contrib").cast(d38)).as("delta"))
        // the SHALLOWEST level is consumed exactly once (the final
        // union) — checkpointing it would buy nothing and cost a stage;
        // deeper levels feed both the next level's join and the union
        deltas(lev) = if (lev > 1) delta.localCheckpoint() else delta
      }
    }
    // ---- bc: sum over pivots, sources excluded ----------------------
    val emptyDelta = seed.limit(0)
      .select(col("s"), col("node"), lit(0).cast(d38).as("delta"))
    val delta = deltas.values.foldLeft(emptyDelta)(_ unionByName _)
    val bc = delta
      .join(labels.select(col("s"), col("node"), col("dist")),
        Seq("s", "node"))
      .filter(col("dist") >= 1L)
      .groupBy(col("node"))
      .agg(sum(col("delta")).cast(d38).as("__bc"))
    sym.select(col("src").as("node")).distinct()
      .join(bc, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__bc"), lit(0).cast(d38)).cast("long").as("bc_ppm"))
  }

  /** E2+ — double-sweep diameter lower bound (the standard 2-BFS
    * heuristic, Magnien-Latapy-Habib 2009): BFS from a deterministic
    * seed (the smallest node id), hop to the farthest node reached,
    * BFS again — the second eccentricity is a lower bound on the
    * graph diameter that is exact on trees and empirically tight on
    * real graphs. Both sweeps run `rounds` fixed min-plus iterations
    * ([[bfsHops]]), so the bound is "within the horizon": rounds must
    * be ≥ the true diameter for an unclipped answer (fixed rounds
    * keep the operator a pure function of the input — the q155
    * determinism contract).
    *
    * Returns ONE row: (seed_node, far_node_1, ecc_1, far_node_2,
    * diameter_lb).
    *
    * Scale: two q155-shaped BFS pipelines; the argmax between them is
    * a TakeOrdered(1), never a global sort materialization. */
  def diameterTwoSweep(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, driverEdgeMax: Long = BcastNodeMax): DataFrame = {
    // ONE distinct+checkpoint feeds both sweeps — the second sweep's
    // rounds re-read the same materialized edge blocks
    val e0 = edgesDistinct(edges, srcCol, dstCol)
    // DRIVER KERNEL for the WHOLE two-sweep below the edge gate (opt
    // round 12, VERDICT r11 item 2): ONE collect of the checkpointed
    // distinct edge list (half the exploded-sym rows; directions are
    // mirrored in the adjacency build) feeds both sweeps and both
    // argmaxes — ~4·rounds distributed stages of pure local-mode
    // latency collapse into one bounded driver computation with
    // bit-identical integer state (spec-pinned in OptR12Spec). Above
    // the gate the distributed log-depth loop below runs unchanged.
    if (e0.count() * 2 <= driverEdgeMax) {
      val spark = edges.sparkSession
      val es = e0.collect()
      if (es.isEmpty) {
        // empty graph: min(src) is NULL, each sweep's label set is the
        // single (null, 0) seed row — replicate the degenerate shape
        return spark.range(1).select(
          lit(null).cast("long").as("seed_node"),
          lit(null).cast("long").as("far_node_1"), lit(0L).as("ecc_1"),
          lit(null).cast("long").as("far_node_2"), lit(0L).as("diameter_lb"))
      }
      val adj = BfsKernel.adjacencyUndirected(es)
      // min over sym's src = min over EITHER endpoint (sym is mirrored)
      var seedNode = Long.MaxValue
      es.foreach { r =>
        val a = r.getLong(0); val b = r.getLong(1)
        if (a < seedNode) seedNode = a
        if (b < seedNode) seedNode = b
      }
      // argmax of (dist DESC, node ASC) — the distributed orderBy+limit(1)
      def far(dist: scala.collection.mutable.LongMap[Long]): (Long, Long) = {
        var bn = Long.MaxValue; var bd = -1L
        dist.foreach { case (n, d) =>
          if (d > bd || (d == bd && n < bn)) { bd = d; bn = n } }
        (bn, bd)
      }
      val (f1, ecc1) = far(BfsKernel.run(adj, Array(seedNode), rounds))
      val (f2, dlb) = far(BfsKernel.run(adj, Array(f1), rounds))
      return spark.range(1).select(
        lit(seedNode).as("seed_node"),
        lit(f1).as("far_node_1"), lit(ecc1).as("ecc_1"),
        lit(f2).as("far_node_2"), lit(dlb).as("diameter_lb"))
    }
    val sym = symFromDistinct(e0)
    val seed = sym.agg(min(col("src")).as("node"))
    val b1 = bfsFromSym(sym, seed, "node", rounds)
    val far1 = b1.orderBy(col("dist").desc, col("node")).limit(1)
      .select(col("node").as("far_node_1"), col("dist").as("ecc_1"))
      .localCheckpoint() // 1 row; sweep 2's every round reads it
    val b2 = bfsFromSym(sym,
      far1.select(col("far_node_1").as("node")), "node", rounds)
    val far2 = b2.orderBy(col("dist").desc, col("node")).limit(1)
      .select(col("node").as("far_node_2"), col("dist").as("diameter_lb"))
    seed.select(col("node").as("seed_node"))
      .crossJoin(broadcast(far1)).crossJoin(broadcast(far2))
  }

  /** k-core peeling, `rounds` FIXED iterations: each round drops every
    * node of current degree < k (with all its edges) simultaneously —
    * the Matula–Beck bulk-peel, the dense-subgraph extractor a spam/
    * bot-cluster pass runs over link graphs. Fixed rounds (not
    * converge-tested) make the operator a pure deterministic function
    * of the input — an engine unrolling the same rounds must agree
    * bit-for-bit even on inputs where peeling hasn't converged yet;
    * peeling converges in ≤ |V| rounds and in practice a handful.
    * Returns the surviving nodes with their residual degree.
    *
    * Scale: each round is ONE degree agg + TWO node-keyed semi-join
    * filters on the (checkpointed) edge list — uniform keys, no
    * driver traffic; plan depth stays constant via per-round
    * localCheckpoint. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int,
      bcastNodeMax: Long = BcastNodeMax): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    var sym = edges.select(explode(array(
        struct(checkedLong(col(srcCol)).as("src"), checkedLong(col(dstCol)).as("dst")),
        struct(checkedLong(col(dstCol)).as("src"), checkedLong(col(srcCol)).as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    // NODE-sized survivor set vs EDGE-sized list (opt round 11, guide
    // §3.1): the checkpoint erased the stats Catalyst would need to see
    // that `keep` is broadcastable, so both per-round semi-joins ran as
    // sort-merge — re-shuffling the (shrinking) edge list TWICE per
    // peel round. Gate ONCE on the materialized edge count (nodes ≤
    // edges, so an edge gate bounds the broadcast): below it each
    // round is two broadcast-semi scans fed by one degree rollup — the
    // edge list never shuffles, and the identical keep subtree under
    // both broadcasts is built once (ReuseExchange). Above the gate
    // the sort-merge plan runs unchanged. No per-round driver probe:
    // the gate is decided before the loop, per the q134 A/B (a
    // per-round checkpoint+count cost MORE than the saved exchanges).
    val small = sym.count() <= bcastNodeMax
    def side(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var i = 0
    while (i < rounds) {
      val keep = sym.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k).select(col("src"))
      sym = sym.join(side(keep), Seq("src"), "left_semi")
        .join(side(keep.withColumnRenamed("src", "dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      i += 1
    }
    sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007 —
    * public literature), the community-detection counterpart to
    * [[connectedComponents]]: components find REACHABILITY clusters;
    * LPA finds DENSITY clusters inside a connected graph (topic pools
    * in a co-purchase graph, template families in a near-dup graph
    * that q70's transitive closure would fuse into one blob).
    *
    * Determinism contract (what makes it oracle-replayable, unlike
    * textbook asynchronous LPA): every node starts labeled with its
    * own id; each round ALL nodes simultaneously adopt the most
    * frequent label among their neighbors, ties broken by SMALLEST
    * label; a fixed `iters` rounds, no convergence test. Integer
    * labels + integer counts → bit-identical under any partitioning.
    *
    * Returns (node, community) for every node with at least one edge.
    *
    * Scale: per round, one node-keyed equi-join (labels onto edge
    * sources) + one (dst, label) agg + one per-node argmax — all keyed
    * on uniform node ids; rounds chain as one lazy plan exactly like
    * [[pageRank]], with no driver-side data movement. */
  /** Symmetrize + dedupe an edge list into the canonical (src, dst)
    * both-directions form the undirected ops iterate over, MATERIALIZED
    * (it is re-read every round). Public so a caller composing several
    * undirected ops over the SAME graph (e.g. [[labelPropagation]] then
    * [[modularity]]) pays the explode+distinct once and passes
    * `symmetric = true` downstream. */
  def symmetrize(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    symmetrizePlan(edges, srcCol, dstCol).localCheckpoint()

  /** [[symmetrize]] WITHOUT the materialization — for callers about to
    * pin the result in a specific layout anyway (a checkpoint first
    * would pay an extra eager pass for nothing). */
  private def symmetrizePlan(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(explode(array(
        struct(checkedLong(col(srcCol)).as("src"), checkedLong(col(dstCol)).as("dst")),
        struct(checkedLong(col(dstCol)).as("src"), checkedLong(col(srcCol)).as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()

  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, symmetric: Boolean = false,
      bcastNodeMax: Long = BcastNodeMax): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // pinned by the per-round join key — one exchange+sort instead of
    // one per round (guide §2.4)
    // ONE materialization; adaptive per-round strategy (see pageRank)
    val symM = (if (symmetric) edges.select(
        col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      else symmetrizePlan(edges, srcCol, dstCol)).localCheckpoint()
    // Round 1 specialization: with every node carrying its OWN id as
    // the initial label, neighbor labels are pairwise distinct, so
    // every count is provably 1 and the most-frequent-with-min-tie
    // winner degenerates to min(neighbor id) — ONE primitive hash agg
    // over the edge list instead of the full argmax machinery on the
    // round where the (dst, label) frame would be largest (zero
    // reduction). The generic oracle recursion agrees: its round-1
    // counts are all 1 and its tie-break picks the same minimum.
    var labels = symM.groupBy(col("dst").as("node"))
      .agg(min(col("src")).as("lab"))
      .localCheckpoint() // node-sized; read by round 2's join
    // Broadcast gate from the count the round-1 labels frame already
    // holds (one row per distinct dst = the node count in a symmetric
    // edge list): the old dedicated distinct().count() probe was a full
    // exchange over the edge list run solely for the gate (ADVICE r11).
    val bcast = labels.count() <= bcastNodeMax
    lazy val sym = if (bcast) symM else pinByKey(symM, "src")
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    var i = 1
    while (i < iters) {
      // argmax-by-count with min-label tie-break as ONE agg: the
      // lexicographically smallest (-count, label) struct IS the
      // winner. struct min is a SortAggregate (off codegen), but by
      // round 2 communities have begun merging, so the (dst, label)
      // frame it sorts is far smaller than round 1's — measured
      // faster here than a 3×-hash-agg max/filter/min rewrite, whose
      // two-consumer count frame forces either a 1M-row eager
      // materialization per round or an ReuseExchange gamble.
      val counted = sym.join(side(labels), sym("src") === labels("node"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("__c"))
      labels = counted
        .groupBy(col("dst").as("node"))
        .agg(min(struct((-col("__c")).as("__negc"), col("lab").as("__l")))
          .as("__best"))
        .select(col("node"), col("__best.__l").as("lab"))
      if ((i + 1) % 8 == 0 && i < iters - 1) labels = labels.localCheckpoint()
      i += 1
    }
    labels.select(col("node"), col("lab").as("community"))
  }

  /** HITS hubs & authorities (Kleinberg 1999 — public literature) on a
    * DIRECTED edge list: authority = endorsed by good hubs, hub =
    * endorses good authorities — the asymmetric companion to
    * [[pageRank]] for bipartite-flavored graphs (buyers→products,
    * crawlers→documents, queries→clicked results) where "important on
    * the left" and "important on the right" are different questions.
    *
    * Fixed `iters` synchronous rounds in integer micro-units: each
    * half-round is one equi-join + one key-side sum; scores renormalize
    * by the round's MAX via integer floor division (`v * unit div
    * max`), so every intermediate is a long and the trajectory is
    * bit-identical under any partitioning and against an unrolled-CTE
    * oracle. Duplicate edges are collapsed.
    *
    * Returns (node, hub_u, auth_u) for every node on either side;
    * nodes with no out-edges have hub_u = 0, no in-edges auth_u = 0.
    *
    * Scale: per half-round, one node-keyed join + one dst(src)-keyed
    * agg — uniform id keys, no driver traffic; the two normalization
    * maxima broadcast as scalars. Degree × unit products stay ≤
    * 10¹⁵ for degrees to 10⁹. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, unit: Long = 1000000L,
      bcastNodeMax: Long = BcastNodeMax): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(checkedLong(col(srcCol)).as("src"),
        checkedLong(col(dstCol)).as("dst"))
      .distinct().localCheckpoint() // read 2× per round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    // adaptive per-round strategy (see pageRank). The two half-rounds
    // join on DIFFERENT keys, so above the broadcast gate the edge
    // list is pinned once PER KEY (two materializations replace
    // 2·iters edge exchanges); below it neither pin is built — the
    // node-sized score frames broadcast and e is only scanned.
    val bcast = nodes.count() <= bcastNodeMax
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val eS = if (bcast) e else pinByKey(e, "src")
    val eD = if (bcast) e else pinByKey(e, "dst")
    var scores = nodes.withColumn("hub_u", lit(unit))
      .withColumn("auth_u", lit(unit))
    var i = 0
    while (i < iters) {
      // the raw half-round sums are node-sized and feed two consumers
      // (their max + the normalized frame) — materialize the expensive
      // join+agg once; the derived selects re-read the blocks
      val authRaw = eS.join(
          side(scores.select(col("node").as("src"), col("hub_u"))), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("hub_u")).as("__a"))
        .localCheckpoint()
      val aMax = authRaw.agg(max(col("__a")).as("__amax"))
      val auth = authRaw.crossJoin(broadcast(aMax))
        .select(col("node"), expr(s"(__a * ${unit}L) div __amax").as("auth_u"))
      val hubRaw = eD.join(
          side(auth.select(col("node").as("dst"), col("auth_u"))), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("auth_u")).as("__h"))
        .localCheckpoint()
      val hMax = hubRaw.agg(max(col("__h")).as("__hmax"))
      val hub = hubRaw.crossJoin(broadcast(hMax))
        .select(col("node"), expr(s"(__h * ${unit}L) div __hmax").as("hub_u"))
      // scores has a SINGLE consumer (next round's join, or the
      // caller) and its parents are checkpointed — keep it lazy; the
      // raw-frame checkpoints above already bound re-execution
      scores = nodes
        .join(side(hub), Seq("node"), "left")
        .join(side(auth), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("hub_u"), lit(0L)).as("hub_u"),
          coalesce(col("auth_u"), lit(0L)).as("auth_u"))
      i += 1
    }
    scores
  }

  /** Newman modularity of a node partition (Newman & Girvan 2004 —
    * public literature): how much denser are communities than a
    * degree-preserving random rewiring? THE quality score for
    * [[labelPropagation]] output — Q near 0 means the "communities"
    * are noise; Q ≳ 0.3 means real structure worth acting on.
    *
    *   Q = Σ_c [ e_c/m − (d_c/2m)² ]
    *     = Σ_c (4·m·e_c − d_c²) / (4·m²)
    *
    * computed EXACTLY as one integer numerator + denominator (e_c =
    * intra-community edges, d_c = community degree sum, m = undirected
    * edge count), then one correctly-rounded double division — so the
    * score is bit-identical on any engine with no libm exposure.
    *
    * `labels`: (node, community) covering every edge endpoint.
    * Returns ONE row: (n_communities, m, q_num, q_den, modularity).
    *
    * Scale: one node-keyed join per endpoint (labels onto the
    * symmetrized edge list), one community-keyed agg each for e_c and
    * d_c — all uniform keys; the finish is |communities| rows. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String, communityCol: String,
      symmetric: Boolean = false): DataFrame = {
    val sym =
      if (symmetric) edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      else symmetrize(edges, srcCol, dstCol)
    val lab = labels.select(col(nodeCol).cast("long").as("node"),
      col(communityCol).cast("long").as("__c"))
      .localCheckpoint() // read by both endpoint joins + degree side
    // node-sized side, edge-sized other side: count-gated broadcast
    // (the checkpoint erased the stats Catalyst would have used — opt
    // guide §3.1) keeps the edge list from being shuffled twice; above
    // the gate the sort-merge plan below is unchanged
    val labB = if (lab.count() <= BcastNodeMax) (df: DataFrame) => broadcast(df)
      else (df: DataFrame) => df
    // every sym row is one directed copy: m = |sym|/2; within-edges
    // counted directed then halved keeps everything integral ×2
    val tagged = sym
      .join(labB(lab.select(col("node").as("src"), col("__c").as("__cs"))), "src")
      .join(labB(lab.select(col("node").as("dst"), col("__c").as("__cd"))), "dst")
    val perC = tagged.groupBy(col("__cs").as("community")).agg(
      count(lit(1)).as("__deg2"), // Σ degrees in c (directed copies)
      sum(when(col("__cs") === col("__cd"), 1L).otherwise(0L)).as("__in2"))
    val mRow = sym.agg((count(lit(1)) / 2).cast("long").as("m"))
    perC.crossJoin(broadcast(mRow))
      // 4·m·e_c − d_c² with e_c = __in2/2, d_c = __deg2 →
      // 2·m·__in2 − __deg2², all exact in decimal(38,0)
      .withColumn("__t",
        lit(2L).cast("decimal(38,0)") * col("m") * col("__in2") -
          col("__deg2").cast("decimal(38,0)") * col("__deg2"))
      .agg(count(lit(1)).as("n_communities"),
        max(col("m")).as("m"),
        sum(col("__t")).as("__qn"))
      // BIGINT output surface (den = 4m² ≤ 9·10¹⁸ up to m ≈ 1.5·10⁹
      // edges — beyond that, widen to the decimal internals)
      .withColumn("q_num", col("__qn").cast("long"))
      .withColumn("q_den", expr("4L * m * m"))
      .select(col("n_communities"), col("m"), col("q_num"), col("q_den"),
        round(col("q_num").cast("double") / col("q_den").cast("double"), 6)
          .as("modularity"))
  }

  /** E2+/graph — degree assortativity coefficient (Newman, "Mixing
    * patterns in networks", PRE 2003 — public literature): the Pearson
    * correlation of endpoint degrees over every DIRECTED edge copy of
    * the undirected graph. r > 0 — hubs attach to hubs (social shape);
    * r < 0 — hubs attach to leaves (web/tech shape); the one-number
    * topology fingerprint read before trusting sampled-subgraph stats.
    * All five sums are exact DECIMAL(38,0) over the edge list; r is
    * one pinned IEEE finish. Returns one row: (m, r) with m the
    * undirected edge count.
    *
    * Scale: degree is a node-keyed agg; each endpoint tag is an
    * equi-join on node id (Zipf hubs → AQE skew-split); the correlation
    * is one edge-grain agg. No pair space beyond the edges themselves. */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val sym = symmetrize(edges, srcCol, dstCol)
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val tagged = sym
      .join(deg.select(col("node").as("src"), col("deg").as("__dx")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("__dy")), "dst")
    def s38(c: Column) = sum(c.cast(d38)).cast(d38)
    tagged.agg(count(lit(1)).cast(d38).as("__m2"),
      s38(col("__dx")).as("__sx"), s38(col("__dy")).as("__sy"),
      s38(col("__dx").cast(d38) * col("__dy").cast(d38)).as("__sxy"),
      s38(col("__dx").cast(d38) * col("__dx").cast(d38)).as("__sxx"),
      s38(col("__dy").cast(d38) * col("__dy").cast(d38)).as("__syy"))
      .select((col("__m2") / 2).cast("long").as("m"),
        round((col("__m2") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double") /
          (sqrt((col("__m2") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double")) *
           sqrt((col("__m2") * col("__syy") - col("__sy") * col("__sy"))
            .cast("double"))), 6).as("r"))
  }

  /** E2+/graph — local clustering coefficients: for each node with
    * degree ≥ 2, c_v = 2·T_v / (deg_v·(deg_v−1)) — how close the
    * node's neighborhood is to a clique. Triangle counts come from
    * [[triangleCounts]] (the degree-oriented wedge-closing kernel);
    * nodes with no triangles report 0, not null. The coefficient is an
    * exact-ppm integer quotient. Returns
    * (node, degree, n_triangles, local_cc_ppm).
    *
    * Scale: triangleCounts' oriented wedge join bounds the work by
    * Σ deg(v)² over the ≺-ordered orientation (the standard m^{3/2}
    * bound); the coefficient join is node-keyed. */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges.select(
        least(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("u"),
        greatest(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = canon.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= 2)
      .join(triangleCounts(edges, srcCol, dstCol), Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .select(col("node"), col("degree"), col("n_triangles"),
        expr("2000000 * n_triangles div (degree * (degree - 1))")
          .as("local_cc_ppm"))
  }

  /** E2+/ML — Adamic–Adar link prediction over a bipartite incidence
    * (basket, item): score a candidate item pair by
    *   AA(a,b) = Σ_{baskets o ∋ a,b} 1/ln(deg(o)),
    * the "rare shared context counts more" principle (Adamic & Adar,
    * "Friends and neighbors on the Web", Social Networks 2003 — public
    * literature). Each shared basket's contribution is nano-quantized
    * (per-basket constant — one IEEE ln of an exact integer), so the
    * pair sum is a plain long aggregation any engine reproduces.
    * Baskets of degree < 2 contribute no pairs and drop; a degree cap
    * guards the quadratic per-basket explode (a basket shared by
    * thousands of items carries ~no signal and quadratic cost — the
    * standard frequent-item guard, same reasoning as the q202
    * co-occurrence kernel). Returns the top-k scored pairs:
    * (item_a, item_b, n_common, aa_nano).
    *
    * Scale: deg is a basket-grain agg of the distinct incidence; the
    * pair space is Σ_o deg(o)² with deg capped — linear in baskets,
    * never |items|². Everything keys on basket id then pair — uniform
    * content-derived keys, map-side combinable. */
  def adamicAdar(incidence: DataFrame, basketCol: Column, itemCol: Column,
      topK: Int, maxBasketDegree: Int = 1000): DataFrame = {
    val inc = incidence.select(basketCol.cast("long").as("__b"),
      itemCol.cast("long").as("__i")).distinct()
    val deg = inc.groupBy(col("__b")).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= 2 && col("__deg") <= maxBasketDegree)
      // nano-quantized per-basket weight: one ln per BASKET, not per pair
      .withColumn("__w", round(lit(1e9) / log(col("__deg").cast("double")), 0)
        .cast("long"))
    // weight rides the a-side BEFORE the pair explode — deg is
    // basket-grain (data-sized), so this is a plain shuffle equi-join,
    // never a broadcast; it also semi-filters both sides to baskets
    // that survive the degree gate
    val a = inc.join(deg.select(col("__b"), col("__w")), "__b")
      .select(col("__b"), col("__i").as("__ia"), col("__w"))
    val b = inc.toDF("__b", "__ib")
    a.join(b, "__b").filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia").as("item_a"), col("__ib").as("item_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("__w")).as("aa_nano"))
      .orderBy(col("aa_nano").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** E2+/E6 — k-truss decomposition by bulk edge peeling (Cohen 2008 —
    * public literature): keep only edges supported by ≥ k−2 triangles,
    * recompute, repeat `rounds` times. The EDGE-grain cohesion filter
    * [[kCore]]'s degree test can't express — a k-core can be a sparse
    * star-of-stars; a k-truss is built of triangles, the signature of
    * genuinely tight communities (near-dup template families, real
    * co-purchase pools).
    *
    * Determinism: fixed `rounds` bulk peels (no convergence test) →
    * the output is a pure function of the input edge set, replayable
    * by an oracle that unrolls the same rounds; support counting is
    * exact triangle enumeration over canonical (u < v) edges — each
    * triangle {x<y<z} found once as wedge (x,y)+(x,z) closed by (y,z).
    * Returns surviving edges with their support in the survivor set:
    * (u, v, support).
    *
    * Scale: per round, one self equi-join on the shared LOWER endpoint
    * + one closing semi-join + one edge-keyed count — all equi-joins;
    * localCheckpoint between rounds cuts the lineage (the [[kCore]]
    * pattern). For skew-heavy graphs compose the [[triangleCounts]]
    * degree orientation in front; the canonical form here keeps the
    * oracle transliteration 1:1. */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 3 && rounds >= 1, "k >= 3 and rounds >= 1")
    def support(cur: DataFrame): DataFrame = {
      val e1 = cur.select(col("u").as("a"), col("v").as("b"))
      val e2 = cur.select(col("u").as("a"), col("v").as("c"))
      val tri = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
        .join(cur.select(col("u").as("b"), col("v").as("c")),
          Seq("b", "c"), "left_semi")
      tri.select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("a").as("u"), col("c").as("v")),
          struct(col("b").as("u"), col("c").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
    }
    var e = edges.select(
        least(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("u"),
        greatest(checkedLong(col(srcCol)), checkedLong(col(dstCol))).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    var i = 0
    while (i < rounds) {
      e = e.join(support(e), Seq("u", "v"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
        .select(col("u"), col("v"))
        .localCheckpoint()
      i += 1
    }
    e.join(support(e), Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
  }
  /** E2+ — rich-club coefficient profile (Colizza, Flammini, Serrano
    * & Vespignani, Nature Physics 2006): for each degree threshold k,
    *   φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1))
    * — the edge density among the hubs alone. A rising φ(k) says the
    * high-degree nodes form a club (supply-chain concentration, crawl
    * hub interlinking); the robustness question behind "what happens
    * if the top nodes fail together". Exact integer counts, one
    * pinned division per threshold. Returns one row per k:
    * (k, n_rich, e_rich, phi).
    *
    * Scale: degrees are ONE dst/src-keyed agg of the symmetrized edge
    * list; each threshold's edge count is a conditional agg over the
    * degree-joined edges — |ks| passes over one broadcast-degree
    * frame, never a pair blowup. */
  def richClub(edges: DataFrame, srcCol: String, dstCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 0), "ks non-empty, >= 0")
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct().localCheckpoint()
    val deg = e0.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val joined = e0
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
    val rows = ks.map { k =>
      val er = joined.filter(col("__da") > k && col("__db") > k)
        .agg(count(lit(1)).as("e_rich"))
      val nr = deg.filter(col("deg") > k).agg(count(lit(1)).as("n_rich"))
      er.crossJoin(broadcast(nr))
        .select(lit(k.toLong).as("k"), col("n_rich"), col("e_rich"),
          when(col("n_rich") >= 2,
            col("e_rich").cast("double") * 2.0 /
              (col("n_rich").cast("double") *
                (col("n_rich") - 1).cast("double"))).as("phi"))
    }
    rows.reduce(_ unionByName _).orderBy(col("k"))
  }

  /** E2+ — targeted-attack tolerance audit (Albert, Jeong & Barabási,
    * Nature 2000, "Error and attack tolerance of complex networks"):
    * remove the top-k highest-degree hubs and measure what fraction
    * of the (edge-connected) graph the largest surviving component
    * still holds — scale-free graphs shatter under targeted removal
    * while staying robust to random failure; this is the
    * supply-chain / crawl-infrastructure fragility readout. Hub rank
    * ties break on node id; components come from the deterministic
    * min-label [[connectedComponents]]. Returns one row per k:
    * (k_removed, n_nodes_left, n_edges_left, largest_cc, share_ppm).
    *
    * Scale: degrees are one agg; each scenario is a filtered CC run
    * (O(log diameter) node-keyed rounds). |ks| scenarios run
    * sequentially — audits run on the (bounded) graph slice under
    * study, not on raw fact volume. */
  def attackTolerance(edges: DataFrame, srcCol: String, dstCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 0), "ks non-empty, >= 0")
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct().localCheckpoint()
    val deg = e0.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // only the top max(ks) hubs are ever removed — orderBy.limit is a
    // TakeOrderedAndProject (per-partition top-k, no global sort, no
    // single-partition window over the unbounded node rollup); the
    // collected list is exactly max(ks) rows, bounded by the k literal
    val spark = edges.sparkSession
    import spark.implicits._
    val hubsTop: Array[Long] = deg
      .orderBy(col("deg").desc, col("node")).limit(ks.max)
      .select(col("node")).as[Long].collect()
    // the |ks| scenarios are INDEPENDENT (each its own filtered CC run
    // over the shared checkpointed edge list), and each is dominated by
    // per-round job latency on a frontier-sized frame — run them
    // CONCURRENTLY and let the scheduler interleave the small jobs;
    // results are assembled per k, so determinism is untouched
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val rows = Await.result(Future.sequence(ks.map { k => Future {
      val removed = hubsTop.take(k).toSeq.toDF("node")
      val surv = e0
        .join(broadcast(removed.withColumnRenamed("node", "a")),
          Seq("a"), "left_anti")
        .join(broadcast(removed.withColumnRenamed("node", "b")),
          Seq("b"), "left_anti")
        .localCheckpoint()
      val nEdges = surv.count()
      if (nEdges == 0) (k.toLong, 0L, 0L, 0L, 0L)
      else {
        val comp = connectedComponents(surv, "a", "b", cache = false)
        val sizes = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("sz"))
          .agg(sum(col("sz")).as("nn"), max(col("sz")).as("mx"))
          .collect()(0)
        val nn = sizes.getLong(0); val mx = sizes.getLong(1)
        (k.toLong, nn, nEdges, mx, mx * 1000000L / math.max(nn, 1L))
      }
    }}), Duration.Inf)
    rows.toDF("k_removed", "n_nodes_left", "n_edges_left", "largest_cc",
      "share_ppm").orderBy(col("k_removed"))
  }

  /** E-graph — STRONGLY CONNECTED COMPONENTS of a capped directed
    * graph by mutual reachability (Nuutila/Tarjan give the sequential
    * algorithm; the distributed form here materializes the bounded
    * transitive closure by POINTER-DOUBLING joins — path length covered
    * doubles per round, so `maxDoublings` = 6 covers diameter 64).
    * scc_id(v) = min{u : u ⇝ v ∧ v ⇝ u} (v itself included, so every
    * node gets a label). Returns (node, scc_id).
    *
    * SCALE CONTRACT (the q432 audit-slice discipline): the closure is
    * O(n · avg-reach) PAIRS — this operator is for BOUNDED analysis
    * graphs (category transition maps, service dependency graphs,
    * capped audit slices), which is what SCC is asked of in practice;
    * it requires n ≤ 100k nodes and refuses otherwise rather than
    * silently materializing a quadratic frame at fact scale. Each
    * doubling round is one equi-join + distinct on mid — no cartesian,
    * no driver loop over pairs. */
  def stronglyConnectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxDoublings: Int = 6,
      smallGraphFastPath: Boolean = true): DataFrame = {
    require(maxDoublings >= 1 && maxDoublings <= 10,
      "maxDoublings in [1, 10]")
    val e = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n"))).distinct()
      .localCheckpoint()
    val nNodes = nodes.count()
    if (nNodes == 0) {
      val spark = edges.sparkSession
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("scc_id",
            org.apache.spark.sql.types.LongType))))
    }
    require(nNodes <= 100000L,
      s"stronglyConnectedComponents is an audit-slice operator " +
        s"(closure is O(n·reach) pairs): $nNodes nodes > 100000 — " +
        "cap the node set upstream")
    // BOUNDED fast path (the connectedComponents adaptive-regime
    // discipline): audit-slice graphs this small pay 6 rounds of
    // doubling-join job latency for nothing — an iterative driver
    // Tarjan produces the IDENTICAL min-node labels in one collect.
    val nEdges = e.count()
    if (smallGraphFastPath && nNodes <= 20000L && nEdges <= 200000L) {
      val spark = edges.sparkSession
      import spark.implicits._
      val adj = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
      val nodeSet = scala.collection.mutable.TreeSet.empty[Long]
      e.collect().foreach { r =>
        adj.getOrElseUpdate(r.getLong(0),
          scala.collection.mutable.ArrayBuffer.empty) += r.getLong(1)
        nodeSet += r.getLong(0); nodeSet += r.getLong(1)
      }
      // iterative Tarjan (explicit stack — no recursion depth limit)
      val index = scala.collection.mutable.Map.empty[Long, Int]
      val low = scala.collection.mutable.Map.empty[Long, Int]
      val onStack = scala.collection.mutable.Set.empty[Long]
      val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
      val label = scala.collection.mutable.Map.empty[Long, Long]
      var counter = 0
      nodeSet.foreach { root =>
        if (!index.contains(root)) {
          // frames: (node, iterator over its successors)
          val frames = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Iterator[Long])]
          index(root) = counter; low(root) = counter; counter += 1
          stack += root; onStack += root
          frames += ((root,
            adj.getOrElse(root, Nil).iterator))
          while (frames.nonEmpty) {
            val (v, it) = frames.last
            var descended = false
            while (it.hasNext && !descended) {
              val w = it.next()
              if (!index.contains(w)) {
                index(w) = counter; low(w) = counter; counter += 1
                stack += w; onStack += w
                frames += ((w, adj.getOrElse(w, Nil).iterator))
                descended = true
              } else if (onStack(w) && index(w) < low(v)) low(v) = index(w)
            }
            if (!descended) {
              frames.remove(frames.length - 1)
              if (frames.nonEmpty) {
                val p = frames.last._1
                if (low(v) < low(p)) low(p) = low(v)
              }
              if (low(v) == index(v)) { // v roots an SCC: pop it
                val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
                var done = false
                while (!done) {
                  val w = stack.remove(stack.length - 1)
                  onStack -= w
                  comp += w
                  done = w == v
                }
                val id = comp.min
                comp.foreach(w => label(w) = id)
              }
            }
          }
        }
      }
      return label.toSeq.sortBy(_._1).toDF("node", "scc_id")
    }
    // reflexive closure seed: (v, v) keeps singleton SCCs labeled
    var reach = e.unionByName(nodes.select(col("n").as("u"), col("n").as("v")))
      .localCheckpoint()
    var prevPairs = reach.count()
    var converged = false
    var r = 0
    while (r < maxDoublings && !converged) {
      r += 1
      reach = reach.unionByName(
          reach.select(col("u"), col("v").as("__m"))
            .join(reach.select(col("u").as("__m"), col("v")), Seq("__m"))
            .select(col("u"), col("v")))
        .distinct()
        .repartition(edges.sparkSession.sparkContext.defaultParallelism,
          col("u"), col("v"))
        .localCheckpoint()
      // fixpoint check: pointer doubling only ever ADDS pairs, so an
      // unchanged count IS closure — stop early (free: the checkpoint
      // materialized the frame anyway). If the count is still growing
      // after the last round the closure has NOT converged (diameter
      // > 2^maxDoublings) and min-mutual labels would silently split
      // SCCs — refuse like the n>100k fence does, never answer wrong.
      val pairs = reach.count()
      if (pairs == prevPairs) converged = true
      prevPairs = pairs
    }
    if (!converged) {
      // one more squaring step proves (or disproves) closure: bounded
      // by the same O(n·reach) pair frame we already materialized
      val next = reach.unionByName(
          reach.select(col("u"), col("v").as("__m"))
            .join(reach.select(col("u").as("__m"), col("v")), Seq("__m"))
            .select(col("u"), col("v")))
        .distinct().count()
      if (next != prevPairs)
        throw new IllegalStateException(
          s"stronglyConnectedComponents: transitive closure not " +
            s"converged after $maxDoublings doubling rounds " +
            s"(diameter > ${1L << maxDoublings}; $prevPairs -> $next " +
            "pairs) — raise maxDoublings or slice the graph")
    }
    // mutual pairs: (u ⇝ v) ∧ (v ⇝ u); min mutual partner labels the SCC
    reach.join(reach.select(col("v").as("u"), col("u").as("v")),
        Seq("u", "v"))
      .groupBy(col("u").as("node"))
      .agg(min(col("v")).as("scc_id"))
  }
}

/** Driver-side layered-BFS kernel (opt round 12; VERDICT r11 item 2 —
  * the PowerKernel / MinLabelUnionFind audit-slice discipline): EXACTLY
  * the semantics of the distributed layered loop in `Graph.bfsFromSym`,
  * on a collected symmetric edge list:
  *
  *   - dist(seed) = 0 for every distinct seed (present in the graph or
  *     not); layer k = neighbors of layer k−1 not yet labeled, dist k;
  *   - an EMPTY layer is the fixed point (early exit), `rounds` caps
  *     the horizon — identical to the distributed empty-layer test;
  *   - all state is integer min-plus, so the trajectory is
  *     bit-identical under any evaluation order (the q155 determinism
  *     contract).
  *
  * OptR12Spec pins kernel ≡ distributed on shared graphs. */
private[ext] object BfsKernel {
  import scala.collection.mutable.{ArrayBuffer, LongMap}
  type Adj = LongMap[ArrayBuffer[Long]]

  /** Adjacency of the SYMMETRIC closure of a directed distinct edge
    * list: both directions are mirrored here, so callers collect the
    * distinct list (half the rows of the exploded sym). A pair present
    * in both directions upstream yields duplicate adjacency entries —
    * exactly the duplicate sym rows the distributed loop tolerates
    * (per-round candidates are deduped by the dist-labeled check). */
  def adjacencyUndirected(rows: Array[org.apache.spark.sql.Row]): Adj = {
    val adj = LongMap.empty[ArrayBuffer[Long]]
    rows.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      adj.getOrElseUpdate(a, new ArrayBuffer[Long]) += b
      adj.getOrElseUpdate(b, new ArrayBuffer[Long]) += a
    }
    adj
  }

  /** (node → hop distance) for every node within `rounds` hops of a seed. */
  def run(adj: Adj, seeds: Array[Long], rounds: Int): LongMap[Long] = {
    require(rounds >= 1, "rounds must be >= 1")
    val dist = LongMap.empty[Long]
    var frontier = new ArrayBuffer[Long]
    seeds.foreach { s =>
      if (!dist.contains(s)) { dist(s) = 0L; frontier += s }
    }
    var k = 0L
    while (k < rounds && frontier.nonEmpty) {
      k += 1
      val next = new ArrayBuffer[Long]
      frontier.foreach { u =>
        adj.get(u).foreach(_.foreach { v =>
          if (!dist.contains(v)) { dist(v) = k; next += v }
        })
      }
      frontier = next
    }
    dist
  }
}

/** Driver-side k-pivot Brandes kernel (opt round 12; VERDICT r11 item 4
  * — the BfsKernel/PowerKernel audit-slice discipline): EXACTLY the
  * semantics of the distributed loop in [[Graph.betweennessPivots]] on a
  * collected canonical edge list:
  *
  *   - forward: layered BFS from the `numPivots` smallest node ids,
  *     σ carried as exact BigInt (≡ decimal(38,0), d38-checked per sum
  *     like the distributed agg under ANSI); a globally EMPTY layer is
  *     the fixed point; `maxHops` caps the horizon;
  *   - backward, level by level descending: δ(v) accumulates
  *     ⌊σ(v)·(10⁶ + δ(w)) / σ(w)⌋ over DAG edges v→w into the next
  *     layer — products and sums d38-checked, division truncating on
  *     non-negative operands (≡ the distributed `div`);
  *   - bc(v) = Σ_s δ_s(v) over v ≠ s, d38-checked, delivered as long
  *     with the ANSI cast-overflow error replicated.
  *
  * OptR12Spec pins kernel ≡ distributed on shared graphs. */
private[ext] object BrandesKernel {
  import scala.collection.mutable.{ArrayBuffer, LongMap}
  import graft.core.AnsiNum.{d38 => ck}

  def run(spark: org.apache.spark.sql.SparkSession,
      canon: Array[org.apache.spark.sql.Row],
      numPivots: Int, maxHops: Int): org.apache.spark.sql.DataFrame = {
    // symmetric adjacency of the canonical (a < b, distinct, no
    // self-loop) edge set — identical to the exploded sym
    val adj = LongMap.empty[ArrayBuffer[Long]]
    canon.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      adj.getOrElseUpdate(a, new ArrayBuffer[Long]) += b
      adj.getOrElseUpdate(b, new ArrayBuffer[Long]) += a
    }
    // pivots: the numPivots smallest node ids (distributed:
    // sym.select(src).distinct.orderBy.limit)
    val pivots = adj.keys.toArray.sorted.take(numPivots)
    val nP = pivots.length
    // ---- forward: per-pivot layers of (node -> sigma) ----------------
    // layers(l)(p): nodes discovered at hop l from pivot p with their
    // exact path counts; the done flag is GLOBAL (a layer empty across
    // ALL pivots ends the loop), exactly like the distributed count probe
    val seed = Array.tabulate(nP) { p =>
      val m = LongMap.empty[BigInt]; m(pivots(p)) = BigInt(1); m }
    val layers = ArrayBuffer(seed)
    val labeled = Array.tabulate(nP) { p =>
      val s = LongMap.empty[Unit]; s(pivots(p)) = (); s }
    var l = 0
    var done = false
    while (l < maxHops && !done) {
      l += 1
      val next = Array.fill(nP)(LongMap.empty[BigInt])
      var total = 0L
      var p = 0
      while (p < nP) {
        layers(l - 1)(p).foreach { case (u, sig) =>
          adj.get(u).foreach(_.foreach { v =>
            if (!labeled(p).contains(v))
              next(p)(v) = ck(next(p).getOrElse(v, BigInt(0)) + sig)
          })
        }
        p += 1
      }
      var q = 0
      while (q < nP) {
        next(q).foreach { case (v, _) => labeled(q)(v) = () }
        total += next(q).size
        q += 1
      }
      if (total == 0L) done = true
      else layers += next
    }
    // ---- backward: ppm dependency accumulation, deepest level first --
    val deltas = scala.collection.mutable.Map.empty[Int, Array[LongMap[BigInt]]]
    val ppm = BigInt(1000000)
    ((maxHops - 1) to 1 by -1).foreach { lev =>
      if (lev + 1 < layers.length) {
        val acc = Array.fill(nP)(LongMap.empty[BigInt])
        val dNext = deltas.get(lev + 1)
        var p = 0
        while (p < nP) {
          layers(lev)(p).foreach { case (v, sigv) =>
            adj.get(v).foreach(_.foreach { w =>
              layers(lev + 1)(p).get(w).foreach { sigw =>
                val dw = dNext.flatMap(_(p).get(w)).getOrElse(BigInt(0))
                // __num = σ_v · (10⁶ + δ_w), d38-checked like the
                // distributed decimal ops; div truncates (non-negative)
                val contrib = ck(sigv * ck(ppm + dw)) / sigw
                acc(p)(v) = ck(acc(p).getOrElse(v, BigInt(0)) + contrib)
              }
            })
          }
          p += 1
        }
        deltas(lev) = acc
      }
    }
    // ---- bc: sum over pivots, sources excluded (every delta row sits
    // at level ≥ 1, so the dist ≥ 1 filter is the level-1 start) ------
    val bc = LongMap.empty[BigInt]
    deltas.values.foreach { byPivot =>
      byPivot.foreach(_.foreach { case (v, d) =>
        bc(v) = ck(bc.getOrElse(v, BigInt(0)) + d)
      })
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bc_ppm",
        org.apache.spark.sql.types.LongType)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](adj.size)
    adj.keys.foreach { n =>
      rows.add(org.apache.spark.sql.Row(n,
        graft.core.AnsiNum.toLongExact(bc.getOrElse(n, BigInt(0)))))
    }
    spark.createDataFrame(rows, schema)
  }
}
