package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for BANDED DYNAMIC TIME WARPING distance
  * between two integer sequences (Sakoe & Chiba 1978, IEEE TASSP —
  * public literature; the standard elastic-alignment distance for
  * time-series similarity search). Alignment cost is Σ |aᵢ − b_j| over
  * the warping path, path slope constrained to the |i − j| ≤ band
  * diagonal corridor — the constraint that makes the kernel O(n·band)
  * instead of O(n·m) AND regularizes pathological warpings.
  *
  * Why an Expression: like [[JaroWinkler]], the kernel runs once per
  * CANDIDATE PAIR of a blocked self-join — the hottest scalar position
  * the plan has. As a codegen expression it evaluates inside the join
  * stage's WholeStageCodegen span (one static call, no UDF boundary),
  * so a similarity search over 100 TB of per-key profiles is bounded
  * by the blocking fan-out, never by kernel dispatch.
  *
  * EXACT integer semantics (oracle-replayable bit-for-bit): inputs are
  * ARRAY<BIGINT> (quantize doubles upstream — the engine-wide micro/
  * cent discipline), costs and the running total are exact long sums.
  * NULL result when either input is null, either sequence is empty,
  * any element is null, or |len(a) − len(b)| > band (no admissible
  * path inside the corridor). Result exceeds no bound: padded INF is
  * Long.MaxValue/4, unreachable by real sums of |Δ| ≤ 2⁶³/4 per step.
  */
case class DtwBanded(left: Expression, right: Expression, band: Int)
    extends BinaryExpression {
  require(band >= 0, "band must be >= 0")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dtw_banded"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"dtw_banded needs ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DtwBanded.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], band)

  // DP scratch + two loops: one static call from generated code, same
  // shape as JaroWinkler / Spark's own levenshtein codegen. The local
  // MUST be a fresh name: two dtw_banded calls compiled into one
  // codegen context would otherwise declare the same Java variable
  // twice and knock the whole stage back to interpreted mode.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.ext.DtwBanded.compute"
    val r = ctx.freshName("dtwRes")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""Object $r = $compute($x, $y, $band);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $r).longValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DtwBanded {

  /** The scalar kernel — static so generated code can call it. Returns
    * java.lang.Long (boxed) or null when no admissible corridor path
    * exists / inputs are degenerate. */
  def compute(a: ArrayData, b: ArrayData, band: Int): Any = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return null
    if (math.abs(n - m) > band) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < m) { if (b.isNullAt(i)) return null; i += 1 }
    val INF = Long.MaxValue / 4
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    java.util.Arrays.fill(prev, INF)
    prev(0) = 0L
    var ii = 1
    while (ii <= n) {
      java.util.Arrays.fill(cur, INF)
      val lo = math.max(1, ii - band)
      val hi = math.min(m, ii + band)
      val ai = a.getLong(ii - 1)
      var j = lo
      while (j <= hi) {
        val d = ai - b.getLong(j - 1)
        val cost = if (d < 0) -d else d
        var best = prev(j)
        if (cur(j - 1) < best) best = cur(j - 1)
        if (prev(j - 1) < best) best = prev(j - 1)
        if (best < INF) cur(j) = best + cost
        j += 1
      }
      val t = prev; prev = cur; cur = t
      ii += 1
    }
    if (prev(m) >= INF) null else java.lang.Long.valueOf(prev(m))
  }

  /** Column builder. `band` is a plan-time literal — the corridor is a
    * structural property of the operator, not data. */
  def dtwBanded(a: Column, b: Column, band: Int): Column =
    GraftSqlBridge.column(DtwBanded(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b), band))

  /** SQL-registration builder (`dtw_banded(a, b, band)`): the band must
    * be an integer literal — it shapes the kernel, not the data. */
  def cast(exprs: Seq[Expression]): DtwBanded = {
    require(exprs.length == 3,
      s"dtw_banded takes 3 arguments (a, b, band), got ${exprs.length}")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val band = exprs(2) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case Literal(v: Short, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"dtw_banded band must be an integer literal, got $other")
    }
    DtwBanded(exprs(0), exprs(1), band)
  }
}

/** Native Catalyst expression: DEFLATE-compressed byte length of a
  * string's UTF-8 bytes (java.util.zip.Deflater, level 6, raw/nowrap).
  * The compressibility QUALITY SIGNAL of web-scale corpus curation
  * (MassiveText/Gopher, Rae et al. 2021 §A1.1 — public literature):
  * near-duplicate boilerplate compresses far below natural prose,
  * random/garbled text barely compresses — thresholding the ratio
  * deflate_len/byte_len screens both tails in ONE scan-side pass.
  *
  * Determinism: fixed input → fixed output for a given zlib build (the
  * JDK bundles its own); the engine treats the LENGTH as a signal, not
  * a portable constant — the declared query is a rows-only contract
  * and the spec pins ORDER properties (repetitive < prose < random),
  * not literal byte counts. Null in → null out; empty string → the
  * 2-byte empty raw-deflate block.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_length"

  override def nullSafeEval(input: Any): Any =
    DeflateLength.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.ext.DeflateLength.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLength {

  /** Static kernel: one Deflater per call (zlib native state is not
    * thread-shareable; allocation is micro-scale next to the deflate
    * itself), raw stream (nowrap — no zlib header/checksum noise). */
  def compute(s: UTF8String): Long = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](math.max(64, in.length + (in.length >> 1) + 16))
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def deflateLength(c: Column): Column =
    GraftSqlBridge.column(DeflateLength(GraftSqlBridge.expression(c)))
}

/** Native Catalyst expression: AHO-CORASICK multi-pattern match count
  * (Aho & Corasick 1975, CACM — public literature): the total number
  * of (pattern, position) occurrences of a LITERAL dictionary in the
  * input, overlapping matches included — the one-pass alternative to k
  * `contains`/regex probes when tagging documents against keyword /
  * PII / blocklist dictionaries at corpus scale.
  *
  * The automaton (goto/fail/output-count per node) is built ONCE per
  * plan from the dictionary literal and shared by every row the task
  * scans — the matcher itself is O(|text| + matches) independent of
  * dictionary size. Matching is on UTF-16 code units of the decoded
  * string (exact for the BMP dictionaries this targets); patterns are
  * case-sensitive — fold upstream with lower(). Null in → null out.
  */
case class AhoCorasickCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "aho_count needs a non-empty dictionary of non-empty patterns")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "aho_count"

  @transient private lazy val automaton = AhoCorasickCount.build(patterns)

  override def nullSafeEval(input: Any): Any =
    AhoCorasickCount.count(automaton, input.asInstanceOf[UTF8String])

  // the automaton rides the plan as a per-partition lazy singleton: the
  // generated code calls a static cached builder keyed by the literal
  // dictionary, then the linear matcher
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("ahoDict", patterns,
      "scala.collection.immutable.Seq")
    defineCodeGen(ctx, ev, x =>
      s"graft.ext.AhoCorasickCount.count(" +
        s"graft.ext.AhoCorasickCount.cached($dictRef), $x)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasickCount {

  /** Flat automaton: goto maps, fail links, per-node terminal count
    * (number of dictionary words ending at the node, following output
    * links — pre-summed so matching never walks the fail chain). */
  final class Automaton(val gotoMaps: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int], val outCount: Array[Long]) extends Serializable

  def build(patterns: Seq[String]): Automaton = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outRaw = scala.collection.mutable.ArrayBuffer(0L)
    patterns.foreach { p =>
      var node = 0
      p.foreach { ch =>
        val m = gotoMaps(node)
        val nxt = m.get(ch)
        node = if (nxt != null) nxt.intValue()
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          outRaw += 0L
          m.put(ch, gotoMaps.length - 1)
          gotoMaps.length - 1
        }
      }
      outRaw(node) += 1L
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val outCount = outRaw.toArray
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach { (_, v) => fail(v) = 0; queue.add(v); () }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // output counts pre-sum down the fail chain (BFS order makes the
      // parent's chain already summed)
      outCount(u) += outCount(fail(u))
      gotoMaps(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(ch)) f = fail(f)
        val t = gotoMaps(f).get(ch)
        fail(v.intValue()) =
          if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        queue.add(v)
        ()
      }
    }
    new Automaton(gotoMaps.toArray, fail, outCount)
  }

  // plan-literal dictionaries are tiny and few: a bounded cache keyed
  // by the dictionary gives codegen a static lookup with one build
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Automaton]()
  def cached(patterns: Seq[String]): Automaton = {
    if (cache.size() > 64) cache.clear() // bounded; rebuild is cheap
    cache.computeIfAbsent(patterns, p => build(p))
  }

  def count(a: Automaton, s: UTF8String): Long = {
    val t = s.toString
    var node = 0
    var total = 0L
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      var n = node
      while (n != 0 && !a.gotoMaps(n).containsKey(ch)) n = a.fail(n)
      val nxt = a.gotoMaps(n).get(ch)
      node = if (nxt != null) nxt.intValue() else 0
      total += a.outCount(node)
      i += 1
    }
    total
  }

  def ahoCount(c: Column, patterns: Seq[String]): Column =
    GraftSqlBridge.column(AhoCorasickCount(GraftSqlBridge.expression(c),
      patterns))
}

/** Native Catalyst expression for EXACT OPTIMAL-PARTITIONING
  * changepoint detection (the PELT family's exact parent — Killick,
  * Fearnhead & Eckley 2012, JASA, public literature; Jackson et al.
  * 2005 gave the O(n²) recursion implemented here) over an integer
  * series under a per-changepoint penalty.
  *
  * EXACT integer metric (oracle-replayable bit-for-bit): segment cost
  * C(s,t) = Σx² − (Σx)² div (t−s) on long prefix sums — the
  * within-segment sum of squares with the mean term FLOOR-divided
  * (both engines truncate non-negative quotients identically), so the
  * whole DP is long arithmetic. F(0) = −β; F(t) = min over s < t of
  * F(s) + C(s,t) + β, argmin ties to the SMALLEST s. PELT's pruning is
  * deliberately omitted: the floor-quantized cost does not satisfy the
  * pruning inequality's preconditions exactly, and series here are
  * calendar-bounded per key (≤ a few hundred points), where O(n²) is
  * already cache-resident — the penalty dial, not the DP, is the
  * 100 TB knob (one kernel call per key inside codegen).
  *
  * Returns ARRAY<BIGINT>: element 0 is the total cost F(n), elements
  * 1.. are the changepoint boundaries (ascending, exclusive end of
  * each non-final segment, 1-based). Null for null/empty input, any
  * null element, or a non-positive penalty — or if ANY intermediate
  * (prefix sum, sum², DP value) overflows a long: every addition and
  * multiplication is checked (Math.*Exact), so a series whose segment
  * sums exceed ~3.04e9 returns null instead of a silently wrapped,
  * corrupted argmin (the costDistance maxCost discipline). */
case class ChangepointsExact(child: Expression, penalty: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "changepoints_exact"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"changepoints_exact needs ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    ChangepointsExact.compute(a.asInstanceOf[ArrayData], penalty)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.ext.ChangepointsExact.compute"
    val r = ctx.freshName("cpRes")
    nullSafeCodeGen(ctx, ev, x =>
      s"""Object $r = $compute($x, ${penalty}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChangepointsExact {

  /** Static kernel for generated code. Returns ArrayData or null
    * (including on any long overflow — checked arithmetic throughout,
    * so a wrapped negative can never corrupt the argmin). */
  def compute(a: ArrayData, penalty: Long): Any = try {
    val n = a.numElements()
    if (n == 0 || penalty <= 0L) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    // prefix sums: S(i) = Σ x[0..i), SS(i) = Σ x²
    val s = new Array[Long](n + 1)
    val ss = new Array[Long](n + 1)
    i = 0
    while (i < n) {
      val x = a.getLong(i)
      s(i + 1) = Math.addExact(s(i), x)
      ss(i + 1) = Math.addExact(ss(i), Math.multiplyExact(x, x))
      i += 1
    }
    val f = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    f(0) = -penalty
    var t = 1
    while (t <= n) {
      var best = Long.MaxValue
      var bestS = 0
      var seg = 0
      while (seg < t) {
        val len = t - seg
        val sum = Math.subtractExact(s(t), s(seg))
        val cost = Math.subtractExact(ss(t) - ss(seg),
          Math.multiplyExact(sum, sum) / len)
        val cand = Math.addExact(Math.addExact(f(seg), cost), penalty)
        if (cand < best) { best = cand; bestS = seg } // ties → smallest s
        seg += 1
      }
      f(t) = best; bp(t) = bestS
      t += 1
    }
    // backtrack boundaries (exclusive segment ends, ascending)
    var cuts = List.empty[Long]
    var cur = n
    while (bp(cur) > 0) { cuts = bp(cur).toLong :: cuts; cur = bp(cur) }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      (f(n) :: cuts).toArray)
  } catch { case _: ArithmeticException => null }

  /** Column builder; `penalty` is a plan-time literal. */
  def changepointsExact(series: Column, penalty: Long): Column =
    GraftSqlBridge.column(ChangepointsExact(
      GraftSqlBridge.expression(series), penalty))
}

/** Native LONGEST STRICTLY-INCREASING SUBSEQUENCE length over an
  * integer series (patience sorting / Fredman 1975 — public
  * literature): the trend-persistence readout of a per-key ordered
  * value sequence — how long a monotone improvement run hides inside
  * the noise. O(n log n) tails array with binary search, exact
  * integers; provably equal to the O(n²) DP the oracle replays
  * (each tails[k] is the smallest possible tail value of an
  * increasing subsequence of length k+1). Null for null input or any
  * null element; 0 for empty. */
case class LisLength(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "lis_length"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"lis_length needs ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    LisLength.compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("lisRes")
    nullSafeCodeGen(ctx, ev, x =>
      s"""Object $r = graft.ext.LisLength.compute($x);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $r).intValue(); }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LisLength {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Static kernel: patience tails + binary search. Returns
    * java.lang.Integer or null (null element). */
  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    if (n == 0) return Integer.valueOf(0)
    val tails = new Array[Long](n)
    var len = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getLong(i)
      // first k with tails(k) >= x — strict increase replaces it
      var lo = 0
      var hi = len
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (tails(mid) < x) lo = mid + 1 else hi = mid
      }
      tails(lo) = x
      if (lo == len) len += 1
      i += 1
    }
    Integer.valueOf(len)
  }

  /** Column builder. */
  def lisLength(series: Column): Column =
    GraftSqlBridge.column(LisLength(GraftSqlBridge.expression(series)))
}
