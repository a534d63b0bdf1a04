package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler string similarity — the
  * ranking companion to the thresholded-levenshtein verify used by the
  * q108/q135 entity-resolution paths (reference fuzzy matching surface,
  * `data_preprocessing.py:152-156` name normalization). Levenshtein
  * answers "within k edits?"; Jaro-Winkler answers "how alike?", with
  * the prefix boost that makes it the standard scorer for
  * person/product name matching (Winkler 1990, public literature).
  *
  * Why an Expression: the kernel runs once per CANDIDATE PAIR of a
  * blocked join — the hottest scalar position an entity-resolution
  * plan has. As a codegen expression it evaluates inside the join
  * stage's WholeStageCodegen span (one static call, no boxing, no UDF
  * serialization boundary), usable in join conditions at 100 TB rates.
  *
  * Semantics are pinned BIT-FOR-BIT to DuckDB's
  * `jaro_winkler_similarity` (empirically verified on 3 000 random
  * pairs: identical IEEE doubles), which is what lets thresholds and
  * rank orders agree with the oracle without any tolerance band:
  *   - either side empty → 0.0 (even when both are empty);
  *   - match window = max(len)/2 − 1 (floor, clamped at 0);
  *   - transpositions = half the out-of-order matched chars;
  *   - jaro = (m/l1 + m/l2 + (m−t)/m) / 3, evaluated in that order;
  *   - prefix boost only when jaro > 0.7: jw = jaro + p·0.1·(1−jaro)
  *     with p = common prefix length capped at 4.
  * Null in → null out.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  // The DP needs scratch arrays and two loops — inlining it would blow
  // up the generated method past the JIT inline budget, so the
  // generated code makes ONE static call instead (the same shape
  // Spark's own levenshtein codegen uses via UTF8String.levenshteinDistance).
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.ext.JaroWinkler.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The scalar kernel — static so generated code can call it. Works
    * on UTF-16 code units of the decoded string; identical to DuckDB
    * on ASCII and the BMP (the entity-name domain). */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var hit = false
      while (j < hi && !hit) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    // evaluation order is part of the contract (bit-identical to the
    // oracle engine) — do not refactor the arithmetic
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  private def toStr(e: Expression): Expression = e.dataType match {
    case StringType => e
    case _ => Cast(e, StringType)
  }

  /** Builder with implicit casts — used by SQL registration too. */
  def cast(exprs: Seq[Expression]): JaroWinkler = {
    require(exprs.length == 2,
      s"jaro_winkler takes 2 arguments, got ${exprs.length}")
    JaroWinkler(toStr(exprs.head), toStr(exprs(1)))
  }

  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(cast(Seq(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b))))
}

/** Native word-shingle expression — the inner loop of every shingle
  * consumer (MinHash q43/q45, corpus pipeline q51, boilerplate q201,
  * vocabulary growth q205). Semantically identical to the column
  * formula it replaces,
  *   array_distinct(transform(sequence(0, size(toks)-n),
  *     i => concat_ws(" ", slice(toks, i+1, n))))
  * with toks = split(lower(text), "\\s+"), but those higher-order
  * functions never enter whole-stage codegen — each shingle paid an
  * interpreted lambda dispatch, an array slice allocation and boxed
  * string joins. This expression builds the distinct n-gram array in
  * ONE static call per row (single lowercase pass, regex split, rolling
  * joins, insertion-ordered dedup) inside the enclosing codegen stage —
  * measured ~2× on the shingle-heavy queries.
  *
  * Parity contract (spec-pinned against the old formula): Unicode
  * lowercase via UTF8String (locale-independent, like Spark's lower);
  * Java regex `\s+` split with trailing empties kept (Spark split
  * limit -1 semantics); fewer than n tokens → empty array; first-
  * occurrence order preserved (array_distinct semantics). Null → null.
  */
case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType}

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(t: Any): Any =
    WordShingles.compute(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.ext.WordShingles.compute($x, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Static kernel — one pass, no per-element lambda. */
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // UTF8String.toLowerCase = Spark lower(): locale-independent
    val s = text.toLowerCase.toString
    // Java split keeps leading empties and (limit -1) trailing empties —
    // exactly Spark's split(col, pat) behavior
    val toks = ws.split(s, -1)
    val out = new java.util.LinkedHashSet[String]
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Column-API entry point. */
  def wordShingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))
}

/** Native multi-pattern substring matcher — ONE Aho–Corasick automaton
  * pass per row over up to 63 literal patterns, returning the BITMASK
  * of patterns present (bit i set ⇔ patterns(i) occurs). The scan-side
  * kernel of keyword gating, PII phrase screens and policy filters:
  * the naive form is k `contains()` calls = k full scans of every
  * document; this visits each input byte ONCE regardless of k
  * (Aho & Corasick, CACM 1975 — public literature).
  *
  * Semantics: plain case-sensitive substring match over the string's
  * UTF-16 code units (identical to `contains`); overlapping and nested
  * matches all report. The automaton (goto/fail/output tables over the
  * patterns' alphabet) is built ONCE per expression instance on the
  * driver, ships with the serialized plan, and the generated code
  * makes one static-shaped instance call per row. Null → null.
  *
  * Bitmask readouts compose downstream as integer ops: `bit_count()`
  * for how many patterns hit, `& (1 << i)` for one pattern, group-bys
  * on the mask for co-occurrence profiles — no per-pattern columns.
  */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.LongType

  require(patterns.nonEmpty && patterns.length <= 63,
    "multi_contains takes 1..63 patterns")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_contains"

  // built once per expression instance; transient so the plan
  // serializes the pattern list, not the tables — executors rebuild
  // lazily on first row
  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(t: Any): Any =
    ac.matchMask(t.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the automaton is referenced from generated code through a
    // plan-object field (same device Spark uses for compiled regexes)
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, x => s"$acRef.matchMask($x.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The automaton: dense goto rows over a compact alphabet of the
  * characters that actually appear in the patterns (everything else is
  * one "other" class that always routes through root), classic
  * BFS-built failure links, and output masks OR-accumulated through
  * the fail chain at build time so matching never walks it. */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  // compact alphabet
  private val alpha: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    patterns.foreach(_.foreach { ch =>
      if (!m.containsKey(ch)) m.put(ch, m.size)
    })
    m
  }
  private val sigma = alpha.size
  // trie build
  private val (goto_, outMask: Array[Long]) = {
    var cap = 16
    var next = Array.fill(cap * sigma)(-1)
    var out = new Array[Long](cap)
    var nStates = 1
    def ensure(n: Int): Unit = if (n > cap) {
      val nc = math.max(cap * 2, n)
      val nn = Array.fill(nc * sigma)(-1)
      System.arraycopy(next, 0, nn, 0, cap * sigma)
      val no = new Array[Long](nc)
      System.arraycopy(out, 0, no, 0, cap)
      next = nn; out = no; cap = nc
    }
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        val c = alpha.get(ch)
        if (next(s * sigma + c) == -1) {
          ensure(nStates + 1)
          next(s * sigma + c) = nStates
          nStates += 1
        }
        s = next(s * sigma + c)
      }
      out(s) |= 1L << pi
    }
    // BFS failure links; convert goto misses into direct transitions
    val fail = new Array[Int](nStates)
    val q = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < sigma) {
      val s = next(c)
      if (s == -1) next(c) = 0
      else { fail(s) = 0; q.add(s) }
      c += 1
    }
    while (!q.isEmpty) {
      val s = q.poll()
      out(s) |= out(fail(s))
      var c2 = 0
      while (c2 < sigma) {
        val t = next(s * sigma + c2)
        if (t == -1) next(s * sigma + c2) = next(fail(s) * sigma + c2)
        else { fail(t) = next(fail(s) * sigma + c2); q.add(t) }
        c2 += 1
      }
    }
    (next, out)
  }

  /** One pass; returns the OR of all matched patterns' bits. */
  def matchMask(text: String): Long = {
    var s = 0
    var mask = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      val cls = alpha.get(text.charAt(i))
      s = if (cls == null) 0 else goto_(s * sigma + cls)
      mask |= outMask(s)
      i += 1
    }
    mask
  }
}

object MultiContains {
  /** Column-API entry point. */
  def multiContains(text: Column, patterns: Seq[String]): Column =
    GraftSqlBridge.column(
      MultiContains(GraftSqlBridge.expression(text), patterns))
}

/** Native token-level LONGEST COMMON SUBSEQUENCE length — the kernel
  * of ROUGE-L (Lin, ACL'04): order-preserving (non-contiguous) token
  * overlap between a candidate and a reference, where ROUGE-2's
  * bigram multiset misses reorder-tolerant agreement. Classic
  * two-row DP (O(m·n) time, O(min) space), one static call per pair
  * inside the enclosing WholeStageCodegen span — the JaroWinkler
  * device, at the hottest position a pairwise eval scan has.
  * Null in → null out; empty side → 0.
  */
case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_lcs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("token_lcs takes two array<string> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenLcs.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.ext.TokenLcs.compute($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenLcs {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Static DP kernel — two rolling rows over the shorter side. Null
    * array ELEMENTS never match anything (ROUGE tokens are non-null;
    * defensive). */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      j = 0
      while (j < n) {
        cur(j + 1) =
          if (ai != null && bs(j) != null && ai.equals(bs(j))) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(n)
  }

  /** Column-API entry point. */
  def tokenLcs(a: Column, b: Column): Column =
    GraftSqlBridge.column(TokenLcs(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** Native token-level SMITH-WATERMAN local alignment score (Smith &
  * Waterman 1981, public literature): the best-scoring LOCAL
  * alignment between two token sequences under integer
  * (match, mismatch, gap) scores —
  *   H(i,j) = max(0, H(i−1,j−1) + s(aᵢ,bⱼ), H(i−1,j) + gap,
  *                H(i,j−1) + gap),  answer = max H.
  * Where [[TokenLcs]] rewards scattered global agreement, SW finds
  * the strongest CONTIGUOUS-modulo-gaps shared region — the kernel
  * behind log-trace alignment, plagiarized-passage forensics and
  * sequence-motif matching. All-long DP, two rolling rows, one static
  * call per pair inside the enclosing WholeStageCodegen span (the
  * TokenLcs device). Null in → null out; empty side → 0. `mismatch`
  * and `gap` are conventionally negative — enforced by the builder,
  * not the kernel (the DP itself is total for any integers). */
case class TokenSmithWaterman(left: Expression, right: Expression,
    matchScore: Int, mismatch: Int, gap: Int)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_smith_waterman"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("token_smith_waterman takes two array<string> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenSmithWaterman.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], matchScore, mismatch, gap)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.ext.TokenSmithWaterman.compute($x, $y, $matchScore, $mismatch, $gap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenSmithWaterman {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** Static DP kernel — two rolling long rows, running max. Null
    * array ELEMENTS never match anything (defensive, like TokenLcs). */
  def compute(a: ArrayData, b: ArrayData, ms: Int, mm: Int,
      gp: Int): Long = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0L
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    var prev = new Array[Long](n + 1)
    var cur = new Array[Long](n + 1)
    var best = 0L
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      j = 0
      while (j < n) {
        val diag = prev(j) +
          (if (ai != null && bs(j) != null && ai.equals(bs(j))) ms else mm)
        val up = prev(j + 1) + gp
        val lft = cur(j) + gp
        var h = if (diag > 0L) diag else 0L
        if (up > h) h = up
        if (lft > h) h = lft
        cur(j + 1) = h
        if (h > best) best = h
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0L)
      i += 1
    }
    best
  }

  /** Column-API entry point; `mismatch`/`gap` must be non-positive
    * and `matchScore` positive (the SW local-alignment regime — a
    * positive gap would reward padding). */
  def tokenSmithWaterman(a: Column, b: Column, matchScore: Int = 2,
      mismatch: Int = -1, gap: Int = -1): Column = {
    require(matchScore > 0 && mismatch <= 0 && gap <= 0,
      "need matchScore > 0, mismatch <= 0, gap <= 0")
    GraftSqlBridge.column(TokenSmithWaterman(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      matchScore, mismatch, gap))
  }

  /** GLOBAL (Needleman-Wunsch 1970, public literature) variant: no
    * 0-clamp, boundary rows pay the gap, answer = H(m,n) — both
    * sequences must be aligned END TO END. The SW kernel's sibling:
    * SW asks "what is the strongest shared region", NW asks "how
    * similar are these sequences as wholes" (trace/schema alignment,
    * whole-document revision scoring). Empty vs length-n side scores
    * n·gap; both empty = 0. */
  def computeGlobal(a: ArrayData, b: ArrayData, ms: Int, mm: Int,
      gp: Int): Long = {
    val m = a.numElements()
    val n = b.numElements()
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    var prev = new Array[Long](n + 1)
    var cur = new Array[Long](n + 1)
    j = 0
    while (j <= n) { prev(j) = j.toLong * gp; j += 1 }
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      cur(0) = (i + 1).toLong * gp
      j = 0
      while (j < n) {
        val diag = prev(j) +
          (if (ai != null && bs(j) != null && ai.equals(bs(j))) ms else mm)
        val up = prev(j + 1) + gp
        val lft = cur(j) + gp
        var h = diag
        if (up > h) h = up
        if (lft > h) h = lft
        cur(j + 1) = h
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }
}

/** [[TokenSmithWaterman]]'s GLOBAL sibling — Needleman-Wunsch
  * end-to-end alignment score. Same two-rolling-row integer DP,
  * different boundary: gaps are charged from the first row/column and
  * the answer is the corner cell, never clamped at 0. */
case class TokenNeedlemanWunsch(left: Expression, right: Expression,
    matchScore: Int, mismatch: Int, gap: Int)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_needleman_wunsch"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("token_needleman_wunsch takes two array<string> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenSmithWaterman.computeGlobal(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], matchScore, mismatch, gap)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.ext.TokenSmithWaterman.computeGlobal($x, $y, $matchScore, $mismatch, $gap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenNeedlemanWunsch {
  /** Column-API entry point (same score-regime guard as SW). */
  def tokenNeedlemanWunsch(a: Column, b: Column, matchScore: Int = 2,
      mismatch: Int = -1, gap: Int = -1): Column = {
    require(matchScore > 0 && mismatch <= 0 && gap <= 0,
      "need matchScore > 0, mismatch <= 0, gap <= 0")
    GraftSqlBridge.column(TokenNeedlemanWunsch(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      matchScore, mismatch, gap))
  }
}
