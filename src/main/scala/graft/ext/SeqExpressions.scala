package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{Column, GraftSqlBridge}

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
  // shape as JaroWinkler / Spark's own levenshtein codegen.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = "graft.ext.DtwBanded.compute"
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""Object r = $compute($x, $y, $band);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) r).longValue(); }""".stripMargin)
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
