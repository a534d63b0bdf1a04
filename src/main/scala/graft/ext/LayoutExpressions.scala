package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native Catalyst expression for the Hilbert-curve cell index
  * (Hilbert 1891; the iterative xy2d form is textbook public
  * knowledge). Maps a quantized (qx, qy) cell to its position along
  * the order-`bits` Hilbert curve.
  *
  * Why an Expression rather than Column arithmetic: the xy2d fold
  * carries (x, y, d) state across `bits` levels where each level reads
  * the previous level's x AND y several times. Inlined as one Column
  * tree, each level re-embeds the prior level's whole subtree, so the
  * expression grows ~5× per level — at bits=7 Catalyst spent 468 s in
  * analysis/codegen on a 60 k-row input (round-4 bench), and at the
  * registry default bits=12 it would effectively never finish. Here
  * the fold is ONE static call that evaluates inside the enclosing
  * WholeStageCodegen span: planning cost is constant in `bits`, and
  * runtime is `bits` iterations of branch-free integer ops per row.
  *
  * Semantics are pinned to the repo's oracle convention
  * ([[graft.ops.Layout.hilbertOracleSteps]]'s CTE chain): the
  * descending-s loop of the classic snippet, with reflections using
  * the CURRENT level size (x ← s−1−x). Out-of-range cells are the
  * caller's problem (Layout.hilbertKey clamps during quantization).
  * Null in → null out.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.ext.HilbertIndex.compute($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** The scalar xy2d kernel — static so generated code can call it.
    * Exactly the per-level arithmetic of the oracle CTE chain. */
  def compute(qx: Long, qy: Long, bits: Int): Long = {
    var x = qx
    var y = qy
    var d = 0L
    var s = 1L << (bits - 1)
    while (s >= 1) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          val t = s - 1 - x
          x = s - 1 - y
          y = t
        } else {
          val t = x; x = y; y = t
        }
      }
      s >>= 1
    }
    d
  }

  /** Column-API entry point over already-quantized long cells. */
  def hilbertIndex(qx: Column, qy: Column, bits: Int): Column =
    GraftSqlBridge.column(HilbertIndex(
      GraftSqlBridge.expression(qx), GraftSqlBridge.expression(qy), bits))
}
