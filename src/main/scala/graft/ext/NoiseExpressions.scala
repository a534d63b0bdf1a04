package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native Catalyst expression for the 64-bit LCG step
  * u = seed·6364136223846793005 + 1442695040888963407 (Knuth's MMIX
  * constants) with WRAPPING two's-complement semantics — i.e. exact
  * mod-2⁶⁴ arithmetic. Exists because ANSI mode (Spark 4 default)
  * rejects the wrapping multiply at the SQL layer, while Java long
  * arithmetic IS mod-2⁶⁴ by definition; an engine replaying this in
  * wide integers reduces the same product mod 2⁶⁴ (the q456 oracle's
  * HUGEINT form). Deterministic pseudo-randomness for the replayable
  * discrete-Laplace mechanism in [[graft.ops.Privacy.dpCounts]].
  * Null in → null out; codegen is a single fused multiply-add. */
case class Lcg64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lcg64"

  override def nullSafeEval(seed: Any): Any =
    seed.asInstanceOf[Long] * 6364136223846793005L + 1442695040888963407L

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"($s * 6364136223846793005L + 1442695040888963407L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Lcg64 {
  def apply(c: Column): Column =
    GraftSqlBridge.column(Lcg64(GraftSqlBridge.expression(c)))
}
