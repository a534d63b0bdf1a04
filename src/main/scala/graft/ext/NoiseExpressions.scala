package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native Catalyst expression for the splitmix64 FINALIZER (Steele,
  * Lea & Flood, OOPSLA'14 "Fast splittable pseudorandom number
  * generators" — public literature): two xor-shift + wrapping-multiply
  * rounds plus a final xor-shift. Unlike an LCG it is NON-AFFINE over
  * Z_2⁶⁴, which is the property [[graft.ops.Privacy.dpCounts]] needs:
  * two draws mix64(key+saltA), mix64(key+saltB) do NOT differ by a
  * key-independent constant (an affine mixer makes u2−u1 constant, so
  * the two geometric draws are strongly dependent and the discrete
  * Laplace shape is destroyed). Bijective on 64 bits. Replayable in
  * wide-integer engines via split 32×64 multiplies mod 2⁶⁴ (the q456
  * oracle's HUGEINT form). Null in → null out. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mix64"

  override def nullSafeEval(seed: Any): Any = {
    var z = seed.asInstanceOf[Long]
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      |long ${ev.value}_z = $s;
      |${ev.value}_z ^= (${ev.value}_z >>> 30);
      |${ev.value}_z *= 0xBF58476D1CE4E5B9L;
      |${ev.value}_z ^= (${ev.value}_z >>> 27);
      |${ev.value}_z *= 0x94D049BB133111EBL;
      |${ev.value} = ${ev.value}_z ^ (${ev.value}_z >>> 31);
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mix64 {
  def apply(c: Column): Column =
    GraftSqlBridge.column(Mix64(GraftSqlBridge.expression(c)))
}
