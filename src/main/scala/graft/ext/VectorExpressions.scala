package graft.ext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native Catalyst expression for the embedding dot product — the
  * hottest scalar kernel in the E3 similarity paths (every cosine in
  * q44/q58/q59/q61 evaluates it per candidate row).
  *
  * Why an Expression and not the `aggregate`/`zip_with` fold: Spark's
  * higher-order functions never enter whole-stage codegen — each
  * element costs an interpreted lambda dispatch with boxing (~25 µs per
  * 64-dim row measured). This expression compiles to a tight primitive
  * `double` loop inside the enclosing WholeStageCodegen stage, no
  * serialization boundary, no null-boxing — usable in join conditions
  * at 100 TB row rates (the same promotion SURVEY §7.3 applied to
  * Haversine).
  *
  * Semantics match the fold AND DuckDB's `list_dot_product` exactly:
  * accumulation in index order (IEEE-identical results, which the
  * oracle gate depends on); a null array, a null element, or a length
  * mismatch yields null — the same poisoning zip_with produces.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_dot"

  // Introduces null beyond child nullability (length mismatch, null
  // element) — without this, two non-nullable children would make
  // nullSafeCodeGen bind ev.isNull to FalseLiteral and the generated
  // `isNull = true;` assignments above would not compile.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  private def toDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType, containsNull = true))
  }

  /** Builder with implicit casts (array<float> → array<double>) —
    * used by SQL registration too. */
  def cast(exprs: Seq[Expression]): ArrayDotProduct = {
    require(exprs.length == 2, s"array_dot takes 2 arguments, got ${exprs.length}")
    ArrayDotProduct(toDoubleArray(exprs.head), toDoubleArray(exprs(1)))
  }
}

object VectorExpressions {
  /** Column-function surface for the native expression. */
  def arrayDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct.cast(Seq(a, b).map(GraftSqlBridge.expression)))
}
