package graft.geo

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Static math callable from both interpreted eval and generated code. */
object GeoMath {
  private val R = 6371008.8 // IUGG mean earth radius, meters

  /** Great-circle distance (meters) between two lon/lat (EPSG:4326)
    * points — the metric the reference's workflows need when sensor
    * tables stay in 4326 instead of reprojecting (F10 companion). */
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }
}

/** Native Catalyst expression with full codegen (SURVEY §7.3: promote
  * hot geometry kernels to `Expression` with `doGenCode`). Unlike a
  * Scala UDF there is no serialization boundary, no null-boxing, and
  * the call inlines into the enclosing WholeStageCodegen stage —
  * usable inside join conditions at 100 TB row rates.
  *
  * Inputs must be DOUBLE; the builders below insert Casts, mirroring
  * what ImplicitCastInputTypes would do (that trait's signature types
  * are private[sql] in Spark 4).
  */
case class Haversine(lon1: Expression, lat1: Expression,
    lon2: Expression, lat2: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_haversine"

  override def first: Expression = lon1
  override def second: Expression = lat1
  override def third: Expression = lon2
  override def fourth: Expression = lat2

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoMath.haversine(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.geo.GeoMath.haversine($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lon1 = newFirst, lat1 = newSecond, lon2 = newThird, lat2 = newFourth)
}

object Haversine {
  /** Builder with implicit casts — used by SQL registration too. */
  def cast(exprs: Seq[Expression]): Haversine = {
    require(exprs.length == 4, s"st_haversine takes 4 arguments, got ${exprs.length}")
    val Seq(a, b, c, d) = exprs.map(e =>
      if (e.dataType == DoubleType) e else Cast(e, DoubleType))
    Haversine(a, b, c, d)
  }
}

object GeoExpressions {
  /** Column-function surface for the native expression. */
  def stHaversine(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    GraftSqlBridge.column(Haversine.cast(Seq(lon1, lat1, lon2, lat2)
      .map(GraftSqlBridge.expression)))
}
