package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.geo.Haversine
import graft.ext.{ArrayDotProduct, DtwBanded, JaroWinkler}

/** SparkSessionExtensions entry point: makes graft's native SQL
  * functions available in any session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), the idiomatic way to ship
  * engine extensions to a cluster without code on the driver path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("st_haversine"),
      new ExpressionInfo(classOf[Haversine].getName, "st_haversine"),
      exprs => Haversine.cast(exprs)))
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      exprs => ArrayDotProduct.cast(exprs)))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      exprs => JaroWinkler.cast(exprs)))
    e.injectFunction((
      FunctionIdentifier("dtw_banded"),
      new ExpressionInfo(classOf[DtwBanded].getName, "dtw_banded"),
      exprs => DtwBanded.cast(exprs)))
    e.injectFunction((
      FunctionIdentifier("deflate_length"),
      new ExpressionInfo(classOf[graft.ext.DeflateLength].getName,
        "deflate_length"),
      exprs => {
        require(exprs.length == 1,
          s"deflate_length takes 1 argument, got ${exprs.length}")
        graft.ext.DeflateLength(exprs.head)
      }))
    // plan audit (E6): non-mutating hazard detector — cartesian joins,
    // single-partition windows, mid-plan global sorts (see
    // graft.plans.Guardrails)
    e.injectOptimizerRule(_ => new graft.plans.GuardrailRule)
  }
}
