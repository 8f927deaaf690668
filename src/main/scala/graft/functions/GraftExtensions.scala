package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension wiring: registers the engine's custom Catalyst
  * expressions as SQL functions, so SQL users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT graft_dot(cast(a as array<double>), cast(b as array<double>))")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
    // the native as-of join operator plans through this strategy
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private val dotBuilder:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    require(exprs.length == 2, "graft_dot(arrayA, arrayB)")
    // cast so SQL callers with int/float arrays get converted values,
    // not ArrayData misreads
    DotProduct(VectorFunctions.castToDoubleArray(exprs.head),
      VectorFunctions.castToDoubleArray(exprs(1)))
  }

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.ColumnBridge
      .registerTempFunction(spark, "graft_dot", dotBuilder)
}
