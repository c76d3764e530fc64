package graft

import graft.codec.GorillaDecodeExpression
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst functions for SQL use. Wire with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Currently: `gorilla_decode(binary)` →
  * `array<struct<ts_epoch:bigint,value:double>>` (the generator inverse
  * of the Gorilla encode aggregator). The encode side stays a typed
  * `Aggregator` (graft.codec.GorillaAgg) exposed via `udaf` — the one
  * sanctioned custom-aggregation surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("gorilla_decode"),
      new ExpressionInfo(classOf[GorillaDecodeExpression].getName,
                         "gorilla_decode"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "gorilla_decode takes one argument")
        GorillaDecodeExpression(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName,
                         "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes two arguments")
        graft.functions.DotProduct(children.head, children(1))
      }))
  }
}
