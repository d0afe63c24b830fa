package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Cosine64, Hamming64}

/** The library's `SparkSessionExtensions` entry point — the
  * deployment-grade registration path:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes the native expressions (`hamming64`, `cosine64`) available to
  * every session — SQL and Column API, no per-session `register()` — and
  * installs the [[graft.plans.TopKStrategy]] planner strategy so the
  * bounded-heap per-key top-k operator plans without touching
  * `spark.experimental`. The programmatic paths
  * ([[graft.functions.GraftFunctions.register]], [[graft.plans.TopK.perKey]])
  * remain for embedded use; both routes produce identical plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // arity-checked builder: a wrong-arity SQL call gets a clear message
  // instead of the builder lambda's IndexOutOfBoundsException
  private def binary(
      name: String,
      f: (Expression, Expression) => Expression
  )(exprs: Seq[Expression]): Expression = {
    require(
      exprs.length == 2,
      s"$name requires exactly 2 arguments, got ${exprs.length}"
    )
    f(exprs(0), exprs(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("hamming64"),
        new ExpressionInfo(classOf[Hamming64].getName, "hamming64"),
        binary("hamming64", Hamming64.apply) _
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("cosine64"),
        new ExpressionInfo(classOf[Cosine64].getName, "cosine64"),
        binary("cosine64", Cosine64.apply) _
      )
    )
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
