package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the COMPLETE function surface, from the same builder list the
    // programmatic register() consumes — extensions-deployed sessions
    // and embedded sessions can never see different function sets
    graft.functions.GraftFunctions.builders.foreach { case (name, cls, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
      )
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // conf-gated (spark.graft.topk.rewrite, default off): SQL window-rank
    // top-k patterns rewrite onto the bounded-heap operator
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
