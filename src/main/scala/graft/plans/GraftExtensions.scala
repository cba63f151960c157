package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions:
  *
  *   SparkSession.builder.withExtensions(new GraftExtensions)   // or
  *   --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * then `SELECT fnv64(text) FROM docs` works from SQL as well as the DSL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (new FunctionIdentifier("fnv64"),
        new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "fnv64 takes exactly one argument")
          Fnv64(children.head)
        }))
    ext.injectFunction(
      (new FunctionIdentifier("dotd"),
        new ExpressionInfo(classOf[DotD].getName, "dotd"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "dotd takes exactly two arguments")
          DotD(children.head, children(1))
        }))
    ext.injectFunction(
      (new FunctionIdentifier("graft_session_tag"),
        new ExpressionInfo(classOf[GapSessionTag].getName, "graft_session_tag"),
        (children: Seq[Expression]) => {
          require(children.size >= 4,
            "graft_session_tag(sessionId, gapUs, ts, seq, keys...)")
          GapSessionTag(children)
        }))
    // auto-rewrite the portable higher-order dot-product fold into DotD
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    // swap sessionize-pattern aggregates onto native session_window
    // (resolution phase: the builtin SessionWindowing rule must still see
    // and expand the SessionWindow expression this rule introduces)
    ext.injectResolutionRule(_ => RewriteGapSessions)
  }
}
