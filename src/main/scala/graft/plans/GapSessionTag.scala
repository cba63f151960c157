package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, RuntimeReplaceable}

/** Compiler annotation carrying the gap-sessionization parameters through
  * the logical plan — the hook [[RewriteGapSessions]] matches on.
  *
  * `KStream.sessionize` wraps its session-id column in this marker:
  *
  *   children = [ sessionId (the lag/cumsum window result),
  *                gapUs literal, ts attr, seq attr, key attrs... ]
  *
  * At runtime the tag is IDENTITY on its first child ([[RuntimeReplaceable]]
  * — the optimizer's ReplaceExpressions strips it before execution), so a
  * query the rewrite does not fire on pays nothing. During ANALYSIS the
  * tag is still present, which is where [[RewriteGapSessions]] reads the
  * parameters and swaps the whole aggregate over to Spark's native
  * `session_window` operator.
  */
case class GapSessionTag(children: Seq[Expression])
    extends Expression with RuntimeReplaceable {

  override lazy val replacement: Expression = children.head

  def sessionId: Expression = children.head
  def gapUs: Option[Long] = children(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => Some(v)
    case _ => None
  }
  def ts: Expression = children(2)
  def seq: Expression = children(3)
  def keys: Seq[Expression] = children.drop(4)

  override def prettyName: String = "graft_session_tag"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GapSessionTag =
    copy(children = newChildren)
}

object GapSessionTag {
  /** Register `graft_session_tag` in the session's function registry
    * (idempotent; also wired through [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("graft_session_tag"),
      new ExpressionInfo(classOf[GapSessionTag].getName, "graft_session_tag"),
      (children: Seq[Expression]) => {
        require(children.size >= 4,
          "graft_session_tag(sessionId, gapUs, ts, seq, keys...)")
        GapSessionTag(children)
      })
}
