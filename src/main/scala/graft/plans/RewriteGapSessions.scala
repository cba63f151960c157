package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  AttributeReference, Cast, CurrentRow, Expression, GetStructField, Literal,
  NamedExpression, RowFrame, RowNumber, SessionWindow, SortOrder,
  SpecifiedWindowFrame, UnboundedPreceding, WindowExpression,
  WindowSpecDefinition, MicrosToTimestamp}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, LongType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Resolution rule: rewrite an aggregate over graft's gap-sessionization
  * pattern to Spark's NATIVE `session_window` operator (VERDICT r6 #6;
  * tier-c precedent [[RewriteDotProduct]]).
  *
  * `KStream.sessionize(G).reduceAll(...)` plans as
  *
  *   Aggregate(keys :+ session_id,
  *     Project… → Window(cumsum __new) → Window(lag ts) → child)
  *
  * — two fact-sized window passes (one exchange + sort) and then a SECOND
  * exchange for the (keys, session_id) hash aggregate. Where the gate is
  * gap-expressible (which [[GapSessionTag]] certifies — `sessionize` is
  * the only emitter), the same result is one pass: Spark's session
  * aggregation (`MergingSessionsExec`) computes the sessions AND the
  * aggregates inside a single exchange + sort, and the dense per-key
  * session ordinal is recovered by a row_number over the SESSION-sized
  * aggregate output (not the fact rows), which reuses the aggregate's
  * (keys) clustering — no further exchange. The obsolete Window nodes
  * below the aggregate lose their last reference and are removed by
  * column pruning.
  *
  * Exactness contract (the oracle-hash argument):
  *   - membership: sessionize breaks when `ts - prev > G`; session_window
  *     breaks when `ts - prev >= gap`, so the rule passes `gap = G + 1` µs
  *     — identical membership for integer-µs timestamps.
  *   - ordinal: session starts are strictly increasing per key (disjoint
  *     sessions), so row_number over start = the cumsum ordinal, 1-based
  *     exactly like the lag-pattern's first-row `__new = 1`.
  *   - aggregates: same groups, same inputs — bit-identical values.
  *     (Order-WITHIN-group remains whatever the engine delivers, exactly
  *     as in the hash-aggregate plan; order-sensitive aggregates are as
  *     nondeterministic before as after.)
  */
object RewriteGapSessions extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    // Short-circuit (VERDICT r7 #5): this runs on every analyzer-fixpoint
    // pass of EVERY query in the session — resolveOperatorsUp's rewrite
    // machinery on plans that cannot contain the pattern (tag emitted only
    // by sessionize) is pure overhead, measurable on the catalog's deep
    // unrolled-loop plans. `exists` is a read-only traversal with a cheap
    // instanceof test; only tag-bearing plans pay for the rewrite pass.
    if (!plan.exists {
      case p: Project => p.projectList.exists {
        case Alias(_: GapSessionTag, _) => true
        case _ => false
      }
      case _ => false
    }) plan
    else plan.resolveOperatorsUp {
      case agg: Aggregate if agg.resolved =>
        tryRewrite(agg).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions
    val tagged = groupAttrs.collectFirst {
      case a: AttributeReference =>
        findTag(a, agg.child).map(t => (a, t))
    }.flatten.orElse {
      groupAttrs.collect { case a: AttributeReference => a }
        .flatMap(a => findTag(a, agg.child).map(t => (a, t))).headOption
    }
    tagged.flatMap { case (sid, tag) =>
      val keyAttrs = groupAttrs.filterNot {
        case a: Attribute => a.exprId == sid.exprId
        case _ => false
      }
      val ok =
        tag.gapUs.isDefined &&
          keyAttrs.nonEmpty &&
          keyAttrs.forall(_.isInstanceOf[AttributeReference]) &&
          tag.ts.isInstanceOf[AttributeReference] &&
          tag.keys.forall(_.isInstanceOf[AttributeReference]) &&
          // the aggregate's keys must BE the sessionize keys — otherwise
          // the session partitioning and the grouping disagree
          keyAttrs.map { case a: Attribute => a.exprId }.toSet ==
            tag.keys.map { case a: AttributeReference => a.exprId }.toSet &&
          // ts must still be available to the new aggregate
          agg.child.outputSet.contains(tag.ts.asInstanceOf[AttributeReference]) &&
          // session_id may appear only as the pass-through grouping column
          agg.aggregateExpressions.forall {
            case a: Attribute => true
            case ne => !ne.references.exists(_.exprId == sid.exprId)
          } &&
          // DISTINCT aggregates stay on the window formulation (ADVICE
          // r7): MergingSessions + RewriteDistinctAggregates planning is
          // an untested composition — correct-by-construction beats
          // correct-by-hope, and the fallback plan is the pre-r7 one
          !agg.aggregateExpressions.exists(_.exists {
            case ae: AggregateExpression => ae.isDistinct
            case _ => false
          })
      if (!ok) None
      else Some(rewrite(agg, sid, tag, keyAttrs))
    }
  }

  /** Walk the Project/Window chain under the aggregate to the Alias that
    * defines `attr`; succeed iff it is a [[GapSessionTag]].
    */
  private def findTag(attr: AttributeReference, plan: LogicalPlan): Option[GapSessionTag] =
    plan match {
      case p: Project =>
        p.projectList.find(_.exprId == attr.exprId) match {
          case Some(Alias(t: GapSessionTag, _)) => Some(t)
          case Some(Alias(ar: AttributeReference, _)) => findTag(ar, p.child)
          case Some(_: AttributeReference) => findTag(attr, p.child)
          case _ => None
        }
      case w: Window =>
        if (w.windowExpressions.exists(_.exprId == attr.exprId)) None
        else findTag(attr, w.child)
      case _ => None
    }

  private def rewrite(agg: Aggregate, sid: AttributeReference,
      tag: GapSessionTag, keyAttrs: Seq[Expression]): LogicalPlan = {
    val ts = tag.ts.asInstanceOf[AttributeReference]
    // sessionize breaks strictly-greater; session_window breaks >=: +1 µs
    val gap = tag.gapUs.get + 1L
    val sw = SessionWindow(MicrosToTimestamp(ts),
      Literal(new CalendarInterval(0, 0, gap), CalendarIntervalType))
    val swAlias = Alias(sw, "__graft_session_window")()

    val innerAggExprs: Seq[NamedExpression] =
      agg.aggregateExpressions.filter {
        case a: Attribute => a.exprId != sid.exprId
        case _ => true
      } :+ swAlias
    val inner = Aggregate(keyAttrs :+ sw, innerAggExprs, agg.child)

    val start = GetStructField(swAlias.toAttribute, 0, Some("start"))
    val order = Seq(SortOrder(start, Ascending))
    val rn = Alias(
      WindowExpression(RowNumber(),
        WindowSpecDefinition(keyAttrs, order,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
      "__graft_session_ordinal")()
    val win = Window(Seq(rn), keyAttrs, order, inner)

    val sidAlias =
      Alias(Cast(rn.toAttribute, LongType), sid.name)(exprId = sid.exprId)
    val projList = agg.aggregateExpressions.map {
      case a: Attribute if a.exprId == sid.exprId => sidAlias
      case ne => ne.toAttribute
    }
    Project(projList, win)
  }
}
