package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single event stream — the scespet `Term[X]`/`MacroTerm[X]` query surface
  * (/root/reference/src/scespet/core/types.scala:230-280, MacroTerm.scala:22)
  * re-expressed as DataFrame lineage. A stream is a DataFrame with:
  *   - `ts: Long`  event time (opaque ordered long)
  *   - `seq: Long` deterministic arrival tie-break
  *   - any number of value columns.
  *
  * Every combinator returns plain Catalyst lineage — predicate pushdown,
  * column pruning and whole-stage codegen apply as if the user had written
  * the DataFrame ops by hand.
  */
final case class EStream(df: DataFrame, tsCol: String = "ts", seqCol: String = "seq") {

  private def meta: Seq[Column] = Seq(col(tsCol), col(seqCol))

  /** Per-event projection (MacroTerm.map, MacroTerm.scala:86-103).
    * `exposeNull=false` reproduces the fused map+drop-null behavior.
    */
  def map(out: (String, Column)*): EStream =
    EStream(df.select(meta ++ out.map { case (n, e) => e.as(n) }: _*), tsCol, seqCol)

  def mapKeepNull(exposeNull: Boolean, out: (String, Column)*): EStream = {
    val m = map(out: _*)
    if (exposeNull) m
    else EStream(m.df.na.drop(out.map(_._1)), tsCol, seqCol)
  }

  /** Per-event predicate (MacroTerm.filter, MacroTerm.scala:105-124). */
  def filter(p: Column): EStream = EStream(df.filter(p), tsCol, seqCol)

  /** Type-routing filter (Term.filterType, types.scala:270-272). In the
    * relational model the "runtime class" is a discriminator column.
    */
  def filterType(disc: Column, tpe: String): EStream = filter(disc === lit(tpe))

  /** Hierarchy-aware type routing — the reference's `filterType[T]`
    * dispatches on the JVM CLASS HIERARCHY (an `isInstanceOf` check,
    * types.scala:270-272), so filtering on a supertype also admits every
    * subtype (OrderReportsExample.scala:86 routes New/Fill/Terminate order
    * events through their common base). Relationally the taxonomy is a
    * dotted discriminator path ("order", "order.fill"): filtering on
    * `tpe` admits the exact type AND every `tpe.`-prefixed subtype.
    */
  def filterTypeHierarchy(disc: Column, tpe: String): EStream =
    filter(disc === lit(tpe) || disc.startsWith(lit(tpe + ".")))

  /** Demultiplex into a keyed stream (MacroTerm.by, MacroTerm.scala:134-138;
    * GroupFunc key discovery GroupFunc.scala:16-50). Dynamic key discovery
    * is free in Spark — grouping is by value, not by wired graph cells.
    */
  def by(key: Column, as: String = "k"): KStream =
    KStream(df.withColumn(as, key), Seq(as), tsCol, seqCol)

  /** Stream → growing distinct set (MacroTerm.valueSet, :160-185);
    * `expand` flattening via explode.
    */
  def valueSet(value: Column): DataFrame = df.select(value.as("v")).distinct()
  def valueSetExpand(values: Column): DataFrame =
    df.select(explode(values).as("v")).distinct()

  /** Whole-stream cumulative scan (fold_all, MacroTerm.scala:42-53):
    * aggregate over the unbounded-preceding rows frame. GENERAL path —
    * plans as a single-partition window (the fold may be order-dependent,
    * e.g. EWMA — inherently sequential). For associative folds use
    * [[foldAllAssoc]], which distributes.
    */
  def foldAll(out: String, agg: Column): EStream =
    EStream(
      df.withColumn(out, agg.over(WindowKernel.cumulative(Nil, tsCol, seqCol))),
      tsCol, seqCol)

  /** Distributed fold_all for ASSOCIATIVE reductions (exact decimal sums,
    * counts, min/max): two-pass prefix scan — within-partition running
    * values in parallel + broadcast per-partition offsets
    * ([[graft.operators.DistributedScan]]). Same rows as [[foldAll]],
    * O(n/P) wall-clock instead of a one-reducer window.
    *
    * @param outs (outputCol, perRowContribution, combine∈{sum,min,max}) —
    *             e.g. a running count is `("n", lit(1L), "sum")`.
    */
  def foldAllAssoc(outs: (String, Column, String)*): EStream =
    EStream(
      graft.operators.DistributedScan.runningAggs(df, tsCol, seqCol, outs),
      tsCol, seqCol)

  /** Single value at termination (reduce_all, MacroTerm.scala:63-84). */
  def reduceAll(aggs: Column*): DataFrame = df.agg(aggs.head, aggs.tail: _*)

  /** Capture a slice spec (MacroTerm.group, :262-265). */
  def group(slice: Slice): GroupedEStream = GroupedEStream(this, slice)

  /** Boolean-gated window (MacroTerm.window, :242-259). */
  def window(gate: Column): WindowedEStream = WindowedEStream(this, gate)

  /** Either-fires temporal zip (MacroTerm.join, :190-204). */
  def joinZip(other: EStream, leftVals: Seq[(String, Column)], rightVals: Seq[(String, Column)]): EStream =
    EStream(AsOf.zip(df, other.df, Nil, leftVals, rightVals, tsCol, seqCol), tsCol, seqCol)

  /** Left-fires sample of `other` (MacroTerm.take, :209-221). */
  def take(other: EStream, rightVals: Seq[(String, Column)]): EStream =
    EStream(AsOf.take(df, other.df, Nil, Nil, rightVals, tsCol, seqCol), tsCol, seqCol)

  /** Emit this stream's latest values when `trigger` fires
    * (MacroTerm.sample, :226-230) — i.e. `trigger.take(this)`.
    */
  def sample(trigger: EStream, myVals: Seq[(String, Column)]): EStream =
    trigger.take(this, myVals)

  /** takef (MacroTerm.scala:140-142): per-event dereference of a STREAM-
    * VALUED attribute — each event names a key (`keyOf`, any expression
    * over this row), and samples that key's stream from `registry` as of
    * the event time. The reference's `f: X => HasVal[Y]` cell lookup is
    * relationally a derived-key as-of join; combine with
    * [[graft.sources.Sources.keyToStreamDynamic]] for generated registries.
    */
  def takef(keyOf: Column, registry: KStream, rightVals: Seq[(String, Column)]): EStream =
    EStream(
      AsOf.take(df.withColumn("__fk", keyOf), registry.df,
        Seq(col("__fk")), registry.keys.map(col), rightVals, tsCol, seqCol)
        .drop("__fk"),
      tsCol, seqCol)
}

/** Sliced single stream: `.group(spec).scan(...)/.reduce(...)`
  * (GroupedTerm, MacroTerm.scala:327-335).
  */
final case class GroupedEStream(s: EStream, slice: Slice) {
  private def withId: DataFrame =
    WindowKernel.withWindowId(s.df, Nil, slice, s.tsCol, s.seqCol)

  /** LAST emit-mode: one row per slice (types.scala:144-148 "Fold"). */
  def reduce(aggs: (String, Column)*): DataFrame =
    withId
      .groupBy(col(WindowKernel.WindowId))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, e) => e.as(n) }: _*)

  /** CUMULATIVE emit-mode: running value within each slice ("Scan"). */
  def scan(out: String, agg: Column): DataFrame = {
    val w = Window
      .partitionBy(col(WindowKernel.WindowId))
      .orderBy(col(s.tsCol), col(s.seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withId.withColumn(out, agg.over(w))
  }
}

/** Boolean-window stream: `.window(gate).reduce(...)` — WindowedBucket
  * semantics (WindowedBucket_Continuous/LastValue; close-edge precedence
  * WindowedReduce.scala:55-58).
  */
final case class WindowedEStream(s: EStream, gate: Column) {
  private def sessions: DataFrame =
    WindowKernel
      .withSessions(s.df, Nil, gate, s.tsCol, s.seqCol)
      .filter(col("in_window"))

  def reduce(aggs: (String, Column)*): DataFrame =
    sessions
      .groupBy(col("session_id"))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, e) => e.as(n) }: _*)

  def scan(out: String, agg: Column): DataFrame = {
    val w = Window
      .partitionBy(col("session_id"))
      .orderBy(col(s.tsCol), col(s.seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions.withColumn(out, agg.over(w))
  }
}
