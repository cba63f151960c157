package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The scespet reduction-function family
  * (/root/reference/src/scespet/util/ReduceFuncs.scala:12-63) as Column
  * expressions. Sum/Avg/Counter/Collect map to built-ins; the
  * order-DEPENDENT ones (EWMA, Append — scespet relies on global arrival
  * order, SURVEY §7.5.1) are expressed as a sorted-collect + higher-order
  * `aggregate` fold, which stays inside whole-stage codegen (no UDF).
  *
  * Float-determinism contract: `ewma` folds left-to-right in (ts, seq)
  * order with the exact op sequence `λ·x + (1−λ)·acc`, so any engine
  * folding the same order yields bit-identical doubles.
  */
object Reducers {

  /** Exact sum: per-row cast to DECIMAL(38,6) then sum. Decimal addition is
    * associative/commutative → order-independent across partitions, and
    * bit-comparable against any other engine (unlike double sums).
    */
  def sumExact(v: Column): Column = sum(v.cast("decimal(38,6)"))

  /** Exact-sum-based mean, finished in double: one IEEE division of two
    * exactly-agreed operands → reproducible across engines.
    */
  def avgExact(v: Column): Column =
    sumExact(v).cast("double") / count(v)

  def counter(): Column = count(lit(1))

  /** Ordered event list (scespet Collect / Append): values in (ts, seq)
    * order. `sortKey` must be a sortable struct, e.g. struct(ts, seq, v).
    */
  def appendOrdered(ts: Column, seq: Column, v: Column): Column =
    transform(
      array_sort(collect_list(struct(ts.as("t"), seq.as("s"), v.as("v")))),
      x => x.getField("v"))

  /** EWMA over the events of a group in (ts, seq) order
    * (scespet EWMA, ReduceFuncs.scala:33-47): ewma₀ = v₀;
    * ewmaᵢ = λ·vᵢ + (1−λ)·ewmaᵢ₋₁.
    */
  def ewma(ts: Column, seq: Column, v: Column, lambda: Double): Column = {
    val arr = transform(
      array_sort(collect_list(struct(ts.as("t"), seq.as("s"), v.cast("double").as("v")))),
      x => x.getField("v"))
    aggregate(
      slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
      element_at(arr, 1),
      (acc, x) => lit(lambda) * x + lit(1.0 - lambda) * acc)
  }

  /** VWAP bucket (scespet Vwap, TradeAnalysis.scala:49-56):
    * Σ(px·qty)/Σ(qty), both sums exact decimal, one final double division.
    */
  /** Scale 2, not 6: price has 2 decimals and qty is integral, so the
    * true product is exact at 2 dp (the double→decimal rounding is
    * unambiguous on both engines), and — the sf1-gate lesson — the
    * SCALED integer backing the decimal sum must stay below 2^53 for the
    * decimal→double cast to be exact in DuckDB too (its hugeint→double
    * conversion is not correctly rounded above 2^53; scale 6 crossed it
    * at 10× volume and diverged by 1 ulp). At scale 2 the numerator sum
    * has 2^53 headroom past 100× this corpus.
    */
  def vwap(px: Column, qty: Column): Column =
    sum((px * qty).cast("decimal(38,2)")).cast("double") /
      sum(qty.cast("decimal(38,2)")).cast("double")
}
