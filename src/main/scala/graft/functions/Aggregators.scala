package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Typed `Aggregator[IN, BUF, OUT]` parity for scespet's mutable
  * aggregation cells (`Agg`/`Reducer`/`CellAdder`+`AggOut`,
  * /root/reference/src/scespet/core/types.scala:158-185,
  * SliceCellLifecycle.scala:13-30,79-103): `zero` = newCell/open,
  * `reduce` = add, `merge` = partition combine, `finish` = value/complete.
  *
  * Order-dependent cells buffer (ts, seq, v) and sort in `finish` — the
  * distributed-order contract from SURVEY §7.5.1.
  */
object Aggregators {

  type TimedValue = (Long, Long, Double) // (ts, seq, v)

  /** Order-dependent EWMA cell (scespet EWMA, ReduceFuncs.scala:33-47). */
  final class EwmaAgg(lambda: Double)
      extends Aggregator[TimedValue, ArrayBuffer[TimedValue], Double] {
    def zero: ArrayBuffer[TimedValue] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[TimedValue], a: TimedValue): ArrayBuffer[TimedValue] = { b += a; b }
    def merge(a: ArrayBuffer[TimedValue], b: ArrayBuffer[TimedValue]): ArrayBuffer[TimedValue] = { a ++= b; a }
    def finish(b: ArrayBuffer[TimedValue]): Double = {
      val s = b.sortBy(x => (x._1, x._2))
      if (s.isEmpty) Double.NaN
      else s.iterator.drop(1).foldLeft(s.head._3)((acc, x) => lambda * x._3 + (1 - lambda) * acc)
    }
    def bufferEncoder: Encoder[ArrayBuffer[TimedValue]] = Encoders.kryo
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Pure streaming-mergeable VWAP (scespet Vwap, TradeAnalysis.scala:49-56). */
  final class VwapAgg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Double)): Double = if (b._2 == 0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.product
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Order-lifecycle fold (scespet OrderState,
    * OrderReportsExample.scala:38-54): folds New/Fill/Terminate events of
    * one order into its terminal state. All fields are merge-commutative
    * (first-non-null stock, summed fills/cashflow, AND-ed liveness), so
    * the cell distributes without an ordering contract.
    */
  final case class OrderEvent(
      etype: String, ts: Long, orderId: String, stock: String, px: Double, qty: Int)
  final case class OrderState(
      stock: String, orderQty: Int, fillQty: Int, cashFlow: Double, running: Boolean)

  final class OrderStateAgg extends Aggregator[OrderEvent, OrderState, OrderState] {
    def zero: OrderState = OrderState(null, 0, 0, 0.0, true)
    def reduce(b: OrderState, e: OrderEvent): OrderState = e.etype match {
      case "New" => b.copy(stock = e.stock, orderQty = e.qty)
      case "Fill" => b.copy(fillQty = b.fillQty + e.qty,
        cashFlow = b.cashFlow + e.qty * e.px)
      case "Terminate" => b.copy(running = false)
      case _ => b
    }
    def merge(a: OrderState, b: OrderState): OrderState = OrderState(
      if (a.stock != null) a.stock else b.stock,
      a.orderQty max b.orderQty,
      a.fillQty + b.fillQty,
      a.cashFlow + b.cashFlow,
      a.running && b.running)
    def finish(b: OrderState): OrderState = b
    def bufferEncoder: Encoder[OrderState] = Encoders.product
    def outputEncoder: Encoder[OrderState] = Encoders.product
  }

  /** Ad-hoc user cell (the scespet CellAdder pattern — any class with
    * `add(x)` + a value, types.scala:158-185): tracks min/max (merge-
    * commutative) AND the (ts, seq)-latest value (order-resolved at merge
    * by keeping the larger (ts, seq) — exactly how a distributed cell must
    * carry the reference's arrival-order contract). finish emits
    * (spread = max−min, last) — spread is a single IEEE subtraction of
    * exactly-agreed operands, cross-engine stable.
    */
  final case class SpreadLastBuf(
      mn: Double, mx: Double, ts: Long, seq: Long, last: Double, any: Boolean)

  final class SpreadLastAgg
      extends Aggregator[TimedValue, SpreadLastBuf, (Double, Double)] {
    def zero: SpreadLastBuf =
      SpreadLastBuf(Double.MaxValue, Double.MinValue, Long.MinValue, Long.MinValue, 0.0, any = false)
    def reduce(b: SpreadLastBuf, a: TimedValue): SpreadLastBuf = {
      val (ts, seq, v) = a
      val newer = ts > b.ts || (ts == b.ts && seq > b.seq)
      SpreadLastBuf(
        math.min(b.mn, v), math.max(b.mx, v),
        if (newer) ts else b.ts, if (newer) seq else b.seq,
        if (newer) v else b.last, any = true)
    }
    def merge(a: SpreadLastBuf, b: SpreadLastBuf): SpreadLastBuf =
      if (!a.any) b
      else if (!b.any) a
      else {
        val bNewer = b.ts > a.ts || (b.ts == a.ts && b.seq > a.seq)
        SpreadLastBuf(
          math.min(a.mn, b.mn), math.max(a.mx, b.mx),
          if (bNewer) b.ts else a.ts, if (bNewer) b.seq else a.seq,
          if (bNewer) b.last else a.last, any = true)
      }
    def finish(b: SpreadLastBuf): (Double, Double) =
      if (!b.any) (Double.NaN, Double.NaN) else (b.mx - b.mn, b.last)
    def bufferEncoder: Encoder[SpreadLastBuf] = Encoders.product
    def outputEncoder: Encoder[(Double, Double)] = Encoders.product
  }

  /** Ordered append cell (scespet Append, BucketStreamTest.scala:55-58). */
  final class AppendAgg[T](implicit e: Encoder[Seq[T]])
      extends Aggregator[(Long, Long, T), ArrayBuffer[(Long, Long, T)], Seq[T]] {
    def zero: ArrayBuffer[(Long, Long, T)] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[(Long, Long, T)], a: (Long, Long, T)): ArrayBuffer[(Long, Long, T)] = { b += a; b }
    def merge(a: ArrayBuffer[(Long, Long, T)], b: ArrayBuffer[(Long, Long, T)]): ArrayBuffer[(Long, Long, T)] = { a ++= b; a }
    def finish(b: ArrayBuffer[(Long, Long, T)]): Seq[T] =
      b.sortBy(x => (x._1, x._2)).map(_._3).toSeq
    def bufferEncoder: Encoder[ArrayBuffer[(Long, Long, T)]] = Encoders.kryo
    def outputEncoder: Encoder[Seq[T]] = e
  }
}
