package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters in two bounded passes — the 100 TB shape for
  * "which items exceed a frequency threshold" when the item universe is too
  * large to hash-aggregate outright (token types, URLs, join keys).
  *
  * Pass 1: a Misra-Gries summary (capacity k) as a typed [[Aggregator]] —
  * bounded O(k) state per task, map-side combinable, shuffles at most k
  * counters per partition. The merged summary GUARANTEES every item with
  * global count > N/(k+1) survives as a candidate (Misra & Gries 1982;
  * mergeability per Agarwal et al., PODS'12).
  *
  * Pass 2: exact recount of ONLY the candidate set (broadcast hash filter —
  * the shuffle carries candidate rows only), then the exact threshold test.
  * The sketch only PRUNES; the answer is exact and therefore deterministic
  * under any partitioning, which is what lets a driver oracle verify it.
  *
  * Reference analog: none — scespet has no frequency operators; this is
  * part of the beyond-reference pipeline surface (builder mandate).
  */
object HeavyHitters {

  /** Misra-Gries frequency summary over strings, capacity `k`.
    * Buffer is a bounded Map; `reduce` is the textbook decrement step,
    * `merge` sums counters then subtracts the (k+1)-th largest value
    * (the standard mergeable-summaries combine). Counts are LOWER bounds;
    * an item with true count > N/(k+1) always survives.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          // decrement-all; amortized O(1) per element over the stream
          b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val m = mutable.Map.from(b1)
      b2.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
      if (m.size <= k) m.toMap
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
        m.collect { case (t, c) if c > cut => t -> (c - cut) }.toMap
      }
    }

    def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Candidate items from a one-pass merged Misra-Gries summary: a SUPERSET
    * of every item with count > N/(k+1). Bounded driver result (≤ k items).
    */
  def candidates(items: DataFrame, itemCol: String, k: Int): Seq[String] = {
    val mg = udaf(new MisraGries(k))
    items.agg(mg(col(itemCol)).as("cands")).head().getSeq[String](0)
  }

  /** Items whose count strictly exceeds `phiNum/phiDen` of all rows, with
    * their EXACT counts. Threshold math stays integral (`cnt*phiDen >
    * N*phiNum`) — no float at the decision boundary, so results are
    * bit-stable across engines and partitionings. `k` must satisfy
    * k+1 >= phiDen/phiNum for the Misra-Gries superset guarantee.
    */
  def exact(items: DataFrame, itemCol: String, phiNum: Long, phiDen: Long,
      k: Int): DataFrame = {
    require((k + 1).toLong * phiNum >= phiDen,
      s"capacity $k too small for threshold $phiNum/$phiDen")
    val cands = candidates(items, itemCol, k)
    val n = items.count()
    items.filter(col(itemCol).isInCollection(cands))
      .groupBy(itemCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(phiDen) > lit(n) * lit(phiNum))
  }
}
