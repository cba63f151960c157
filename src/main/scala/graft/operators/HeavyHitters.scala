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
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    // in-place mutation (r16 guide §4: the immutable-Map form rebuilt the
    // whole k-entry map on every decrement and allocated per token —
    // ~600 ms of the doc_heavy_tokens constructor); the Aggregator
    // contract allows mutating and returning the buffer, and the
    // decrement-all step stays the textbook amortized-O(1) op
    def reduce(b: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
      b.get(x) match {
        case Some(c) => b.update(x, c + 1)
        case None if b.size < k => b.update(x, 1L)
        case None =>
          b.filterInPlace((_, c) => c > 1)
          b.mapValuesInPlace((_, c) => c - 1)
      }
      b
    }

    def merge(b1: mutable.HashMap[String, Long],
              b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      val m = b1
      b2.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
      if (m.size <= k) m
      else {
        val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
        m.filterInPlace((_, c) => c > cut)
        m.mapValuesInPlace((_, c) => c - cut)
        m
      }
    }

    def finish(b: mutable.HashMap[String, Long]): Seq[String] = b.keys.toSeq.sorted
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] = Encoders.kryo
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
    // ONE pass builds the summary AND the exact row count (r16: the
    // separate items.count() re-ran the full tokenize/explode)
    val mg = udaf(new MisraGries(k))
    val r = items.agg(mg(col(itemCol)).as("cands"),
      count(lit(1)).as("n")).head()
    val cands = r.getSeq[String](0)
    val n = r.getLong(1)
    items.filter(col(itemCol).isInCollection(cands))
      .groupBy(itemCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(phiDen) > lit(n) * lit(phiNum))
  }
}
