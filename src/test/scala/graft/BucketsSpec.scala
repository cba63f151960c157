package graft

import org.apache.spark.sql.functions._
import graft.core._

/** Multi-input bucket goldens — the XYCollector contract from
  * TestMultiBucketing.scala:69-175: a bucket bound to two streams counts
  * each input, and `countBoth` counts CYCLES where both fired atomically
  * (rendezvous: same-ts fires = one bucket update).
  */
class BucketsSpec extends SparkSpec {
  import spark.implicits._

  private def xs = Seq(0L, 1L, 2L, 3L, 4L, 5L).zipWithIndex
    .map { case (ts, i) => (ts, i.toLong, 1) }.toDF("ts", "seq", "x")
  private def ys = Seq(0L, 2L, 4L).zipWithIndex
    .map { case (ts, i) => (ts, 100L + i, 10) }.toDF("ts", "seq", "y")

  test("bind two streams: per-tag counts in one bucket (TradeQuoteStats pattern)") {
    val got = Buckets(Nil)
      .bind("x", xs)("v" -> col("x"))
      .bind("y", ys)("v" -> col("y"))
      .reset(Slice.Termination)
      .last(
        "nx" -> count(Buckets.fromTag("x", col("v"))),
        "ny" -> count(Buckets.fromTag("y", col("v"))),
        "sum_all" -> sum(col("v")))
      .select("nx", "ny", "sum_all")
      .as[(Long, Long, Long)].collect().toSeq
    got shouldBe Seq((6L, 3L, 36L))
  }

  test("reduceByCycle: countBoth counts cycles where BOTH inputs fired (XYCollector golden)") {
    val got = Buckets(Nil)
      .bind("x", xs)("v" -> col("x"))
      .bind("y", ys)("v" -> col("y"))
      .reset(Slice.Termination)
      .reduceByCycle(
        cycleAggs = Seq(
          "sawX" -> max(when(col("tag") === "x", 1).otherwise(0)),
          "sawY" -> max(when(col("tag") === "y", 1).otherwise(0))),
        bucketAggs = Seq(
          "countX" -> sum(col("sawX")),
          "countY" -> sum(col("sawY")),
          "countBoth" -> sum(when(col("sawX") === 1 && col("sawY") === 1, 1).otherwise(0))))
      .select("countX", "countY", "countBoth")
      .as[(Long, Long, Long)].collect().toSeq
    got shouldBe Seq((6L, 3L, 3L))
  }

  test("bound bucket with count slices: bucket resets every N union events") {
    // union of x (6 events) and y (3 events) = 9 events, sliced every 3 —
    // executable oracle over the merged (ts, seq) sequence
    val merged = (Seq(0L, 1L, 2L, 3L, 4L, 5L).zipWithIndex.map { case (t, i) => (t, i.toLong, 1) } ++
      Seq(0L, 2L, 4L).zipWithIndex.map { case (t, i) => (t, 100L + i, 10) })
      .sortBy { case (t, s, _) => (t, s) }.map(_._3)
    val expected = merged.grouped(3).map(g => g.sum.toLong).toSeq
    val got = Buckets(Nil)
      .bind("x", xs)("v" -> col("x"))
      .bind("y", ys)("v" -> col("y"))
      .reset(Slice.Count(3))
      .last("s" -> sum(col("v")))
      .orderBy("window_id").select("s").as[Long].collect().toSeq
    got shouldBe expected
  }

  test("keyed bound bucket groups per key (GroupedTerm2.bind)") {
    val a = Seq(("k1", 0L, 0L, 1), ("k2", 1L, 1L, 2)).toDF("k", "ts", "seq", "x")
    val b = Seq(("k1", 2L, 2L, 5)).toDF("k", "ts", "seq", "y")
    val got = Buckets(Seq("k"))
      .bind("a", a)("v" -> col("x"))
      .bind("b", b)("v" -> col("y"))
      .reset(Slice.Termination)
      .last("s" -> sum(col("v")), "n" -> count(lit(1)))
      .orderBy("k").select("k", "s", "n")
      .as[(String, Long, Long)].collect().toSeq
    got shouldBe Seq(("k1", 6L, 2L), ("k2", 2L, 1L))
  }
}
