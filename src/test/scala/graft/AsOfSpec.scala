package graft

import org.apache.spark.sql.functions._
import graft.core._

/** As-of join goldens (scespet join/take/sample, MacroTerm.scala:190-230):
  * including the rendezvous-atomicity contract — an event on the sampled
  * stream in the same cycle IS visible to the sampler, and both sides
  * firing in one cycle coalesce to ONE emission (SlowGraphWalk.java:82-92).
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // left fires at ts 1,3,5,5; right fires at ts 0,3,4 (3 collides with left)
  private def left = Seq((1L, 0L, 10), (3L, 1L, 30), (5L, 2L, 50), (6L, 3L, 60))
    .toDF("ts", "seq", "lv")
  private def right = Seq((0L, 0L, 100), (3L, 1L, 300), (4L, 2L, 400))
    .toDF("ts", "seq", "rv")

  test("take: left fires, carrying latest right with right.ts <= left.ts (same-ts visible)") {
    val got = EStream(left)
      .take(EStream(right), Seq("rv" -> col("rv")))
      .df.orderBy("ts").select("ts", "lv", "rv")
      .as[(Long, Int, Int)].collect().toSeq
    // at ts=3 the right event in the same cycle IS visible (rendezvous)
    got shouldBe Seq((1L, 10, 100), (3L, 30, 300), (5L, 50, 400), (6L, 60, 400))
  }

  test("take: right not yet seen yields null") {
    val l = Seq((0L, 0L, 1)).toDF("ts", "seq", "lv")
    val got = EStream(l)
      .take(EStream(right.filter(col("ts") > 0)), Seq("rv" -> col("rv")))
      .df.select("rv").collect()
    got.head.isNullAt(0) shouldBe true
  }

  test("zip join: either side fires; same-cycle fires coalesce to one emission") {
    val got = EStream(left)
      .joinZip(EStream(right), Seq("lv" -> col("lv")), Seq("rv" -> col("rv")))
      .df.orderBy("ts")
      .select("ts", "lv", "rv")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .toSeq
    got shouldBe Seq(
      (0L, None, Some(100)),      // right fires first; left not initialised
      (1L, Some(10), Some(100)),  // left fires
      (3L, Some(30), Some(300)),  // BOTH fire in one cycle → ONE emission
      (4L, Some(30), Some(400)),
      (5L, Some(50), Some(400)),
      (6L, Some(60), Some(400)))
  }

  test("keyed take: as-of is per key") {
    val l = Seq(("a", 2L, 0L, 1), ("b", 2L, 1L, 2)).toDF("k", "ts", "seq", "lv")
    val r = Seq(("a", 0L, 0L, 10), ("a", 1L, 1L, 11), ("b", 1L, 2L, 20))
      .toDF("k", "ts", "seq", "rv")
    val got = KStream(l, Seq("k"))
      .take(KStream(r, Seq("k")), Seq(col("k")), Seq("rv" -> col("rv")))
      .df.orderBy("k").select("k", "lv", "rv")
      .as[(String, Int, Int)].collect().toSeq
    got shouldBe Seq(("a", 1, 11), ("b", 2, 20))
  }

  test("joinZipMapped: right stream re-keyed by keyMap before the zip (VectorJoin keyMap)") {
    // left keyed by symbol; right keyed by (feed, symbol) — keyMap drops feed
    val l = Seq(("VOD", 1L, 0L, 1.0), ("MSFT", 2L, 1L, 2.0))
      .toDF("sym", "ts", "seq", "pos")
    val r = Seq(("reuters.VOD", 0L, 10L, 100.0), ("reuters.MSFT", 1L, 11L, 200.0))
      .toDF("feedsym", "ts", "seq", "px")
    val got = KStream(l, Seq("sym"))
      .joinZipMapped(
        KStream(r, Seq("feedsym")),
        Seq(substring_index(col("feedsym"), ".", -1)),
        Seq("pos" -> col("pos")), Seq("px" -> col("px")))
      .df.filter(col("pos").isNotNull).orderBy("sym")
      .select("sym", "pos", "px").as[(String, Double, Double)].collect().toSeq
    got shouldBe Seq(("MSFT", 2.0, 200.0), ("VOD", 1.0, 100.0))
  }

  test("sample: trigger stream samples this stream's latest value") {
    val trig = Seq((2L, 0L, 0), (10L, 1L, 0)).toDF("ts", "seq", "x")
    val got = EStream(right).sample(EStream(trig), Seq("rv" -> col("rv")))
      .df.orderBy("ts").select("ts", "rv").as[(Long, Int)].collect().toSeq
    got shouldBe Seq((2L, 100), (10L, 400))
  }
}
