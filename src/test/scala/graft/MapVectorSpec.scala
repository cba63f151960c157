package graft

import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions.{col, when, lower, lit, element_at, aggregate}
import graft.core._

/** General mapVector goldens — the reference's whole-vector-function
  * examples reproduced exactly:
  *
  *   - TestMultiTerms.scala:122-132 "map subset keys": after a mapKeys
  *     subset to one key, `mapVector(_.getSize)` emits 1 on every event
  *     and `mapVector(v => v.get(0))` is the first cell's value stream;
  *   - the cross-sectional demean over the reference's 3-key test stream
  *     (TestMultiTerms.scala:55-57 data: A=0..5 @ ts 10i+1, B=10..15
  *     @ 10i+2, C=20..25 @ 10i+3).
  */
class MapVectorSpec extends SparkSpec {
  import spark.implicits._

  /** createTestMultiStream (TestMultiTerms.scala:70-79): three interleaved
    * per-key streams on one event axis; seq = global arrival order.
    */
  private def multi = {
    val rows =
      (0 to 5).map(i => (10L * i + 1, "A", i.toDouble)) ++
        (0 to 5).map(i => (10L * i + 2, "B", (i + 10).toDouble)) ++
        (0 to 5).map(i => (10L * i + 3, "C", (i + 20).toDouble))
    rows.sortBy(_._1).zipWithIndex
      .map { case ((ts, k, v), i) => (ts, i.toLong, k, v) }
      .toDF("ts", "seq", "k", "v")
  }

  test("mapVector(getSize) after mapKeys subset emits 1 per event " +
    "(TestMultiTerms.scala:122-128)") {
    val subset = KStream(multi, Seq("k"))
      .mapKeys(when(col("k") === "C", lower(col("k"))), "k2")
    val sizes = subset.mapVector(col("v"), "snap")
      .select(functions.size(col("snap")))
      .as[Int].collect().toSeq
    sizes shouldBe Seq.fill(6)(1)
  }

  test("mapVector(v.get(0)) is the first cell's value stream " +
    "(TestMultiTerms.scala:130-132)") {
    val subset = KStream(multi, Seq("k"))
      .mapKeys(when(col("k") === "C", lower(col("k"))), "k2")
    val first = subset.mapVector(col("v"), "snap")
      .orderBy("seq")
      .select(element_at(col("snap"), 1).getField("v"))
      .as[Double].collect().toSeq
    first shouldBe (20 to 25).map(_.toDouble)
  }

  test("sessionize matches Spark's built-in session_window aggregation") {
    // three keys, gaps around the 1000-unit threshold
    val rows = Seq(
      ("a", 0L), ("a", 500L), ("a", 900L), ("a", 2500L), ("a", 2600L),
      ("b", 100L), ("b", 1500L), ("b", 1600L), ("c", 50L))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, 1.0) }
      .toDF("k", "ts", "seq", "v")
    val mine = KStream(rows, Seq("k"))
      .sessionize(1000L)
      .reduceAll("n" -> functions.count(lit(1)),
        "start" -> functions.min(col("ts")))
      .select("k", "start", "n")
      .as[(String, Long, Long)].collect().toSet
    val builtin = rows
      .groupBy(col("k"),
        functions.session_window(functions.timestamp_micros(col("ts")), "0.001 seconds"))
      .agg(functions.count(lit(1)).as("n"))
      .select(col("k"),
        functions.unix_micros(col("session_window.start")).as("start"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    mine shouldBe builtin
  }

  test("cross-sectional demean: snapshot holds every key's LATEST value, " +
    "firing event included (VectTerm.scala:145-176 rendezvous)") {
    val ks = KStream(multi, Seq("k"))
    val snaps = ks.mapVector(col("v"), "snap")
      .orderBy("seq")
      .select(col("ts"), col("k"), col("v"),
        aggregate(col("snap"), lit(0.0), (a, e) => a + e.getField("v")),
        functions.size(col("snap")))
      .as[(Long, String, Double, Double, Int)].collect()

    // ts=1: only A(0) fired → snapshot [0], size 1
    snaps(0) shouldBe ((1L, "A", 0.0, 0.0, 1))
    // ts=3: A=0, B=10, C=20 all live → sum 30, size 3
    snaps(2) shouldBe ((3L, "C", 20.0, 30.0, 3))
    // ts=51 (A fires 5): latest B=14 (ts 42), C=24 (ts 43) → sum 43
    val at51 = snaps.find(_._1 == 51L).get
    at51 shouldBe ((51L, "A", 5.0, 43.0, 3))
    // every event's own value is already in its snapshot (rendezvous)
    snaps.foreach { case (_, _, v, sum, n) =>
      if (n == 1) sum shouldBe v
    }
  }

  test("mapVector snapshot ≡ brute force on random streams (latest value " +
    "per seen key at every event, same-ts rendezvous included)") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 250).map { i =>
      (rnd.nextInt(30).toLong, i.toLong, Vector("a", "b", "c")(rnd.nextInt(3)),
        rnd.nextInt(100).toLong)
    }
    val got = KStream(rows.toDF("ts", "seq", "k", "v"), Seq("k"))
      .mapVector(col("v"), "snap")
      .select(col("seq"),
        aggregate(col("snap"), lit(0L), (acc, e) => acc + e.getField("v"))
          .as("s"),
        functions.size(col("snap")).as("n"))
      .as[(Long, Long, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    val expected = rows.map { case (ts, seq, _, _) =>
      val latest = rows.groupBy(_._3).flatMap { case (_, ks) =>
        val vis = ks.filter(_._1 <= ts) // same-ts rendezvous: seq not compared
        if (vis.isEmpty) None else Some(vis.maxBy(e => (e._1, e._2))._4)
      }
      seq -> ((latest.sum, latest.size))
    }.toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (seq, exp) =>
      withClue(s"seq=$seq") { got(seq) shouldBe exp }
    }
  }

  test("general mapVector fails LOUDLY past its key-universe envelope, " +
    "pointing at the O(n) specializations (VERDICT r8 #6)") {
    val wide = (0 until 40).map(i => (i.toLong, i.toLong, s"k$i", 1.0))
      .toDF("ts", "seq", "k", "v")
    val ex = intercept[IllegalArgumentException] {
      KStream(wide, Seq("k")).mapVector(col("v"), "snap", maxKeys = 16L)
    }
    ex.getMessage should include("events × keys")
    ex.getMessage should include("vectorSumAtEachEvent")
    // the same universe passes when the caller raises the envelope
    KStream(wide, Seq("k")).mapVector(col("v"), "snap", maxKeys = 64L)
      .count() shouldBe 40L
  }
}
