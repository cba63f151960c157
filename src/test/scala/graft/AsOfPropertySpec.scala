package graft

import org.apache.spark.sql.functions._
import graft.core.AsOf

/** Property check for the as-of core: on seeded random keyed streams with
  * heavy ts collisions, `AsOf.take` must equal the brute-force
  * "latest right of my key with r.ts <= l.ts" (same-ts rights visible —
  * the rendezvous contract), and `takeWithin` must null exactly the
  * stale carries. The window/union implementation details can't drift
  * from the semantics without this going red.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val keys = Vector("a", "b", "c")

  private def randStream(seed: Int, seqBase: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until 300).map { i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(40).toLong, seqBase + i, rnd.nextInt(1000).toDouble)
    }
  }

  test("AsOf.take ≡ brute force on random streams (incl. equal-ts rendezvous)") {
    val left = randStream(7, 0L)
    val right = randStream(13, 10000L)
    val expected: Map[Long, Option[Double]] = left.map { case (k, ts, seq, _) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      seq -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._4))
    }.toMap

    val got = AsOf.take(
      left.toDF("k", "ts", "seq", "v"),
      right.toDF("k", "ts", "seq", "v"),
      Seq(col("k")), Seq(col("k")), Seq("rv" -> col("v")))
      .select("seq", "rv").as[(Long, Option[Double])].collect().toMap

    got.size shouldBe left.size
    left.foreach { case (_, _, seq, _) =>
      withClue(s"left seq=$seq") { got(seq) shouldBe expected(seq) }
    }
  }

  test("AsOf.takeWithin nulls exactly the stale carries") {
    val left = randStream(21, 0L)
    val right = randStream(42, 10000L)
    val tol = 5L
    val expected: Map[Long, Option[Double]] = left.map { case (k, ts, seq, _) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      seq -> (if (cands.isEmpty) None
              else {
                val best = cands.maxBy(r => (r._2, r._3))
                if (ts - best._2 <= tol) Some(best._4) else None
              })
    }.toMap

    val got = AsOf.takeWithin(
      left.toDF("k", "ts", "seq", "v"),
      right.toDF("k", "ts", "seq", "v"),
      Seq(col("k")), Seq(col("k")), Seq("rv" -> col("v")), tol)
      .select("seq", "rv").as[(Long, Option[Double])].collect().toMap

    left.foreach { case (_, _, seq, _) =>
      withClue(s"left seq=$seq") { got(seq) shouldBe expected(seq) }
    }
  }

  test("AsOf.zip ≡ brute force: one emission per (key, ts) cycle carrying " +
    "both latest values") {
    val left = randStream(31, 0L)
    val right = randStream(57, 10000L)

    val expected: Map[(String, Long), (Option[Double], Option[Double])] =
      (left.map(e => (e._1, e._2)) ++ right.map(e => (e._1, e._2))).distinct
        .map { case (k, ts) =>
          def latest(s: Seq[(String, Long, Long, Double)]) = {
            val c = s.filter(e => e._1 == k && e._2 <= ts)
            if (c.isEmpty) None else Some(c.maxBy(e => (e._2, e._3))._4)
          }
          (k, ts) -> ((latest(left), latest(right)))
        }.toMap

    val got = AsOf.zip(
      left.toDF("k", "ts", "seq", "v"),
      right.toDF("k", "ts", "seq", "v"),
      Seq("k"), Seq("lv" -> col("v")), Seq("rv" -> col("v")))
      .select(col("k"), col("ts"), col("lv"), col("rv"))
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap

    got.keySet shouldBe expected.keySet
    expected.foreach { case (kts, exp) =>
      withClue(s"cycle=$kts") { got(kts) shouldBe exp }
    }
  }
}
