package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Misra-Gries heavy hitters: the superset guarantee on a skewed stream
  * with a vocabulary much larger than the sketch capacity, exactness of the
  * two-pass operator vs brute force, and partitioning independence.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 10 planted heavy items (~500 occurrences each) drowned in a 20k-type
  // long tail (1 occurrence each): N = 25_000, heavy freq = 2% each.
  private def items = {
    val heavy = spark.range(5000)
      .select(concat(lit("hh_"), col("id") % 10).as("token"))
    val tail = spark.range(20000)
      .select(concat(lit("tail_"), col("id")).as("token"))
    heavy.union(tail)
  }

  test("candidates is a superset of every item above N/(k+1), with |c| <= k") {
    val k = 128 // N/(k+1) ~ 194 < 500 => all 10 planted items must survive
    val cands = HeavyHitters.candidates(items, "token", k).toSet
    cands.size should be <= 128
    (0 until 10).foreach { i => cands should contain(s"hh_$i") }
  }

  test("exact() equals brute-force counting, independent of partitioning") {
    val expected = items.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 > lit(25000L) * 1) // > 1% of N
      .as[(String, Long)].collect().toSet

    Seq(items, items.repartition(7)).foreach { src =>
      val got = HeavyHitters.exact(src, "token", phiNum = 1, phiDen = 100, k = 128)
        .as[(String, Long)].collect().toSet
      got shouldBe expected
    }
    expected.map(_._1) shouldBe (0 until 10).map(i => s"hh_$i").toSet
  }

  test("capacity below the guarantee bound is rejected") {
    an[IllegalArgumentException] should be thrownBy
      HeavyHitters.exact(items, "token", phiNum = 1, phiDen = 1000, k = 64)
  }
}
