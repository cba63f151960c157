package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Invariants of the quantized-integer PageRank loop:
  * determinism across partitionings, a hand-checked fixture, and
  * per-iteration movement shrinking (power-iteration contraction).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // star: a,b,c -> d, plus d -> a (so d has an out-edge)
  private def star = Seq(
    ("a", "d"), ("b", "d"), ("c", "d"), ("d", "a"))
    .toDF("src", "dst")

  test("hand-checked fixture: one iteration of the star graph") {
    val base = 1000000000000L / 4
    val got = PageRank.run(star, 1)
      .orderBy("node").as[(String, Long)].collect().toSeq
    // d receives a+b+c's full rank (outdeg 1 each); a receives d's
    val expD = (85L * 3 * base + 15L * base) / 100
    val expA = (85L * base + 15L * base) / 100
    val expBC = (15L * base) / 100
    got shouldBe Seq(
      ("a", expA), ("b", expBC), ("c", expBC), ("d", expD))
  }

  test("determinism: 1-partition and 8-partition runs agree bit-for-bit") {
    val e = star
    val r1 = PageRank.run(e.repartition(1), 3)
      .orderBy("node").as[(String, Long)].collect().toSeq
    val r8 = PageRank.run(e.repartition(8), 3)
      .orderBy("node").as[(String, Long)].collect().toSeq
    r1 shouldBe r8
  }

  test("dangling nodes keep teleport-only rank and their mass leaks " +
    "(documented semantics, not conservation)") {
    // a -> b, b has no out-edges: b's inflow never recirculates
    val e = Seq(("a", "b")).toDF("src", "dst")
    val base = 1000000000000L / 2
    val got = PageRank.run(e, 2).orderBy("node")
      .as[(String, Long)].collect().toSeq
    // iter1: a gets teleport only; b gets 85%*a0 + teleport
    // iter2: a teleport only again; b gets 85%*a1 + teleport
    val a1 = (15L * base) / 100
    val b2 = (85L * a1 + 15L * base) / 100
    got shouldBe Seq(("a", a1), ("b", b2))
    // leaked: b's iter-1 mass vanished — total is below the start mass
    (got.map(_._2).sum) should be < 2 * base
  }

  test("runUntil: iteration count and ranks are partition-independent, " +
    "and the stopping rule replays runs of run()") {
    // the star is asymmetric: deltas start ~1.7·base and contract by
    // 0.85 per sweep (a plain ring is symmetric and converges in one)
    val e = star
    val (ra, ka) = PageRank.runUntilRel(e.repartition(1), epsCentiBase = 50)
    val (rb, kb) = PageRank.runUntilRel(e.repartition(8), epsCentiBase = 50)
    ka shouldBe kb // exact int64 delta => data-dependent K, not plan-dependent
    ka should be > 1
    ra.orderBy("node").as[(String, Long)].collect().toSeq shouldBe
      rb.orderBy("node").as[(String, Long)].collect().toSeq
    // the converged frame IS run(e, K) — runUntil adds a stopping rule,
    // never a different sweep
    ra.orderBy("node").as[(String, Long)].collect().toSeq shouldBe
      PageRank.run(e, ka).orderBy("node").as[(String, Long)].collect().toSeq
  }

  test("runUntil: tighter epsilon takes strictly more sweeps (caps respected)") {
    val (_, loose) = PageRank.runUntilRel(star, epsCentiBase = 2000, maxIterations = 30)
    val (_, tight) = PageRank.runUntilRel(star, epsCentiBase = 20, maxIterations = 30)
    loose should be < tight
    val (_, capped) = PageRank.runUntilRel(star, epsCentiBase = 1, maxIterations = 3)
    capped shouldBe 3
  }

  test("contraction: rank movement shrinks per iteration on a ring+chords graph") {
    val edges = (0 until 12).map(i => (s"n$i", s"n${(i + 1) % 12}")) ++
      Seq(("n0", "n6"), ("n3", "n9"), ("n6", "n0"))
    val e = edges.toDF("src", "dst")
    def ranks(k: Int): Map[String, Long] =
      PageRank.run(e, k).as[(String, Long)].collect().toMap
    val (r1, r2, r5, r6) = (ranks(1), ranks(2), ranks(5), ranks(6))
    def move(a: Map[String, Long], b: Map[String, Long]): Long =
      a.keys.map(k => math.abs(a(k) - b(k))).sum
    // per-step movement can oscillate on near-periodic graphs; the damped
    // spectral radius (0.85) guarantees ~0.52× decay over 4 steps
    move(r2, r1) should be > 0L
    move(r6, r5) should be < move(r2, r1)
  }
}
