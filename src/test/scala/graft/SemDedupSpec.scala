package graft

import org.apache.spark.sql.functions._
import graft.operators.SemDedup

/** SemDeDup semantic dedup: planted near-duplicates are pruned with the
  * paper's diversity-preserving keeper rule (lowest centroid-cosine
  * survives), cross-cell near-duplicates are NOT compared (the cell
  * bound is what makes the operator tractable), and the removal set is
  * partitioning-independent.
  */
class SemDedupSpec extends SparkSpec {

  private def vec(xs: Double*) = xs

  // Two well-separated cells around e0 and e4 (8-dim). In the e0 cell:
  // a planted near-dup PAIR (ids 10, 11 — tiny perturbation, cosine
  // ~0.9999) plus a lone far member (id 12). In the e4 cell: a TRIPLE
  // (ids 20, 21, 22). Centroids are the axes themselves (ids 0, 1).
  private def fixture = {
    import spark.implicits._
    val rows = Seq(
      // id, vector
      (10L, vec(1.0, 0.02, 0, 0, 0, 0, 0, 0)),
      (11L, vec(1.0, 0.021, 0, 0, 0, 0, 0, 0)),
      (12L, vec(1.0, 0.9, 0.2, 0, 0, 0, 0, 0)), // same cell, cos ~0.74 to 10
      (20L, vec(0, 0, 0, 0, 1.0, 0.03, 0, 0)),
      (21L, vec(0, 0, 0, 0, 1.0, 0.031, 0, 0)),
      (22L, vec(0, 0, 0, 0, 1.0, 0.032, 0, 0)))
    val cents = Seq(
      (0L, vec(1.0, 0, 0, 0, 0, 0, 0, 0)),
      (1L, vec(0, 0, 0, 0, 1.0, 0, 0, 0)))
    graft.plans.DotD.register(spark)
    val e = rows.toDF("id", "v")
      .withColumn("n2", call_function("dotd", col("v"), col("v")))
    val c = cents.toDF("c_id", "cv")
      .withColumn("cn2", call_function("dotd", col("cv"), col("cv")))
    (e, c)
  }

  test("planted near-dups pruned; keeper = lowest centroid-cosine; far member kept") {
    val (e, c) = fixture
    val assigned = SemDedup.assign(e, c).persist()
    // cells: 10,11,12 -> cell 0; 20,21,22 -> cell 1
    assigned.select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(10L -> 0L, 11L -> 0L, 12L -> 0L, 20L -> 1L, 21L -> 1L, 22L -> 1L)
    val removed = SemDedup.removed(assigned, theta = 0.99)
      .collect().map(_.getLong(0)).toSet
    // pair (10, 11): 11's perturbation 0.021 > 10's 0.02 → 11 is farther
    // from the e0 centroid (lower ccos) → 11 survives, 10 removed.
    // triple (20, 21, 22): 22 farthest from centroid → survives.
    removed shouldBe Set(10L, 20L, 21L)
    val kept = SemDedup.survivors(assigned, 0.99)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(11L, 12L, 22L)
  }

  test("cross-cell near-duplicates are not compared (cell bound is respected)") {
    import spark.implicits._
    // two identical vectors forced into DIFFERENT cells by distinct
    // dominant axes — identical tails would be near-dups under a global
    // scan, but SemDeDup only prunes within a cell
    val rows = Seq(
      (30L, vec(1.0, 0.5, 0.5, 0, 0, 0, 0, 0)),
      (31L, vec(0, 0.5, 0.5, 0, 1.0, 0, 0, 0)))
    graft.plans.DotD.register(spark)
    val e = rows.toDF("id", "v")
      .withColumn("n2", call_function("dotd", col("v"), col("v")))
    val (_, c) = fixture
    val assigned = SemDedup.assign(e, c)
    assigned.select("cell").distinct().count() shouldBe 2L
    SemDedup.removed(assigned, theta = 0.1).count() shouldBe 0L
  }

  test("removal set is partitioning-independent") {
    val (e, c) = fixture
    val r1 = SemDedup.removed(SemDedup.assign(e, c), 0.99)
      .collect().map(_.getLong(0)).toSet
    val r7 = SemDedup.removed(SemDedup.assign(e.repartition(7), c), 0.99)
      .collect().map(_.getLong(0)).toSet
    r7 shouldBe r1
  }

  test("property law: distributed result equals the O(n²) brute force " +
    "on random vectors (assignment + keeper rule)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 8
    val n = 300
    val vecs = (0 until n).map(i =>
      (i.toLong, IndexedSeq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val cents = (0 until 4).map(c =>
      (c.toLong, IndexedSeq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    // brute force: nearest centroid (ties → lowest c_id), then the
    // EXISTS removal predicate pair by pair
    val theta = 0.35
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (cid, cos(cv, v)) }
        .maxBy { case (cid, c) => (c, -cid) }
    }.toMap
    val removedBrute = vecs.filter { case (id, v) =>
      val (cell, ccos) = cellOf(id)
      vecs.exists { case (id2, v2) =>
        id2 != id && cellOf(id2)._1 == cell && cos(v, v2) >= theta && {
          val ccos2 = cellOf(id2)._2
          ccos2 < ccos || (ccos2 == ccos && id2 < id)
        }
      }
    }.map(_._1).toSet

    graft.plans.DotD.register(spark)
    val e = vecs.toDF("id", "v")
      .withColumn("n2", org.apache.spark.sql.functions
        .call_function("dotd", org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("v")))
    val c = cents.toDF("c_id", "cv")
      .withColumn("cn2", org.apache.spark.sql.functions
        .call_function("dotd", org.apache.spark.sql.functions.col("cv"),
          org.apache.spark.sql.functions.col("cv")))
    val removedDist = SemDedup.removed(SemDedup.assign(e, c), theta)
      .collect().map(_.getLong(0)).toSet
    removedDist shouldBe removedBrute
    removedDist should not be empty // the law isn't vacuous at this theta
  }
}
