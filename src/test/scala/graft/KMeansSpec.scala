package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** Full Lloyd loop: planted well-separated clusters are recovered exactly,
  * the fixed point is stable, and the result is partitioning-independent
  * (the determinism contract every operator in this engine carries).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // 300 points in 8-dim: three planted clusters around axes e0/e3/e6 with
  // small hash-derived perturbations — separation >> noise.
  private def points = spark.range(300).select(
    col("id"),
    transform(sequence(lit(0), lit(7)), i => {
      val axis = (col("id") % 3).cast("int") * 3 // 0, 3, 6
      val noise = pmod(hash(col("id"), i), lit(100)).cast("double") / 1000.0
      when(i === axis, lit(1.0) + noise).otherwise(noise)
    }).as("v"))

  test("planted clusters are recovered exactly and the fixed point is stable") {
    val (cents, assign) = KMeans.run(points, k = 3, iterations = 5)
    val a = assign.as[(Long, Int)].collect().toMap
    // every planted group lands in ONE cell, groups in distinct cells
    val byPlant = (0 until 3).map(g => (0 until 300).filter(_ % 3 == g)
      .map(i => a(i.toLong)).toSet)
    byPlant.foreach(_.size shouldBe 1)
    byPlant.flatten.toSet.size shouldBe 3
    // one more iteration does not move the centroids (converged)
    val (cents2, _) = KMeans.run(points, k = 3, iterations = 6)
    cents2.map(_.v.toSeq) shouldBe cents.map(_.v.toSeq)
  }

  test("result is partitioning-independent (exact-integer mean accumulation)") {
    val (c1, a1) = KMeans.run(points, 3, 3)
    val (c7, a7) = KMeans.run(points.repartition(7), 3, 3)
    c7.map(_.v.toSeq) shouldBe c1.map(_.v.toSeq)
    a7.orderBy("id").collect() shouldBe a1.orderBy("id").collect()
  }

  // normalized corpus in the shape withCell/assign expects ((id, vn))
  private def normed = points.select(
    col("id"),
    transform(col("v"), x => x / sqrt(aggregate(
      transform(col("v"), y => y * y), lit(0.0), (a, b) => a + b))).as("vn"))

  test("broadcast-join assignment path equals the literal-columns path (ties included)") {
    val cents = (0 until 8).map(c => KMeans.Centroid(c,
      Array.tabulate(8)(d => if (d == c) 1.0 else 0.25 * ((c + d) % 3)))).toSeq
    val lits = KMeans.assign(normed, cents, forceJoin = false)
      .select("id", "cell").orderBy("id").collect()
    val join = KMeans.assign(normed, cents, forceJoin = true)
      .select("id", "cell").orderBy("id").collect()
    join shouldBe lits
  }

  test("both assignment paths preserve extra input columns with the same " +
    "schema (ADVICE r4: the join path used to emit only (id, vn, cell))") {
    val cents = (0 until 4).map(c => KMeans.Centroid(c,
      Array.tabulate(8)(d => if (d == c) 1.0 else 0.1))).toSeq
    val withExtra = normed.withColumn("tag", concat(lit("t"), col("id")))
    val lits = KMeans.assign(withExtra, cents, forceJoin = false)
    val join = KMeans.assign(withExtra, cents, forceJoin = true)
    join.columns.toSeq shouldBe lits.columns.toSeq
    join.select("id", "tag", "cell").orderBy("id").collect() shouldBe
      lits.select("id", "tag", "cell").orderBy("id").collect()
  }

  test("k=4096 assignment plans O(1) in k (no per-centroid aliased columns)") {
    // 4096 distinct unit-ish centroids from a hash grid
    val cents = (0 until 4096).map { c =>
      KMeans.Centroid(c, Array.tabulate(8)(d =>
        1.0 + ((c * 31 + d * 17) % 97) / 97.0))
    }.toSeq
    val assigned = KMeans.assign(normed.limit(50), cents, forceJoin = false)
    // the adaptive cutover picked the broadcast-table path: the analyzed
    // plan carries NO per-centroid score alias and stays small
    val plan = assigned.queryExecution.analyzed.toString
    plan should not include "__s1025"
    plan.length should be < 100000
    assigned.count() shouldBe 50
    // every produced cell is a valid centroid id
    assigned.select(min("cell"), max("cell")).head() match {
      case row =>
        row.getInt(0) should be >= 0
        row.getInt(1) should be < 4096
    }
  }
}
