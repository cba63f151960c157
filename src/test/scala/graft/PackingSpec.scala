package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing: every item placed exactly once, no bin exceeds
  * capacity, NFD beats naive one-per-bin substantially, and the packing is
  * partitioning-independent (hash shards + total within-shard order).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // 500 items, hash-derived lengths in [10, 250]
  private def items = spark.range(500).select(
    col("id"), (pmod(hash(col("id")), lit(241)) + 10).cast("int").as("len"))

  test("complete, capacity-respecting, and better than one-item-per-bin") {
    val cap = 512
    val packed = Packing.nextFitDecreasing(items, cap, shards = 8)
    packed.count() shouldBe 500L
    packed.select(countDistinct(col("id"))).head().getLong(0) shouldBe 500L

    val bins = Packing.utilization(packed, cap)
      .as[(Int, Long, Long, Long, Long)].collect()
    bins.foreach { case (s, b, _, fill, _) =>
      withClue(s"shard=$s bin=$b") { fill should be <= cap.toLong }
    }
    // NFD on ~130-avg items into 512 should need far fewer bins than items
    bins.length.toLong should be < 200L
    // aggregate utilization above 80%: decreasing order keeps bins dense
    val totalFill = bins.map(_._4).sum
    totalFill * 100 / (bins.length * cap) should be >= 80L
  }

  test("packing is independent of input partitioning") {
    val cap = 512
    val a = Packing.nextFitDecreasing(items, cap, shards = 8)
      .as[(Int, Long, Long, Int)].collect().toSet
    val b = Packing.nextFitDecreasing(items.repartition(7), cap, shards = 8)
      .as[(Int, Long, Long, Int)].collect().toSet
    b shouldBe a
  }

  test("oversize items drop instead of corrupting bins") {
    val withBig = items.union(Seq((9999L, 1000)).toDF("id", "len"))
    val packed = Packing.nextFitDecreasing(withBig, 512, shards = 8)
    packed.filter(col("id") === 9999L).count() shouldBe 0L
    packed.count() shouldBe 500L
  }
}
