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

  private def shardCol = pmod(hash(col("id")), lit(8)).cast("int").as("shard")

  test("FFD: complete, capacity-respecting, >=90% utilization, beats NFD") {
    val cap = 512
    val sharded = items.select(shardCol, col("id"), col("len"))
    val ffd = Packing.firstFitDecreasingSharded(sharded, cap, openBins = 8)
    ffd.count() shouldBe 500L
    val bins = Packing.utilization(ffd, cap)
      .as[(Int, Long, Long, Long, Long)].collect()
    bins.foreach { case (s, b, _, fill, _) =>
      withClue(s"shard=$s bin=$b") { fill should be <= cap.toLong }
    }
    val nfdBins = Packing.utilization(
      Packing.nextFitDecreasingSharded(sharded, cap), cap).count()
    bins.length.toLong should be <= nfdBins
    val totalFill = bins.map(_._4).sum
    totalFill * 100 / (bins.length * cap) should be >= 90L
  }

  test("FFD: starts are exact in-bin prefix sums and the packing is " +
    "partition-independent") {
    val cap = 512
    val sharded = items.select(shardCol, col("id"), col("len"))
    val a = Packing.firstFitDecreasingSharded(sharded, cap, 4)
      .as[(Int, Long, Long, Int, Int)].collect().toSet
    val b = Packing.firstFitDecreasingSharded(sharded.repartition(7), cap, 4)
      .as[(Int, Long, Long, Int, Int)].collect().toSet
    b shouldBe a
    // per bin: sorted starts tile the fill exactly (start_i = Σ earlier lens)
    a.groupBy(r => (r._1, r._2)).values.foreach { bin =>
      val inOrder = bin.toSeq.sortBy(_._5)
      inOrder.foldLeft(0) { case (expectStart, (_, _, _, len, start)) =>
        start shouldBe expectStart
        expectStart + len
      }
    }
  }

  test("FFD with ring=1 degenerates to exactly NFD (shared placement law)") {
    val cap = 512
    val sharded = items.select(shardCol, col("id"), col("len"))
    val ffd1 = Packing.firstFitDecreasingSharded(sharded, cap, openBins = 1)
      .select("shard", "bin", "id", "len", "start")
      .as[(Int, Long, Long, Int, Int)].collect().toSet
    val nfd = Packing.withOffsets(Packing.nextFitDecreasingSharded(sharded, cap))
      .select("shard", "bin", "id", "len", "start")
      .as[(Int, Long, Long, Int, Int)].collect().toSet
    ffd1 shouldBe nfd
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

  test("bin arrays: boundaries are prefix sums, position ids restart per " +
    "doc, segment ids are doc ordinals — the dataloader contract") {
    val cap = 512
    val packed = Packing.nextFitDecreasing(items, cap, shards = 8)
    val lens = items.as[(Long, Int)].collect().toMap
    val rows = Packing.binArrays(packed).collect()
    rows should not be empty
    rows.foreach { r =>
      val ids = r.getSeq[Long](2)
      val bounds = r.getSeq[Int](3)
      val pos = r.getSeq[Int](4)
      val seg = r.getSeq[Int](5)
      val binLens = ids.map(lens)
      withClue(s"shard=${r.getInt(0)} bin=${r.getLong(1)}: ") {
        // boundaries = prefix sums of the packed lens, starting at 0
        bounds shouldBe binLens.scanLeft(0)(_ + _).init
        val total = binLens.sum
        total should be <= cap
        pos.length shouldBe total
        seg.length shouldBe total
        // position ids: 0..len-1 per doc, concatenated
        pos shouldBe binLens.flatMap(l => 0 until l)
        // segment ids: the doc ordinal repeated len times (the
        // block-diagonal attention-mask key)
        seg shouldBe binLens.zipWithIndex.flatMap { case (l, i) => Seq.fill(l)(i) }
      }
    }
  }

  test("withOffsets starts are partitioning-independent and consistent " +
    "with the packer's consumption order") {
    val a = Packing.withOffsets(Packing.nextFitDecreasing(items, 512, 8))
      .as[(Int, Long, Long, Int, Int)].collect().toSet
    val b = Packing.withOffsets(
      Packing.nextFitDecreasing(items.repartition(11), 512, 8))
      .as[(Int, Long, Long, Int, Int)].collect().toSet
    b shouldBe a
    // each bin's starts begin at 0 and step by the previous len
    a.groupBy(t => (t._1, t._2)).values.foreach { bin =>
      val inOrder = bin.toSeq.sortBy(_._5)
      inOrder.head._5 shouldBe 0
      inOrder.sliding(2).foreach {
        case Seq(p, n) => n._5 shouldBe p._5 + p._4
        case _         =>
      }
    }
  }
}
