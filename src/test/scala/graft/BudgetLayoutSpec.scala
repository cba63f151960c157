package graft

import org.apache.spark.sql.functions._

/** Result-level laws for the mixture-planning / layout / profiling
  * additions — properties the DuckDB hash-compare cannot express
  * (exact-sum guarantees, range containment, agreement with the
  * brute-force definition).
  */
class BudgetLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("doc_token_budget: Hamilton allocation sums EXACTLY to the budget " +
    "and every domain is within 1 of its exact proportional share") {
    val rows = SparkEntry.queries("doc_token_budget")(spark, dir)
      .select("lang", "t", "alloc").collect()
    val b = 1000000L
    val tt = rows.map(_.getLong(1)).sum
    rows.map(_.getLong(2)).sum shouldBe b
    rows.foreach { r =>
      val exact = b.toDouble * r.getLong(1) / tt
      math.abs(r.getLong(2) - exact) should be <= 1.0
    }
  }

  test("doc_len_quantiles agrees with the brute-force sort definition " +
    "of percentile_disc") {
    val lens = Tables_documents_lengths()
    val got = SparkEntry.queries("doc_len_quantiles")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val sorted = lens.sorted
    for (pct <- Seq(25, 50, 75, 90, 99)) {
      // smallest value whose cumulative count reaches ceil(pct*n/100):
      // the 1-indexed ceil(pct*n/100)-th order statistic
      val rank = (pct.toLong * sorted.length + 99) / 100
      got(pct) shouldBe sorted((rank - 1).toInt)
    }
  }

  private def Tables_documents_lengths(): Seq[Int] =
    graft.core.Tables.documents(spark, dir)
      .select(expr("size(split(text, ' '))").as("len"))
      .collect().map(_.getInt(0)).toSeq

  test("ev_zorder_layout: shards partition the corpus, z-ranges stay " +
    "inside their shard's 2^28 slot, and the interleave is invertible") {
    val rows = SparkEntry.queries("ev_zorder_layout")(spark, dir).collect()
    val total = graft.core.Tables.events(spark, dir).count()
    rows.map(_.getLong(1)).sum shouldBe total
    rows.foreach { r =>
      val (shard, minZ, maxZ) =
        (r.getLong(0), r.getLong(4), r.getLong(5))
      shard should (be >= 0L and be <= 15L)
      minZ should be >= shard * (1L << 28)
      maxZ should be < (shard + 1) * (1L << 28)
    }
    // Morton interleave round-trips: deinterleaving even/odd bits of
    // z(a,b) recovers (a,b) for adversarial 16-bit corners
    def z(a: Long, bb: Long): Long =
      (0 until 16).map(k =>
        (((a >> k) & 1L) << (2 * k)) | (((bb >> k) & 1L) << (2 * k + 1))).sum
    def deA(v: Long): Long =
      (0 until 16).map(k => (((v >> (2 * k)) & 1L) << k)).sum
    def deB(v: Long): Long =
      (0 until 16).map(k => (((v >> (2 * k + 1)) & 1L) << k)).sum
    for (a <- Seq(0L, 1L, 0x5555L, 0xAAAAL, 0xFFFFL, 12345L);
         bb <- Seq(0L, 1L, 0x8000L, 0xFFFFL, 54321L)) {
      deA(z(a, bb)) shouldBe a
      deB(z(a, bb)) shouldBe bb
    }
  }
}
