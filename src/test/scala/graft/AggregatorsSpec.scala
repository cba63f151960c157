package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators._
import graft.functions.Reducers

/** Typed Aggregator cells (§2.7): the Aggregator path agrees with the
  * Column-expression path and with plain Scala folds, independent of
  * partitioning (merge correctness).
  */
class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("EwmaAgg matches Reducers.ewma and the Scala recurrence across partitions") {
    val vals = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, i.toLong, v) }
    val ds = spark.createDataset(rows).repartition(4) // force merges
    val typed = ds.select(new EwmaAgg(0.25).toColumn).collect().head
    val expect = vals.tail.foldLeft(vals.head)((acc, x) => 0.25 * x + 0.75 * acc)
    typed shouldBe expect
    val viaColumn = ds.toDF("ts", "seq", "v")
      .agg(Reducers.ewma(col("ts"), col("seq"), col("v"), 0.25))
      .as[Double].collect().head
    viaColumn shouldBe expect
  }

  test("VwapAgg matches the exact-decimal Column vwap") {
    val pxQty = Seq((10.0, 2.0), (11.0, 3.0), (9.0, 5.0))
    val typed = spark.createDataset(pxQty).repartition(3)
      .select(new VwapAgg().toColumn).collect().head
    val expect = pxQty.map { case (p, q) => p * q }.sum / pxQty.map(_._2).sum
    typed shouldBe expect +- 1e-12
  }

  test("AppendAgg restores (ts, seq) order regardless of partitioning") {
    val rows = Seq((3L, 3L, "d"), (0L, 0L, "a"), (2L, 2L, "c"), (1L, 1L, "b"))
    val got = spark.createDataset(rows).repartition(4)
      .select(new AppendAgg[String]().toColumn).collect().head
    got shouldBe Seq("a", "b", "c", "d")
  }
}
