package graft

import org.apache.spark.sql.functions._
import graft.sources.v2.WalkDataSource

/** The DSv2 EventSourceX connector: per-key partition planning, ts-range
  * filter pushdown (the reference's `init(start, end)`), deterministic
  * cumulative state across the pruned prefix.
  */
class WalkDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def walk(keys: String, steps: Long) =
    spark.read.format(classOf[WalkDataSource].getName)
      .option("keys", keys).option("steps", steps.toString)
      .option("seed", "s1").load()

  test("per-key partition planning: one input partition per key") {
    val df = walk("A,B,C", 50)
    df.rdd.getNumPartitions shouldBe 3
    df.count() shouldBe 150
  }

  test("rows match a driver-side replay of the md5 walk") {
    val got = walk("A", 20).orderBy("ts")
      .select("ts", "v").as[(Long, Long)].collect().toSeq
    val expect = (0L until 20L)
      .scanLeft(0L)((acc, i) => acc + WalkDataSource.step("s1", "A", i)).tail
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    got shouldBe expect
  }

  test("init(start,end) as pushdown: ts bounds reach the scan and prune " +
    "generation, cumulative state survives the skipped prefix") {
    val full = walk("A,B", 500)
    val ranged = full.filter(col("ts") >= 100 && col("ts") <= 199)
    ranged.collect()
    val plan = ranged.queryExecution.executedPlan.toString
    withClue(plan) {
      // the scan description carries the bounds — the source, not a Spark
      // Filter node, enforces the range
      plan should include("lo=100, hi=199")
    }
    // pushdown result ≡ full scan + post-filter (state carried exactly)
    val viaPush = ranged.orderBy("k", "ts")
      .select("k", "ts", "v").as[(String, Long, Long)].collect().toSeq
    val viaPost = full.orderBy("k", "ts")
      .select("k", "ts", "v").as[(String, Long, Long)].collect()
      .filter(r => r._2 >= 100 && r._2 <= 199).toSeq
    viaPush shouldBe viaPost
    viaPush.size shouldBe 200
  }

  test("column pruning reaches the reader: a projection narrows the scan " +
    "schema and values survive unchanged") {
    val df = walk("A,B", 50).select("k", "v")
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    withClue(scan.toString) {
      scan.output.map(_.name) shouldBe Seq("k", "v")
      scan.toString should include("cols=k,v")
    }
    // pruned read ≡ full read projected (reader's column mapping is right)
    val pruned = df.orderBy("k", "v").as[(String, Long)].collect().toSeq
    val full = walk("A,B", 50).select("k", "v")
      .orderBy("k", "v").as[(String, Long)].collect().toSeq
    pruned shouldBe full
    // and the final sum is the replayed walk's final sum per key
    walk("A", 50).select("k", "v").orderBy(col("v")).count() shouldBe 50
  }

  test("SQL DDL face: CREATE TABLE ... USING the connector, query with " +
    "plain SQL") {
    spark.sql("DROP TABLE IF EXISTS walk_tbl")
    spark.sql(s"""CREATE TABLE walk_tbl
      USING ${classOf[WalkDataSource].getName}
      OPTIONS (keys 'A,B', steps '100', seed 's1')""")
    try {
      val got = spark.sql(
        "SELECT k, count(*) AS n, sum(v) AS sv FROM walk_tbl " +
          "WHERE ts >= 50 GROUP BY k ORDER BY k")
        .as[(String, Long, Long)].collect().toSeq
      val expect = Seq("A", "B").map { k =>
        val walk = (0L until 100L)
          .scanLeft(0L)((acc, i) => acc + WalkDataSource.step("s1", k, i)).tail
        (k, 50L, walk.drop(50).sum)
      }
      got shouldBe expect
    } finally spark.sql("DROP TABLE IF EXISTS walk_tbl")
  }

  test("streaming face: readStream over the same table equals the batch " +
    "read (MicroBatchStream, offsets = step indices)") {
    val sdf = spark.readStream.format(classOf[WalkDataSource].getName)
      .option("keys", "A,B").option("steps", "300").option("seed", "s1")
      .load()
    val name = "walk_stream_" + System.nanoTime()
    val q = sdf.writeStream.queryName(name).format("memory")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).orderBy("k", "ts")
      .select("k", "ts", "v").as[(String, Long, Long)].collect().toSeq
    val batch = walk("A,B", 300).orderBy("k", "ts")
      .select("k", "ts", "v").as[(String, Long, Long)].collect().toSeq
    streamed shouldBe batch
  }
}
