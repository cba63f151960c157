package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-technique demonstrations: salted aggregation correctness and
  * bucketed-table co-located joins (no shuffle in the plan).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg: two-phase aggregation equals direct aggregation") {
    // one mega-key (0) + long tail
    val df = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, col("id") % 100).otherwise(0L)).as("k"),
        (col("id") % 7).as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
      .orderBy("k").as[(Long, Long, Long, Long)].collect().toSeq
    val salted = Skew.saltedAgg(df, Seq("k"), salt = 8,
      partials = Seq("n" -> count(lit(1)), "s" -> sum(col("v")), "mx" -> max(col("v"))),
      merges = Seq("n" -> sum(col("n")), "s" -> sum(col("s")), "mx" -> max(col("mx"))))
      .orderBy("k").as[(Long, Long, Long, Long)].collect().toSeq
    salted shouldBe direct
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    spark.range(500).select(col("id").as("k"), (col("id") * 3).as("w"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    // co-located: both sides pre-bucketed on the join key → no Exchange
    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "Exchange hashpartitioning"
    }
    joined.count() shouldBe 500L
  }
}
