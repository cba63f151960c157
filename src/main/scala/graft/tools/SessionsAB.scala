package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B timing: sessionize→reduceAll under RewriteGapSessions (native
  * MergingSessions plan) vs the identical untagged lag/cumsum window
  * formulation, interleaved in one JVM (dev harness; VERDICT r7 #5).
  */
object SessionsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tagged() = graft.core.KStream(graft.queries.Q.events(spark, sfDir), Seq("user_id"))
      .sessionize(3600L * 1000 * 1000)
      .reduceAll(
        "n" -> count(lit(1)),
        "dur_us" -> (max(col("ts")) - min(col("ts"))),
        "sum_value" -> graft.queries.Q.dsumD(col("value")))
      .orderBy("user_id", "session_id")

    def untagged() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("seq"))
      val cum = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      graft.queries.Q.events(spark, sfDir)
        .withColumn("__new",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") - lag(col("ts"), 1).over(w) > 3600L * 1000 * 1000, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("__new")).over(cum))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n"),
          (max(col("ts")) - min(col("ts"))).as("dur_us"),
          graft.queries.Q.dsumD(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    }

    // warmup both
    tagged().count(); untagged().count()
    for (i <- 1 to 5) {
      val t0 = System.nanoTime(); tagged().count()
      val t1 = System.nanoTime(); untagged().count()
      val t2 = System.nanoTime()
      println(f"[ab] run=$i native=${(t1 - t0) / 1e9}%.3f window=${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
