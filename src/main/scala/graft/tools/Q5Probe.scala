// Scratch probe for the q5_nation_revenue r10 bench regression
// (VERDICT r10 #2): split analysis/planning vs execution time under the
// EXACT Bench session config, print the AQE final plan.
// Run: sbt -batch -error "runMain graft.tools.Q5Probe /root/testdata/sf0.1"
package graft.tools

import org.apache.spark.sql.SparkSession

object Q5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q5_nation_revenue")(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"[$tag] build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
      spark.catalog.clearCache()
    }
    once("cold")
    once("warm1")
    once("warm2")
    once("warm3")
    val df = graft.SparkEntry.queries("q5_nation_revenue")(spark, sfDir)
    df.count()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
