package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.metrics.source.CodegenMetrics

/** Is whole-stage codegen recompiling on every run of the same query?
  * Prints the Janino compile-time and generated-class metric DELTAS per
  * warmed repetition.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (_ <- 1 to 3) { fn(spark, sfDir).count(); spark.catalog.clearCache() }
      for (i <- 1 to 3) {
        val t0c = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val s0 = CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e6
        val dc = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - t0c
        val ds = CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount - s0
        println(f"$name%-26s rep$i exec=$dt%7.1f ms  compiles=$dc  newSources=$ds")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
