// Dump formatted plans for the flagship queries (SCALE.md source).
// Run: sbt -batch -error "runMain graft.tools.ExplainDump /root/testdata/sf0.001 /tmp/plans"
package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val names = Seq("q6_forecast", "q5_nation_revenue", "ev_slice_time",
      "ev_fold_all", "ev_asof_take", "dedup_minhash_lsh", "knn_lsh",
      "li_interval_days")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/$n.txt"), plan)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
