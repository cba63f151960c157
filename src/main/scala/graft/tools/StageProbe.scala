package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-stage attribution for one catalog query: prints every stage's wall,
  * task count and summed task time on the FINAL warmed run.
  */
object StageProbe {
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
    @volatile var record = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (record) {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        lines.add(f"  stage ${si.stageId}%3d wall=${wall}%5d ms tasks=${si.numTasks}%3d  ${si.name.take(90)}")
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = if (record) {
        lines.add(s"  -- job ${j.jobId} (${j.stageInfos.size} stages)")
      }
    })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (_ <- 1 to 4) { fn(spark, sfDir).count(); spark.catalog.clearCache() }
      lines.clear(); record = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e6
      record = false
      Thread.sleep(100)
      println(f"$name exec=${dt}%.1f ms")
      lines.forEach(println(_))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
