package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import org.apache.spark.storage.StorageLevel

/** Task-metric attribution for one PageRank sweep's stages. */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var record = false
    val agg = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (record && t.taskMetrics != null) {
        val a = agg.computeIfAbsent(t.stageId, _ => new Array[Long](6))
        a.synchronized {
          a(0) += 1
          a(1) += t.taskMetrics.executorRunTime
          a(2) += t.taskMetrics.jvmGCTime
          a(3) += t.taskMetrics.executorDeserializeTime
          a(4) += t.taskMetrics.shuffleReadMetrics.fetchWaitTime
          a(5) += t.taskMetrics.executorCpuTime / 1000000
        }
      }
    })
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = li.select((col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val e = edges.repartition(col("src")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val base = 1000000000000L / n
    val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    outdeg.count()
    val r0 = nodes.select(col("node"), lit(base).as("rank_q")).localCheckpoint()
    def sweep = {
      val contribs = r0.join(outdeg, "node")
        .select(col("node").as("src"), expr("rank_q div deg").as("contrib"))
      val inflow = e.join(contribs, "src")
        .groupBy(col("dst").as("node")).agg(sum(col("contrib")).as("inflow"))
      r0.select(col("node"), col("rank_q").as("prev_q"))
        .join(inflow, Seq("node"), "left")
        .select(col("node"), col("prev_q"),
          expr(s"(85L * coalesce(inflow, 0L) + 15L * ${base}L) div 100").as("rank_q"))
    }
    for (_ <- 1 to 3) sweep.write.format("noop").mode("overwrite").save()
    record = true
    val t0 = System.nanoTime()
    sweep.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e6
    record = false
    Thread.sleep(150)
    println(f"sweep noop wall=$dt%.1f ms")
    agg.forEach((sid, a) =>
      println(f"  stage $sid%4d tasks=${a(0)}%3d run=${a(1)}%6d gc=${a(2)}%5d deser=${a(3)}%5d fetchWait=${a(4)}%5d cpu=${a(5)}%6d (ms)"))
    spark.stop()
  }
}
