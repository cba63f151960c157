package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.file.{Files, Paths}

/** Commit the PageRank per-sweep plan evidence for r15: the pre-r15
  * src-partitioned exchange sweep vs the r15 small-graph broadcast sweep
  * (plans/r15/graph_pagerank_sweep_{before,after}.txt). The loop itself
  * checkpoints per sweep, so PlanDump on the catalog query cannot show the
  * sweep interior — this rebuilds both shapes exactly as PageRank.loop
  * does and explains one sweep of each.
  */
object SweepPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = li.select((col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    Files.createDirectories(Paths.get("plans/r15"))

    def sweepPlan(partKey: String, bcast: Boolean, out: String): Unit = {
      val e = edges.select("src", "dst")
        .repartition(col(partKey)).distinct().persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val n = nodes.count()
      val base = 1000000000000L / n
      val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val r0 = nodes.select(col("node"), lit(base).as("rank_q")).localCheckpoint()
      val contribs0 = r0.join(outdeg, "node")
        .select(col("node").as("src"), expr("rank_q div deg").as("contrib"))
      val contribs = if (bcast) broadcast(contribs0) else contribs0
      val inflow0 = e.join(contribs, "src")
        .groupBy(col("dst").as("node")).agg(sum(col("contrib")).as("inflow"))
      val inflow = if (bcast) broadcast(inflow0) else inflow0
      val upd = r0.select(col("node"), col("rank_q").as("prev_q"))
        .join(inflow, Seq("node"), "left")
        .select(col("node"), col("prev_q"),
          expr(s"(85L * coalesce(inflow, 0L) + 15L * ${base}L) div 100").as("rank_q"))
      val txt = upd.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r15/$out"), txt)
      println(s"wrote plans/r15/$out (${txt.length} chars)")
      e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    }
    sweepPlan("src", bcast = false, "graph_pagerank_sweep_before.txt")
    sweepPlan("dst", bcast = true, "graph_pagerank_sweep_after.txt")
    spark.stop()
  }
}
