package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Decompose one PageRank sweep at sf0.1: plan + wall of each sub-join. */
object PrProbe {
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
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e6}%8.1f ms  (n=$n)")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = li.select((col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))

    t("setup: repartition+distinct+persist+count") {
      val e = edges.select("src", "dst").repartition(col("src")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
    }
    val e = edges.select("src", "dst").repartition(col("src")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    t("nodes distinct+persist+count") {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      nodes.count()
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val base = 1000000000000L / n
    val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("outdeg persist+count") { outdeg.count() }
    val r0 = nodes.select(col("node"), lit(base).as("rank_q")).localCheckpoint()
    t("r0 count") { r0.count() }

    val contribs = r0.join(outdeg, "node")
      .select(col("node").as("src"), expr("rank_q div deg").as("contrib"))
    t("contribs alone (count)") { contribs.count() }
    val inflow = e.join(contribs, "src")
      .groupBy(col("dst").as("node")).agg(sum(col("contrib")).as("inflow"))
    t("inflow (e join contribs + agg)") { inflow.count() }
    val upd = r0.select(col("node"), col("rank_q").as("prev_q"))
      .join(inflow, Seq("node"), "left")
      .select(col("node"), col("prev_q"),
        expr(s"(85L * coalesce(inflow, 0L) + 15L * ${base}L) div 100").as("rank_q"))
    t("full sweep no checkpoint (count)") { upd.count() }
    t("full sweep + lazy localCheckpoint (count)") {
      upd.localCheckpoint(eager = false).count()
    }
    // broadcast variant
    val contribsB = r0.join(broadcast(outdeg), "node")
      .select(col("node").as("src"), expr("rank_q div deg").as("contrib"))
    val inflowB = e.join(broadcast(contribsB), "src")
      .groupBy(col("dst").as("node")).agg(sum(col("contrib")).as("inflow"))
    val updB = r0.select(col("node"), col("rank_q").as("prev_q"))
      .join(broadcast(inflowB), Seq("node"), "left")
      .select(col("node"), col("prev_q"),
        expr(s"(85L * coalesce(inflow, 0L) + 15L * ${base}L) div 100").as("rank_q"))
    t("bcast sweep no checkpoint (count)") { updB.count() }
    t("bcast sweep + lazy localCheckpoint (count)") {
      updB.localCheckpoint(eager = false).count()
    }
    println("=== sweep plan (current) ===")
    println(upd.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Sort") ||
      l.contains("Aggregate") || l.contains("Scan")).mkString("\n"))
    println("=== sweep plan (broadcast) ===")
    println(updB.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Sort") ||
      l.contains("Aggregate") || l.contains("Scan")).mkString("\n"))
    spark.stop()
  }
}
