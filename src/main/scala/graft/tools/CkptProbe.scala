package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Why does a per-sweep localCheckpoint cost ~1.3 s on a 21k-row frame? */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(body: => Long): Unit = {
      for (_ <- 1 to 2) body
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6 }
      println(f"$label%-52s min=${runs.min}%8.1f ms runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }
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
    t("sweep NOOP write (AQE, full compute)") {
      sweep.write.format("noop").mode("overwrite").save(); 0L }
    t("sweep agg-sum (AQE, full compute)") {
      sweep.agg(sum("rank_q")).head(); 0L }
    t("sweep.localCheckpoint(lazy).count()") { sweep.localCheckpoint(eager = false).count() }
    t("sweep.localCheckpoint(eager).count()") { sweep.localCheckpoint(eager = true).count() }
    t("sweep.coalesce(1).localCheckpoint(lazy).count()") { sweep.coalesce(1).localCheckpoint(eager = false).count() }
    t("sweep.persist+count (then unpersist)") {
      val p = sweep.persist(StorageLevel.MEMORY_AND_DISK)
      val c = p.count(); p.unpersist(); c
    }
    t("sweep.rdd.count()") { sweep.rdd.count() }
    t("sweep.collect->createDataFrame (driver bounce)") {
      val rows = sweep.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), sweep.schema).count()
    }
    spark.stop()
  }
}
