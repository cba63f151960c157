package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object SweepProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(body: => Any): Unit = {
      for (_ <- 1 to 3) body
      val runs = (1 to 5).map { _ =>
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
    val contribs = r0.join(broadcast(outdeg), "node")
      .select(col("node").as("src"), expr("rank_q div deg").as("contrib"))
      .localCheckpoint() // freeze: isolate the e-side stage

    t("a. scan cache agg sum(src)") { e.agg(sum("src")).head() }
    t("b. scan + groupBy(dst).count") { e.groupBy("dst").count().agg(sum("count")).head() }
    t("c. scan + BHJ probe + sum") {
      e.join(broadcast(contribs), "src").agg(sum("contrib")).head() }
    t("d. scan + BHJ + groupBy(dst).sum partial+final") {
      e.join(broadcast(contribs), "src")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
        .agg(sum("inflow")).head() }
    // same but from a NON-cached re-computed edge frame
    val eFresh = edges.repartition(col("src")).distinct()
    t("e. FRESH e scan+distinct+BHJ+agg") {
      eFresh.join(broadcast(contribs), "src")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
        .agg(sum("inflow")).head() }
    // cache with serialized OFF? try MEMORY_ONLY
    val e2 = edges.repartition(col("src")).distinct().persist(StorageLevel.MEMORY_ONLY)
    e2.count()
    t("f. MEMORY_ONLY e scan+BHJ+agg") {
      e2.join(broadcast(contribs), "src")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
        .agg(sum("inflow")).head() }
    spark.stop()
  }
}

object SweepProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    def t(label: String)(body: => Any): Unit = {
      for (_ <- 1 to 3) body
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6 }
      println(f"$label%-52s min=${runs.min}%8.1f ms runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = li.select((col("l_partkey") * 2).cast("long").as("src"),
      (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    // dst-partitioned edge cache
    val eD = edges.repartition(col("dst")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    eD.count()
    val nodes = eD.select(col("src").as("node")).union(eD.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val base = 1000000000000L / n
    val outdeg = eD.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    outdeg.count()
    val r0 = nodes.select(col("node"), lit(base).as("rank_q")).localCheckpoint()
    def sweepB = {
      val contribs = r0.join(outdeg, "node")
        .select(col("node").as("src"), expr("rank_q div deg").as("contrib"))
      val inflow = eD.join(broadcast(contribs), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("contrib")).as("inflow"))
      r0.select(col("node"), col("rank_q").as("prev_q"))
        .join(inflow, Seq("node"), "left")
        .select(col("node"), col("prev_q"),
          expr(s"(85L * coalesce(inflow, 0L) + 15L * ${base}L) div 100").as("rank_q"))
    }
    t("g. dst-part sweep noop") {
      sweepB.write.format("noop").mode("overwrite").save() }
    t("h. dst-part sweep lazy ckpt count") {
      sweepB.localCheckpoint(eager = false).count() }
    t("i. inflow only (dst-part, bcast)") {
      eD.join(broadcast(r0.join(outdeg, "node")
          .select(col("node").as("src"), expr("rank_q div deg").as("contrib"))), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("contrib")).as("inflow"))
        .agg(sum("inflow")).head() }
    println(sweepB.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate") || l.contains("Sort ")).mkString("\n"))
    spark.stop()
  }
}
