package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B: spark.sql.adaptive.coalescePartitions.minPartitionSize 1m (default)
  * vs smaller — does raising post-shuffle parallelism on mid-weight
  * shuffles pay at sf0.1?
  */
object MinPartBench {
  def run(minSize: String, names: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", minSize)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (_ <- 1 to 3) { fn(spark, sfDir).count(); spark.catalog.clearCache() }
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e6
        spark.catalog.clearCache(); dt
      }
      println(f"min=$minSize $name%-26s min=${runs.min}%7.1f ms runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }
    spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val names = Seq("graph_triangles", "q3_top_customers", "doc_sparse_knn",
      "ev_approx_overlap", "q17_small_quantity", "dedup_ngram_jaccard", "ev_fold_all")
    run("1m", names)
    run("128k", names)
  }
}
