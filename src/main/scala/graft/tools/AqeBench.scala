package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure AQE's per-query driver overhead on tiny catalog queries: run the
  * same queries with adaptive execution on and off (two sessions).
  */
object AqeBench {
  def run(adaptive: Boolean, names: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", adaptive.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (_ <- 1 to 4) { fn(spark, sfDir).count(); spark.catalog.clearCache() }
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e6
        spark.catalog.clearCache(); dt
      }
      println(f"aqe=$adaptive $name%-26s min=${runs.min}%7.1f ms runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("cust_semi_anti", "ev_fold_all", "ev_slice_count", "q13_cust_dist",
        "ord_snapshot_diff", "q3_top_customers", "li_topk_parts", "doc_bigram_lift")
    run(adaptive = true, names)
    run(adaptive = false, names)
  }
}
