package graft

import org.apache.spark.sql.SparkSession

/** Driver bench contract: run the catalog on SPARK_GRAFT_SF_DIR, print ONE
  * JSON line with total + per-query seconds.
  *
  * Each query is executed twice: an untimed warmup (JVM/JIT + codegen
  * compilation) and a timed run. `clearCache()` between the runs drops any
  * DataFrame persisted inside the query, so the timed run recomputes the
  * full pipeline — steady-state cost, not cache replay.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warmup: JIT + codegen
        spark.catalog.clearCache() // drop query-internal persists
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> dt
      } catch { case _: Throwable => name -> -1.0 }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
