package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: delta sequence of PageRank.runUntil on the
  * graph_pagerank graph at a given sfDir (picks epsQ for the conv query).
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val e0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select((col("l_partkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val n = edges.select("src").union(edges.select("dst")).distinct().count()
      println(s"== $dir nodes=$n base=${1000000000000L / n}")
      val (_, it) = graft.operators.PageRank.runUntil(edges, epsQ = 1L,
        maxIterations = 15,
        trace = (i, d) => println(s"  iter=$i maxDelta=$d"))
      println(s"  (capped at $it)")
    }
    spark.stop()
  }
}
