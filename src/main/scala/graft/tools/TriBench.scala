package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: graph_triangles' pair build — lineitem self-join on orderkey vs
  * groupBy(orderkey)+in-row pair expansion of the distinct part set.
  */
object TriBench {
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
      for (_ <- 1 to 2) body
      val runs = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6 }
      println(f"$label%-36s min=${runs.min}%8.1f ms runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def pairsJoin = {
      val l = li
      l.select(col("l_orderkey").as("ok"), col("l_partkey").as("u"))
        .join(l.select(col("l_orderkey").as("ok"), col("l_partkey").as("v")), "ok")
        .filter(col("u") < col("v"))
        .select("u", "v")
    }
    def pairsRow = {
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
            struct(x.as("u"), y.as("v")))))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
    }
    t("pairs self-join -> stats") { graft.operators.Triangles.stats(pairsJoin).collect() }
    t("pairs in-row    -> stats") { graft.operators.Triangles.stats(pairsRow).collect() }
    // equality check of the one-row stats
    val a = graft.operators.Triangles.stats(pairsJoin).collect().toSeq
    val b = graft.operators.Triangles.stats(pairsRow).collect().toSeq
    println(s"stats equal: ${a == b}\n  a=$a\n  b=$b")
    spark.stop()
  }
}
