package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench: does a round-robin fan-out of the single-split tiny scan pay
  * for itself on the q3-shaped map side (BHJ probe + grouped partial agg)?
  */
object FanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.DataFrame
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def ord = spark.read.parquet(s"$sfDir/orders.parquet")
    def cust = spark.read.parquet(s"$sfDir/customer.parquet")

    def q3(fan: DataFrame => DataFrame): DataFrame = {
      val revenue = fan(li)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(38,6)")).cast("double").as("revenue"))
      revenue.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(10)
    }

    def t(label: String)(body: => Unit): Unit = {
      for (_ <- 1 to 3) body
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-34s min=${runs.min}%8.1f ms  runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }

    t("q3 as-is (1-task map)") { q3(identity).count() }
    t("q3 fan repartition(cpus)") { q3(_.repartition(spark.sparkContext.defaultParallelism)).count() }
    t("q3 fan repartition(8)") { q3(_.repartition(8)).count() }
    spark.stop()
  }
}
