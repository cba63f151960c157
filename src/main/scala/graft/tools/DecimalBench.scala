package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench for the r15 optimization round: cost of decimal(38,6)
  * aggregation (Q.dsumD's accumulator) vs long-micros and double sums over
  * the sf lineitem. Decides whether the exact-sum hot path is worth a
  * quantized-integer rewrite (verify gotcha: floor(x*1e6+0.5) is the
  * bit-stable cross-engine quantization).
  */
object DecimalBench {
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
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .localCheckpoint() // isolate agg cost from scan cost

    def t(label: String)(body: => Unit): Unit = {
      for (_ <- 1 to 3) body
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-40s min=${runs.min}%8.1f ms  runs=${runs.map(r => f"$r%.0f").mkString(",")}")
    }

    val x = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t("global sum(double)") { li.agg(sum(x)).head() }
    t("global sum(decimal(38,6))") { li.agg(sum(x.cast("decimal(38,6)"))).head() }
    t("global sum(decimal(18,6))") { li.agg(sum(x.cast("decimal(18,6)"))).head() }
    t("global sum(long-micros)") { li.agg(sum(floor(x * 1000000L + 0.5).cast("long"))).head() }
    t("groupBy(orderkey) sum(double)") { li.groupBy("l_orderkey").agg(sum(x)).count() }
    t("groupBy(orderkey) sum(dec38)") { li.groupBy("l_orderkey").agg(sum(x.cast("decimal(38,6)"))).count() }
    t("groupBy(orderkey) sum(dec18)") { li.groupBy("l_orderkey").agg(sum(x.cast("decimal(18,6)"))).count() }
    t("groupBy(orderkey) sum(long-micros)") { li.groupBy("l_orderkey").agg(sum(floor(x * 1000000L + 0.5).cast("long"))).count() }
    t("scan-only count") { li.count() }
    spark.stop()
  }
}
