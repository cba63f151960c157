package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-window decomposition of q9_product_profit's cost (VERDICT r11 #5:
  * 2.06 vs 1.45 s = 1.42× at sf1, the only TPC-H shape above 1.3× at 10×).
  * Variants isolate the suspected costs — the decimal(38,0) exact
  * accumulator vs a plain long sum, and the double lineitem scan (the ps
  * min-cost subquery re-reads lineitem) — so the named cause in
  * BASELINE.md is measured, not guessed. Each variant runs 3× warm on the
  * same session; compare WITHIN a run, never across host windows (q5's
  * byte-identical-plan 2× window swings, r11).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_fixture \
  *     sbt -batch "runMain graft.tools.Q9Probe"
  */
object Q9Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[q9] $name run=$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.3f")
      }

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def prt = spark.read.parquet(s"$sfDir/part.parquet")
    def supp = spark.read.parquet(s"$sfDir/supplier.parquet")
    def nat = spark.read.parquet(s"$sfDir/nation.parquet")
    def ord = spark.read.parquet(s"$sfDir/orders.parquet")

    def base(agg: DataFrame => DataFrame): Long = {
      val redParts = broadcast(prt.filter(col("p_name").like("%red%"))
        .select("p_partkey"))
      val liRed = li.join(redParts, col("l_partkey") === col("p_partkey"))
      val ps = liRed
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit"))
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(min("unit").as("ps_cost"))
      agg(liRed
        .join(ps, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))).count()
    }
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("ps_cost") * col("l_quantity")

    t("current_decimal38") {
      base(_.groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(floor(profit * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
          .cast("double") / lit(1e6)).as("profit")))
    }
    t("long_sum") {
      base(_.groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(floor(profit * lit(1e6) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e6)).as("profit")))
    }
    t("double_sum") {
      base(_.groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(profit) ).as("profit")))
    }
    t("two_long_split") {
      // m = floored micro-units (exact integer double < 2^53); split into
      // hi = floor(m/1e9), lo = m - hi*1e9 ∈ [0,1e9) — both exact, both
      // long-summable with ~9e9-rows-per-group headroom; recombine in ONE
      // deterministic IEEE chain
      val m = floor(profit * lit(1e6) + lit(0.5))
      val hi = floor(m / lit(1e9))
      val lo = m - hi * lit(1e9)
      base(_.groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(((sum(hi.cast("long")).cast("double") * lit(1e9) +
          sum(lo.cast("long")).cast("double")) / lit(1e6)).as("profit")))
    }
    t("no_agg_count_only") {
      base(df => df.select(col("n_name")))
    }
    spark.stop()
  }
}
