package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Empirical scaling curve for the core operators: synthesize keyed event
  * streams at growing row counts (seeded, deterministic — `spark.range`
  * plus hash-derived columns, no files), run each operator, print sec per
  * size. Near-linear growth is the measurable form of the SCALE.md
  * arguments (keyed partitioning ⇒ wall-clock tracks rows/partitions).
  *
  *   sbt -batch "runMain graft.tools.ScaleCurve 1000000 10000000"
  */
object ScaleCurve {

  private def events(spark: SparkSession, n: Long, keys: Int): DataFrame =
    spark.range(n).select(
      col("id").as("ts"),
      col("id").as("seq"),
      pmod(hash(col("id")), lit(keys)).cast("long").as("k"),
      (pmod(hash(col("id") * 7), lit(1000)) / lit(10.0)).as("v"))

  private def time(label: String, n: Long)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] $label%-18s n=$n%,12d rows_out=$rows%,12d  $sec%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (n <- sizes) {
      val e = events(spark, n, keys = 10000)
      time("tumbling_agg", n) {
        KStream(e, Seq("k")).group(Slice.Tumbling(86400L))
          .reduce("s" -> sum(col("v")), "c" -> count(lit(1))).count()
      }
      time("count_slices", n) {
        KStream(e, Seq("k")).group(Slice.Count(100))
          .reduce("s" -> sum(col("v"))).count()
      }
      time("asof_take", n) {
        val right = e.filter(col("seq") % 10 === 0)
          .select(col("k"), col("ts"), col("seq"), col("v").as("rv"))
        // consume the carried column — count() alone lets Catalyst prune
        // the as-of window entirely
        KStream(e, Seq("k"))
          .take(KStream(right, Seq("k")), Seq(col("k")), Seq("rv" -> col("rv")))
          .df.agg(count(col("rv"))).first().getLong(0)
      }
      time("exact_dedup", n) {
        e.withColumn("h", hash(col("v"), col("k")))
          .groupBy("h").agg(min(col("seq")).as("keep")).count()
      }
      time("distributed_scan", n) {
        EStream(e.drop("k")).foldAllAssoc(("run", col("v"), "sum"))
          .df.agg(count(col("run"))).first().getLong(0)
      }
    }
    spark.stop()
  }
}
