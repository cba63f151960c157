import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object StreamProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.core.Tables.events(spark, dir).groupBy(col("user_id")).agg(count(lit(1))).count()
    def run(parts: Int, fmtVal: Boolean): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.stateStore.formatValidation.enabled", fmtVal)
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val src = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .withColumn("ts", graft.core.Tables.tsUsExpr(schema))
      val agg = graft.streaming.Streams.tumblingAgg(
        src, Seq("user_id"), "1 day", "0 seconds", "n" -> count(lit(1)))
      val name = "probe_" + System.nanoTime()
      val t0 = System.nanoTime()
      val q = agg.writeStream.queryName(name).format("memory")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
      val rows = spark.table(name).count()
      val dt = (System.nanoTime()-t0)/1e9
      spark.catalog.dropTempView(name)
      println(f"PROBE parts=$parts fmtVal=$fmtVal rows=$rows time=$dt%.3f")
      dt
    }
    run(4, true) // warm the streaming path itself
    for (_ <- 1 to 3) { run(4, true); run(2, true); run(1, true); run(4, false) }
    spark.stop()
  }
}
