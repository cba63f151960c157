package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement aid for the r15 optimization round (guide §1): decompose a
  * tiny catalog query's wall into (construct, plan, execute), with a
  * scheduler listener counting jobs/stages/tasks and summing task time, so
  * the per-query floor can be attacked empirically instead of by guess.
  *
  *   FLOOR_WARM=5 FLOOR_REPS=3 sbt "runMain graft.tools.FloorProbe q3_top_customers"
  */
object FloorProbe {

  private final class Counters extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0) }
    def line: String =
      f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%4d taskMs=${taskMs.get}%6d"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "3600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = new Counters
    spark.sparkContext.addSparkListener(c)

    def ms[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e6)
    }

    val warm = sys.env.getOrElse("FLOOR_WARM", "4").toInt
    val reps = sys.env.getOrElse("FLOOR_REPS", "3").toInt

    // context baselines, to steady state
    for (_ <- 1 to 8) {
      spark.range(1000).count()
      spark.range(1000).groupBy(org.apache.spark.sql.functions.col("id") % 7).count().count()
    }
    for (i <- 1 to 3) {
      val (_, tRange) = ms(spark.range(1000).count())
      val (_, tShuf) = ms(spark.range(1000)
        .groupBy(org.apache.spark.sql.functions.col("id") % 7).count().count())
      val (_, tSchema) = ms(spark.read.parquet(s"$sfDir/events.parquet").schema)
      println(f"baseline[$i]: range-count=$tRange%.1f  range-shuffle=$tShuf%.1f  schema=$tSchema%.1f  (ms)")
    }

    args.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: not in catalog")
        case Some(fn) =>
          for (_ <- 1 to warm) { fn(spark, sfDir).count(); spark.catalog.clearCache() }
          for (i <- 1 to reps) {
            val (df, tc) = ms(fn(spark, sfDir))
            val (_, tp) = ms(df.queryExecution.executedPlan)
            c.reset()
            val (_, te) = ms(df.count())
            // listener events are posted async; give the bus a beat to drain
            Thread.sleep(50)
            println(f"$name%-26s rep$i construct=$tc%7.1f plan=$tp%6.1f exec=$te%7.1f  ${c.line}")
            spark.catalog.clearCache()
          }
      }
    }
    spark.stop()
  }
}
