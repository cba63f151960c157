package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver bench contract: run the catalog on SPARK_GRAFT_SF_DIR, print ONE
  * JSON line with total + per-query seconds.
  *
  * Each query is executed twice: an untimed warmup (JVM/JIT + codegen
  * compilation) and a timed run. `clearCache()` between the runs drops any
  * DataFrame persisted inside the query, so the timed run recomputes the
  * full pipeline — steady-state cost, not cache replay.
  *
  * Handoff hardening (round-1 BENCH had `parsed: null` — the JSON line was
  * buried in sbt stdout): the JSON is ALSO written to `BENCH.json` in the
  * working directory and to `$SPARK_GRAFT_BENCH_OUT` if set, and printed
  * last after a sentinel-free flush. Failed queries are reported in a
  * `"failed"` map (name → error class) instead of being silently dropped.
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
    // optional args: bench only the named queries (debug aid; the driver
    // passes none and gets the full catalog)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    // Contention robustness (the r2 artifact was inflated 2-5× on its
    // heavy tail by a noisy neighbor): every streaming query (micro-batch
    // state-store commits are the most stall-sensitive work in the
    // catalog) and every query whose FIRST timed run exceeds 1.5 s runs
    // three timed reps and reports the MEDIAN — one hrtimer stall can't
    // blow the artifact. Cheap plan-dominated queries stay at one timed
    // run, so the adaptive repeats add seconds, not minutes.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        // cleanup between runs: drop query-internal persists AND temp
        // views — memory-sink tables (one per streaming run, nanoTime-
        // suffixed) hold their full results on the driver heap and are
        // never read again; 161 queries × repeats of accumulation
        // measurably slowed the late alphabet (stream_ewma: 5.2 s in
        // full-catalog context vs 2.7 s isolated) until dropped here
        def cleanup(): Unit = {
          spark.catalog.clearCache()
          spark.catalog.listTables().collect()
            .filter(_.isTemporary)
            .foreach(t => spark.catalog.dropTempView(t.name))
        }
        fn(spark, sfDir).count() // warmup: JIT + codegen
        cleanup()
        def timed(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          cleanup()
          dt
        }
        val first = timed()
        val runs =
          if (name.startsWith("stream_") || first > 1.5)
            first +: (1 to 2).map(_ => timed())
          else Seq(first)
        val median = runs.sorted.apply(runs.size / 2)
        (name, Right((median, runs)): Either[String, (Double, Seq[Double])])
      } catch {
        case e: Throwable =>
          spark.catalog.clearCache()
          (name, Left(e.getClass.getSimpleName): Either[String, (Double, Seq[Double])])
      }
    }
    val ok = results.collect { case (n, Right((d, _))) => n -> d }
    val failed = results.collect { case (n, Left(e)) => n -> e }
    val multi = results.collect { case (n, Right((_, rs))) if rs.size > 1 => n -> rs }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val rs = multi.map { case (k, v) => "\"" + k + "\":[" + v.mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"failed":$fs,"n_ok":${ok.size},"n_failed":${failed.size},"sf":"$sfDir"}"""
    if (args.isEmpty) Files.writeString(Paths.get("BENCH.json"), json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .foreach(p => Files.writeString(Paths.get(p), json))
    spark.stop()
    // last stdout line, after Spark's own shutdown logging is done
    System.out.flush()
    println(json)
    System.out.flush()
  }
}
