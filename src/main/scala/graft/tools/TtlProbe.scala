// Scratch probe for the stream_clean_corpus_ttl sf1 divergence: run the
// TTL stream on a fixture dir and dump the RAW emitted rows (pre-rollup)
// to parquet for a driver-side diff against the oracle's closed form.
// Run: sbt -batch -error "runMain graft.tools.TtlProbe <sfDir> <outDir>"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{Q, StreamHarness, StreamFixtures, TtlGate}

object TtlProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    StreamHarness.withShufflePartitions(s, StreamHarness.StreamPartitions) {
      import s.implicits._
      val fx = StreamFixtures.docsTtlBatches(s, dir)
      val schema = StreamFixtures.docsTtlBatchesSchema(s, dir)
      val root = StreamFixtures.scratchDir("graft_ttlprobe_")
      val srcDir = s"$root/src"
      StreamFixtures.feed(fx, "b1", srcDir)
      val src = s.readStream.schema(schema).parquet(srcDir)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .filter(col("n_tokens") >= 20 && col("n_tokens") <= 1000)
        .select(Q.hash60(col("text")).as("h"), col("doc_id").as("ord"),
          col("lang"), col("n_tokens").cast("long").as("nTokens"),
          col("ts"))
        .as[graft.streaming.TsKeyedDoc]
      val name = "ttl_probe_" + System.nanoTime()
      val q = graft.streaming.KeepFirst.withTtl(src, TtlGate.TtlMs)
        .writeStream.queryName(name).format("memory")
        .outputMode("append").start()
      def batches(): Unit =
        println("[probe] progress: " + Option(q.lastProgress).map(p =>
          s"batch=${p.batchId} wm=${p.eventTime.get("watermark")} rows=${p.numInputRows}").getOrElse("none"))
      try {
        q.processAllAvailable(); batches()
        StreamFixtures.feed(fx, "b2", srcDir)
        StreamHarness.settle(q); batches()
        StreamFixtures.feed(fx, "b3", srcDir)
        StreamHarness.settle(q); batches()
        StreamFixtures.feed(fx, "b4", srcDir)
        StreamHarness.settle(q); batches()
      } finally q.stop()
      s.table(name).write.mode("overwrite").parquet(out)
      StreamFixtures.deleteRecursively(root)
    }
    s.stop()
  }
}
