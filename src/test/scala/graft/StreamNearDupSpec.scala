package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.streaming.{BandDoc, StreamNearDup}

/** Cross-batch contract for the streaming near-dup operator: the driver
  * query (`stream_neardup_minhash`) runs the whole corpus through ONE
  * micro-batch, so this spec pins the part it can't see — a duplicate
  * arriving in a LATER batch must still pair against the bucket history
  * held in state.
  */
class StreamNearDupSpec extends SparkSpec {

  test("near-dup pairs across micro-batch boundaries via bucket state") {
    val s = spark
    import s.implicits._

    val sigA = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val sigB = Seq(1L, 2L, 3L, 4L, 5L, 6L, 99L, 98L) // 6/8 agree → pair
    val sigC = Seq(9L, 9L, 9L, 9L, 9L, 9L, 9L, 9L) // different bucket
    // batch 1: originals; batch 2: the near-dup + an unrelated doc
    val b1 = Seq(BandDoc(0, 77L, 10L, sigA), BandDoc(0, 55L, 30L, sigC))
    val b2 = Seq(BandDoc(0, 77L, 20L, sigB), BandDoc(0, 55L, 40L, sigB))

    val root = Files.createTempDirectory("graft_nd_spec_").toString
    val srcDir = s"$root/src"
    Files.createDirectories(Paths.get(srcDir))
    b1.toDS().coalesce(1).write.parquet(s"$root/h1")
    def feed(half: String): Unit =
      Files.list(Paths.get(s"$root/$half")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => Files.copy(p,
          Paths.get(srcDir, half + "_" + p.getFileName.toString)))
    feed("h1")

    val in = s.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[BandDoc]].schema)
      .parquet(srcDir).as[BandDoc]
    val name = "nd_spec_" + System.nanoTime()
    val q = StreamNearDup(in, 6)
      .writeStream.queryName(name).format("memory").outputMode("append").start()
    try {
      q.processAllAvailable()
      s.table(name).count() shouldBe 0 // batch 1: originals only, no pairs
      b2.toDS().coalesce(1).write.parquet(s"$root/h2")
      feed("h2")
      graft.queries.StreamHarness.settle(q)
      // doc 20 pairs with doc 10 (bucket 77, 6/8 components agree); doc 40
      // lands in bucket 55 but shares only 0/8 components with doc 30.
      val pairs = s.table(name).as[graft.streaming.NearDupPair].collect()
      pairs.map(p => (p.idA, p.idB, p.nEq)).toSeq shouldBe Seq((10L, 20L, 6))
    } finally q.stop()

    Files.walk(Paths.get(root)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }

  test("bucket history is FIFO-capped at maxPerBucket (state stays bounded)") {
    val s = spark
    import s.implicits._

    val sig = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L) // identical sigs: all pair
    // one bucket, three arrivals in docId order; cap = 1 history entry
    val docs = Seq(
      BandDoc(0, 77L, 10L, sig),
      BandDoc(0, 77L, 20L, sig),
      BandDoc(0, 77L, 30L, sig))

    val root = Files.createTempDirectory("graft_nd_cap_").toString
    docs.toDS().coalesce(1).write.parquet(s"$root/src")
    val in = s.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[BandDoc]].schema)
      .parquet(s"$root/src").as[BandDoc]
    val name = "nd_cap_" + System.nanoTime()
    val q = StreamNearDup(in, 6, maxPerBucket = 1)
      .writeStream.queryName(name).format("memory").outputMode("append").start()
    try {
      q.processAllAvailable()
      // doc 20 pairs with doc 10; doc 10 then evicts (cap 1), so doc 30
      // pairs ONLY with doc 20 — an uncapped history would also emit
      // (10, 30). Total state never exceeds one signature per bucket.
      val pairs = s.table(name).as[graft.streaming.NearDupPair].collect()
        .map(p => (p.idA, p.idB)).toSeq.sorted
      pairs shouldBe Seq((10L, 20L), (20L, 30L))
    } finally q.stop()

    Files.walk(Paths.get(root)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }
}
