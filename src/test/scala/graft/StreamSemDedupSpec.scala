package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.streaming.{CellVec, SemDupPair, StreamSemDedup}

/** Cross-batch contract for streaming semantic dedup: the driver query
  * (`stream_semdedup`) runs the corpus through ONE micro-batch, so this
  * spec pins what it can't see — a semantic near-dup arriving in a LATER
  * batch pairs against the cell history in state, cross-cell vectors are
  * never compared, and the per-cell history is FIFO-capped.
  */
class StreamSemDedupSpec extends SparkSpec {

  private def vec(xs: Double*): Seq[Double] = xs

  private def n2(v: Seq[Double]): Double = v.map(x => x * x).sum

  private def cv(cell: Long, id: Long, v: Seq[Double]): CellVec =
    CellVec(cell, id, v, n2(v))

  test("semantic pairs across micro-batch boundaries via cell state; " +
    "cross-cell twins never compared") {
    val s = spark
    import s.implicits._

    val a = vec(1.0, 0.02, 0, 0)
    val aDup = vec(1.0, 0.021, 0, 0) // cosine ~0.9999 to a
    val far = vec(0, 1.0, 0, 0) // same cell, low cosine
    // batch 1: original + far member (cell 0), one vector in cell 1;
    // batch 2: the near-dup of `a` in cell 0, and an IDENTICAL copy of
    // `a` placed in cell 1 — same values, different cell → no pair
    val b1 = Seq(cv(0, 10, a), cv(0, 12, far), cv(1, 20, vec(0, 0, 1.0, 0)))
    val b2 = Seq(cv(0, 11, aDup), cv(1, 21, a))

    val root = Files.createTempDirectory("graft_sd_spec_").toString
    val srcDir = s"$root/src"
    Files.createDirectories(Paths.get(srcDir))
    def feed(half: String, rows: Seq[CellVec]): Unit = {
      rows.toDS().coalesce(1).write.parquet(s"$root/$half")
      Files.list(Paths.get(s"$root/$half")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => Files.copy(p,
          Paths.get(srcDir, half + "_" + p.getFileName.toString)))
    }
    feed("h1", b1)

    val in = s.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[CellVec]].schema)
      .parquet(srcDir).as[CellVec]
    val name = "sd_spec_" + System.nanoTime()
    val q = StreamSemDedup(in, theta = 0.99)
      .writeStream.queryName(name).format("memory").outputMode("append").start()
    try {
      q.processAllAvailable()
      s.table(name).count() shouldBe 0 // no near-dups within batch 1
      feed("h2", b2)
      graft.queries.StreamHarness.settle(q)
      val pairs = s.table(name).as[SemDupPair].collect()
        .map(p => (p.idA, p.idB)).toSeq
      // 11 pairs with 10 (same cell, cos >= 0.99); 21 is IDENTICAL to 10
      // but sits in cell 1 → never compared (the cell bound)
      pairs shouldBe Seq((10L, 11L))
    } finally q.stop()

    Files.walk(Paths.get(root)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }

  test("codebook sizing law: cells = max(8, n/256) bounds expected " +
    "occupancy at 256 and stays under the FIFO cap") {
    import StreamSemDedup.{codebookCells, DefaultMaxPerCell, TargetOccupancy}
    codebookCells(0L) shouldBe 8L
    codebookCells(500L) shouldBe 8L // sf0.001/sf0.01 corpora: the r7 constant
    codebookCells(2000L) shouldBe 8L // sf0.1
    codebookCells(20000L) shouldBe 78L // sf1-equivalent: the r8 divergence fix
    val sweep = Seq(1L, 2048L, 20000L, 1000000L, 1000000000L)
    sweep.foreach { n =>
      val k = codebookCells(n)
      // the law: expected occupancy n/k never exceeds ~2× the target
      // (the max(8,·) floor only ever LOWERS occupancy past n=2048)
      assert(n.toDouble / k <= 2 * TargetOccupancy,
        s"occupancy ${n.toDouble / k} for n=$n exceeds bound")
      // a well-sized codebook keeps mean occupancy far below the FIFO
      // cap, so the bounded state is a backstop, not a truncation
      assert(TargetOccupancy * 2 < DefaultMaxPerCell)
    }
    // monotone non-decreasing in n
    sweep.sliding(2).foreach { case Seq(a, b) =>
      assert(codebookCells(a) <= codebookCells(b))
    }
  }

  test("cell history is FIFO-capped at maxPerCell (state stays bounded)") {
    val s = spark
    import s.implicits._

    // cap 2: after ids 1,2,3 arrive (one batch, ascending order), state
    // holds {2,3}; a batch-2 twin of id 1 must NOT pair with the evicted
    // id 1 but DOES pair with 2 and 3 (all four vectors are near-dups)
    val base = vec(1.0, 0.01, 0, 0)
    def tweak(eps: Double) = vec(1.0, 0.01 + eps, 0, 0)
    val b1 = Seq(cv(0, 1, base), cv(0, 2, tweak(0.001)), cv(0, 3, tweak(0.002)))
    val b2 = Seq(cv(0, 4, tweak(0.0005)))

    val root = Files.createTempDirectory("graft_sd_cap_").toString
    val srcDir = s"$root/src"
    Files.createDirectories(Paths.get(srcDir))
    def feed(half: String, rows: Seq[CellVec]): Unit = {
      rows.toDS().coalesce(1).write.parquet(s"$root/$half")
      Files.list(Paths.get(s"$root/$half")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => Files.copy(p,
          Paths.get(srcDir, half + "_" + p.getFileName.toString)))
    }
    feed("h1", b1)

    val in = s.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[CellVec]].schema)
      .parquet(srcDir).as[CellVec]
    val name = "sd_cap_" + System.nanoTime()
    val q = StreamSemDedup(in, theta = 0.99, maxPerCell = 2)
      .writeStream.queryName(name).format("memory").outputMode("append").start()
    try {
      q.processAllAvailable()
      feed("h2", b2)
      graft.queries.StreamHarness.settle(q)
      val later = s.table(name).as[SemDupPair].collect()
        .filter(p => p.idA == 4L || p.idB == 4L).map(p => (p.idA, p.idB)).toSet
      // id 1 was evicted by the cap before batch 2 → only 2 and 3 pair
      later shouldBe Set((2L, 4L), (3L, 4L))
    } finally q.stop()

    Files.walk(Paths.get(root)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }
}
