package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing: binary columns flow through partition-batched
  * extraction/sampling with deterministic results and no shuffle.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def rows: Seq[MediaRow] = Seq(
    MediaRow(1L, "hello world".getBytes("UTF-8"), MediaMeta("image", 4, 3, 0, 1)),
    MediaRow(2L, Array.tabulate[Byte](256)(_.toByte), MediaMeta("audio", 0, 0, 16000, 0)),
    MediaRow(3L, Array.emptyByteArray, MediaMeta("video", 0, 0, 0, 0)))

  test("extractFeatures: histogram + fingerprint are deterministic and partition-independent") {
    val ds = spark.createDataset(rows).repartition(3)
    val feats = Multimodal.extractFeatures(ds).collect().sortBy(_.id)
    feats.map(_.nBytes).toSeq shouldBe Seq(11L, 256L, 0L)
    // 256-byte ramp → exactly 16 bytes per coarse bin
    feats(1).histo.toSeq shouldBe Seq.fill(16)(16L)
    feats(0).fingerprint shouldBe Multimodal.fnv64("hello world".getBytes("UTF-8"))
    // empty blob is handled, not crashed
    feats(2).histo.sum shouldBe 0L
  }

  test("sampleFrames: fixed-size chunks, every Nth kept") {
    val ds = spark.createDataset(rows.filter(_.id == 2L))
    val frames = Multimodal.sampleFrames(ds, frameBytes = 32, stride = 2)
      .collect().sortBy(_.frameIdx)
    // 256/32 = 8 frames, stride 2 → indices 0,2,4,6
    frames.map(_.frameIdx).toSeq shouldBe Seq(0, 2, 4, 6)
    frames.foreach(_.bytes.length shouldBe 32)
    frames.head.bytes.head shouldBe 0.toByte
    frames(1).bytes.head shouldBe 64.toByte
  }

  test("downsample keeps every k-th byte and updates meta") {
    val ds = spark.createDataset(rows.filter(_.id == 2L))
    val out = Multimodal.downsample(ds, 4).collect().head
    out.blob.length shouldBe 64
    out.blob(1) shouldBe 4.toByte
    out.meta.nFrames shouldBe 64
  }
}
