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

  /** Encode a real PNG in-memory (javax.imageio round trip). */
  private def png(w: Int, h: Int, rgbOf: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbOf(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("Codecs.decodeImage: REAL PNG decode through the extraction " +
    "pipeline (javax.imageio, no stub)") {
    import graft.multimodal.Codecs
    // 4x2: top row white, bottom row black → mean luma 127.5
    val blob = png(4, 2, (_, y) => if (y == 0) 0xffffff else 0x000000)
    val junk = "not an image".getBytes("UTF-8")
    val ds = spark.createDataset(Seq(
      MediaRow(1L, blob, MediaMeta("image", 4, 2, 0, 1)),
      MediaRow(2L, junk, MediaMeta("image", 0, 0, 0, 0))))
    val stats = Codecs.imageStats(ds).collect().sortBy(_.id)
    // junk blob drops instead of failing the task
    stats.map(_.id).toSeq shouldBe Seq(1L)
    stats.head.width shouldBe 4
    stats.head.height shouldBe 2
    stats.head.meanLuma shouldBe 127.5 // (255 + 0) / 2, Rec.601 integer
    // direct decode returns the actual pixels
    val Some((w, h, px)) = Codecs.decodeImage(blob)
    (w, h) shouldBe ((4, 2))
    (px(0) & 0xffffff) shouldBe 0xffffff
    (px(7) & 0xffffff) shouldBe 0x000000
  }

  test("Codecs.resizeImage: REAL bilinear resize, blob->blob through the " +
    "partition-batched pipeline") {
    import graft.multimodal.Codecs
    // 8x8 solid red downsampled to 2x2 stays solid red (interpolation of
    // a constant field is exact); junk drops
    val blob = png(8, 8, (_, _) => 0xff0000)
    val junk = "not an image".getBytes("UTF-8")
    val ds = spark.createDataset(Seq(
      MediaRow(1L, blob, MediaMeta("image", 8, 8, 0, 1)),
      MediaRow(2L, junk, MediaMeta("image", 0, 0, 0, 0))))
    val out = Codecs.resizeAll(ds, 2, 2).collect().sortBy(_.id)
    out.map(_.id).toSeq shouldBe Seq(1L)
    out.head.meta.width shouldBe 2
    val Some((w, h, px)) = Codecs.decodeImage(out.head.blob)
    (w, h) shouldBe ((2, 2))
    all(px.map(_ & 0xffffff).toSeq) shouldBe 0xff0000
  }

  /** Encode a real WAV in-memory (javax.sound round trip). */
  private def wav(samples: Array[Short], rateHz: Float): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * 2)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer().put(samples)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rateHz, 16, 1, 2, rateHz, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("Codecs.pcmToWav: lossless PCM16 round trip through the real codec") {
    import graft.multimodal.Codecs
    val samples = Array.tabulate[Short](500)(i => (((i * 37) % 3000) - 1500).toShort)
    Codecs.decodeAudio(Codecs.pcmToWav(samples, 8000f)).get.toSeq shouldBe samples.toSeq
  }

  test("Codecs video: GVID mux/demux round trip, stride sampling, REAL " +
    "per-frame PNG decode, junk tolerance") {
    import graft.multimodal.Codecs
    // 4 frames: solid gray levels 10, 20, 30, 40 → luma == level, sum = 64*level
    val frames = (1 to 4).map(k => png(8, 8, (_, _) => {
      val v = k * 10; (v << 16) | (v << 8) | v
    }))
    val blob = Codecs.packVideo(frames)
    Codecs.demuxVideo(blob).get.map(_.toSeq) shouldBe frames.map(_.toSeq)
    Codecs.demuxVideo("not a video".getBytes("UTF-8")) shouldBe None
    Codecs.demuxVideo(blob.dropRight(10)) shouldBe None
    val ds = spark.createDataset(Seq(
      MediaRow(7L, blob, MediaMeta("video", 8, 8, 0, 4)),
      MediaRow(8L, Array[Byte](1, 2, 3), MediaMeta("video", 0, 0, 0, 0))))
    val out = Codecs.videoFrameLuma(ds, 2).collect().sortBy(_.frameIdx)
    out.map(f => (f.id, f.frameIdx, f.lumaSum)).toSeq shouldBe
      Seq((7L, 0, 64L * 10), (7L, 2, 64L * 30))
  }

  test("Codecs MP4: ISO-BMFF mux/demux round trip, container sniff, " +
    "stride sampling through the same seam, junk tolerance") {
    import graft.multimodal.Codecs
    val frames = (1 to 4).map(k => png(8, 8, (_, _) => {
      val v = k * 10; (v << 16) | (v << 8) | v
    }))
    val blob = Codecs.packMp4(frames)
    // a real BMFF layout: starts with an ftyp box
    new String(blob.slice(4, 8), "ISO-8859-1") shouldBe "ftyp"
    Codecs.demuxMp4(blob).get.map(_.toSeq) shouldBe frames.map(_.toSeq)
    // demuxAny sniffs the container: same result for MP4 and GVID blobs
    Codecs.demuxAny(blob).get.map(_.toSeq) shouldBe frames.map(_.toSeq)
    Codecs.demuxAny(Codecs.packVideo(frames)).get.map(_.toSeq) shouldBe
      frames.map(_.toSeq)
    // junk tolerance: garbage, truncation (moov lost), corrupt stco
    Codecs.demuxMp4("utter garbage, definitely not a movie".getBytes) shouldBe None
    Codecs.demuxMp4(blob.dropRight(12)) shouldBe None
    Codecs.demuxMp4(blob.take(40)) shouldBe None
    val corrupted = blob.clone()
    // point every stco chunk offset past EOF: find 'stco', bump offset field
    val idx = corrupted.indexOfSlice("stco".getBytes("ISO-8859-1"))
    idx should be > 0
    java.nio.ByteBuffer.wrap(corrupted)
      .putInt(idx + 4 + 8, corrupted.length + 100)
    Codecs.demuxMp4(corrupted) shouldBe None
    // and the frame-sampling path accepts MP4 via the sniff
    val ds = spark.createDataset(Seq(
      MediaRow(7L, blob, MediaMeta("video", 8, 8, 0, 4)),
      MediaRow(8L, Array[Byte](1, 2, 3), MediaMeta("video", 0, 0, 0, 0))))
    val out = Codecs.videoFrameLuma(ds, 2).collect().sortBy(_.frameIdx)
    out.map(f => (f.id, f.frameIdx, f.lumaSum)).toSeq shouldBe
      Seq((7L, 0, 64L * 10), (7L, 2, 64L * 30))
  }

  test("Codecs.demuxMp4: general stbl walk handles multi-chunk, " +
    "multi-run sample layouts (not just packMp4's single chunk)") {
    import graft.multimodal.Codecs
    // hand-mux 5 samples into 3 chunks: stsc runs (chunk1: 2 spc),
    // (chunk2..3: varying tail) — layout [s0 s1][s2 s3][s4]
    val samples = (1 to 5).map(k => Array.tabulate[Byte](k + 2)(i => (k * 16 + i).toByte))
    def box(kind: String, payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(8 + payload.length); out.writeBytes(kind); out.write(payload)
      bos.toByteArray
    }
    def be32(vs: Int*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      vs.foreach(out.writeInt); bos.toByteArray
    }
    val ftyp = box("ftyp", be32(0x69736f6d, 0, 0x69736f6d))
    val mdatPayload = samples.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    val base = ftyp.length + 8
    val chunkStarts = Seq(
      base, // s0 s1
      base + samples(0).length + samples(1).length, // s2 s3
      base + samples.take(4).map(_.length).sum) // s4
    val stsz = box("stsz", be32(0 +: 0 +: 5 +: samples.map(_.length): _*))
    val stco = box("stco", be32(0 +: 3 +: chunkStarts.map(_.toInt): _*))
    val stsc = box("stsc", be32(0, 2, /*run1*/ 1, 2, 1, /*run2*/ 3, 1, 1))
    val stts = box("stts", be32(0, 1, 5, 1))
    val stsd = box("stsd", be32(0, 1) ++ box("gvid", be32(0, 0)))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    val blob = ftyp ++ mdat ++ moov
    Codecs.demuxMp4(blob).get.map(_.toSeq) shouldBe samples.map(_.toSeq)
  }

  test("Codecs.decodeAudio: REAL WAV decode through the extraction " +
    "pipeline (javax.sound, no stub)") {
    import graft.multimodal.Codecs
    // a 100-sample square wave at +/-1000
    val samples = Array.tabulate[Short](100)(i => if (i % 2 == 0) 1000 else -1000)
    val blob = wav(samples, 16000f)
    val junk = "not audio".getBytes("UTF-8")
    // direct decode round-trips the samples
    val Some(decoded) = Codecs.decodeAudio(blob)
    decoded.toSeq shouldBe samples.toSeq
    // pipeline: junk drops, stats are exact
    val ds = spark.createDataset(Seq(
      MediaRow(1L, blob, MediaMeta("audio", 0, 0, 16000, 0)),
      MediaRow(2L, junk, MediaMeta("audio", 0, 0, 0, 0))))
    val stats = Codecs.audioStats(ds).collect().sortBy(_.id)
    stats.map(_.id).toSeq shouldBe Seq(1L)
    stats.head.nSamples shouldBe 100L
    stats.head.meanAbs shouldBe 1000.0
  }

  test("Codecs.aHash + imageNearDups: re-encoded/noised image pairs with " +
    "the original; a different image does not") {
    import graft.multimodal.Codecs
    // 32×32 horizontal gradient; dup = same with a few noised pixels;
    // other = vertical gradient (different structure entirely)
    val base = png(32, 32, (x, _) => { val v = x * 8; v << 16 | v << 8 | v })
    val dup = png(32, 32, (x, y) => {
      val v = if ((x, y) == (5, 5) || (x, y) == (20, 11)) 255 else x * 8
      v << 16 | v << 8 | v
    })
    val other = png(32, 32, (_, y) => { val v = 255 - y * 8; v << 16 | v << 8 | v })
    val junk = "not an image".getBytes("UTF-8")

    val Some(hBase) = Codecs.aHash(base)
    val Some(hDup) = Codecs.aHash(dup)
    val Some(hOther) = Codecs.aHash(other)
    java.lang.Long.bitCount(hBase ^ hDup) should be <= 3
    java.lang.Long.bitCount(hBase ^ hOther) should be > 3

    val ds = spark.createDataset(Seq(
      MediaRow(1L, base, MediaMeta("image", 32, 32, 0, 1)),
      MediaRow(2L, dup, MediaMeta("image", 32, 32, 0, 1)),
      MediaRow(3L, other, MediaMeta("image", 32, 32, 0, 1)),
      MediaRow(4L, junk, MediaMeta("image", 0, 0, 0, 0)))).repartition(3)
    val pairs = Codecs.imageNearDups(ds, maxDist = 3)
      .as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  test("Codecs.audioFingerprint + audioNearDups: a noised copy pairs with " +
    "the original; a different envelope does not") {
    import graft.multimodal.Codecs
    val rnd = new scala.util.Random(11)
    // amplitude-modulated tone: the energy-delta fingerprint tracks the
    // per-frame envelope; dup = same plus small noise; other = reversed
    // envelope (deltas flip sign)
    def tone(rev: Boolean, noise: Int): Array[Short] =
      Array.tabulate[Short](6500) { i =>
        val fr = i / 100 // frame index at 65 frames
        val env = if (rev) 65 - fr else fr + 1
        val s = (if (i % 2 == 0) 1 else -1) * env * 400
        (s + (if (noise > 0) rnd.nextInt(2 * noise) - noise else 0)).toShort
      }
    val base = wav(tone(rev = false, 0), 16000f)
    val dup = wav(tone(rev = false, 40), 16000f)
    val other = wav(tone(rev = true, 0), 16000f)
    val junk = "still not audio".getBytes("UTF-8")

    val Some(fBase) = Codecs.audioFingerprint(base)
    val Some(fDup) = Codecs.audioFingerprint(dup)
    val Some(fOther) = Codecs.audioFingerprint(other)
    java.lang.Long.bitCount(fBase ^ fDup) should be <= 3
    java.lang.Long.bitCount(fBase ^ fOther) should be > 3

    val ds = spark.createDataset(Seq(
      MediaRow(1L, base, MediaMeta("audio", 0, 0, 16000, 0)),
      MediaRow(2L, dup, MediaMeta("audio", 0, 0, 16000, 0)),
      MediaRow(3L, other, MediaMeta("audio", 0, 0, 16000, 0)),
      MediaRow(4L, junk, MediaMeta("audio", 0, 0, 0, 0)))).repartition(3)
    val pairs = Codecs.audioNearDups(ds, maxDist = 3)
      .as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }
}
