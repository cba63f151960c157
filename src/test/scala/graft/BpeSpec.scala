package graft

import graft.operators.BPE

/** Law: the distributed BPE trainer equals a plain single-node reference
  * implementation of the classic Sennrich merge loop (argmax pair by
  * count desc then pair asc; greedy non-overlapping left-to-right merge)
  * on every corpus, including adversarial repeated-symbol words where the
  * greedy/overlap distinction actually bites.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Single-node reference trainer over (word, freq). */
  private def refTrain(words: Map[String, Long], rounds: Int): Seq[BPE.Merge] = {
    var segs: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[BPE.Merge]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- segs; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x + " " + y) }
        out += BPE.Merge(r, s"$a $b", n)
        segs = segs.map { case (syms, wn) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2 // greedy: merged symbol not rescanned
            } else { merged += syms(i); i += 1 }
          }
          (merged.result(), wn)
        }
      }
    }
    out.result()
  }

  private def law(words: Map[String, Long], rounds: Int): Unit = {
    val df = words.toSeq.toDF("w", "wn")
    BPE.train(df, rounds) shouldBe refTrain(words, rounds)
  }

  test("matches reference on a small natural corpus") {
    law(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L,
      "lowest" -> 4L, "wider" -> 2L, "new" -> 7L), rounds = 10)
  }

  test("matches reference on repeated-symbol words (greedy overlap cases)") {
    // 'aaaa', 'aaa' exercise non-overlapping left-to-right semantics:
    // merging (a,a) on 'aaa' must give [aa, a], not [aa, aa]
    law(Map("aaaa" -> 9L, "aaa" -> 5L, "aa" -> 3L, "abab" -> 4L,
      "ababab" -> 2L, "bbbb" -> 6L), rounds = 6)
  }

  test("matches reference on a pseudo-random corpus") {
    // deterministic pseudo-random words over a 3-letter alphabet: small
    // alphabet forces deep merge chains (multi-char symbols re-merging)
    val rnd = new scala.util.Random(42)
    val words = (1 to 60).map { _ =>
      val len = 2 + rnd.nextInt(7)
      val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      w
    }.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    law(words, rounds = 12)
  }

  test("stops cleanly when no pairs remain") {
    // single-char words: zero pairs, zero merges, no crash
    law(Map("a" -> 3L, "b" -> 2L), rounds = 4)
  }

  test("matches reference at production round counts (512 merges, 2k vocab)") {
    // the merge-count dimension: 2000 distinct pseudo-random words over a
    // 6-letter alphabet sustain hundreds of merges; the incremental
    // driver-side trainer must equal the O(rounds × vocab) reference loop
    // rule for rule (rank, pair, AND selection-time count) all the way out
    val rnd = new scala.util.Random(1234)
    val words = (1 to 2000).map { _ =>
      val len = 3 + rnd.nextInt(10)
      (1 to len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    }.groupBy(identity).map { case (w, g) => w -> (g.size.toLong * 3) }
    val df = words.toSeq.toDF("w", "wn")
    val got = BPE.train(df, rounds = 512)
    val want = refTrain(words, rounds = 512)
    got.size shouldBe want.size
    got.size should be >= 256 // the regime actually exercised, not vacuous
    got shouldBe want
  }

  /** Single-node reference ENCODER: apply merges in rank order, each
    * greedily non-overlapping left-to-right (the Sennrich apply_bpe
    * order — identical greedy step as the trainer's merge). */
  private def refEncode(w: String, merges: Seq[BPE.Merge]): Vector[String] = {
    var syms = w.map(_.toString).toVector
    for (m <- merges.sortBy(_.rank)) {
      val Array(a, b) = m.pair.split(" ", 2)
      val merged = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
          merged += a + b; i += 2
        } else { merged += syms(i); i += 1 }
      }
      syms = merged.result()
    }
    syms
  }

  private def encodeLaw(words: Map[String, Long], rounds: Int): Unit = {
    val df = words.toSeq.toDF("w", "wn")
    val merges = BPE.train(df, rounds)
    val got = BPE.encode(df, merges)
      .select("w", "toks").as[(String, Seq[String])].collect().toMap
    for (w <- words.keys) {
      withClue(s"word '$w': ") { got(w).toVector shouldBe refEncode(w, merges) }
    }
  }

  test("encode matches reference apply-in-rank-order (natural corpus)") {
    encodeLaw(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L,
      "lowest" -> 4L, "wider" -> 2L, "new" -> 7L), rounds = 10)
  }

  test("encode matches reference on repeated-symbol words") {
    encodeLaw(Map("aaaa" -> 9L, "aaa" -> 5L, "aa" -> 3L, "abab" -> 4L,
      "ababab" -> 2L, "bbbb" -> 6L), rounds = 6)
  }

  test("encode matches reference on a pseudo-random corpus") {
    val rnd = new scala.util.Random(7)
    val words = (1 to 60).map { _ =>
      val len = 2 + rnd.nextInt(7)
      (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    encodeLaw(words, rounds = 12)
  }

  test("encode with zero merges is character segmentation") {
    val df = Seq(("abc", 1L), ("a", 2L)).toDF("w", "wn")
    val got = BPE.encode(df, Nil)
      .select("w", "toks").as[(String, Seq[String])].collect().toMap
    got("abc") shouldBe Seq("a", "b", "c")
    got("a") shouldBe Seq("a")
  }

  test("typed JVM encoder ≡ plan expression (bit parity, incl. unseen words)") {
    // VERDICT r11 #1: the hot encode path is now BPE.segmentJvm/nToksJvm;
    // this pin is what licenses swapping it in for the nested-replace
    // expression in doc_bpe_encode / stream_bpe_encode.
    val rnd = new scala.util.Random(99)
    val words = (1 to 400).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }.distinct.map(w => (w, 1L + rnd.nextInt(20).toLong))
    val df = words.toDF("w", "wn")
    val merges = BPE.train(df, rounds = 64)
    val rules = BPE.compileRules(merges)
    val expr = BPE.encode(df, merges)
      .select("w", "toks", "n_toks").as[(String, Seq[String], Long)]
      .collect()
    expr.length shouldBe words.length
    for ((w, toks, n) <- expr) withClue(s"word '$w': ") {
      BPE.segmentJvm(w, rules).toSeq shouldBe toks
      BPE.nToksJvm(w, rules) shouldBe n
    }
    // unseen-word serving shape: same parity off the training vocab
    for (w <- Seq("zzz", "abcd", "a", "dcba", "aabbccdd")) {
      BPE.segmentJvm(w, rules).toSeq shouldBe refEncode(w, merges)
      BPE.nToksJvm(w, rules) shouldBe refEncode(w, merges).size.toLong
    }
  }

  test("encode on unseen words applies trained merges consistently") {
    // train on one corpus, encode words NOT in it — the serving shape
    val train = Map("newest" -> 6L, "lowest" -> 4L, "widest" -> 3L)
    val merges = BPE.train(train.toSeq.toDF("w", "wn"), rounds = 6)
    val unseen = Seq(("fastest", 1L), ("est", 1L), ("zzz", 1L))
    val got = BPE.encode(unseen.toDF("w", "wn"), merges)
      .select("w", "toks").as[(String, Seq[String])].collect().toMap
    for ((w, _) <- unseen)
      got(w).toVector shouldBe refEncode(w, merges)
  }
}
