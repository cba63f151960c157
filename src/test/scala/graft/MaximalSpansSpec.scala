package graft

import graft.operators.MaximalSpans

/** Laws for [[MaximalSpans]] — maximality verified against the DEFINITION
  * (substring occurrence counts), not against the operator's own suffix
  * formulation, plus completeness vs an all-pairs brute force and the
  * partition-count independence law.
  */
class MaximalSpansSpec extends SparkSpec {

  private val MinLen = 4
  private val Cap = 12

  /** doc_id → tokens. Designed coverage: a 20-token cross-doc repeat
    * (clips at Cap=12), a 10-token within-doc repeat, an overlapping
    * partial repeat (shared 6-prefix diverging after), and unique filler.
    */
  private val corpus: Map[Long, Array[String]] = {
    val shared20 = (1 to 20).map(k => s"s$k")
    val rep10 = (1 to 10).map(k => s"r$k")
    val part6 = (1 to 6).map(k => s"p$k")
    def filler(tag: String, n: Int) = (1 to n).map(k => s"$tag$k")
    Map(
      1L -> (filler("a", 5) ++ shared20 ++ filler("b", 4)).toArray,
      2L -> (filler("c", 3) ++ shared20 ++ part6 ++ Seq("x1") ++ filler("d", 3)).toArray,
      3L -> (rep10 ++ filler("e", 3) ++ rep10 ++ Seq("y1") ++ part6 ++ Seq("z1")).toArray,
      4L -> filler("u", 15).toArray)
  }

  private def df = {
    val ids = corpus.values.flatten.toSeq.distinct.sorted.zipWithIndex.toMap
    val rows = corpus.toSeq.map { case (d, t) => (d, t.map(ids(_).toLong).toSeq) }
    spark.createDataFrame(rows).toDF("doc_id", "h0")
  }

  private def run(parts: Int): Set[(Long, Long, Long)] =
    MaximalSpans.spans(df, MinLen, Cap, parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Corpus occurrence count of a token sequence (all docs, all offsets). */
  private def occ(seq: Seq[String]): Int =
    corpus.values.map { t =>
      (0 to t.length - seq.length).count(o => t.slice(o, o + seq.length).sameElements(seq))
    }.sum

  /** All-pairs reference: true capped lrs per position, capped left-max. */
  private def brute: Set[(Long, Long, Long)] = {
    val sufs = for {
      (d, t) <- corpus.toSeq; i <- 1 to t.length
    } yield (d, i, t.slice(i - 1, math.min(t.length, i - 1 + Cap)).toSeq)
    def lcp(a: Seq[String], b: Seq[String]) =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val lrs = sufs.map { case (d, i, w) =>
      (d, i) -> sufs.iterator
        .filter { case (d2, i2, _) => !(d2 == d && i2 == i) }
        .map(s => lcp(w, s._3)).max
    }.toMap
    sufs.flatMap { case (d, i, _) =>
      val l = lrs((d, i))
      val pl = lrs.get((d, i - 1))
      if (l >= MinLen && pl.forall(_ < math.min(l + 1, Cap)))
        Some((d, i.toLong, l.toLong))
      else None
    }.toSet
  }

  test("every emitted span satisfies the maximality DEFINITION") {
    val out = run(parts = 4)
    assert(out.nonEmpty)
    assert(out.exists(_._3 == Cap), "fixture must exercise clipping")
    assert(out.exists(s => s._3 < Cap && s._3 > MinLen),
      "fixture must exercise variable uncapped lengths")
    out.foreach { case (d, start, len) =>
      val t = corpus(d)
      val s0 = start.toInt - 1
      val span = t.slice(s0, s0 + len.toInt).toSeq
      assert(span.length == len, s"span ($d,$start,$len) exceeds doc")
      assert(occ(span) >= 2, s"span ($d,$start,$len) does not repeat")
      if (len < Cap) {
        // right-maximal: one-token right extension must not repeat
        if (s0 + len < t.length)
          assert(occ(span :+ t(s0 + len.toInt)) < 2,
            s"span ($d,$start,$len) extendable right")
        // left-maximal: one-token left extension must not repeat
        if (s0 > 0)
          assert(occ(t(s0 - 1) +: span) < 2,
            s"span ($d,$start,$len) extendable left")
      }
    }
  }

  test("output equals the all-pairs brute-force reference (completeness)") {
    assert(run(parts = 4) == brute)
  }

  test("output is independent of partition count") {
    assert(run(parts = 1) == run(parts = 7))
  }

  test("cut equals brute-force interval coverage of all lrs >= minLen spans") {
    // brute lrs per position (capped), as in `brute` above
    val sufs = for {
      (d, t) <- corpus.toSeq; i <- 1 to t.length
    } yield (d, i, t.slice(i - 1, math.min(t.length, i - 1 + Cap)).toSeq)
    def lcp(a: Seq[String], b: Seq[String]) =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val lrs = sufs.map { case (d, i, w) =>
      (d, i) -> sufs.iterator
        .filter { case (d2, i2, _) => !(d2 == d && i2 == i) }
        .map(s => lcp(w, s._3)).max
    }.toMap
    val expected = corpus.keys.toSeq.sorted.flatMap { d =>
      val n = corpus(d).length
      val hits = (1 to n).filter(i => lrs((d, i)) >= MinLen)
      if (hits.isEmpty) None
      else {
        val covered = (1 to n).count(t =>
          hits.exists(p => p <= t && t < p + lrs((d, p))))
        Some((d, hits.size.toLong, covered.toLong))
      }
    }.toSet
    val got = MaximalSpans.cut(df, MinLen, Cap, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // the union must close over the cap-saturated run: covered tokens in
    // the 20-token shared passage exceed the clipped span length
    val doc1 = got.find(_._1 == 1L).get
    assert(doc1._3 > Cap, s"cap-saturated run not fully covered: $doc1")
  }

  test("empty when nothing repeats") {
    val d = spark.createDataFrame(Seq(
      (1L, (1L to 30L).toSeq), (2L, (100L to 130L).toSeq))).toDF("doc_id", "h0")
    assert(MaximalSpans.spans(d, MinLen, Cap, 4).count() == 0)
  }
}
