package graft

import graft.operators.UnigramLM
import graft.operators.UnigramLM.{Params, Piece}

/** Laws for [[UnigramLM]]: the Viterbi DP must be a true argmax
  * (brute-force law), the distributed plan-expression encode must equal
  * the driver reference word for word, the trainer must be input-order-
  * and partition-independent, and the coverage/bound contracts must fail
  * loudly.
  */
class UnigramLMSpec extends SparkSpec {

  private val P = Params(maxPiece = 3, seedMulti = 16, rounds = 2,
    vocabTarget = 24, maxWordLen = 10, quant = 10000)

  // small deterministic corpus with real substring structure
  private val corpus: Array[(String, Long)] = Array(
    "banana" -> 30L, "bandana" -> 12L, "ana" -> 25L, "nab" -> 9L,
    "band" -> 17L, "bank" -> 8L, "anna" -> 14L, "dana" -> 11L)

  private lazy val vocab: Seq[Piece] = UnigramLM.trainLocal(corpus, P)
  private lazy val score: Map[String, Long] =
    vocab.map(p => p.piece -> p.scoreQ).toMap

  /** All segmentations of `w` into pieces from `score`, brute force. */
  private def allSegs(w: String): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(P.maxPiece, w.length)).flatMap { l =>
      val h = w.substring(0, l)
      if (score.contains(h)) allSegs(w.substring(l)).map(h :: _) else Nil
    }

  test("viterbi is the argmax over all segmentations (q max, then n min)") {
    for ((w, _) <- corpus) {
      val (q, n) = UnigramLM.viterbi(w, score, P.maxPiece)
      val scored = allSegs(w).map(seg => (seg.map(score).sum, seg.length))
      assert(scored.nonEmpty, s"no segmentation for $w")
      val qMax = scored.map(_._1).max
      assert(q == qMax, s"$w: viterbi q=$q, brute-force max=$qMax")
      val nMin = scored.filter(_._1 == qMax).map(_._2).min
      assert(n == nMin, s"$w: viterbi n=$n, min pieces among max-q=$nMin")
      // the returned segmentation is consistent with its own summary
      val segs = UnigramLM.viterbiSegments(w, score, P.maxPiece)
      assert(segs.mkString == w)
      assert(segs.map(score).sum == q && segs.length == n)
    }
  }

  test("plan-expression encode equals the driver Viterbi, word for word") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = corpus.map(_._1).toSeq.toDF("w").repartition(3)
    val got = words
      .select(col("w"), UnigramLM.encodeExpr(col("w"), vocab, P).as("e"))
      .select(col("w"), col("e")("q").as("q"), col("e")("n").as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    for ((w, _) <- corpus)
      assert(got(w) == UnigramLM.viterbi(w, score, P.maxPiece), s"word $w")
  }

  test("trainer is input-order independent") {
    val shuffled = corpus.reverse ++ Array.empty[(String, Long)]
    assert(UnigramLM.trainLocal(shuffled, P) == vocab)
  }

  test("distributed train is partition-independent and equals trainLocal") {
    import spark.implicits._
    val df1 = corpus.toSeq.toDF("w", "wn").repartition(1)
    val df7 = corpus.toSeq.toDF("w", "wn").repartition(7)
    assert(UnigramLM.train(df1, P) == vocab)
    assert(UnigramLM.train(df7, P) == vocab)
  }

  test("every character survives pruning (coverage invariant)") {
    val chars = corpus.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(vocab.map(_.piece).toSet))
    assert(vocab.size <= P.vocabTarget)
  }

  test("words beyond the oracle unroll bound fail loudly") {
    val e = intercept[IllegalArgumentException] {
      UnigramLM.trainLocal(corpus :+ ("a" * (P.maxWordLen + 1) -> 1L), P)
    }
    assert(e.getMessage.contains("maxWordLen"))
  }
}
