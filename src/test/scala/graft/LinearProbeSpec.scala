package graft

import graft.operators.LinearProbe

/** Laws for [[LinearProbe]]: the distributed batch-perceptron trainer
  * must equal a plain sequential reference implementation exactly
  * (integer weights, round by round), be partition-independent, and
  * fail loudly outside its label envelope.
  */
class LinearProbeSpec extends SparkSpec {

  private val K = 4
  private val D = 6
  private val Steps = 3

  // deterministic pseudo-random separable-ish fixture: class c clusters
  // around axis c with integer noise
  private val data: Seq[(Int, Array[Long])] =
    (0 until 120).map { i =>
      val c = i % K
      val x = Array.tabulate(D)(j =>
        (if (j == c) 50L else 0L) + ((i * 31 + j * 17) % 13) - 6L)
      (c, x)
    }

  /** Sequential reference: identical algorithm (batch updates, averaged
    * iterates), no Spark.
    */
  private def refTrain(steps: Int): Array[Array[Long]] = {
    var w = Array.fill(K, D)(0L)
    val acc = Array.fill(K, D)(0L)
    for (_ <- 1 to steps) {
      val next = w.map(_.clone())
      data.foreach { case (label, x) =>
        val pred = LinearProbe.predict(w, x)
        if (pred != label) {
          val wl = next(label); val wp = next(pred)
          for (j <- 0 until D) {
            wl(j) += x(j)
            wp(j) -= x(j)
          }
        }
      }
      w = next
      for (c <- 0 until K; j <- 0 until D) acc(c)(j) += w(c)(j)
    }
    acc
  }

  private def df(parts: Int) = {
    val rows = data.map { case (c, x) => (c, x.toSeq) }
    spark.createDataFrame(rows).toDF("label", "xq").repartition(parts)
  }

  test("distributed trainer equals the sequential reference, weight for weight") {
    val got = LinearProbe.train(df(5), K, D, Steps)
    val want = refTrain(Steps)
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("training and scoring are partition-independent") {
    val a = LinearProbe.probe(df(1), K, D, Steps).collect().map(_.toSeq).toSeq
    val b = LinearProbe.probe(df(7), K, D, Steps).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("probe accuracy is non-trivial on the separable fixture") {
    val acc = LinearProbe.probe(df(4), K, D, Steps)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(acc.size == K)
    assert(acc.values.forall(_ >= 500), s"expected separable classes, got $acc")
  }

  test("hashed-text path learns a vocabulary-carried label (doc_quality_probe shape)") {
    // Synthetic corpus where the label IS in the vocabulary: class c
    // writes from a disjoint word set. The exact doc_quality_probe
    // pipeline — Dsir.featureBuckets → Dsir.denseCounts → probe — must
    // then classify nearly perfectly; this is the counterpoint to the
    // gated query's honesty note (the driver fixture's lang labels are
    // text-independent, so THERE the probe collapses — the operator, not
    // the fixture, is what this test certifies).
    import org.apache.spark.sql.functions._
    val kC = 3; val b = 64; val steps = 6
    val docs = (0 until 90).map { i =>
      val c = i % kC
      val words = (0 until 12).map(j => s"w${c}_${(i * 7 + j) % 9}")
      (c, words.mkString(" "))
    }
    val e = spark.createDataFrame(docs).toDF("label", "text")
      .select(col("label"), split(col("text"), " ").as("t"))
      .select(col("label"),
        graft.operators.Dsir.featureBuckets(col("t"), b).as("bks"))
      .select(col("label"),
        graft.operators.Dsir.denseCounts(col("bks"), b).as("xq"))
    val acc = LinearProbe.probe(e, kC, b, steps)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(acc.size == kC)
    assert(acc.values.forall(_ >= 950), s"expected near-perfect separation, got $acc")
  }

  test("JVM featurization mirrors the Column path bit for bit") {
    import org.apache.spark.sql.functions._
    import graft.queries.Q
    // hash60Jvm == hash60 Column on assorted strings (incl. empties,
    // unicode, the dsir feature shapes)
    val strs = Seq("", "a", "dsir|u:hash", "dsir|b:row column", "naïve-ü",
      "w0_3 w1_7", "x" * 200)
    val sdf = spark.createDataFrame(strs.map(Tuple1(_))).toDF("s")
    val viaCol = sdf.select(Q.hash60(col("s"))).collect().map(_.getLong(0))
    assert(viaCol.toSeq == strs.map(Q.hash60Jvm))
    // denseCountsJvm == featureBuckets → denseCounts on realistic docs
    val docs = (0 until 40).map(i =>
      (0 until 15).map(j => s"w${(i * 7 + j) % 11}").mkString(" "))
    val ddf = spark.createDataFrame(docs.map(Tuple1(_))).toDF("text")
      .select(split(col("text"), " ").as("t"))
      .select(col("t"),
        graft.operators.Dsir.featureBuckets(col("t"), 64).as("bks"))
      .select(col("t"),
        graft.operators.Dsir.denseCounts(col("bks"), 64).as("xq"))
    ddf.collect().foreach { r =>
      val toks = r.getSeq[String](0)
      val viaColumn = r.getSeq[Long](1)
      assert(viaColumn ==
        graft.operators.Dsir.denseCountsJvm(toks, 64).toSeq,
        s"mismatch for '${toks.mkString(" ")}'")
    }
  }

  test("labels outside [0, k) fail loudly") {
    val bad = spark.createDataFrame(Seq((K + 3, (1 to D).map(_.toLong))))
      .toDF("label", "xq")
    val e = intercept[Exception] {
      LinearProbe.train(bad, K, D, 1)
    }
    assert(e.getMessage != null)
  }
}
