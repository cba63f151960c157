package graft

import graft.operators.Pca

/** Laws of the integer power iteration: the result is (approximately) an
  * eigenvector of the input, the dominant direction wins from a generic
  * start, and the arithmetic is pure-function deterministic.
  */
class PcaSpec extends SparkSpec {

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("power iteration lands on an eigenvector: G·v is parallel to v") {
    // symmetric PSD matrix with a clear spectral gap
    val g = Array(
      Array(400000L, 100000L, 0L),
      Array(100000L, 200000L, 50000L),
      Array(0L, 50000L, 100000L))
    val v = Pca.powerIteration(g, rounds = 20).map(_.toDouble)
    val gv = g.map(row => row.zip(v).map { case (c, x) => c * x }.sum)
    cosine(gv, v) should be > 0.999999
  }

  test("dominant axis wins: near-diagonal matrix concentrates on the " +
    "largest diagonal entry") {
    val g = Array(
      Array(1000000L, 10L),
      Array(10L, 1000L))
    val v = Pca.powerIteration(g, rounds = 8)
    math.abs(v(0)) shouldBe 1000000L
    math.abs(v(1)) should be < 1000L
  }

  test("deterministic: repeated runs are bit-identical") {
    val g = Array.tabulate(8, 8)((i, j) => ((i + 1) * (j + 1) * 1000L))
    Pca.powerIteration(g, 8).toSeq shouldBe Pca.powerIteration(g, 8).toSeq
  }
}
