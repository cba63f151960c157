package graft.operators

/** Driver-side half of the PCA/top-principal-direction operator: power
  * iteration on the (collected) integer-quantized Gram matrix.
  *
  * The DISTRIBUTED piece is the Gram accumulation (the `emb_pca_power`
  * query: in-row outer-product explosion, one dim²-group partial-agg
  * shuffle — never a join); what reaches the driver is d×d longs — the
  * k-bounded-state discipline of KMeans centroids / PQ codebooks, not a
  * data-sized collect.
  *
  * Determinism contract: every sweep is exact integer arithmetic —
  * w = G·v in int64 (bounds documented at the call site), renormalized
  * as (w·1e6) div max|w| computed in BigInt. BigInt division truncates
  * toward zero, which matches DuckDB's hugeint `//` (verified -7e21//3e12
  * = -2333333333 in both) — so the unrolled-CTE oracle replays the loop
  * bit-for-bit.
  */
object Pca {

  /** @param gram  d×d integer-quantized second-moment matrix (symmetric)
    * @param rounds power-iteration sweeps
    * @return dominant-eigenvector direction in ppm units (max |v| = 1e6)
    */
  def powerIteration(gram: Array[Array[Long]], rounds: Int): Array[Long] = {
    val d = gram.length
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(0L)((acc, j) => acc + gram(i)(j) * v(j)))
      val m = w.map(math.abs).max
      require(m > 0, "Pca.powerIteration: zero Gram matrix")
      v = w.map(x => (BigInt(x) * 1000000 / BigInt(m)).toLong)
    }
    v
  }
}
