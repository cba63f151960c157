package graft

/** ANN quality pinned against exact ground truth: the LSH and IVF paths
  * must RECALL most of what brute-force cosine finds (they are speed/
  * recall trades, not different semantics). Everything is deterministic
  * (constant-folded planes, md5-derived data), so the recall value is a
  * stable regression number, not a flaky statistic.
  */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def topk(name: String): Map[Long, Set[Long]] = {
    val rows = SparkEntry.queries(name)(spark, dir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
  }

  test("knn_lsh recalls >= 60% of knn_brute's exact top-k per query") {
    val exact = topk("knn_brute")
    val lsh = topk("knn_lsh")
    val recalls = exact.toSeq.map { case (q, truth) =>
      lsh.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    withClue(s"per-query recalls: $recalls") { mean should be >= 0.6 }
  }

  test("knn_ivf_trained recalls >= 60% of knn_brute's exact top-k per query") {
    val exact = topk("knn_brute")
    val ivf = topk("knn_ivf_trained")
    val recalls = exact.toSeq.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    withClue(s"per-query recalls: $recalls") { mean should be >= 0.6 }
  }
}
