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

  test("trained PQ-ADC (M=8, K=256 codes, Lloyd-trained) recalls >= 60% of exact top-k") {
    import org.apache.spark.sql.functions._
    // PQ on L2-NORMALIZED vectors: ADC inner product then ranks by cosine,
    // making the quantized scores comparable to knn_brute's ground truth
    val n2 = aggregate(transform(col("v0"), x => x * x), lit(0.0), (a, b) => a + b)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v0"))
      .select(col("vec_id"), transform(col("v0"), x => x / sqrt(n2)).as("v"))
    val cbs = graft.operators.PQ.trainCodebooks(emb, m = 8, k = 256, iterations = 2)
    val encoded = graft.operators.PQ.encode(emb, cbs)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val pq = graft.operators.PQ.adcTopK(encoded, queries, cbs, topK = 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }

    val exact = topk("knn_brute")
    val recalls = exact.toSeq.map { case (q, truth) =>
      pq.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    withClue(s"per-query recalls: $recalls") { mean should be >= 0.6 }
  }
}
