package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the cluster
  * step of a dedup pipeline (pairs → "which rows are one duplicate
  * group"). scespet has no graph ops; this belongs to the
  * beyond-reference pipeline surface.
  *
  * Each iteration is one join + one groupBy (fully distributed); the loop
  * converges in O(component diameter) iterations — near-dup clusters are
  * small and dense, so typically 2-4. Iterations persist their result and
  * drop the previous one to keep lineage flat; at very large scale swap
  * `persist` for `localCheckpoint` every few rounds (same structure).
  */
object ConnectedComponents {

  /** @param edges DataFrame with two columns `a`, `b` (undirected edges).
    * @return (id, comp) — comp = min node id reachable from id.
    */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .persist()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each node proposes its label to its neighbors; take the min
      val proposals = sym
        .join(labels, sym("a") === labels("id"))
        .groupBy(col("b").as("nid"))
        .agg(min(col("comp")).as("prop"))
      val next = labels
        .join(proposals, labels("id") === proposals("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("prop"), col("comp"))).as("comp"))
        .persist()
      converged = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.comp") =!= col("o.comp"))
        .limit(1).count() == 0
      labels.unpersist()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
