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
    *
    * Adaptive: when the edge set is small (the common case after LSH +
    * exact verification — near-dup pairs are a tiny fraction of a corpus),
    * a driver-side union-find beats N distributed join rounds by an order
    * of magnitude; above the threshold the distributed min-label loop
    * runs. The cutover mirrors how Spark itself treats broadcast joins:
    * collect small, shuffle big.
    */
  def run(edges: DataFrame, maxIter: Int = 20, localThreshold: Long = 2000000L): DataFrame = {
    val e = edges.persist()
    val isLong = e.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    if (isLong && e.count() <= localThreshold) runLocal(e) else runDistributed(e, maxIter)
  }

  /** Driver-side union-find with min-root bookkeeping. */
  private def runLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.collect().foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // attach larger root under smaller → comp = min id
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val out = parent.keys.toSeq.map(id => (id, find(id))).sorted
    spark.createDataset(out).toDF("id", "comp")
  }

  private def runDistributed(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .persist()
    // localCheckpoint (NOT persist) inside the loop: each round's plan
    // references the previous round's twice — without lineage truncation
    // the logical plan doubles per iteration and OOMs the driver at
    // ~10 rounds regardless of data size.
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
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
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.comp") =!= col("o.comp"))
        .limit(1).count() == 0
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
