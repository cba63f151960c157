package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007, the near-linear community baseline) — beyond-reference pipeline
  * surface next to [[ConnectedComponents]] (which it refines: LPA splits
  * a connected component into densely-linked groups).
  *
  * Determinism contract: classic LPA breaks frequency ties RANDOMLY and
  * updates asynchronously — both unacceptable under a cross-engine hash
  * gate. This variant is SYNCHRONOUS with a total tie-break: at each
  * round every node adopts the label most frequent among its in-neighbors
  * at the previous round, ties to the SMALLEST label; initial label =
  * node id. A fixed round count + exact integer counts + total order ⇒
  * partition/schedule/engine-independent results (the same discipline as
  * [[PageRank]]'s quantized ranks).
  *
  * Scale shape: edges deduped + hash-partitioned on `src` once and
  * persisted; each round is one edge⨝label join on that partitioning, a
  * (node, label)-keyed partial-agg count (bounded by Σ degree), and a
  * per-node argmax window over neighbor-label groups (≤ degree rows per
  * node, never fact-sized partitions); `localCheckpoint` truncates
  * lineage per round.
  */
object LabelProp {

  /** @param edges directed influence edges (`src` labels flow to `dst`);
    *              bidirect upstream for the undirected classic
    * @param rounds fixed synchronous sweep count
    * @return (node, label) — final community assignment
    */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    // Small graphs (plan-estimated input under PageRank.SmallGraphEdgeBytes)
    // take the broadcast shape (r15 guide §2.4/§3.1): edges partition by
    // DST once, the node-sized label frame reaches the influence join as a
    // broadcast, and the per-round (dst,label) count + most-frequent window
    // both ride the dst partitioning (hash(dst) clusters every group key
    // subset) — zero per-round exchanges. Large graphs keep the exchange
    // shape: src-partitioned edges never re-shuffle, labels move. Results
    // are identical either way (exact counts, total-order tie-break).
    // repartition BEFORE distinct: one fact-sized setup shuffle, not two
    // (the dedup agg rides the repartition — PageRank's VERDICT r8 #7 fix).
    val small = edges.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(PageRank.SmallGraphEdgeBytes)
    val e = edges.select("src", "dst")
      .repartition(if (small) col("dst") else col("src")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    // broadcast only when the node-sized label frame is ALSO bounded
    // (ADVICE r15: explicit broadcast() bypasses the auto threshold and
    // nodes can approach 2× edge rows; see PageRank.MaxBroadcastNodes).
    // Lazy &&: the count job runs on the small path only, over the
    // already-materialized persisted node frame.
    val bcast = small && nodes.count() <= PageRank.MaxBroadcastNodes
    for (_ <- 1 to rounds) {
      val lbl = labels.select(col("node").as("src"), col("label"))
      val counts = e
        .join(if (bcast) broadcast(lbl) else lbl, "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("node")
        .orderBy(col("cnt").desc, col("label").asc)
      val adopted0 = counts
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("node"), col("label"))
      val adopted = if (bcast) broadcast(adopted0) else adopted0
      // nodes with no in-neighbors keep their current label
      labels = labels.select(col("node"), col("label").as("old"))
        .join(adopted, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("old")).as("label"))
        .localCheckpoint()
    }
    e.unpersist(); nodes.unpersist()
    labels
  }
}
