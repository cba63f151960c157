package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source breadth-first search: hop distance from a seed set, the
  * graph-exploration primitive next to [[PageRank]] / [[Triangles]] /
  * [[ConnectedComponents]] (beyond-reference pipeline surface — reachability
  * audits, contamination-spread tracing, N-hop feature neighborhoods).
  *
  * Determinism: distances are exact small ints (hop counts) and each node
  * takes the FIRST hop that reaches it (the left-anti against the settled
  * set), so the result is independent of partitioning and scheduling —
  * there is no tie to break: every node reached at hop h is reached at
  * hop h under any schedule.
  *
  * Scale shape (the [[PageRank]] loop discipline):
  *   - edges deduped + hash-partitioned on `src` ONCE and persisted; each
  *     hop joins the (frontier-sized) node frame against that same
  *     partitioning — the fact-sized edge set never re-shuffles;
  *   - the settled-set anti-join keys on the node id (node-sized);
  *   - `localCheckpoint` per hop truncates lineage;
  *   - early exit on an empty frontier (one k-bounded driver count/hop).
  */
object Bfs {

  /** @param edges directed edges (`src`, `dst`); bidirect upstream for
    *              undirected reachability
    * @param seeds frame with a `node` column — distance-0 set
    * @param maxHops inclusive hop bound
    * @return (node, dist) for every node within `maxHops` of a seed
    */
  def layers(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    // Small graphs broadcast the node-sized frames (frontier, settled set)
    // and partition edges by DST so the per-hop dst-distinct rides the
    // edge partitioning — zero per-hop exchanges; large graphs keep the
    // src-partitioned exchange shape (see PageRank.SmallGraphEdgeBytes).
    // repartition BEFORE distinct: one setup shuffle, not two.
    val small = edges.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(PageRank.SmallGraphEdgeBytes)
    val e = edges.select("src", "dst")
      .repartition(if (small) col("dst") else col("src")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // broadcast only when the node-sized frames are ALSO bounded (ADVICE
    // r15: the settled set grows toward the full node count ≤ 2× edge
    // rows, and explicit broadcast() bypasses the auto threshold; see
    // PageRank.MaxBroadcastNodes). Lazy &&: the count job runs on the
    // small path only, over the already-persisted edge frame.
    val bcast = small && e.count() <= PageRank.MaxBroadcastNodes / 2
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0).as("dist")).localCheckpoint()
    var frontier = dist.select("node")
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val fr = frontier.select(col("node").as("src"))
      val settled = dist.select("node")
      val next = e.join(if (bcast) broadcast(fr) else fr, "src")
        .select(col("dst").as("node")).distinct()
        .join(if (bcast) broadcast(settled) else settled, Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("dist"))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        dist = dist.union(next).localCheckpoint()
        frontier = next.select("node")
        h += 1
      }
    }
    e.unpersist()
    dist
  }
}
