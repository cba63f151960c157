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
    val e = edges.select("src", "dst").distinct()
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val counts = e
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("node")
        .orderBy(col("cnt").desc, col("label").asc)
      val adopted = counts
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("node"), col("label"))
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
