package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank by quantized-integer power iteration — the
  * link-analysis twin of [[ConnectedComponents]]' label propagation
  * (beyond-reference pipeline surface; the one-step form is driver-verified
  * as `pr_step_partsupp`).
  *
  * Ranks are exact int64 quantities (1e12 units split uniformly at start);
  * each scatter contributes `rank div outdeg` and damping is
  * `(85·inflow + 15·base) div 100` — no floating accumulation, so results
  * are independent of partitioning, scheduling, and engine. Each iteration
  * is one join + one groupBy with `localCheckpoint` lineage truncation
  * (same loop discipline as ConnectedComponents — without it the plan
  * doubles per round).
  */
object PageRank {

  /** @param edges directed edges, columns `src`, `dst` (any orderable type).
    * @param iterations fixed power-iteration count.
    * @return (node, rank_q) for every node appearing as src or dst.
    */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select("src", "dst").distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val base = 1000000000000L / n
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    var ranks = nodes.withColumn("rank_q", lit(base)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val inflow = e.join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .withColumn("contrib", expr("rank_q div deg"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("inflow"))
      ranks = nodes
        .join(inflow, Seq("node"), "left")
        .withColumn("inflow", coalesce(col("inflow"), lit(0L)))
        .select(col("node"),
          expr(s"(85 * inflow + 15 * ${base}L) div 100").as("rank_q"))
        .localCheckpoint()
    }
    e.unpersist(); outdeg.unpersist(); nodes.unpersist()
    ranks
  }
}
