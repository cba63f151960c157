package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with the degree-orientation optimization
  * (node-iterator on the minimum-order corner — the scheme GraphX's
  * `triangleCount` and Cohen's MapReduce counter use).
  *
  * Input: canonical undirected edges `(u, v)` with `u < v`, distinct.
  * Each edge is oriented from its lower-(degree, id) endpoint to the
  * higher; wedges are built ONLY at a node's oriented out-neighbors, so
  * candidate wedges are O(m^1.5) instead of O(Σ d²) — on a skewed graph a
  * single hub with degree 10⁶ would otherwise contribute 5·10¹¹ wedges.
  * Every triangle is counted exactly once, at its unique minimum-order
  * corner. All stages are narrow-row hash joins (AQE can skew-split the
  * wedge join); nothing is sampled — the count is exact.
  *
  * Output: one row — n_nodes, n_edges, n_wedges (unoriented, Σ C(d,2)),
  * n_triangles, and the global clustering coefficient 3·T/wedges as exact
  * integer ppm (engine-bit-identical).
  */
object Triangles {

  /** Below this many edges the 16-byte edge rows broadcast (≤ ~320 MB
    * build side) and the wedge stream never hits an Exchange; above it
    * the shuffle joins take over. Same adaptive-cutover pattern as
    * `ConnectedComponents.run`'s driver union-find threshold.
    */
  val BroadcastEdgeThreshold = 20000000L

  /** Eager form: materializes the 1-row stats while the intermediate
    * caches are live, then unpersists them (ADVICE r4: the lazy form left
    * `pairs`/`deg`/`o` cached for the session). The result is a single row,
    * so re-wrapping it as a local DataFrame costs nothing.
    */
  def stats(
      pairsIn: DataFrame,
      broadcastThreshold: Long = BroadcastEdgeThreshold): DataFrame = {
    val (out, cleanup) = statsPlan(pairsIn, broadcastThreshold)
    try {
      val spark = pairsIn.sparkSession
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally cleanup()
  }

  /** Lazy form: the full distributed plan plus an explicit cleanup handle
    * that unpersists the shared intermediates — callers that need the plan
    * itself (audits, composition) consume the DataFrame, then invoke the
    * handle.
    */
  def statsPlan(
      pairsIn: DataFrame,
      broadcastThreshold: Long = BroadcastEdgeThreshold): (DataFrame, () => Unit) = {
    // persist every multiply-consumed stage: `pairs` feeds degree/orient/
    // closure/edge-count, `deg` feeds both orientation joins + the node
    // agg, and `o` is BOTH sides of the wedge self-join — without the
    // persists each consumer would recompute the upstream joins. All
    // three are narrow (≤3 longs per row).
    val pairs = pairsIn.select(col("u"), col("v")).distinct().persist()
    val m = pairs.count() // materializes the persist; sizes the join mode
    val deg = pairs.select(col("u").as("node"))
      .unionAll(pairs.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d")).persist()
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = pairs
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
      .persist()
    // Two physical strategies for the closure count, same exact result:
    //
    //  * edge-iterator (small/medium graphs): per-node oriented adjacency
    //    arrays broadcast (≤ √(2m) longs per node after orientation), and
    //    each oriented edge (s,t) contributes |N⁺(s) ∩ N⁺(t)| via an
    //    in-row array_intersect — the Σ C(d⁺,2) wedge intermediate is
    //    NEVER materialized (41M wedge rows → 1.2M in-row intersections
    //    on the sf0.1 co-purchase graph; measured 21 s → ~4 s).
    //
    //  * wedge join (huge graphs, where per-node arrays could exceed row
    //    budgets): o ⋈ o on the min-order corner then probe closure
    //    against the canonical edge list — wedges partition by (x, y) and
    //    AQE skew-splits hot corners.
    val tri =
      if (m <= broadcastThreshold) {
        val adj = o.groupBy(col("s").as("node"))
          .agg(collect_list(col("t")).as("nbrs"))
        o.join(broadcast(adj.select(col("node").as("s"), col("nbrs").as("ns"))), "s")
          .join(broadcast(adj.select(col("node").as("t"), col("nbrs").as("nt"))), "t")
          .agg(coalesce(sum(size(array_intersect(col("ns"), col("nt"))))
            .cast("long"), lit(0L)).as("n_triangles"))
      } else {
        val wedges = o.select(col("s"), col("t").as("x"))
          .join(o.select(col("s"), col("t").as("y")), "s")
          .filter(col("x") < col("y"))
        wedges
          .join(pairs, col("x") === col("u") && col("y") === col("v"))
          .agg(count(lit(1)).as("n_triangles"))
      }
    val degAgg = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(expr("sum((d * (d - 1)) DIV 2)").cast("long"), lit(0L))
        .as("n_wedges"))
    val edgeAgg = pairs.agg(count(lit(1)).as("n_edges"))
    val out = degAgg.crossJoin(edgeAgg).crossJoin(tri) // 1×1×1 scalar combine
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        // wedge-free graphs (empty, or disjoint single edges) have no
        // defined clustering coefficient — emit 0 instead of a div-0
        when(col("n_wedges") > 0,
          expr("(3 * n_triangles * 1000000) DIV n_wedges"))
          .otherwise(lit(0L)).as("gcc_ppm"))
    (out, () => { o.unpersist(); deg.unpersist(); pairs.unpersist(); () })
  }
}
