package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spherical k-means (full Lloyd loop) — the training twin of
  * the driver-verified single step (`emb_kmeans_step`) and the trained-IVF
  * coarse quantizer (`knn_ivf_trained`), with [[PageRank]]'s loop
  * discipline.
  *
  * Determinism and scale come from the same two choices as everywhere else
  * in this engine:
  *   - per-cell means accumulate as EXACT int64 sums of floor-quantized
  *     coordinates (floor is rounding-mode-free) with ONE double division,
  *     so an iteration's centroids are independent of partitioning,
  *     scheduling, and engine;
  *   - centroids are a k×dim driver-side array (bounded, like PageRank's
  *     edge-count cutover); ASSIGNMENT is adaptive in k — small k inlines
  *     them as plan literals (pure map, zero shuffle), large k (> LargeK)
  *     broadcasts a centroid table and argmaxes via max_by, keeping plan
  *     size O(1) in k — so per iteration the only shuffles carry k×dim
  *     partially-aggregated cells (and, on the large-k path, one row per
  *     point), never vectors.
  *
  * Points are L2-normalized once up front (spherical k-means: the mean of
  * unit vectors points at the spherical centroid direction); ties in the
  * argmax break to the lowest cell id by strict inequality.
  */
object KMeans {

  /** One centroid as plain doubles (driver-side, k of these). */
  final case class Centroid(cell: Int, v: Array[Double])

  private def dot(a: Column, b: Column): Column = {
    // portable fold — identical accumulation order to plans.DotD; the
    // operator stays independent of session function registration
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  private def norml2(v: Column): Column = sqrt(dot(v, v))

  /** Above this k, assignment switches from per-centroid literal columns
    * to the broadcast-centroid-table path: a codegen'd plan with thousands
    * of aliased score columns and a k×dim literal array re-broadcast per
    * round breaks down around IVF-scale k (√n ≈ 10⁴–10⁵), while the join
    * shape is k-independent in plan size.
    */
  private[graft] val LargeK = 1024

  /** Add a `cell` column: the argmax-cosine centroid for each row (lowest
    * cell wins exact ties). `vn` must be L2-normalized; centroids need
    * not be. Adaptive (same pattern as ConnectedComponents' cutover):
    * small k inlines centroids as plan literals (pure map, zero shuffle);
    * large k scores against a BROADCAST centroid table and argmaxes with
    * `max_by` — same n×k dot products, but plan size O(1) in k and the
    * per-id partial aggregation keeps the shuffle at n rows.
    */
  private def withCell(df: DataFrame, cents: Seq[Centroid]): DataFrame =
    assign(df, cents, forceJoin = false)

  private[graft] def assign(
      df: DataFrame, cents: Seq[Centroid], forceJoin: Boolean): DataFrame = {
    require(cents.size >= 2, "k must be >= 2")
    if (forceJoin || cents.size > LargeK) withCellJoin(df, cents)
    else withCellCols(df, cents)
  }

  /** Literal-columns assignment (small k): scores materialize as ordinary
    * aliased columns, so the expression stays LINEAR in k (a when/struct
    * fold doubles the tree per centroid); `greatest` + first-match keeps
    * the lowest-cell tie-break.
    */
  private def withCellCols(df: DataFrame, cents: Seq[Centroid]): DataFrame = {
    def centLit(c: Centroid): Column = array(c.v.map(lit(_)).toIndexedSeq: _*)
    def centNorm(c: Centroid): Double = math.sqrt(c.v.map(x => x * x).sum)
    val scoreCols = cents.map { c =>
      (dot(col("vn"), centLit(c)) / lit(centNorm(c))).as(s"__s${c.cell}")
    }
    val scored = df.select(col("*") +: scoreCols: _*)
    val best = greatest(cents.map(c => col(s"__s${c.cell}")): _*)
    val cell = cents.tail.foldLeft(
      when(col(s"__s${cents.head.cell}") === best, cents.head.cell)) {
      (acc, c) => acc.when(col(s"__s${c.cell}") === best, c.cell)
    }
    scored.withColumn("cell", cell)
      .drop(cents.map(c => s"__s${c.cell}"): _*)
  }

  /** Broadcast-table assignment (large k): corpus ⨯ broadcast(centroids),
    * one score per pair, argmax via `max_by` ordered by
    * (score, −cell) — identical lowest-cell tie-break as the literal
    * path (cell ids are unique, so the ordering is total). The broadcast
    * ships k×dim doubles once per stage instead of embedding them in the
    * plan; map-side partial `max_by` collapses each id before the
    * n-row shuffle.
    */
  private def withCellJoin(df: DataFrame, cents: Seq[Centroid]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val centDf = cents
      .map(c => (c.cell, c.v.toSeq, math.sqrt(c.v.map(x => x * x).sum)))
      .toDF("__cell", "__cv", "__cnorm")
    // group on EVERY input column (ADVICE r4: grouping on just (id, vn)
    // silently dropped any other columns, so the k>LargeK cutover changed
    // the output schema vs the literal path; `id` is unique per the run()
    // contract, so the extra group keys don't change the aggregation and
    // both paths now emit df.* + cell)
    val keyCols = df.columns.map(col).toIndexedSeq
    df.crossJoin(broadcast(centDf))
      .withColumn("__s", dot(col("vn"), col("__cv")) / col("__cnorm"))
      .groupBy(keyCols: _*)
      .agg(max_by(col("__cell"), struct(col("__s"), -col("__cell"))).as("cell"))
  }

  /** Lloyd iterations from the k lowest-id points.
    *
    * @param points (id: Long, v: array&lt;double&gt;) — v non-degenerate
    * @return (centroids after the last mean update, assignment DataFrame
    *         (id, cell) under those final centroids)
    */
  def run(points: DataFrame, k: Int, iterations: Int): (Seq[Centroid], DataFrame) = {
    val Q = 1000000000L // 1e-9 quantization of normalized coordinates
    val pts = points
      .select(col("id"), transform(col("v"),
        x => x / norml2(col("v"))).as("vn"))
      .localCheckpoint() // normalize once; truncate lineage for the loop
    val dim = pts.select(size(col("vn"))).head().getInt(0)

    var cents: Seq[Centroid] = pts.orderBy("id").limit(k)
      .select(col("id"), col("vn")).collect()
      .zipWithIndex
      .map { case (r, i) => Centroid(i, r.getSeq[Double](1).toArray) }.toSeq

    for (_ <- 1 to iterations) {
      val means = withCell(pts, cents)
        .select(col("cell"), posexplode(col("vn")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((sum(floor(col("x") * Q)).cast("double") /
          (count(lit(1)) * Q).cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val v = new Array[Double](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          cell -> v
        }
      // empty cells keep their previous centroid (deterministic)
      cents = cents.map(c => Centroid(c.cell, means.getOrElse(c.cell, c.v)))
    }
    (cents, withCell(pts, cents).select(col("id"), col("cell")))
  }
}
