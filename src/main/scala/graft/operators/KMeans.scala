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
  *     edge-count cutover) re-broadcast each round as plan literals, so
  *     ASSIGNMENT is a pure map over the corpus — per iteration the only
  *     shuffle carries k×dim partially-aggregated cells, never vectors.
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

  /** Add a `cell` column: the argmax-cosine centroid for each row (first
    * match on `greatest` ⇒ lowest cell wins exact ties). `vn` must be
    * L2-normalized; centroids need not be. Scores materialize as ordinary
    * aliased columns, so the expression stays LINEAR in k (a when/struct
    * fold doubles the tree per centroid).
    */
  private def withCell(df: DataFrame, cents: Seq[Centroid]): DataFrame = {
    def centLit(c: Centroid): Column = array(c.v.map(lit(_)).toIndexedSeq: _*)
    def centNorm(c: Centroid): Double = math.sqrt(c.v.map(x => x * x).sum)
    require(cents.size >= 2, "k must be >= 2")
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
