package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with a coarse k-means
  * codebook, then prune near-duplicate pairs WITHIN each cluster only —
  * the cluster assignment bounds the quadratic pair blowup to
  * O(sum(cluster_size²)) instead of O(n²), which is what makes semantic
  * dedup tractable on a web-scale corpus.
  *
  * Keeper rule (the paper's): within a near-duplicate group, KEEP the
  * example with the LOWEST cosine similarity to its cluster centroid
  * (it preserves the most diversity); ties break on the smaller id.
  * Relationally that needs no transitive closure: a row is REMOVED iff
  * some same-cell neighbor with pair-cosine >= theta outranks it
  * (strictly lower centroid-cosine, or equal and smaller id) — an
  * EXISTS semi-join, one shuffle on the cell id.
  *
  * Scale: the cell count k must track the corpus (k ~ n / target cell
  * size, like the IVF coarse quantizer — train with [[KMeans]], whose
  * assignment path is already adaptive in k). Pair generation shuffles
  * narrow (cell, id, vec) rows on cell; skewed cells split under AQE.
  * Cosines route through the native `dotd` codegen expression.
  */
object SemDedup {

  private def dot(a: Column, b: Column): Column = call_function("dotd", a, b)

  /** Assign each vector to its nearest centroid by cosine.
    *
    * @param emb   (id, v: array<double>, n2: double) — n2 = dot(v, v)
    * @param cents (c_id, cv: array<double>, cn2: double) — small, broadcast
    * @return (id, v, n2, cell, ccos) — ccos = cosine(v, centroid(cell))
    */
  def assign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("ccos").desc, col("c_id"))
    emb.join(broadcast(cents), lit(true))
      .withColumn("ccos",
        dot(col("cv"), col("v")) / (sqrt(col("cn2")) * sqrt(col("n2"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("v"), col("n2"), col("c_id").as("cell"), col("ccos"))
  }

  /** Ids pruned by within-cell near-duplicate removal at `theta`.
    * Input is [[assign]]'s output; result is (id, cell), one row per
    * removed vector (the semi-join deduplicates multi-neighbor hits).
    */
  def removed(assigned: DataFrame, theta: Double): DataFrame = {
    val a = assigned.as("a")
    val b = assigned.as("b")
    a.join(b,
        col("a.cell") === col("b.cell") &&
          col("a.id") =!= col("b.id") &&
          dot(col("a.v"), col("b.v")) /
            (sqrt(col("a.n2")) * sqrt(col("b.n2"))) >= theta &&
          (col("b.ccos") < col("a.ccos") ||
            (col("b.ccos") === col("a.ccos") && col("b.id") < col("a.id"))),
        "left_semi")
      .select(col("id"), col("cell"))
  }

  /** Survivors: the input minus [[removed]] (anti-join on id). */
  def survivors(assigned: DataFrame, theta: Double): DataFrame =
    assigned.join(removed(assigned, theta).select("id"), Seq("id"), "left_anti")
}
