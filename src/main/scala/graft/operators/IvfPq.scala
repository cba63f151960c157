package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end IVF-PQ — THE billion-vector ANN serving shape: a trained
  * coarse quantizer (IVF, [[KMeans]]) routes each query to its `nprobe`
  * nearest cells, and candidates inside those cells are scored from
  * [[PQ]]-compressed RESIDUAL codes (v − coarse centroid, classic IVFADC)
  * via asymmetric distance computation. Composes the two verified halves
  * (KMeans coarse cells, PQ.adcTopK re-rank) that r3 shipped separately.
  *
  * Scale shape (what makes this THE plan at 10⁹ vectors):
  *   - index build: KMeans touches the corpus once per Lloyd iteration
  *     (broadcast centroids, map-side argmax); PQ training shuffles only
  *     M·K·subLen quantized cells per iteration; encoding is one broadcast
  *     join. The corpus itself never shuffles.
  *   - serving: centroids + codebooks + per-query LUTs are all broadcast;
  *     the probe is a broadcast semi-join on cell id, so per-query work is
  *     bounded by nprobe cell sizes, never the corpus. The only shuffle is
  *     the final (q_id, vec_id) partial-aggregated candidate sum.
  *   - memory: candidates are scored from M one-byte codes (64-dim double
  *     vector = 512 B → M bytes, 128× at M=4), the reason IVF-PQ serves
  *     billions of vectors from RAM.
  *
  * Determinism: both trainers carry the engine-wide exact-integer
  * contracts (floor-quantized means, id tie-breaks); scores are int64
  * sums of floor-quantized partial dots — partition-order independent.
  */
object IvfPq {

  /** Left-to-right fold dot (small arrays; stays codegen'd). */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** A built IVF-PQ index: trained coarse centroids, residual codebooks,
    * and the encoded corpus — `(vec_id, cell, m, code)`, M rows of one-byte
    * payload per vector. Build ONCE, serve many query batches: the real
    * deployment shape (the index is the expensive artifact; [[serve]] is
    * the cheap per-batch plan).
    */
  final case class Index(
      cents: Seq[KMeans.Centroid],
      cbs: Seq[PQ.Codeword],
      encoded: DataFrame)

  /** Train + encode an IVF-PQ index over a NORMALIZED corpus
    * `(vec_id: Long, v: array&lt;double&gt;)` (unit vectors — ADC inner
    * product then ranks by cosine).
    *
    * RESIDUAL encoding (classic IVFADC, Jégou et al. 2011, §III): PQ
    * quantizes r = v − c(cell) rather than v itself. Residuals spread far
    * tighter than raw vectors, so the same M×K code budget buys exacter
    * scores — the standard recall upgrade at small nprobe. Scoring splits
    * exactly: q·v = q·c(cell) + q·r, where the first term is a per-
    * (query, cell) CONSTANT carried on the probe list and the second is
    * the usual cell-independent ADC LUT sum (the LUT is q·codeword — the
    * codebooks live in residual space, but the lookup shape is unchanged).
    */
  def build(
      embN: DataFrame,
      kCoarse: Int, kmIters: Int,
      m: Int, k: Int, pqIters: Int): Index = {
    val spark = embN.sparkSession
    import spark.implicits._
    val (cents, assign) = KMeans.run(
      embN.select(col("vec_id").as("id"), col("v")), kCoarse, kmIters)
    val centDf = cents.map(c => (c.cell, c.v.toSeq)).toDF("cell", "cv")
    val resid = embN
      .join(assign.withColumnRenamed("id", "vec_id"), "vec_id")
      .join(broadcast(centDf), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("v"))
      .localCheckpoint() // trainer (iterative) + encode both consume it
    val cbs = PQ.trainCodebooks(resid.select("vec_id", "v"), m, k, pqIters)
    val encoded = PQ.encode(resid.select("vec_id", "v"), cbs)
      .join(resid.select("vec_id", "cell"), "vec_id")
    Index(cents, cbs, encoded)
  }

  /** Append a NORMALIZED vector batch `(vec_id, v)` to a built index
    * WITHOUT retraining — the FAISS `add()` / daily-ingest shape
    * (mirrors `dedup_incremental`'s registry pattern on the ANN side).
    *
    * The quantizer is FROZEN: each new vector routes to its nearest
    * existing coarse cell (broadcast centroids, map-side argmax — the
    * exact assignment map `build` used), its residual is PQ-encoded
    * against the existing codebooks, and the encoded rows union in.
    * Consequently append(build(A), B).encoded is BIT-IDENTICAL to
    * encoding A∪B under A's quantizer — serving the appended index
    * equals serving that full encode exactly (AnnRecallSpec pins both
    * the equality and the recall gate). Cost: one pass over the NEW
    * batch only; the existing corpus is untouched.
    */
  def append(index: Index, embN: DataFrame): Index = {
    val spark = embN.sparkSession
    import spark.implicits._
    val assign = KMeans.assign(
      embN.select(col("vec_id").as("id"), col("v").as("vn")),
      index.cents, forceJoin = false)
      .select(col("id").as("vec_id"), col("cell"))
    val centDf = index.cents.map(c => (c.cell, c.v.toSeq)).toDF("cell", "cv")
    val resid = embN
      .join(assign, "vec_id")
      .join(broadcast(centDf), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("v"))
      .localCheckpoint() // encode + cell tag both consume it
    val encodedNew = PQ.encode(resid.select("vec_id", "v"), index.cbs)
      .join(resid.select("vec_id", "cell"), "vec_id")
    Index(index.cents, index.cbs, index.encoded.unionByName(encodedNew))
  }

  /** Serve one query batch `(q_id: Long, qv: array&lt;double&gt;)` (unit
    * vectors, EXACT — asymmetric distance) against a built index.
    *
    * Scale shape: centroids, probe lists, and LUTs broadcast; candidates
    * bounded by the nprobe probed cells per query, never the corpus; ONE
    * partial-aggregated (q_id, vec_id) shuffle. The per-(query, cell)
    * residual constant q·c rides the probe list as a quantized long.
    *
    * @param excludeSelf drop the corpus vector whose vec_id equals the
    *        query's q_id — ONLY correct when q_ids are corpus vec_ids
    *        (the self-query shape, [[topK]]). For external query batches
    *        keep the default `false`: an unrelated q_id colliding with a
    *        vec_id must not silently lose that corpus vector (ADVICE r5).
    */
  def serve(index: Index, queries: DataFrame, nprobe: Int, topK: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = index.cents
      .map(c => (c.cell, c.v.toSeq, math.sqrt(c.v.map(x => x * x).sum)))
      .toDF("cell", "cv", "cnorm")
    // nprobe nearest cells by cosine (cell tie-break) + the floor-
    // quantized q·c(cell) score constant. Centroids are means of unit
    // vectors; queries are unit too → cosine = dot / |centroid|.
    val probes = queries.crossJoin(broadcast(centDf))
      .withColumn("s", dot(col("qv"), col("cv")) / col("cnorm"))
      .withColumn("prk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("s").desc, col("cell"))))
      .filter(col("prk") <= nprobe)
      .select(col("q_id"), col("cell"),
        floor(dot(col("qv"), col("cv")) * 1e6).cast("long").as("qc"))
    // ADC inside probed cells: M integer adds per candidate plus the cell
    // constant. Each candidate lives in exactly one cell, so qc is
    // constant per (q_id, vec_id) group — min() just makes the aggregate
    // deterministic.
    val cands = index.encoded.join(broadcast(probes), "cell")
      .join(broadcast(PQ.lut(queries, index.cbs)), Seq("q_id", "m", "code"))
    (if (excludeSelf) cands.filter(col("vec_id") =!= col("q_id")) else cands)
      .groupBy("q_id", "vec_id")
      .agg((min(col("qc")) + sum(col("pdot"))).as("score_q"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("score_q").desc, col("vec_id"))))
      .filter(col("rk") <= topK)
      .select("q_id", "rk", "vec_id", "score_q")
  }

  /** IVF-PQ cosine top-k — [[build]] + [[serve]] in one call.
    *
    * @param emb     (vec_id: Long, v: array&lt;double&gt;) corpus; normalized
    *                internally (ADC inner product then ranks by cosine)
    * @param queryPred predicate over vec_id selecting the query subset
    *                (queries use EXACT vectors — asymmetric distance)
    * @param kCoarse IVF cell count (≈ √n at scale; cells bound probe work)
    * @param kmIters Lloyd iterations for the coarse quantizer
    * @param m       PQ subspaces; k — codes per subspace; pqIters — Lloyd
    *                iterations for the codebooks
    * @param nprobe  cells probed per query (the recall/latency lever)
    * @return (q_id, rk, vec_id, score_q) — top `topK` per query by ADC
    *         score, vec_id tie-break, queries never score themselves
    */
  def topK(
      emb: DataFrame,
      queryPred: org.apache.spark.sql.Column,
      kCoarse: Int, kmIters: Int,
      m: Int, k: Int, pqIters: Int,
      nprobe: Int, topK: Int): DataFrame = {
    val n2 = aggregate(transform(col("v"), x => x * x), lit(0.0), (a, b) => a + b)
    val embN = emb
      .select(col("vec_id"), transform(col("v"), x => x / sqrt(n2)).as("v"))
      .localCheckpoint() // both trainers + encode + queries consume it
    val index = build(embN, kCoarse, kmIters, m, k, pqIters)
    val queries = embN.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    serve(index, queries, nprobe, topK, excludeSelf = true)
  }
}
