package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with trained per-subspace codebooks — the
  * memory side of IVF-PQ at 100 TB: a dim-D vector is stored as M one-byte
  * codes (D·8 bytes → M bytes), and queries score candidates from a
  * per-query lookup table with M integer adds instead of a full dot
  * product (asymmetric distance computation, ADC). Reference pipeline
  * analog: the `emb_pq_adc` driver query runs the same machinery with a
  * one-step-trained codebook under the DuckDB oracle; this operator is the
  * realistic-parameter trainer (Lloyd iterations, K up to 256 codes).
  *
  * Determinism (the engine-wide contract): seeds are the subvectors of
  * the K lowest vec_ids, assignment argmins break ties to the lowest code,
  * and per-(m, code, dim) means accumulate as EXACT int64 sums of
  * floor-quantized coordinates with one double division — independent of
  * partitioning and scheduling.
  *
  * Scale shape: training iterates [broadcast(M·K·sub codebook) join →
  * map-side partial argmin → one shuffle of M·K·sub quantized cells];
  * the corpus never shuffles. Encoding is the same broadcast join once.
  * ADC is a broadcast LUT join + per-(q, candidate) sum — integer adds,
  * map-side combinable.
  */
object PQ {

  /** One codeword: subspace m, code id, centroid. */
  final case class Codeword(m: Int, code: Int, cw: Array[Double])

  private val Q = 1000000000L // 1e-9 mean quantization (engine convention)

  /** Portable left-to-right dot (sub-dims are small; stays codegen'd). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Explode `vecCol` into (idCol, m, sub) subvector rows. */
  private def subRows(df: DataFrame, idCol: String, vecCol: String,
      m: Int, subLen: Int): DataFrame =
    df.select(col(idCol),
      explode(array((0 until m).map { mi =>
        struct(lit(mi).as("m"), slice(col(vecCol), mi * subLen + 1, subLen).as("sub"))
      }: _*)).as("s"))
      .select(col(idCol), col("s.m").as("m"), col("s.sub").as("sub"))

  private def codebookDf(df: DataFrame, cbs: Seq[Codeword]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    cbs.map(c => (c.m, c.code, c.cw.toSeq)).toDF("m", "code", "cw")
      .withColumn("cwn2", dot(col("cw"), col("cw")))
  }

  /** Argmin-L2 code per (id, m): |cw|² − 2·sub·cw (the sub's own norm is
    * constant across codes), lowest code on exact ties.
    */
  private def encodeSubs(subs: DataFrame, cbDf: DataFrame, idCol: String): DataFrame =
    subs.join(broadcast(cbDf), "m")
      .withColumn("d2", col("cwn2") - lit(2.0) * dot(col("sub"), col("cw")))
      .groupBy(col(idCol), col("m"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))

  /** Train per-subspace L2 codebooks with Lloyd iterations — all M
    * subspaces advance in ONE distributed job per iteration.
    *
    * @param emb    (vec_id: Long, v: array&lt;double&gt;); pre-normalize v
    *               if ADC should approximate cosine rather than raw IP
    * @param m      number of subspaces (dim % m == 0)
    * @param k      codes per subspace (≤ corpus size; 256 = published PQ)
    */
  def trainCodebooks(emb: DataFrame, m: Int, k: Int, iterations: Int): Seq[Codeword] = {
    val dim = emb.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subLen = dim / m
    val pts = subRows(emb, "vec_id", "v", m, subLen).localCheckpoint()

    var cbs: Seq[Codeword] = emb.orderBy("vec_id").limit(k)
      .select(col("v")).collect().zipWithIndex.flatMap { case (r, code) =>
        val v = r.getSeq[Double](0).toArray
        (0 until m).map(mi => Codeword(mi, code, v.slice(mi * subLen, (mi + 1) * subLen)))
      }.toSeq

    for (_ <- 1 to iterations) {
      val means = encodeSubs(pts, codebookDf(emb, cbs), "vec_id")
        .join(pts, Seq("vec_id", "m"))
        .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("m", "code", "pos")
        .agg((sum(floor(col("x") * Q)).cast("double") /
          (count(lit(1)) * Q).cast("double")).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case ((mi, code), rows) =>
          val v = new Array[Double](subLen)
          rows.foreach(r => v(r.getInt(2)) = r.getDouble(3))
          (mi, code) -> v
        }
      // empty cells keep their previous codeword (deterministic)
      cbs = cbs.map(c => Codeword(c.m, c.code, means.getOrElse((c.m, c.code), c.cw)))
    }
    cbs
  }

  /** Encode a corpus: (vec_id, m, code) — M rows per vector, 1 byte of
    * payload each at K ≤ 256.
    */
  def encode(emb: DataFrame, cbs: Seq[Codeword]): DataFrame = {
    val m = cbs.map(_.m).max + 1
    val subLen = cbs.head.cw.length
    encodeSubs(subRows(emb, "vec_id", "v", m, subLen), codebookDf(emb, cbs), "vec_id")
  }

  /** Per-query ADC lookup table: (q_id, m, code, pdot) — the dot of each
    * EXACT query subvector with each trained codeword, floor-quantized to
    * int64 so the M-way candidate sums are exact (double sums are
    * fold-order-nondeterministic; longs are not). M·K rows per query —
    * always broadcast-sized.
    */
  def lut(queries: DataFrame, cbs: Seq[Codeword]): DataFrame = {
    val m = cbs.map(_.m).max + 1
    val subLen = cbs.head.cw.length
    subRows(queries, "q_id", "qv", m, subLen)
      .join(broadcast(codebookDf(queries, cbs)), "m")
      .select(col("q_id"), col("m"), col("code"),
        floor(dot(col("sub"), col("cw")) * 1e6).cast("long").as("pdot"))
  }

  /** ADC top-k: per-query LUT of query-subvector × codeword dots
    * (quantized to int64 — exact cross-partition sums), M adds per
    * candidate, top-k by quantized score (vec_id tie-break). Queries never
    * score themselves.
    *
    * @param encoded corpus codes from [[encode]]
    * @param queries (q_id: Long, qv: array&lt;double&gt;) — EXACT query
    *                vectors (asymmetric: only the corpus is quantized)
    */
  def adcTopK(
      encoded: DataFrame,
      queries: DataFrame,
      cbs: Seq[Codeword],
      topK: Int): DataFrame = {
    encoded.join(broadcast(lut(queries, cbs)), Seq("m", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("pdot")).as("score_q"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("score_q").desc, col("vec_id"))))
      .filter(col("rk") <= topK)
      .select("q_id", "rk", "vec_id", "score_q")
  }
}
