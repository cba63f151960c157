package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Linear-probe quality classification over embeddings — the linear
  * classifier workhorse of LLM data pipelines (fastText-style quality
  * filters score every document with a linear model; a probe trained on
  * labeled embeddings is the same shape): multiclass BATCH perceptron,
  * all-integer, so training and scoring are exactly reproducible across
  * partitionings, schedules, and engines — no learning-rate floats, no
  * sigmoid/log libm calls (the engine-wide determinism rule).
  *
  * Algorithm (classic batch perceptron, Freund & Schapire's additive
  * multiclass form): embeddings quantize once to int vectors
  * x_q = floor(x·Q); step t scores every example against the current
  * integer weights (argmax_c ⟨w_c, x_q⟩, ties to the LOWEST class id),
  * and every misclassified example contributes +x_q to its true class
  * and −x_q to the predicted class; the summed deltas apply at step end.
  * Batch (not online) deliberately: the update is a pure aggregation —
  * order-independent, hence partition-independent — while the online
  * variant's weight trajectory depends on row order.
  *
  * Scale shape (the KMeans/PageRank/BPE loop discipline): per step ONE
  * shuffle-free distributed pass over the corpus (broadcast k×d weights,
  * per-partition partial k×d delta matrices) and a k×d×partitions-bounded
  * driver collect+merge; weights never live in a shuffle. Exactness envelope: |x_q| ≤ Q·max|x|, |w| ≤ steps·n·|x_q|,
  * |score| ≤ d·|w|·|x_q| — int64-safe far past 10⁶ examples at Q = 10³,
  * and every double the oracle produces en route (list_sum of integer
  * products) stays integer-valued < 2⁵³, so the cross-engine compare is
  * exact.
  *
  * Reference analog: none (beyond-reference pipeline surface).
  */
object LinearProbe {

  final case class Ex(label: Int, xq: Array[Long])

  private[graft] def predict(w: Array[Array[Long]], x: Array[Long]): Int = {
    var best = 0
    var bestS = Long.MinValue
    var c = 0
    while (c < w.length) {
      val wc = w(c)
      var s = 0L
      var j = 0
      while (j < wc.length) { s += wc(j) * x(j); j += 1 }
      if (s > bestS) { bestS = s; best = c } // strict >: ties → lowest c
      c += 1
    }
    best
  }

  /** Train `steps` batch-perceptron rounds; returns every post-update
    * weight iterate w_1..w_steps (k×d ints each, driver-bounded).
    */
  def trainIterates(emb: DataFrame, k: Int, d: Int,
                    steps: Int): Seq[Array[Array[Long]]] = {
    val s = emb.sparkSession
    import s.implicits._
    val ds: Dataset[Ex] = emb.select(col("label").cast("int").as("label"),
      col("xq")).as[Ex].cache()
    try {
      // Enforce the documented exactness envelope LOUDLY (ADVICE r10):
      // |w_c(j)| ≤ steps·n·max|xq| (each misclassified row adds ±xq once
      // per step), so the score term Σ_d w·x is bounded by
      // d·steps·n·max|xq|². Outside that, Spark's Long would wrap
      // silently while the DuckDB oracle's ::BIGINT cast errors — a
      // confusing cross-engine divergence instead of a clear failure.
      // One cheap agg over the (already cached) corpus buys the check.
      val (nRows, maxAbs) = {
        val r = ds.select(count(lit(1)),
          coalesce(max(expr("aggregate(xq, 0L, (m, v) -> greatest(m, abs(v)))")), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      val worst = BigInt(d) * steps * nRows * maxAbs * maxAbs
      require(worst <= Long.MaxValue,
        s"integer-exactness envelope exceeded: d=$d × steps=$steps × n=$nRows × max|xq|²=${maxAbs}² " +
          s"= $worst > 2^63-1 — scores would wrap; lower Q or steps (LinearProbe scaladoc)")
      var w = Array.fill(k, d)(0L)
      val iters = Seq.newBuilder[Array[Array[Long]]]
      for (_ <- 1 to steps) {
        val bw = s.sparkContext.broadcast(w)
        // Per-partition partial k×d delta matrices merged on the driver —
        // ONE shuffle-free job per step (r16; the flatMap → posexplode →
        // groupBy formulation cost 2 jobs + a shuffle per step, pure
        // scheduling floor on small corpora). Bit-identical result:
        // integer addition is commutative/associative, and the entry
        // envelope bound |Σ_subset delta| ≤ n·max|xq| covers every
        // partial, so no intermediate can wrap that the grouped form
        // wouldn't. Driver merge stays k×d×numPartitions-bounded (the
        // loop discipline — weights never live in a shuffle).
        val partials = ds.mapPartitions { it =>
          val acc = new Array[Long](k * d) // row-major k×d (flat: encoder)
          var any = false
          it.foreach { ex =>
            require(ex.label >= 0 && ex.label < k,
              s"label ${ex.label} outside [0, $k) — pass the right class count")
            require(ex.xq.length == d,
              s"vector dim ${ex.xq.length} != d=$d")
            val pred = predict(bw.value, ex.xq)
            if (pred != ex.label) {
              any = true
              val xa = ex.xq
              val ol = ex.label * d; val op = pred * d
              var j = 0
              while (j < d) { acc(ol + j) += xa(j); acc(op + j) -= xa(j); j += 1 }
            }
          }
          if (any) Iterator.single(acc) else Iterator.empty
        }.collect() // k×d-bounded driver state (the loop discipline)
        val next = w.map(_.clone())
        partials.foreach { m => // addExact: driver-side k×d, belt to the entry guard
          var c = 0
          while (c < k) {
            val nc = next(c)
            var j = 0
            while (j < d) {
              val v = m(c * d + j)
              if (v != 0L) nc(j) = Math.addExact(nc(j), v)
              j += 1
            }
            c += 1
          }
        }
        w = next
        iters += w
        bw.unpersist()
      }
      iters.result()
    } finally ds.unpersist()
  }

  /** Final AVERAGED-perceptron weights: the elementwise SUM of the
    * iterates (argmax is scale-invariant, so the sum IS the average) —
    * the classic stabilizer for non-separable data, where the last
    * iterate oscillates (measured on the fixture: last-iterate accuracy
    * 0.13 vs 0.20 averaged ≈ the nearest-centroid linear ceiling).
    * Integer-exact: a sum of int iterates.
    */
  def train(emb: DataFrame, k: Int, d: Int, steps: Int): Array[Array[Long]] = {
    val iters = trainIterates(emb, k, d, steps)
    val acc = Array.fill(k, d)(0L)
    iters.foreach { wi =>
      var c = 0
      while (c < k) {
        var j = 0
        while (j < d) { acc(c)(j) += wi(c)(j); j += 1 }
        c += 1
      }
    }
    acc
  }

  /** Train, then score the corpus under the final weights: per-class
    * support, correct count, and exact integer per-mille accuracy.
    *
    * @param emb (label: int, xq: array&lt;long&gt;) — quantized vectors
    * @return (label, n, n_correct, acc_pm) ordered by label
    */
  def probe(emb: DataFrame, k: Int, d: Int, steps: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val w = train(emb, k, d, steps)
    val bw = s.sparkContext.broadcast(w)
    emb.select(col("label").cast("int").as("label"), col("xq")).as[Ex]
      .map(ex => (ex.label,
        if (predict(bw.value, ex.xq) == ex.label) 1L else 0L))
      .toDF("label", "ok")
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("n_correct"))
      .withColumn("acc_pm", expr("n_correct * 1000 DIV n"))
      .select(col("label").cast("long").as("label"), col("n"),
        col("n_correct"), col("acc_pm"))
      .orderBy("label")
  }
}
