package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Q

/** DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
  * 2023): select the raw-corpus documents whose hashed-n-gram profile is
  * most TARGET-like, by importance weight p_target/q_raw under two
  * bag-of-hashed-n-gram models, resampled without replacement via the
  * Gumbel-top-k trick. The published recipe for "pick the 10% of the
  * crawl that looks like Wikipedia" at pre-training scale (beyond
  * reference — pipeline surface; scespet has no corpus operators).
  *
  * Spark-first shape (the 100 TB story):
  *   - features are hashed on the MAP side (unigrams + bigrams →
  *     `buckets` ids); raw text never shuffles — the only corpus-wide
  *     exchanges move (doc_id, bucket) pairs and the per-doc weight
  *     reduce is map-side combinable;
  *   - both n-gram models are ONE shared aggregation over the feature
  *     frame (target counts as a conditional sum riding the raw count),
  *     bucket-bounded output → broadcast back; totals are a second agg
  *     over that B-row frame, not another corpus pass;
  *   - selection is `orderBy(score).limit(k)` = TakeOrdered (per-
  *     partition top-k, k·P driver merge), NOT a global-window
  *     row_number, which would single-partition the corpus.
  *
  * Determinism contract (gate-grade, cross-engine):
  *   - bucket ids via [[Q.hash60]] (md5-derived, engine-identical);
  *   - per-bucket log-ratio quantized `floor(ln(x)·10⁴)` where x is ONE
  *     IEEE division of exactly-agreed int64 products (the
  *     doc_unigram_nll regime): x = ((tc+1)·(rt+B)) / ((tt+B)·(rc+1)),
  *     Laplace-smoothed so no zero/div-zero exists; products below
  *     2^53 cast exactly to double in both engines — ENFORCED by a
  *     runtime bound check over the collected totals (fail-loud with a
  *     rescale remedy, never silent drift);
  *   - the Gumbel perturbation is deterministic: u = (hash60(id-salt) %
  *     2^20 + 1) / (2^20 + 1) ∈ (0,1), g_q = floor(−ln(−ln u)·10⁴) —
  *     same unit as the quantized log-weight, so score_q = lw_q + g_q
  *     IS "log w + Gumbel" of the paper, in integer nat·10⁻⁴ units;
  *   - k = ceil(n·num/den) in integer arithmetic; ties broken by id.
  */
object Dsir {

  /** Hashed unigram+bigram feature buckets for one tokenized document.
    * Distinct `u:`/`b:` prefixes keep the two n-gram orders collision-
    * free in feature-string space before hashing. `toks` must be a
    * PROJECTED array column (codegen does not CSE inside higher-order
    * lambdas — an inline split() here would re-tokenize per element).
    */
  def featureBuckets(toks: Column, buckets: Int): Column = {
    val unis = transform(toks, w => concat(lit("u:"), w))
    val bis = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(lit("b:"), element_at(toks, i), lit(" "),
          element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    transform(concat(unis, bis),
      f => pmod(Q.hash60(concat(lit("dsir|"), f)), lit(buckets.toLong)))
  }

  /** Dense per-document count vector over the hashed feature space —
    * the bridge from [[featureBuckets]] to fixed-width integer consumers
    * ([[LinearProbe]]'s xq contract in `doc_quality_probe`). `bks` MUST
    * be a PROJECTED column holding featureBuckets output (the no-CSE-in-
    * lambda rule: inlining it here would re-hash the document `buckets`
    * times).
    */
  def denseCounts(bks: Column, buckets: Int): Column =
    transform(sequence(lit(0), lit(buckets - 1)),
      j => size(filter(bks, x => x === j)).cast("long"))

  /** Typed-JVM twin of [[featureBuckets]] → [[denseCounts]] for hot
    * training loops: one MessageDigest hash per feature and a plain array
    * bump — measured ~10× cheaper than the interpreted higher-order-
    * function path, whose per-element lambda evaluation dominated
    * doc_quality_probe's bench profile (95 s → single-digit). Parity with
    * the Column path is spec-pinned (LinearProbeSpec).
    */
  def denseCountsJvm(toks: Seq[String], buckets: Int): Array[Long] = {
    val out = new Array[Long](buckets)
    def bump(f: String): Unit =
      out((Q.hash60Jvm("dsir|" + f) % buckets).toInt) += 1 // hash60 ≥ 0
    toks.foreach(w => bump("u:" + w))
    var i = 0
    while (i + 1 < toks.length) {
      bump("b:" + toks(i) + " " + toks(i + 1)); i += 1
    }
    out
  }

  /** Select the `keepNum/keepDen` fraction of `corpus` with the highest
    * Gumbel-perturbed importance weight toward the `isTarget` subset.
    *
    * @param corpus   one row per document
    * @param id       unique int64 document id column
    * @param toks     array<string> token column (projected, not inline)
    * @param isTarget boolean column marking the target subset (rows
    *                 where it is true define p; ALL rows define q)
    * @param buckets  hashed-feature space size (paper: 10⁴; B-bounded
    *                 model state, broadcast)
    * @return (id, lw_q, score_q) for the selected docs — lw_q the
    *         quantized log importance weight, score_q its Gumbel-
    *         perturbed sampling key — ordered by (score_q desc, id)
    */
  def select(corpus: DataFrame, id: Column, toks: Column, isTarget: Column,
             buckets: Int = 4096, keepNum: Int = 1, keepDen: Int = 10): DataFrame = {
    val b = buckets.toLong
    // persisted internals (model pass + scoring pass share the feature
    // frame; count + top-k share the scored frame) — released by the
    // action owner per the QueryDef cache-lifecycle contract
    val feats = corpus
      .select(id.as("id"), isTarget.as("tgt"),
        explode(featureBuckets(toks, buckets)).as("bucket"))
      .persist()
    // one corpus-wide pass builds BOTH models: target count rides the
    // raw count as a conditional sum; output is bucket-bounded
    val bc = feats.groupBy("bucket")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("tc"),
        count(lit(1)).as("rc"))
      .persist()
    // totals are a 1-row agg over the B-row model frame, collected so the
    // < 2^53 exactness contract below is ENFORCED, not assumed (ADVICE
    // r8): at pre-training scale (rt ~1e13) the products can exceed 2^53
    // — and int64 — so fail loudly with the rescale remedy instead of
    // silently losing cross-engine cast exactness
    val trow = bc.agg(sum("tc").as("tt"), sum("rc").as("rt"),
      max("tc").as("mtc"), max("rc").as("mrc")).head()
    val tt = if (trow.isNullAt(0)) 0L else trow.getLong(0)
    val rt = if (trow.isNullAt(1)) 0L else trow.getLong(1)
    val mtc = if (trow.isNullAt(2)) 0L else trow.getLong(2)
    val mrc = if (trow.isNullAt(3)) 0L else trow.getLong(3)
    val lim = BigInt(1) << 53
    require((BigInt(mtc) + 1) * (BigInt(rt) + b) < lim &&
      (BigInt(tt) + b) * (BigInt(mrc) + 1) < lim,
      s"DSIR log-ratio exactness bound exceeded (tt=$tt, rt=$rt, B=$b): " +
        "an int64 product reaches 2^53 and no longer casts exactly to " +
        "double — downscale tc/rc by a common factor before the ratio")
    // Laplace-smoothed quantized log-ratio; ONE double division of two
    // exact int64 products (< 2^53 ⇒ exact casts in both engines). The
    // totals fold in as literals — no crossJoin stage
    val sq = bc.select(col("bucket"),
      floor(log(((col("tc") + 1L) * lit(rt + b)).cast("double") /
        (lit(tt + b) * (col("rc") + 1L)).cast("double"))
        * 10000).as("s_q"))
    val scored = feats.join(broadcast(sq), "bucket")
      .groupBy("id")
      .agg(sum("s_q").as("lw_q"))
      .select(col("id"), col("lw_q"),
        (col("lw_q") +
          floor(-log(-log((pmod(Q.hash60(concat(lit("dsir-g|"), col("id"))),
            lit(1048576L)) + 1L).cast("double") / lit(1048577.0d)))
            * 10000).cast("long")).as("score_q"))
      .persist()
    val n = scored.count() // 1-row driver audit, the k-bounded pattern
    val k = ((n * keepNum + keepDen - 1) / keepDen).toInt
    scored.orderBy(col("score_q").desc, col("id"))
      .limit(k)
      .select(col("id"), col("lw_q"), col("score_q"))
  }
}
