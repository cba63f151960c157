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
  *     Laplace-smoothed so no zero/div-zero exists; products stay below
  *     2^53, so the int64→double casts are exact in both engines;
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
    val tot = bc.agg(sum("tc").as("tt"), sum("rc").as("rt"))
    // Laplace-smoothed quantized log-ratio; ONE double division of two
    // exact int64 products (< 2^53 ⇒ exact casts in both engines)
    val sq = bc.crossJoin(broadcast(tot))
      .select(col("bucket"),
        floor(log(((col("tc") + 1L) * (col("rt") + lit(b))).cast("double") /
          ((col("tt") + lit(b)) * (col("rc") + 1L)).cast("double"))
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
