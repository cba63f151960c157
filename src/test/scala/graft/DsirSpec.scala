package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling laws: exact selection size, genuine target
  * enrichment (the selected set must look MORE like the target than the
  * corpus does — the property the method exists for), partitioning
  * independence, and degenerate-input behavior.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic two-population corpus: target docs draw tokens from an
    * "alpha" vocabulary, background docs from a "beta" vocabulary, with a
    * deterministic minority of background docs written in alpha-speak —
    * the docs DSIR should fish out.
    */
  private def corpus = spark.range(400).select(
    col("id").as("doc_id"),
    (col("id") % 4 === 0).as("is_target"),
    // alpha-speak for targets AND for every 7th background doc
    when(col("id") % 4 === 0 || col("id") % 7 === 0,
      concat_ws(" ",
        concat(lit("alpha"), pmod(col("id"), lit(5))),
        concat(lit("alpha"), pmod(col("id") * 3, lit(5))),
        concat(lit("alpha"), pmod(col("id") * 7, lit(5))),
        lit("common")))
      .otherwise(concat_ws(" ",
        concat(lit("beta"), pmod(col("id"), lit(11))),
        concat(lit("beta"), pmod(col("id") * 3, lit(11))),
        concat(lit("beta"), pmod(col("id") * 7, lit(11))),
        lit("common"))).as("text"))
    .select(col("doc_id"), col("is_target"),
      split(col("text"), " ").as("t"))

  test("selects exactly ceil(n/10) docs, ordered by (score desc, id)") {
    val sel = Dsir.select(corpus, col("doc_id"), col("t"),
      col("is_target"), buckets = 1024).collect()
    sel.length shouldBe 40 // ceil(400/10)
    val scores = sel.map(r => (r.getLong(2), r.getLong(0)))
    scores.sortBy { case (s, id) => (-s, id) }.toSeq shouldBe scores.toSeq
  }

  test("selection is target-enriched: alpha-speak docs dominate") {
    val sel = Dsir.select(corpus, col("doc_id"), col("t"),
      col("is_target"), buckets = 1024)
    val ids = sel.select("id").as[Long].collect().toSet
    // alpha-speak docs (targets + the planted 7th-multiples) should fill
    // nearly the whole selection; by chance it would be ~39%
    val alphaSpeak = ids.count(id => id % 4 == 0 || id % 7 == 0)
    alphaSpeak.toDouble / ids.size should be >= 0.9
  }

  test("partitioning-independent: repartition(7) yields the same set") {
    val a = Dsir.select(corpus, col("doc_id"), col("t"),
      col("is_target"), buckets = 1024).collect().toSeq
    val b = Dsir.select(corpus.repartition(7), col("doc_id"), col("t"),
      col("is_target"), buckets = 1024).collect().toSeq
    a shouldBe b
  }

  test("degenerate inputs: empty corpus, single doc, all-target") {
    val empty = corpus.filter(lit(false))
    Dsir.select(empty, col("doc_id"), col("t"), col("is_target"))
      .count() shouldBe 0L

    val one = corpus.limit(1)
    val selOne = Dsir.select(one, col("doc_id"), col("t"), col("is_target"))
      .collect()
    selOne.length shouldBe 1 // ceil(1/10) = 1

    // all-target ≡ raw: every smoothed ratio uses tc=rc, tt=rt — weights
    // near zero, selection still exactly ceil(n/10), no NaN/null
    val allT = Dsir.select(corpus, col("doc_id"), col("t"), lit(true))
    allT.count() shouldBe 40L
    allT.filter(col("lw_q").isNull || col("score_q").isNull)
      .count() shouldBe 0L
  }
}
