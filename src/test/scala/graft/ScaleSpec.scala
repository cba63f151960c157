package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-technique demonstrations: salted aggregation correctness and
  * bucketed-table co-located joins (no shuffle in the plan).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg: two-phase aggregation equals direct aggregation") {
    // one mega-key (0) + long tail
    val df = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, col("id") % 100).otherwise(0L)).as("k"),
        (col("id") % 7).as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
      .orderBy("k").as[(Long, Long, Long, Long)].collect().toSeq
    val salted = Skew.saltedAgg(df, Seq("k"), salt = 8,
      partials = Seq("n" -> count(lit(1)), "s" -> sum(col("v")), "mx" -> max(col("v"))),
      merges = Seq("n" -> sum(col("n")), "s" -> sum(col("s")), "mx" -> max(col("mx"))))
      .orderBy("k").as[(Long, Long, Long, Long)].collect().toSeq
    salted shouldBe direct
  }

  test("partitioned writes prune at the source: lang=en scan never touches " +
    "other partitions") {
    // the 100 TB layout lever the single-file testdata can't show: corpus
    // written partitionBy(lang) → a lang-filtered query reads ONE directory
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString
    withClue(plan) {
      // the filter lands in PartitionFilters (directory pruning), NOT as a
      // row-level DataFilter over a full scan
      plan should include regex "PartitionFilters: \\[[^\\]]*lang"
      plan should not include regex ("PushedFilters: \\[[^\\]]*lang")
    }
    // and the pruned read returns exactly the en rows
    back.count() shouldBe docs.filter(col("lang") === "en").count()
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions " +
    "at runtime") {
    // star-schema 100 TB staple: fact partitioned by the join key, dim
    // filtered at runtime — the fact scan must receive a dynamicpruning
    // subquery (built from the broadcast dim) instead of reading all
    // partitions and filtering after the join.
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.range(10000)
      .select(col("id"), (col("id") % 50).as("k"))
      .write.mode("overwrite").partitionBy("k").parquet(s"$dir/fact")
    spark.range(50)
      .select(col("id").as("k"), (col("id") % 10).as("grp"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("grp") === 3)
    val joined = fact.join(dim, "k")
    joined.count() shouldBe 1000L // 5 of 50 keys survive the dim filter
    val plan = joined.queryExecution.executedPlan.toString
    withClue(plan) {
      plan.toLowerCase should include("dynamicpruning")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    spark.range(500).select(col("id").as("k"), (col("id") * 3).as("w"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    // co-located: both sides pre-bucketed on the join key → no Exchange
    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "Exchange hashpartitioning"
    }
    joined.count() shouldBe 500L
  }

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    // One key holds ~99% of the left side. With thresholds scaled to the
    // fixture, AQE's OptimizeSkewedJoin must split that partition into
    // multiple tasks instead of letting one straggler carry the join —
    // the runtime answer to skew the salting operator solves statically.
    val s = spark
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set(keys(0), "1.0")
      s.conf.set(keys(1), "8KB")
      s.conf.set(keys(2), "8KB")
      s.conf.set(keys(3), "-1") // keep the join sort-merge shaped
      val left = s.range(0, 200000).select(
        when(col("id") % 100 =!= 0, 0L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = s.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k").agg(count(lit(1)).as("n"))
      val n = j.collect().head.getLong(0)
      val plan = j.queryExecution.executedPlan.toString
      withClue(plan) { plan should include("skew=true") }
      // rows with k=0 match right's k=0 row; k=100,200,...<1000 also match
      n shouldBe 198000L + 10L
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }

  test("banded LSH candidate sets stay far below all-pairs " +
    "(dedup_simhash_pairs / emb_neardup shape)") {
    // synthetic signatures: 200 random-ish 60-bit values (md5-derived,
    // deterministic) + 5 planted near-dup pairs (hamming <= 2)
    val n = 200
    val base = spark.range(n).select(col("id").as("doc_id"),
      (conv(substring(md5(concat(lit("sig"), col("id"))), 1, 15), 16, 10)
        .cast("long")).as("simhash"))
    val planted = base.filter(col("doc_id") < 5)
      .select((col("doc_id") + n).as("doc_id"),
        (col("simhash").bitwiseXOR(lit(3L))).as("simhash")) // flip 2 bits
    val sigs = base.unionByName(planted)
    val banded = sigs.select(col("doc_id"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 15 * b).bitwiseAND(0x7FFFL).as("bh"))
      }: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
    val nCand = cand.count()
    val allPairs = (n + 5).toLong * (n + 4) / 2
    // every planted pair agrees on >= 2 of 4 bands (2 flipped bits can
    // break at most 2) → all 5 recalled; random 15-bit collisions are
    // ~n²/2^15 → candidate set is a tiny fraction of all-pairs
    nCand should be >= 5L
    nCand should be < (allPairs / 20)
  }

  test("repeated-span mining: candidate volume is the span-occurrence " +
    "count of shared hashes — exactly linear, never doc-pairs " +
    "(doc_repeated_spans shape)") {
    // 100 docs x 50 spans; doc pairs (2k, 2k+1) share their first 10
    // hashes, the rest are unique
    val nd = 100L
    val spans = spark.range(nd).select(col("id").as("doc_id"),
      explode(sequence(lit(0L), lit(49L))).as("i"))
      .select(col("doc_id"),
        when(col("i") < 10, xxhash64(expr("doc_id div 2"), col("i")))
          .otherwise(xxhash64(col("doc_id"), col("i") + 1000)).as("h"))
    val shared = spans.groupBy("h")
      .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("h")
    // the shared-hash set is 10 hashes per doc pair — nothing else collides
    shared.count() shouldBe (nd / 2) * 10
    // the join-back volume is one row per SHARED SPAN OCCURRENCE (2 per
    // shared hash here) — the quantity that scales the pipeline; a
    // pair-based formulation would be quadratic in group size instead
    spans.join(shared, "h").count() shouldBe nd * 10
    // per-doc output: every doc has 50 spans, 10 shared
    val out = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      .join(spans.join(shared, "h").groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared")), "doc_id")
    out.filter(col("n_spans") =!= 50 || col("n_shared") =!= 10)
      .count() shouldBe 0L
  }

  test("sparse tf-idf knn: candidate rows = sum df*(df-1)/2 over capped " +
    "tokens, and the df cap zeroes stopword contributions " +
    "(doc_sparse_knn shape)") {
    val nd = 120L
    // each doc: 20 hash-spread tokens (mean df ~2.4) + 1 stopword in
    // EVERY doc (df = 120 > cap)
    val tf = spark.range(nd).select(col("id").as("doc_id"),
      explode(sequence(lit(0L), lit(19L))).as("i"))
      .select(col("doc_id"),
        pmod(xxhash64(col("doc_id"), col("i")), lit(1000L)).as("tok"))
      .union(spark.range(nd).select(col("id").as("doc_id"), lit(-1L).as("tok")))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val comp = tf.join(dfc.filter(col("df") <= 100), "tok")
    // candidate volume (pre-aggregation self-join rows) is EXACTLY
    // sum over capped tokens of df*(df-1)/2 — the Σdf² bound
    val expected = dfc.filter(col("df") <= 100)
      .agg(sum(expr("df * (df - 1) div 2"))).head().getLong(0)
    val cands = comp.as("a").join(comp.as("b"),
      col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
    cands.count() shouldBe expected
    // the stopword (df = nd) is excluded — it alone would have added
    // nd*(nd-1)/2 = 7140 all-pairs rows, dwarfing the real signal
    comp.filter(col("tok") === -1L).count() shouldBe 0L
    expected should be < nd * (nd - 1) / 2
  }
}
