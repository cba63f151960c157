package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TopK}

/** Direct unit coverage for the small operators that are otherwise only
  * exercised through driver queries: exact per-group top-k and the
  * deterministic hash-gate sampling/split family.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Triangles.stats equals O(n³) brute-force enumeration on seeded " +
    "random graphs (orientation counts each triangle exactly once)") {
    for (seed <- Seq(7, 23, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 25
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n
        if rnd.nextDouble() < 0.25
      } yield (u.toLong, v.toLong)).toSeq
      val adj = edges.toSet
      val triBrute = (for {
        a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n
        if adj((a, b)) && adj((a, c)) && adj((b, c))
      } yield 1).size.toLong
      val degBrute = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map(_._2.size.toLong)
      val wedgeBrute = degBrute.map(d => d * (d - 1) / 2).sum
      // both physical strategies (edge-iterator broadcast path and the
      // huge-graph wedge-join path) must produce the identical exact count
      for (threshold <- Seq(Long.MaxValue, 0L)) {
        val row = graft.operators.Triangles
          .stats(edges.toDF("u", "v"), threshold).collect().head
        row.getLong(row.fieldIndex("n_nodes")) shouldBe degBrute.size.toLong
        row.getLong(row.fieldIndex("n_edges")) shouldBe edges.size.toLong
        row.getLong(row.fieldIndex("n_wedges")) shouldBe wedgeBrute
        row.getLong(row.fieldIndex("n_triangles")) shouldBe triBrute
      }
    }
  }

  test("Triangles.stats degenerate inputs: empty graph and wedge-free " +
    "graph produce zeros, not a division error") {
    val empty = graft.operators.Triangles
      .stats(Seq.empty[(Long, Long)].toDF("u", "v")).collect().head
    empty.toSeq shouldBe Seq(0L, 0L, 0L, 0L, 0L)
    // two disjoint edges: 4 nodes, 2 edges, no wedges, no triangles
    val flat = graft.operators.Triangles
      .stats(Seq((1L, 2L), (3L, 4L)).toDF("u", "v")).collect().head
    flat.toSeq shouldBe Seq(4L, 2L, 0L, 0L, 0L)
  }

  test("TopK.perGroup equals brute force under a total order") {
    val rows = (1 to 200).map(i => ((i % 7).toString, (i * 37) % 100, i.toLong))
    val df = rows.toDF("g", "score", "id")
    val got = TopK.perGroup(df, Seq("g"), Seq(col("score").desc, col("id")), 3)
      .select("g", "id").as[(String, Long)].collect().toSet
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(3).map(r => (g, r._3))
    }.toSet
    got shouldBe expected
  }

  test("splitAssign: disjoint total cover, deterministic under repartitioning, " +
    "same key always lands in the same split") {
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val keys = spark.range(5000).select(concat(lit("doc_"), col("id")).as("k"))
    val assigned = keys.withColumn("split",
      Sampling.splitAssign("s1", col("k"), splits))
    // total cover: every row gets exactly one label from the declared set
    assigned.filter(!col("split").isin("train", "val", "test")).count() shouldBe 0L
    val byName = assigned.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    byName.values.sum shouldBe 5000L
    // fractions near the declared percentages (hash-uniform, not exact)
    byName("train").toDouble / 5000 shouldBe 0.80 +- 0.03
    byName("val").toDouble / 5000 shouldBe 0.10 +- 0.02
    // repartitioning changes nothing
    val a = assigned.as[(String, String)].collect().toSet
    val b = keys.repartition(7).withColumn("split",
      Sampling.splitAssign("s1", col("k"), splits))
      .as[(String, String)].collect().toSet
    b shouldBe a
    // the gate is keyed: a different salt reshuffles, the same salt never does
    val c = keys.withColumn("split", Sampling.splitAssign("s2", col("k"), splits))
      .as[(String, String)].collect().toSet
    c should not be a
  }

  test("sampleGate keeps ~pct% and is a subset-stable gate (pct1 ⊂ pct2)") {
    val keys = spark.range(5000).select(concat(lit("doc_"), col("id")).as("k"))
    val p10 = keys.filter(Sampling.sampleGate("s", col("k"), 10))
      .as[String].collect().toSet
    val p30 = keys.filter(Sampling.sampleGate("s", col("k"), 30))
      .as[String].collect().toSet
    (p10.size.toDouble / 5000) shouldBe 0.10 +- 0.02
    (p30.size.toDouble / 5000) shouldBe 0.30 +- 0.03
    // monotone gates: the 10% sample is contained in the 30% sample —
    // growing a sample never resamples (stable experiment cohorts)
    p10.subsetOf(p30) shouldBe true
  }

  test("permilleHash is uniform on [0,1000), monotone-gated, partition-stable") {
    val keys = spark.range(5000).select(concat(lit("doc_"), col("id")).as("k"))
    val h = keys.select(Sampling.permilleHash("s", col("k")).as("h"))
      .as[Long].collect()
    all(h) should (be >= 0L and be < 1000L)
    // a 12.5% per-mille gate lands near 12.5% (finer than pctHash's 1% steps)
    (h.count(_ < 125).toDouble / 5000) shouldBe 0.125 +- 0.02
    // monotone: the 125-permille cohort is inside the 300-permille cohort
    h.count(x => x < 125 && x >= 300) shouldBe 0
    // partitioning-independent (hash of the key, not of placement)
    val h7 = keys.repartition(7)
      .select(col("k"), Sampling.permilleHash("s", col("k")).as("h"))
      .orderBy("k").as[(String, Long)].collect().map(_._2)
    val h1 = keys.select(col("k"), Sampling.permilleHash("s", col("k")).as("h"))
      .orderBy("k").as[(String, Long)].collect().map(_._2)
    h7 shouldBe h1
  }

  test("RangeShards: contiguous monotone ranges, whole-key shards, " +
    "near-balanced, partitioning-independent") {
    import graft.operators.RangeShards
    // skewed integral scores: hash-spread 0..99 plus a fat tie group at 50
    val d = spark.range(10000).select(col("id"),
      when(col("id") % 5 === 0, lit(50L))
        .otherwise(pmod(hash(col("id")), lit(100)).cast("long")).as("score"))
    val a = RangeShards.assign(d, "score", 8)
    val stats = a.groupBy("shard")
      .agg(min("score").as("lo"), max("score").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("shard")
      .as[(Long, Long, Long, Long)].collect()
    // ranges are contiguous and non-overlapping in shard order
    stats.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => lo2 should be > hi1
      case _ =>
    }
    // whole-key granularity: every score maps to exactly one shard
    a.groupBy("score").agg(countDistinct("shard").as("ns"))
      .agg(max("ns")).as[Long].head() shouldBe 1L
    // near-balance: each shard ≤ ideal + largest tie group
    val tieMax = d.groupBy("score").count().agg(max("count")).as[Long].head()
    all(stats.map(_._4)) should be <= (10000L / 8 + tieMax)
    // deterministic under repartitioning
    val b = RangeShards.assign(d.repartition(7), "score", 8)
      .select("id", "shard").orderBy("id").as[(Long, Long)].collect()
    val a1 = a.select("id", "shard").orderBy("id").as[(Long, Long)].collect()
    b shouldBe a1
  }

  test("RangeShards law: shard equals floor(rowsBefore·N/total) from a " +
    "brute-force rank, for several shard counts") {
    import graft.operators.RangeShards
    val rnd = new scala.util.Random(7)
    val scores = Vector.fill(2000)(rnd.nextInt(60).toLong)
    val d = scores.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
    val total = scores.size.toLong
    for (n <- Seq(1, 3, 8, 16)) {
      val brute = scores.zipWithIndex.map { case (s, i) =>
        val before = scores.count(_ < s).toLong
        i.toLong -> before * n / total
      }.toMap
      val dist = RangeShards.assign(d, "score", n)
        .select("id", "shard").as[(Long, Long)].collect().toMap
      dist shouldBe brute
    }
  }

  test("Decontaminate.hits (Bloom-pruned) is bit-identical to the exact " +
    "join, and the prune passes every true hit") {
    import graft.operators.Decontaminate
    // corpus: 5000 (doc, hash) rows over a large hash space; bench: a
    // planted subset, so hits are known
    val corpus = spark.range(5000).select(
      (col("id") % 100).as("doc_id"),
      (hash(col("id")).cast("long") * 1000003L).as("h"))
    val bench = corpus.filter(col("doc_id") % 7 === 0)
      .select("h").distinct()
    val got = Decontaminate.hits(corpus, bench)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = corpus.join(bench, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe exact
    // disjoint benchmark: no false hits survive the exact phase
    val none = Decontaminate.hits(corpus,
      spark.range(100).select((col("id") + 1).as("h")))
    none.count() shouldBe 0L
  }

  test("RangeShards NULL-score policy: rows are kept, NULL sorts first " +
    "into shard 0, law unchanged for non-NULL scores") {
    import graft.operators.RangeShards
    // 100 NULL scores + 900 spread 0..8 — NULL is the lowest tie group
    val d = spark.range(1000).select(col("id"),
      when(col("id") < 100, lit(null).cast("long"))
        .otherwise(col("id") % 9).as("score"))
    val a = RangeShards.assign(d, "score", 4)
    a.count() shouldBe 1000L // ADVICE r4: equality join dropped NULL rows
    // NULLs are the lowest whole-key group: all in shard 0
    a.filter(col("score").isNull).select("shard")
      .distinct().as[Long].collect() shouldBe Array(0L)
    // law for the rest: floor(rowsBefore·4/1000) with NULLs counted before
    val nonNull = a.filter(col("score").isNotNull)
      .select("score", "shard").as[(Long, Long)].collect()
    val counts = (0L to 8L).map(s => s -> (100L + s * 100)).toMap // rowsBefore
    nonNull.foreach { case (s, shard) => shard shouldBe counts(s) * 4 / 1000 }
  }
}
