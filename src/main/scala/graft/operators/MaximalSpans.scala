package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Variable-length MAXIMAL repeated-span mining — the exact-substring
  * dedup signal of "Deduplicating Training Data Makes Language Models
  * Better" (Lee et al. 2021), which removes *maximal* repeats of >= k
  * tokens found via a corpus suffix array. A monolithic suffix array is
  * not distribution-friendly; the equivalent here keeps the exactness of
  * the suffix-array formulation while staying shuffle-narrow:
  *
  * Definitions (token alphabet = per-token 60-bit hashes, identical in
  * the DuckDB oracle, so even a hash collision is cross-engine
  * consistent):
  *   - lrs(p) = length of the longest prefix of the suffix at position p
  *     (capped at `cap` tokens) that occurs >= 2 times in the corpus
  *     (any document, within-document repeats included);
  *   - a span (p, lrs(p)) with lrs(p) >= minLen is emitted iff it is
  *     LEFT-MAXIMAL: lrs(p-1) < lrs(p)+1 (the one-token-left extension
  *     does not repeat), so every emitted span is exactly one maximal
  *     repeat. Right-maximality holds by definition of lrs. Repeats
  *     longer than `cap` are reported clipped to `cap`, and span starts
  *     inside a cap-saturated run coalesce into the run head (the
  *     capped lrs cannot distinguish them) — `cap` is the documented
  *     operating envelope, sized to the span lengths worth cutting.
  *
  * Plan shape (no document text ever shuffles — only fixed-width long
  * frames and bounded hash windows):
  *   1. CANDIDATE FILTER: positions whose minLen-gram (as the token-hash
  *      prefix) occurs >= 2 times — one narrow groupBy over
  *      (doc_id, i, prefix) rows. Only candidates can host a span
  *      >= minLen, and the candidate set is closed under the
  *      left-maximality test (a non-candidate left neighbor has
  *      lrs < minLen and can never suppress), so the expensive stage
  *      below runs on the repeated fraction of the corpus only.
  *   2. SUFFIX SORT: each candidate carries its capped token-hash window
  *      (<= cap longs, fixed width); one repartitionByRange + in-partition
  *      sort orders the capped suffixes. Under ANY total alphabet order,
  *      each suffix's maximum-LCP partner is adjacent in suffix order —
  *      the classic suffix-array property — so lrs(p) =
  *      max(LCP(prev), LCP(next)), computed by a single mapPartitions
  *      neighbor scan (a global-ORDER window would serialize on one
  *      partition; this is the distributed form).
  *   3. BOUNDARY PATCH: the first/last row of each partition is missing
  *      one neighbor; those 2·P boundary windows (P = partition count,
  *      driver-bounded) are collected, patched with the cross-partition
  *      LCP, and merged back — the DistributedScan/Packing two-pass
  *      discipline. The intermediate is localCheckpoint'ed so both
  *      passes see ONE materialized range partitioning (range sampling
  *      is not replay-deterministic).
  *
  * Determinism: lrs is a property of the suffix multiset — tie order
  * among equal windows cannot change it (LCP with an equal window is the
  * full capped length either way) — so the output is independent of
  * partition count; MaximalSpansSpec asserts the P-independence law and
  * brute-force-verifies maximality on a small corpus.
  *
  * Reference analog: none (beyond-reference pipeline surface; the fixed
  * 8-token approximation is doc_repeated_spans/doc_span_cut).
  */
object MaximalSpans {

  /** A candidate position with its capped suffix window of token hashes. */
  final case class PosWin(doc_id: Long, i: Int, w: Array[Long])

  /** Neighbor-scan intermediate: lrs0 = max LCP with in-partition
    * neighbors; first/last rows carry their window for the boundary
    * patch (null otherwise — never shuffled wide).
    */
  final case class NbLrs(doc_id: Long, i: Int, lrs0: Int, pid: Int,
      first: Boolean, last: Boolean, w: Array[Long])

  private def lcp(a: Array[Long], b: Array[Long]): Int = {
    val m = math.min(a.length, b.length)
    var k = 0
    while (k < m && a(k) == b(k)) k += 1
    k
  }

  /** Mine maximal repeated spans.
    *
    * @param d      (doc_id: long, h0: array&lt;long&gt;) — one row per
    *               document, h0 the per-token hash sequence (docs shorter
    *               than minLen may be pre-filtered; they produce nothing)
    * @param minLen emit spans of at least this many tokens
    * @param cap    suffix-window cap — spans longer than cap are clipped
    * @param parts  range partitions for the suffix sort
    * @return (doc_id: long, start: long, len: long) — 1-based token
    *         start, one row per maximal repeated span, unordered
    */
  def spans(d: DataFrame, minLen: Int, cap: Int, parts: Int): DataFrame = {
    // left-maximality: suppress p when the candidate at p-1 extends it
    val wd = Window.partitionBy("doc_id").orderBy("i")
    lrsFrame(d, minLen, cap, parts)
      .withColumn("pi", lag(col("i"), 1).over(wd))
      .withColumn("pl", lag(col("lrs"), 1).over(wd))
      .filter(col("lrs") >= minLen &&
        (col("pi").isNull || col("pi") =!= col("i") - 1 ||
          col("pl") < least(col("lrs") + 1, lit(cap))))
      .select(col("doc_id"), col("i").cast("long").as("start"),
        col("lrs").cast("long").as("len"))
  }

  /** The per-candidate longest-repeated-prefix frame — steps 1–3 of the
    * pipeline above, BEFORE the left-maximality filter: (doc_id, i, lrs)
    * for every candidate position. [[spans]] derives the maximal span
    * list from it; coverage consumers (the exact-substring CUT) need the
    * unfiltered frame, because inside a cap-saturated run every position
    * carries lrs = cap and it is their UNION — not the clipped emitted
    * head — that covers the full repeated region.
    */
  def lrsFrame(d: DataFrame, minLen: Int, cap: Int, parts: Int): DataFrame = {
    require(minLen >= 2 && cap >= minLen, s"need 2 <= minLen <= cap, got ($minLen, $cap)")
    val s = d.sparkSession
    import s.implicits._

    // 1. candidate positions: minLen-gram (hash-prefix) repeats >= 2×
    val pos = d
      .filter(size(col("h0")) >= minLen)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("h0")) - (minLen - 1)),
        i => struct(i.as("i"), slice(col("h0"), i, lit(minLen)).as("p")))).as("x"))
      .select(col("doc_id"), col("x.i").as("i"), col("x.p").as("p"))
    val rep = pos.groupBy("p").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("p")
    val candPerDoc = pos.join(rep, "p")
      .groupBy("doc_id").agg(collect_list(col("i")).as("is"))

    // 2. capped windows for candidates only, then the suffix sort
    val win = d.join(candPerDoc, "doc_id")
      .select(col("doc_id"), explode(transform(col("is"),
        i => struct(i.as("i"), slice(col("h0"), i, lit(cap)).as("w")))).as("x"))
      .select(col("doc_id"), col("x.i").as("i"), col("x.w").as("w"))
      .as[PosWin]
    val sorted = win.repartitionByRange(parts, col("w")).sortWithinPartitions("w")

    // single-pass neighbor scan: each row's lrs0 = max(LCP prev, LCP next)
    val scanned: Dataset[NbLrs] = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      if (!it.hasNext) Iterator.empty
      else new Iterator[NbLrs] {
        private var prev = it.next()
        private var pending = 0 // LCP(prev, its predecessor)
        private var isFirst = true
        private var done = false
        def hasNext: Boolean = !done
        def next(): NbLrs = {
          if (it.hasNext) {
            val cur = it.next()
            val l = lcp(prev.w, cur.w)
            val out = NbLrs(prev.doc_id, prev.i, math.max(pending, l), pid,
              isFirst, last = false, if (isFirst) prev.w else null)
            prev = cur; pending = l; isFirst = false
            out
          } else {
            done = true
            NbLrs(prev.doc_id, prev.i, pending, pid, isFirst, last = true, prev.w)
          }
        }
      }
    }.localCheckpoint(true) // pin ONE range partitioning for both passes

    // 3. boundary patch: cross-partition neighbor LCPs (2 rows/partition)
    val bnd = scanned.filter(b => b.first || b.last).collect()
    val byPid = bnd.groupBy(_.pid)
    val pids = byPid.keys.toArray.sorted
    val patch = scala.collection.mutable.Map.empty[(Int, Boolean), Int]
    var k = 0
    while (k + 1 < pids.length) {
      val a = pids(k); val b = pids(k + 1)
      val lastA = byPid(a).find(_.last).get
      val firstB = byPid(b).find(_.first).get
      val c = lcp(lastA.w, firstB.w)
      patch((a, false)) = math.max(patch.getOrElse((a, false), 0), c) // a's last
      patch((b, true)) = math.max(patch.getOrElse((b, true), 0), c)   // b's first
      k += 1
    }
    val patchB = s.sparkContext.broadcast(patch.toMap)
    scanned.map { r =>
      val pm = patchB.value
      var v = r.lrs0
      if (r.first) v = math.max(v, pm.getOrElse((r.pid, true), 0))
      if (r.last) v = math.max(v, pm.getOrElse((r.pid, false), 0))
      (r.doc_id, r.i, v)
    }.toDF("doc_id", "i", "lrs")
  }

  /** Exact-substring CUT under the maximal-span policy — the removal
    * size of Lee et al. 2021's dedup pass at span granularity: per doc,
    * the number of tokens covered by the UNION of all repeated spans of
    * >= minLen tokens. Computed from [[lrsFrame]]: each candidate
    * position p with lrs(p) >= minLen covers [p, p+lrs(p)); the interval
    * union is one running-max-end window per doc (variable span lengths,
    * so the fixed-length lag trick of the 8-gram cut does not apply —
    * this is the general gaps-and-islands form, still exact integers and
    * doc-bounded partitions).
    *
    * @return (doc_id, n_pos, n_tokens_cut): covering candidate position
    *         count and exact covered-token count, one row per doc with
    *         at least one repeated span
    */
  def cut(d: DataFrame, minLen: Int, cap: Int, parts: Int): DataFrame = {
    val wd = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    lrsFrame(d, minLen, cap, parts)
      .filter(col("lrs") >= minLen)
      .withColumn("pe", max(col("i") + col("lrs")).over(wd))
      .withColumn("c", greatest(lit(0),
        col("i") + col("lrs") - greatest(col("i"), coalesce(col("pe"), col("i")))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"),
        sum(col("c")).cast("long").as("n_tokens_cut"))
  }
}
