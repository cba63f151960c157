package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable operator query: a Spark implementation + (usually) an
  * equivalent DuckDB oracle SQL. Names of output columns MUST match between
  * the two — the driver sorts columns by name and hash-compares values.
  *
  * Cache lifecycle CONTRACT (VERDICT r6 #4 / r7 #6): `fn` returns a LAZY
  * frame, so a query that `.persist()`s an internal frame cannot unpersist
  * it before the caller's action without recomputing every consumer. The
  * action owner therefore owns the release: Verify's per-query
  * `finally clearCache()` and Bench's `cleanup()` after every timed run
  * drop all query-internal persists, and Bench ASSERTS the SQL cache is
  * empty at run end. Library-embedding callers inherit the same rule —
  * run your action, then release. Per-JVM frozen stream models
  * (StreamFixtures.frozen) use `localCheckpoint`, which lives outside the
  * SQL cache and is RDD-GC-governed by design.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Cross-engine determinism helpers.
  *
  * Hash-compare contract with the DuckDB oracle:
  *   - sums/dots → DECIMAL (associative ⇒ partition-order independent, and
  *     bit-comparable across engines);
  *   - ratios/means → a SINGLE IEEE double division of exactly-agreed
  *     operands (deterministic);
  *   - sequential folds (EWMA) → identical op order in both engines;
  *   - 64-bit hashing → md5-derived (md5 exists in both engines;
  *     Spark's xxhash64/DuckDB's hash() do NOT match each other).
  */
object Q {

  /** 60-bit positive hash from md5 hex — Spark side.
    * DuckDB twin: `('0x'||substr(md5(x),1,15))::bigint`.
    */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[hash60]] as SQL text. */
  def hash60Sql(expr: String): String = s"('0x'||substr(md5($expr),1,15))::bigint"

  /** JVM mirror of [[hash60]] for typed hot paths (training loops whose
    * interpreted higher-order-function featurization dominates): md5 hex,
    * first 15 chars, base-16 — bit-identical to the Column form (parity
    * spec-pinned in LinearProbeSpec). ThreadLocal digest: the call sites
    * are per-row map functions.
    */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  def hash60Jvm(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = the top 7.5 bytes of the digest, big-endian
    var v = 0L
    var i = 0
    while (i < 15) {
      val b = d(i / 2)
      val nib = if (i % 2 == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** DuckDB replay of
    * [[graft.operators.Packing.firstFitDecreasingSharded]]'s placement
    * machine, as the CTE chain `it → step → placed` (caller supplies a
    * preceding `it0(shard, id, len)` CTE inside a WITH RECURSIVE and a
    * final SELECT over `placed(shard, bin, id, len, start)`). The
    * recursive CTE steps one item per shard per iteration, its state row
    * carrying the whole open-bin ring — k (bin id, fill) pairs in
    * opening order, sentinel fill cap+1 for unopened slots, the next-bin
    * counter, and the placement the step just made. The ordered CASE
    * over the fit predicates IS first-fit; the no-fit branch shifts the
    * ring left (FIFO eviction) and opens `nxt`. Shared by
    * doc_seq_pack_ffd (token packing) and ord_compaction_plan (file
    * compaction) so one generator serves every FFD consumer.
    */
  def ffdStepCtes(k: Int, cap: Int): String = {
    val slots = 1 to k
    def ff(j: Int) = s"(s.f$j + i.len <= $cap)"
    val anyFit = slots.map(ff).mkString("(", " OR ", ")")
    val stateCols = slots.flatMap(j => Seq(s"b$j", s"f$j")).mkString(", ")
    val anchorState =
      slots.map(_ => s"(-1)::bigint, ${cap + 1}::bigint").mkString(", ")
    def shiftB(j: Int) = if (j < k) s"s.b${j + 1}" else "s.nxt"
    def shiftF(j: Int) = if (j < k) s"s.f${j + 1}" else "i.len"
    val newState = slots.map { j =>
      val fCases = slots.map { m =>
        val v = if (m == j) s"s.f$j + i.len" else s"s.f$j"
        s"WHEN ${ff(m)} THEN $v"
      }.mkString(" ")
      s"""CASE WHEN $anyFit THEN s.b$j ELSE ${shiftB(j)} END,
                 CASE $fCases ELSE ${shiftF(j)} END"""
    }.mkString(",\n                 ")
    val pbin = slots.map(j => s"WHEN ${ff(j)} THEN s.b$j").mkString(" ")
    val pstart = slots.map(j => s"WHEN ${ff(j)} THEN s.f$j").mkString(" ")
    s"""it AS MATERIALIZED (
               SELECT shard, id, len,
                 row_number() OVER (PARTITION BY shard ORDER BY len DESC, id) AS rn
               FROM it0 WHERE len <= $cap),
             step(shard, rn, $stateCols, nxt, pbin, pstart) AS (
               SELECT shard, 0::bigint, $anchorState, 0::bigint,
                      NULL::bigint, NULL::bigint
               FROM (SELECT DISTINCT shard FROM it)
               UNION ALL
               SELECT i.shard, i.rn,
                 $newState,
                 CASE WHEN $anyFit THEN s.nxt ELSE s.nxt + 1 END,
                 CASE $pbin ELSE s.nxt END,
                 CASE $pstart ELSE 0::bigint END
               FROM step s JOIN it i ON i.shard = s.shard AND i.rn = s.rn + 1),
             placed AS (
               SELECT st.shard, st.pbin AS bin, i.id, i.len, st.pstart AS start
               FROM step st JOIN it i ON i.shard = st.shard AND i.rn = st.rn
               WHERE st.rn >= 1)"""
  }

  /** Exact decimal sum (order-independent, cross-engine bit-stable).
    * INTERNAL accumulator type — never leave DECIMAL in a final select
    * (the driver's hash is representation-sensitive: Decimal('2436.000000')
    * vs the oracle's 2436.0 is a fail). Use [[dsumD]] at output boundaries.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(38,6)"))

  /** Output-boundary exact sum: decimal accumulation, ONE correctly-rounded
    * cast to double at the end. DuckDB twin: `sum(x::decimal(38,6))::double`.
    * Only valid in agg contexts (a cast-wrapped aggregate can't take
    * `.over(w)` — for window scans cast the output column instead).
    */
  def dsumD(c: Column): Column = dsum(c).cast("double")

  /** Whitespace tokenization — identical in both engines for the
    * single-space-joined synthetic corpus. DuckDB twin: string_split(x, ' ').
    */
  def tokens(c: Column): Column = split(c, " ")

  /** Fan a small unsplittable scan across cores before md5/shingle-heavy
    * per-row work — the batch twin of `StreamHarness.scanWide` (r15 guide
    * §2.6 idle capacity). The harness fixtures are single-row-group
    * parquet, so the map side of every downstream shuffle runs
    * single-threaded regardless of cores (a byte-range split cannot open
    * mid-row-group); the doc_maximal_* probe measured two ~1.2-1.4 s
    * one-task hashing stages while 31 cores idled. One round-robin
    * exchange of the sub-MB text fixture buys a cores-wide map side.
    *
    * SIZE-ADAPTIVE (the r15 rule: nothing tuned to local[32] only): the
    * fan only fires when the plan-estimated input cannot occupy the
    * available cores at the configured split size — at deployment scale a
    * scan has ≥ cores natural splits and a round-robin re-shuffle of the
    * text would be a fact-sized regression, so the frame passes through
    * untouched. Apply ONLY where per-row CPU dominates the row-sized
    * exchange (measured per site; results are partition-independent —
    * the CPUS=7 determinism gate covers every consumer).
    */
  def fanWide(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val cores = s.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val split = s.sessionState.conf.filesMaxPartitionBytes
    if (est <= BigInt(split) * cores / 2) df.repartition(cores) else df
  }

  /** Coalesce a plan-estimated-tiny frame to ONE partition — the inverse
    * of `fanWide`, for frames that are about to be persisted and then
    * consumed by many small jobs. A persisted frame materializes through
    * the non-AQE path, so its post-shuffle partition count stays at
    * spark.sql.shuffle.partitions; every downstream job then schedules
    * that many near-empty tasks per consuming stage (knn_ivfpq_residual:
    * ~40 jobs × 32 tasks over ≤8k-row frames, r16 FloorProbe).
    *
    * SIZE-ADAPTIVE (r15 rule): packs only when the plan-estimated bytes
    * fit comfortably in a single split (≤ filesMaxPartitionBytes / 2);
    * a deployment-scale frame passes through untouched with its full
    * shuffle parallelism. coalesce is a narrow op — results and row
    * order semantics are unchanged (consumers are order-insensitive
    * aggregations/joins; the CPUS=7 determinism gate covers them).
    */
  def packTiny(df: DataFrame): DataFrame = packTinyAs(df, df)

  /** packTiny gated on a PROXY frame's plan stats instead of df's own —
    * for frames downstream of cross/broadcast joins, whose sizeInBytes
    * estimate multiplies through the join and never passes the gate even
    * when the true row count is bounded by one input (e.g. a per-row
    * argmax over corpus × centroids is row-wise ≤ the corpus). Pass the
    * bounding input as `proxy`.
    */
  def packTinyAs(df: DataFrame, proxy: DataFrame): DataFrame = {
    val est = proxy.queryExecution.optimizedPlan.stats.sizeInBytes
    val split = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    if (est <= BigInt(split) / 2) df.coalesce(1) else df
  }

  def lineitem(s: SparkSession, dir: String): DataFrame = graft.core.Tables.lineitem(s, dir)
  def events(s: SparkSession, dir: String): DataFrame = graft.core.Tables.events(s, dir)
  def documents(s: SparkSession, dir: String): DataFrame = graft.core.Tables.documents(s, dir)
  def embeddings(s: SparkSession, dir: String): DataFrame = graft.core.Tables.embeddings(s, dir)
}
