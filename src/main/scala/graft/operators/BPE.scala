package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-training loop — the tokenizer-training inner
  * loop every LLM pipeline runs (ref: the `doc_bpe_pairs` single scan was
  * one iteration of this; SURVEY §5 LLM-pipeline addendum).
  *
  * Semantics (the classic Sennrich trainer over a word-frequency table):
  * each word is a symbol sequence (initially characters); each round counts
  * adjacent symbol pairs weighted by word frequency, picks the argmax pair
  * (count desc, then lexicographically smallest pair — fully deterministic),
  * and merges every non-overlapping occurrence greedily left-to-right.
  *
  * Scale shape: the corpus collapses to the DISTINCT-WORD frequency frame
  * first (~10⁷ rows at 100 TB regardless of corpus size — the reason real
  * BPE trainers pre-aggregate). That frame is vocab-bounded, so the merge
  * LOOP runs in driver memory over the collected vocab with incremental
  * pair counts (see [[train]]/[[trainLocal]]) — one Spark job total for
  * the trainer, regardless of merge count, which is what makes production
  * parameter regimes (30k–50k merges) feasible: a per-merge Spark job at a
  * ~200 ms scheduling floor would cost hours of driver-serial time at any
  * cluster size. Corpus-sized passes (pre-aggregation, encode) stay
  * distributed.
  *
  * Cross-engine determinism: a word's segmentation is encoded as the string
  * `|s1||s2||s3|` — every symbol wrapped in its own `|…|`. With that
  * encoding, merging pair (a,b) is the PLAIN string replace of `|a||b|`
  * with `|ab|`, and SQL `replace` (non-overlapping, left-to-right, resumes
  * after the replaced text) implements exactly the greedy merge in Spark
  * and DuckDB alike: consecutive occurrences share no characters (unlike
  * space-joined encodings, where adjacent matches share a delimiter and the
  * second is silently missed), and a match can never start mid-symbol
  * (the pattern's flanking `|` must align with delimiters; symbols are
  * `[a-z0-9]+` so no symbol ever contains `|`).
  */
object BPE {

  /** One merge rule: rank (1-based round), the pair (space-joined), and its
    * weighted count at selection time. */
  final case class Merge(rank: Int, pair: String, n: Long)

  /** Run `rounds` greedy merges over a word-frequency frame.
    *
    * The corpus-sized work (collapsing the corpus to the distinct-word
    * frequency frame) happens UPSTREAM, distributed; `words` is
    * vocab-bounded by contract (~10⁷ rows / a few hundred MB at 100 TB of
    * corpus — bounded by the language, not the data). So the merge loop
    * itself collects the vocab ONCE and runs in driver memory with
    * incrementally-maintained pair counts (the HF-tokenizers /
    * Sennrich `learn_bpe` design): round r touches only the words that
    * contain round r's argmax pair, so 30k–50k production merge rounds cost
    * seconds, not 30k serial Spark jobs. Encoding stays distributed
    * ([[encode]]) and the merge table stays k-bounded driver state — the
    * same loop discipline as KMeans/PageRank (collect only vocab/k-bounded
    * state, never corpus-sized frames).
    *
    * @param words (w: string of [a-z0-9]+, wn: long) — distinct words with
    *              corpus frequencies
    * @return the learned merge table, rank ascending
    */
  /** Hard ceiling on the collected vocabulary (rows). Natural-language
    * distinct-word vocabularies plateau around 10⁷ regardless of corpus
    * size; a `words` frame past 2×10⁷ means the upstream collapse is
    * wrong (e.g. not actually distinct), and the failure should be this
    * message, not a driver OOM minutes later. */
  val MaxVocabRows = 20000000L

  def train(words: DataFrame, rounds: Int): Seq[Merge] = {
    // persist the (vocab-bounded) projection so the guard count and the
    // collect share ONE computation of the upstream corpus collapse —
    // without it every train() call paid the distinct-word agg twice
    val proj = words.select(col("w").cast("string"), col("wn").cast("long"))
      .persist()
    try {
      val n = proj.count()
      require(n <= MaxVocabRows,
        s"BPE.train collects the vocabulary to the driver; got $n rows > " +
          s"cap $MaxVocabRows — pass a DISTINCT word-frequency frame " +
          "(the corpus collapse belongs upstream, distributed)")
      val vocab = proj.collect().map(r => (r.getString(0), r.getLong(1)))
      trainLocal(vocab, rounds)
    } finally proj.unpersist(blocking = true)
  }

  /** The in-memory merge loop over a collected vocabulary. Semantics are
    * exactly the classic trainer: each round the argmax adjacent pair
    * (weighted count desc, then space-joined pair string asc) is merged
    * greedily left-to-right, non-overlapping, in every word. Pair counts
    * are maintained INCREMENTALLY: merging pair p only re-derives the
    * adjacency counts of words that actually contain p (tracked per pair),
    * and the argmax comes from a lazy max-heap (stale entries are
    * re-enqueued at their corrected count on pop — the standard
    * decrease-key-free priority queue), so total work is
    * O(Σ affected-word lengths + heap churn), independent of vocabulary
    * size per round. */
  def trainLocal(vocab: Array[(String, Long)], rounds: Int): Seq[Merge] = {
    import scala.collection.mutable
    // singleton-char symbols are SHARED across all words (the alphabet is
    // ~40 strings; per-word fresh 1-char Strings would dominate driver
    // memory at the 10⁷-word bound — the arrays then hold pointers only)
    val charSym = new Array[String](128)
    def sym(c: Char): String =
      if (c < 128) {
        val s = charSym(c)
        if (s != null) s else { val t = c.toString; charSym(c) = t; t }
      } else c.toString
    val segs = vocab.map(_._1.map(sym))              // word → symbol array
    val wns = vocab.map(_._2)
    val counts = mutable.HashMap.empty[String, Long] // "a b" → Σ wn
    // pair → words that MAY contain it (monotone superset: memberships are
    // never retracted and may repeat; a stale/duplicate member costs one
    // O(len) no-op scan at the pair's single merge round — each pair is
    // merged at most once ever — which keeps the hot loop allocation-free.
    // A compact append-only Int buffer, NOT a BitSet: BitSet capacity is
    // the max word INDEX (25 KB per pair at 200k words even for singleton
    // pairs), which O(live pairs) would turn into GBs)
    val where = mutable.HashMap.empty[String, mutable.ArrayBuffer[Int]]
    val changed = mutable.HashSet.empty[String]      // pairs touched per round
    // max-heap: highest count first, then lexicographically smallest pair
    val ord: Ordering[(Long, String)] = (x, y) => {
      val c = java.lang.Long.compare(x._1, y._1)
      if (c != 0) c else y._2.compareTo(x._2)
    }
    val heap = mutable.PriorityQueue.empty[(Long, String)](ord)

    def bump(pair: String, wi: Int, n: Long): Unit = {
      counts(pair) = counts.getOrElse(pair, 0L) + n
      val members = where.getOrElseUpdate(pair, mutable.ArrayBuffer.empty[Int])
      // skip intra-word duplicates (a word's bumps arrive consecutively)
      if (members.isEmpty || members(members.length - 1) != wi) members += wi
      changed += pair
    }
    def drop(pair: String, n: Long): Unit = counts.get(pair) match {
      case Some(c) =>
        val nn = c - n
        if (nn <= 0L) { counts.remove(pair); where.remove(pair) }
        else counts(pair) = nn // lazily corrected when its heap entry pops
        changed += pair
      case None => () // already fully merged away this round
    }
    /** One heap entry per pair whose count changed this round (NOT one per
      * occurrence update — that would grow the heap by the round's whole
      * update volume and is what makes the naive lazy-heap trainer
      * quadratic-ish in practice). */
    def flushChanged(): Unit = {
      for (p <- changed; c <- counts.get(p)) heap.enqueue((c, p))
      changed.clear()
    }
    for (wi <- segs.indices; i <- 0 until segs(wi).length - 1)
      bump(segs(wi)(i) + " " + segs(wi)(i + 1), wi, wns(wi))
    flushChanged()

    /** Pop the true argmax: stale heap entries (count changed since push)
      * are re-enqueued at their live count until a fresh one surfaces. */
    def popArgmax(): Option[(String, Long)] = {
      while (heap.nonEmpty) {
        val (n, p) = heap.dequeue()
        counts.get(p) match {
          case Some(cn) if cn == n => return Some((p, n))
          case Some(cn)            => heap.enqueue((cn, p))
          case None                => // pair fully merged away
        }
      }
      None
    }

    val merges = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      popArgmax() match {
        case None => done = true // no adjacent pairs remain anywhere
        case Some((pair, n)) =>
          merges += Merge(r, pair, n)
          val Array(a, b) = pair.split(" ", 2)
          val ab = a + b
          for (wi <- where.getOrElse(pair, mutable.ArrayBuffer.empty[Int])) {
            val syms = segs(wi)
            val merged = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += ab; i += 2 // greedy: merged symbol not rescanned
              } else { merged += syms(i); i += 1 }
            }
            val out = merged.result()
            if (out.length != syms.length) { // stale member ⇒ no-op scan
              val wn = wns(wi)
              var j = 0
              while (j < syms.length - 1) {
                drop(syms(j) + " " + syms(j + 1), wn); j += 1
              }
              j = 0
              while (j < out.length - 1) {
                bump(out(j) + " " + out(j + 1), wi, wn); j += 1
              }
              segs(wi) = out
            }
          }
          // greedy merge removed every (a,b) adjacency from every member
          counts.remove(pair); where.remove(pair); changed -= pair
          flushChanged()
          r += 1
      }
    }
    merges.result()
  }

  /** The merge table as a DataFrame (merge_rank, pair, n). */
  def trainDf(spark: SparkSession, words: DataFrame, rounds: Int): DataFrame = {
    import spark.implicits._
    train(words, rounds)
      .map(m => (m.rank, m.pair, m.n))
      .toDF("merge_rank", "pair", "n")
  }

  /** The merge-apply expression — the ENCODE half of the tokenizer
    * (Sennrich apply-in-rank-order: each merge is applied greedily
    * left-to-right across the whole word before the next rank; with the
    * `|sym|` encoding each application is one plain `replace`). The entire
    * merge table folds into ONE nested-replace projection — a map-only,
    * whole-stage-codegen pass with zero extra jobs and zero shuffles (the
    * merge table is driver-resident and k-bounded: `rounds` rules, never
    * data-sized).
    */
  def segExpr(word: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(regexp_replace(word, "(.)", "|$1|")) {
      (c, m) =>
        val Array(a, b) = m.pair.split(" ", 2)
        replace(c, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }

  /** Encode a distinct-word frame with a trained merge table: adds `toks`
    * (the BPE token array) and `n_toks`. Input needs a `w: string` column
    * of `[a-z0-9]+` words. Corpus encoding then JOINS this frame back to
    * per-doc word occurrences — tokens are materialized once per DISTINCT
    * word (~10⁷ rows at 100 TB), never once per corpus token.
    */
  def encode(words: DataFrame, merges: Seq[Merge]): DataFrame =
    words
      .withColumn("toks",
        regexp_extract_all(segExpr(col("w"), merges), lit("[^|]+"), lit(0)))
      .withColumn("n_toks", size(col("toks")).cast("long"))

  /** Merge table precompiled for the typed-JVM encoder: rank-ordered
    * (a, b, ab) triples — split once, shipped in task closures as a few
    * KB of driver state. */
  def compileRules(merges: Seq[Merge]): Array[(String, String, String)] =
    merges.sortBy(_.rank).map { m =>
      val Array(a, b) = m.pair.split(" ", 2)
      (a, b, a + b)
    }.toArray

  /** Typed-JVM twin of [[segExpr]] + `regexp_extract_all` (VERDICT r11 #1:
    * the nested-replace chain is interpreted per distinct word and was the
    * only payload query whose DuckDB ratio stayed flat with volume). Same
    * semantics over the symbol array directly: merges applied in rank
    * order, each greedily left-to-right non-overlapping across the whole
    * word before the next rank (the merged symbol is not rescanned as the
    * left element of the next candidate pair — exactly what the `|sym|`
    * plain-replace encoding does, since `replace` resumes after the
    * replaced text). Bit-parity with the plan-expression form is pinned in
    * BpeSpec ("typed JVM encoder ≡ plan expression"). */
  def segmentJvm(w: String, rules: Array[(String, String, String)]): Array[String] = {
    val syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var len = w.length
    var r = 0
    while (r < rules.length && len > 1) {
      val (a, b, ab) = rules(r)
      var read = 0
      var write = 0
      while (read < len) {
        if (read + 1 < len && syms(read) == a && syms(read + 1) == b) {
          syms(write) = ab; read += 2 // greedy: merged symbol not rescanned
        } else { syms(write) = syms(read); read += 1 }
        write += 1
      }
      len = write
      r += 1
    }
    java.util.Arrays.copyOf(syms, len)
  }

  /** Token count under [[segmentJvm]] without materializing the array copy. */
  def nToksJvm(w: String, rules: Array[(String, String, String)]): Long = {
    if (w.isEmpty) return 0L
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var len = w.length
    var r = 0
    while (r < rules.length && len > 1) {
      val (a, b, ab) = rules(r)
      var read = 0
      var write = 0
      while (read < len) {
        if (read + 1 < len && syms(read) == a && syms(read + 1) == b) {
          syms(write) = ab; read += 2
        } else { syms(write) = syms(read); read += 1 }
        write += 1
      }
      len = write
      r += 1
    }
    len.toLong
  }

  /** `^[a-z0-9]+$` without the regex engine — the ingest-path word gate
    * (same predicate as the batch queries' `rlike`). */
  def wordOk(w: String): Boolean = {
    if (w.isEmpty) return false
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))) return false
      i += 1
    }
    true
  }

  /** DuckDB oracle prelude for train-then-encode: the same unrolled
    * data-dependent argmax chain as [[oracleSql]], but keeping the word
    * `w` through every state and emitting ALL of w0..wN plus a final
    * `encoded` CTE = (w, toks, n_toks, wn) — the encoded distinct-word
    * frame. Returns a full single-line `WITH …` prefix; append a final
    * SELECT that reads from `encoded`.
    */
  def encodeOracleWith(wordsSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH w0 AS MATERIALIZED (
      SELECT w, regexp_replace(w, '(.)', '|\\1|', 'g') AS seg, wn
      FROM ($wordsSql)),\n"""
    for (r <- 1 to rounds) {
      sb ++= s"""p$r AS (
        SELECT pair FROM (
          SELECT pair, sum(wn)::bigint AS n FROM (
            SELECT unnest([syms[i] || ' ' || syms[i+1]
                           for i in range(1, len(syms))]) AS pair, wn
            FROM (SELECT regexp_extract_all(seg, '[^|]+') AS syms, wn
                  FROM w${r - 1}
                  WHERE len(regexp_extract_all(seg, '[^|]+')) >= 2))
          GROUP BY pair)
        ORDER BY n DESC, pair LIMIT 1),\n"""
      sb ++= s"""w$r AS MATERIALIZED (
        SELECT w, replace(seg,
            '|' || string_split(p.pair, ' ')[1] || '||'
                || string_split(p.pair, ' ')[2] || '|',
            '|' || replace(p.pair, ' ', '') || '|') AS seg, wn
        FROM w${r - 1}, p$r p),\n"""
    }
    sb ++= s"""encoded AS (
      SELECT w, regexp_extract_all(seg, '[^|]+') AS toks,
             len(regexp_extract_all(seg, '[^|]+'))::bigint AS n_toks, wn
      FROM w$rounds)"""
    // single-line: SparkEntry.oracleSql strips `|` margins, and this SQL is
    // full of literal `|` — no line may ever start with whitespace + `|`.
    sb.toString.replaceAll("\\s+", " ").trim
  }

  /** DuckDB oracle for [[trainDf]]: the data-dependent argmax loop cannot
    * be a recursive CTE (aggregation over the recursive term), so the N
    * rounds are UNROLLED as generated chained CTEs — wN is the word state
    * after N merges, pN selects round N's argmax pair from w(N-1).
    * `wordsSql` must yield columns (w, wn).
    */
  def oracleSql(wordsSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH w0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS seg, wn
      FROM ($wordsSql)),\n"""
    for (r <- 1 to rounds) {
      sb ++= s"""p$r AS (
        SELECT $r AS merge_rank, pair, n FROM (
          SELECT pair, sum(wn)::bigint AS n FROM (
            SELECT unnest([syms[i] || ' ' || syms[i+1]
                           for i in range(1, len(syms))]) AS pair, wn
            FROM (SELECT regexp_extract_all(seg, '[^|]+') AS syms, wn
                  FROM w${r - 1}
                  WHERE len(regexp_extract_all(seg, '[^|]+')) >= 2))
          GROUP BY pair)
        ORDER BY n DESC, pair LIMIT 1),\n"""
      if (r < rounds)
        sb ++= s"""w$r AS MATERIALIZED (
          SELECT replace(seg,
              '|' || string_split(p.pair, ' ')[1] || '||'
                  || string_split(p.pair, ' ')[2] || '|',
              '|' || replace(p.pair, ' ', '') || '|') AS seg, wn
          FROM w${r - 1}, p$r p),\n"""
    }
    val union = (1 to rounds).map(r => s"SELECT * FROM p$r")
      .mkString(" UNION ALL ")
    // drop the trailing comma of the last CTE
    val ctes = sb.toString.reverse.dropWhile(c => c == '\n' || c == ',').reverse
    // single-line: SparkEntry.oracleSql strips `|` margins, and this SQL is
    // full of literal `|` — no line may ever start with whitespace + `|`.
    // (string literals in the SQL contain no multi-space runs, so the
    // whitespace collapse is semantics-preserving)
    s"$ctes $union ORDER BY merge_rank".replaceAll("\\s+", " ").trim
  }
}
