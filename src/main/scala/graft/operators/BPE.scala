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
  * BPE trainers pre-aggregate), so each round is one narrow groupBy(pair)
  * over the word frame plus a map-only merge. The only driver-sized data is
  * the 1-row argmax per round (same loop discipline as KMeans/PageRank).
  * The word frame is persisted per round and the previous round's cache
  * dropped, so round r does not replay rounds 1..r-1's merges.
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

  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("wn"),
        regexp_extract_all(col("seg"), lit("[^|]+"), lit(0)).as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("wn"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wn")).as("n"))

  /** Run `rounds` greedy merges over a word-frequency frame.
    *
    * @param words (w: string of [a-z0-9]+, wn: long) — distinct words with
    *              corpus frequencies
    * @return the learned merge table, rank ascending
    */
  def train(words: DataFrame, rounds: Int): Seq[Merge] = {
    var cur = words
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("seg"), col("wn"))
      .persist()
    val merges = Seq.newBuilder[Merge]
    try {
      for (r <- 1 to rounds) {
        val top = pairCounts(cur)
          .orderBy(col("n").desc, col("pair"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val pair = top(0).getString(0)
          val n = top(0).getLong(1)
          merges += Merge(r, pair, n)
          val Array(a, b) = pair.split(" ", 2)
          val next = cur
            .withColumn("seg",
              expr(s"replace(seg, '|$a||$b|', '|$a$b|')"))
            .persist()
          next.count() // materialize before dropping the parent cache
          cur.unpersist()
          cur = next
        }
      }
    } finally cur.unpersist()
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
