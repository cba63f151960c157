package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer — the OTHER major tokenizer
  * family next to [[BPE]] (Kudo 2018: "Subword Regularization", the
  * algorithm behind SentencePiece's default trainer; VERDICT r10 #6).
  *
  * Algorithm, as implemented (hard-EM / Viterbi-EM variant — the standard
  * deterministic approximation of Kudo's soft EM, chosen because expected
  * counts under forward–backward are float accumulations no cross-engine
  * gate can replay exactly, while Viterbi counts are INTEGERS):
  *
  *   1. SEED: every substring occurrence of length 1..maxPiece in the
  *      distinct-word frequency frame, weighted by word frequency; the
  *      vocabulary starts as ALL single characters (coverage — never
  *      pruned) plus the top `seedMulti` multi-char substrings by
  *      (count desc, piece asc).
  *   2. SCORE: piece log-probabilities, Laplace-smoothed and QUANTIZED:
  *      s_q(p) = floor(ln((c_p + 1)/(total + |V|)) · quant) — one IEEE
  *      division of two exact int64s (< 2^53 ⇒ exact casts in both
  *      engines) through the established quantized-ln regime
  *      (doc_unigram_nll; flip probability ~1e-11 per input).
  *   3. EM ROUND (× rounds): segment every distinct word by integer
  *      Viterbi under the current scores (maximize Σ s_q; ties → fewer
  *      pieces, then shortest last piece — a total order, so the
  *      segmentation is unique); re-count pieces from the segmentations
  *      weighted by word frequency (exact integers); drop multi-char
  *      pieces with count 0 (chars stay); re-score.
  *   4. PRUNE: keep all chars + the top multi-char pieces by
  *      (count desc, piece asc) up to `vocabTarget`; final re-score.
  *
  * Scale shape (the BPE discipline, BPE.scala:38): the corpus collapses
  * to the distinct-word frequency frame distributed (vocab-bounded,
  * ~10⁷ rows at 100 TB — guarded by [[BPE.MaxVocabRows]]); the EM loop
  * runs driver-side over the collected vocab (cost: rounds × Σ word
  * lengths × maxPiece — seconds at the 10⁷-word bound); ENCODE stays
  * distributed as ONE plan expression ([[encodeExpr]]: the Viterbi DP as
  * an `aggregate` fold over word positions with the trained scores as a
  * literal map — map-only, zero shuffles), materialized once per
  * DISTINCT word and broadcast-joined back to corpus occurrences exactly
  * like [[BPE.encode]].
  *
  * Cross-engine: the DuckDB oracle replays the ENTIRE trainer — seed,
  * every EM round's Viterbi DP (unrolled per word position, max word
  * length bounded by `maxWordLen`), the backtrack walk that recovers
  * segment counts, and the prune — as generated chained CTEs from the
  * SAME constants ([[oracleSql]] / [[encodeOracleWith]]; the PrConvKMax
  * pattern: Scala and SQL cannot drift).
  */
object UnigramLM {

  /** Trainer constants. `maxWordLen` is the ORACLE's DP-unroll bound —
    * [[train]] fails loudly if any word exceeds it (a silently-missing
    * dp stage would surface as a confusing cross-engine divergence).
    */
  final case class Params(maxPiece: Int = 4, seedMulti: Int = 64,
                          rounds: Int = 3, vocabTarget: Int = 48,
                          maxWordLen: Int = 12, quant: Int = 10000)

  final case class Piece(piece: String, cnt: Long, scoreQ: Long)

  /** floor(ln((c+1)/(total+v)) · quant) with the exactness envelope
    * enforced (both operands must cast to double exactly).
    */
  private def lnq(c: Long, total: Long, v: Long, quant: Int): Long = {
    val lim = 1L << 53
    require(c + 1 < lim && total + v < lim,
      s"unigram-LM count $c / total $total exceeds the 2^53 exact-cast envelope")
    math.floor(math.log((c + 1).toDouble / (total + v).toDouble) * quant).toLong
  }

  /** Integer Viterbi over one word: maximize total quantized score; ties →
    * fewer pieces, then (per position) the SHORTEST candidate piece.
    * Returns the unique segmentation. Requires char coverage (every
    * character of `word` present in `score`).
    */
  def viterbiSegments(word: String, score: collection.Map[String, Long],
                      maxPiece: Int): List[String] = {
    val L = word.length
    val dpQ = Array.fill(L + 1)(Long.MinValue)
    val dpN = Array.fill(L + 1)(Int.MaxValue)
    val bt = new Array[Int](L + 1)
    dpQ(0) = 0L; dpN(0) = 0
    var i = 1
    while (i <= L) {
      var l = 1
      while (l <= math.min(maxPiece, i)) {
        if (dpQ(i - l) != Long.MinValue) {
          score.get(word.substring(i - l, i)) match {
            case Some(s) =>
              val q = dpQ(i - l) + s
              val n = dpN(i - l) + 1
              // strict better under (q desc, n asc); l ascends, so the
              // smallest l wins full ties — the documented total order
              if (q > dpQ(i) || (q == dpQ(i) && n < dpN(i))) {
                dpQ(i) = q; dpN(i) = n; bt(i) = l
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    require(dpQ(L) != Long.MinValue,
      s"no segmentation for '$word' — single-char coverage broken")
    var out = List.empty[String]
    var p = L
    while (p > 0) { val l = bt(p); out = word.substring(p - l, p) :: out; p -= l }
    out
  }

  /** (total score_q, piece count) of the unique Viterbi segmentation. */
  def viterbi(word: String, score: collection.Map[String, Long],
              maxPiece: Int): (Long, Int) = {
    val segs = viterbiSegments(word, score, maxPiece)
    (segs.iterator.map(score).sum, segs.length)
  }

  /** The in-memory trainer over a collected (word, frequency) vocabulary.
    * Order-independent in the input array (all accumulations are
    * commutative sums; every selection carries an explicit total order).
    */
  def trainLocal(words: Array[(String, Long)], p: Params): Seq[Piece] = {
    import scala.collection.mutable
    require(words.forall(_._1.nonEmpty), "empty word in vocabulary")
    words.find(_._1.length > p.maxWordLen).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"word '$w' exceeds maxWordLen=${p.maxWordLen} (the oracle's DP unroll " +
          "bound) — raise Params.maxWordLen")
    }
    // 1. seed: every substring occurrence, weighted
    val c0 = mutable.HashMap.empty[String, Long]
    for ((w, n) <- words; l <- 1 to p.maxPiece; i <- 0 to w.length - l) {
      val pc = w.substring(i, i + l)
      c0(pc) = c0.getOrElse(pc, 0L) + n
    }
    val chars = c0.keysIterator.filter(_.length == 1).toSeq.sorted
    require(chars.size < p.vocabTarget,
      s"alphabet ${chars.size} leaves no room under vocabTarget=${p.vocabTarget}")
    val seedMulti = c0.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (pc, c) => (-c, pc) }.take(p.seedMulti)
    var vocab: Map[String, Long] =
      (chars.map(ch => ch -> c0(ch)) ++ seedMulti).toMap
    def scores(v: Map[String, Long]): Map[String, Long] = {
      val total = v.valuesIterator.sum
      val nv = v.size.toLong
      v.map { case (pc, c) => pc -> lnq(c, total, nv, p.quant) }
    }
    var sc = scores(vocab)
    // 3. hard-EM rounds
    for (_ <- 1 to p.rounds) {
      val cr = mutable.HashMap.empty[String, Long]
      for ((w, n) <- words; pc <- viterbiSegments(w, sc, p.maxPiece))
        cr(pc) = cr.getOrElse(pc, 0L) + n
      vocab = (chars.map(ch => ch -> cr.getOrElse(ch, 0L)) ++
        cr.iterator.filter(_._1.length > 1)).toMap
      sc = scores(vocab)
    }
    // 4. prune to vocabTarget (chars always kept), final re-score
    val keepMulti = vocab.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (pc, c) => (-c, pc) }.take(p.vocabTarget - chars.size)
    val fin = (chars.map(ch => ch -> vocab(ch)) ++ keepMulti).toMap
    val fsc = scores(fin)
    fin.toSeq.sortBy(_._1).map { case (pc, c) => Piece(pc, c, fsc(pc)) }
  }

  /** Collect the (vocab-bounded, guarded) word-frequency frame and train.
    * `words` needs columns (w: string, wn: long); the corpus collapse
    * belongs upstream, distributed (the [[BPE.train]] contract).
    */
  def train(words: DataFrame, p: Params): Seq[Piece] = {
    val proj = words.select(col("w").cast("string"), col("wn").cast("long"))
      .persist()
    try {
      val n = proj.count()
      require(n <= BPE.MaxVocabRows,
        s"UnigramLM.train collects the vocabulary to the driver; got $n rows > " +
          s"cap ${BPE.MaxVocabRows} — pass a DISTINCT word-frequency frame")
      trainLocal(proj.collect().map(r => (r.getString(0), r.getLong(1))), p)
    } finally proj.unpersist(blocking = true)
  }

  /** The trained vocabulary as a DataFrame (piece, cnt, score_q). */
  def trainDf(spark: SparkSession, words: DataFrame, p: Params): DataFrame = {
    import spark.implicits._
    train(words, p).map(pc => (pc.piece, pc.cnt, pc.scoreQ))
      .toDF("piece", "cnt", "score_q")
  }

  /** The Viterbi ENCODE as one plan expression: the DP fold over word
    * positions (`aggregate` over sequence(1, length), state = the dp
    * prefix as array&lt;struct&lt;q,n&gt;&gt;) with the trained scores as
    * a literal map — map-only, zero shuffles, one evaluation per row.
    * Returns struct(q: bigint, n: int) of the word's unique segmentation
    * (same total order as [[viterbiSegments]]). Apply to the DISTINCT
    * word frame and broadcast-join back (the [[BPE.encode]] shape); the
    * literal map is vocab-sized — exactly what production tokenizers
    * ship to every worker.
    */
  def encodeExpr(word: Column, vocab: Seq[Piece], p: Params): Column = {
    val m = map(vocab.flatMap(pc => Seq(lit(pc.piece), lit(pc.scoreQ))): _*)
    val nullState = lit(null).cast("struct<q:bigint,n:int>")
    val dp = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0L).as("q"), lit(0).as("n"))),
      (acc, i) => {
        // candidates l = 1..maxPiece as an ARRAY, reduced by a second
        // aggregate: a when-chain foldLeft would re-embed the running
        // `best` ~3× per candidate (condition + branch), an expression
        // tree EXPONENTIAL in maxPiece (measured: 15 MB task binaries,
        // 7.8 s for a 31-word encode); the lambda form is one constant-
        // size compare evaluated per element. Fold order l ascending +
        // strict better keeps the smallest l on full (q, n) ties —
        // viterbiSegments' order.
        val cands = array((1 to p.maxPiece).map { l =>
          val prev = element_at(acc, i - lit(l) + 1) // acc(k+1) = dp(k)
          val s = element_at(m, word.substr(i - lit(l) + 1, lit(l)))
          when(i >= l && prev.isNotNull && s.isNotNull,
            struct((prev("q") + s).as("q"), (prev("n") + 1).as("n")))
        }: _*)
        val best = aggregate(cands, nullState, (b, c) =>
          when(c.isNotNull && (b.isNull || c("q") > b("q") ||
            (c("q") === b("q") && c("n") < b("n"))), c).otherwise(b))
        concat(acc, array(best))
      })
    element_at(dp, length(word) + lit(1))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle generation (shared constants; the PrConvKMax pattern)
  // ---------------------------------------------------------------------

  private def lnqSql(c: String, total: String, nv: String, quant: Int): String =
    s"floor(ln(($c + 1)::double / ($total + $nv)::double) * $quant)::bigint"

  /** The per-round Viterbi DP + backtrack walk as chained CTEs.
    * Emits d{tag}_0..W (dp states: word, cnt, q, n, l = winning piece
    * length), dall{tag} (dp assembled over i), and — when `walk` — the
    * k{tag}_1..W walk stages plus c{tag} (piece → Σ cnt).
    * Scores are read from CTE `s$prev(piece, sq)`.
    */
  private def dpSql(tag: String, prevScores: String, p: Params,
                    walk: Boolean): String = {
    val sb = new StringBuilder
    sb ++= s"d${tag}_0 AS (SELECT word, cnt, 0::bigint AS q, 0 AS n, 0 AS l FROM w0),\n"
    for (i <- 1 to p.maxWordLen) {
      val arms = (1 to math.min(p.maxPiece, i)).map { l =>
        s"""SELECT d.word, d.cnt, d.q + s.sq AS q, d.n + 1 AS n, $l AS l
            FROM d${tag}_${i - l} d JOIN $prevScores s
              ON s.piece = substr(d.word, ${i - l + 1}, $l)
            WHERE len(d.word) >= $i"""
      }.mkString(" UNION ALL ")
      sb ++= s"""d${tag}_$i AS MATERIALIZED (
        SELECT word, cnt, q, n, l FROM (
          SELECT word, cnt, q, n, l,
            row_number() OVER (PARTITION BY word ORDER BY q DESC, n ASC, l ASC) AS rk
          FROM ($arms)) WHERE rk = 1),\n"""
    }
    if (walk) {
      val dall = (1 to p.maxWordLen)
        .map(i => s"SELECT word, $i AS i, l FROM d${tag}_$i")
        .mkString(" UNION ALL ")
      sb ++= s"dall$tag AS MATERIALIZED ($dall),\n"
      sb ++= s"k${tag}_0 AS (SELECT word, cnt, len(word)::int AS pos FROM w0),\n"
      for (t <- 1 to p.maxWordLen) {
        sb ++= s"""k${tag}_$t AS MATERIALIZED (
          SELECT k.word, k.cnt, (k.pos - d.l)::int AS pos,
            substr(k.word, k.pos - d.l + 1, d.l) AS piece
          FROM k${tag}_${t - 1} k JOIN dall$tag d
            ON d.word = k.word AND d.i = k.pos
          WHERE k.pos > 0),\n"""
      }
      val pieces = (1 to p.maxWordLen)
        .map(t => s"SELECT piece, cnt FROM k${tag}_$t")
        .mkString(" UNION ALL ")
      sb ++= s"c$tag AS MATERIALIZED (SELECT piece, sum(cnt)::bigint AS c FROM ($pieces) GROUP BY piece),\n"
    }
    sb.toString
  }

  /** Shared trainer CTE chain: seed → R × (dp, walk, re-count, re-score)
    * → prune. Ends with `sfin(piece, c, sq)` — the final vocabulary. The
    * caller appends its SELECT (and, for encode, further CTEs).
    */
  private def trainerCtes(wordsSql: String, p: Params): String = {
    val sb = new StringBuilder
    sb ++= s"WITH w0 AS MATERIALIZED (SELECT w AS word, wn::bigint AS cnt FROM ($wordsSql)),\n"
    sb ++= s"""cand AS MATERIALIZED (
      SELECT piece, sum(cnt)::bigint AS c FROM (
        SELECT substr(word, i.i, l.l) AS piece, cnt
        FROM w0, range(1, ${p.maxWordLen + 1}) i(i), range(1, ${p.maxPiece + 1}) l(l)
        WHERE i.i + l.l - 1 <= len(word)) GROUP BY piece),\n"""
    sb ++= "chars AS MATERIALIZED (SELECT piece, c FROM cand WHERE len(piece) = 1),\n"
    sb ++= s"""v0 AS MATERIALIZED (
      SELECT piece, c FROM chars
      UNION ALL
      SELECT piece, c FROM (
        SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rk
        FROM cand WHERE len(piece) > 1) WHERE rk <= ${p.seedMulti}),\n"""
    sb ++= s"""s0 AS MATERIALIZED (
      SELECT v.piece, ${lnqSql("v.c", "t.total", "t.nv", p.quant)} AS sq
      FROM v0 v, (SELECT sum(c)::bigint AS total, count(*)::bigint AS nv FROM v0) t),\n"""
    for (r <- 1 to p.rounds) {
      sb ++= dpSql(s"$r", s"s${r - 1}", p, walk = true)
      sb ++= s"""v$r AS MATERIALIZED (
        SELECT piece, c FROM c$r
        UNION ALL
        SELECT ch.piece, 0::bigint AS c FROM chars ch
        WHERE ch.piece NOT IN (SELECT piece FROM c$r)),\n"""
      sb ++= s"""s$r AS MATERIALIZED (
        SELECT v.piece, ${lnqSql("v.c", "t.total", "t.nv", p.quant)} AS sq
        FROM v$r v, (SELECT sum(c)::bigint AS total, count(*)::bigint AS nv FROM v$r) t),\n"""
    }
    sb ++= s"""fin AS MATERIALIZED (
      SELECT piece, c FROM v${p.rounds} WHERE len(piece) = 1
      UNION ALL
      SELECT piece, c FROM (
        SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rk
        FROM v${p.rounds} WHERE len(piece) > 1)
      WHERE rk <= ${p.vocabTarget} - (SELECT count(*) FROM chars)),\n"""
    sb ++= s"""sfin AS MATERIALIZED (
      SELECT f.piece, f.c, ${lnqSql("f.c", "t.total", "t.nv", p.quant)} AS sq
      FROM fin f, (SELECT sum(c)::bigint AS total, count(*)::bigint AS nv FROM fin) t)"""
    sb.toString
  }

  /** DuckDB oracle for [[trainDf]]: the full trainer, final vocab out.
    * `wordsSql` must yield (w, wn).
    */
  def oracleSql(wordsSql: String, p: Params): String =
    (trainerCtes(wordsSql, p) +
      " SELECT piece, c AS cnt, sq AS score_q FROM sfin ORDER BY piece")
      .replaceAll("\\s+", " ").trim

  /** Oracle prelude for train-then-encode: the trainer chain plus the
    * encode-pass DP under `sfin`, ending with CTE
    * `encw(word, q, n)` — per distinct word, the Viterbi score and piece
    * count. Append a final SELECT joining corpus occurrences to `encw`.
    */
  def encodeOracleWith(wordsSql: String, p: Params): String = {
    val enc = dpSql("E", "sfin", p, walk = false)
    val asm = (1 to p.maxWordLen)
      .map(i => s"SELECT word, q, n FROM dE_$i WHERE len(word) = $i")
      .mkString(" UNION ALL ")
    (trainerCtes(wordsSql, p) + ",\n" + enc +
      s"encw AS MATERIALIZED ($asm)")
      .replaceAll("\\s+", " ").trim
  }
}
