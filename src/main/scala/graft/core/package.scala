package graft

/** == graft.core — the scespet query surface on Spark ==
  *
  * A stream is a `DataFrame` with `ts: Long` (event time, epoch-µs) and
  * `seq: Long` (deterministic arrival tie-break — scespet's global merge
  * order, SURVEY §1.2). Wrap it:
  *
  * {{{
  * val trades = EStream(df)                       // Term[X]
  * val bySym  = trades.by(col("symbol"))          // MultiTerm[K,X]
  * }}}
  *
  * Everything composes as Catalyst lineage:
  *
  * {{{
  * // per-symbol 10-event buckets, LAST emit mode (scespet:
  * //   trades.by(_.sym).group(10.events).reduce(new Sum))
  * bySym.group(Slice.Count(10)).reduce("qty" -> sum(col("qty")))
  *
  * // as-of sample: latest quote at or before each trade (scespet take)
  * trades.take(quotes, Seq("bid" -> col("bid")))
  *
  * // multi-input bucket (scespet bucketStream.bind.bind.reset.last)
  * Buckets(Seq("sym"))
  *   .bind("t", trades.df)("px" -> col("px"))
  *   .bind("q", quotes.df)("bid" -> col("bid"))
  *   .reset(Slice.Tumbling(60L * 1000000))
  *   .last("n_t" -> count(Buckets.fromTag("t", col("px"))))
  * }}}
  *
  * Slice specs ([[Slice]]): `Tumbling` (time), `Count` (every N events),
  * `TriggerCol` (data-driven, BEFORE/AFTER alignment), `Termination`,
  * `Never`; boolean-gated windows via `.window(gate)`. Emit modes:
  * `reduce`/`last` = one row per bucket, `scan`/`all` = running value per
  * event. Streaming twins live in [[graft.streaming]].
  */
package object core
