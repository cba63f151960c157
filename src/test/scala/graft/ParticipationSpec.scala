package graft

import org.apache.spark.sql.functions._
import graft.core._

/** Port of the reference's ParticipationStatsTest
  * (/root/reference/test/programs/TradeAnalysis.scala:10-66): track an
  * order's participation in market volume —
  *
  *   1. order events scanned into per-order state (`by(orderId).scan`);
  *   2. `keyToStream(state => trades(state.symbol))` — each order's key
  *      dereferences a DERIVED attribute (its symbol) to pull in that
  *      symbol's market-trade stream;
  *   3. a running market `Vwap` scan per order;
  *   4. `take(idToState)` — as-of sample of the order's own state at each
  *      market trade;
  *   5. gate `!terminated && vwap.sum * 0.10 < orderQty`, and
  *      `window(gate).last` — the last market VWAP while the order still
  *      represents >10% of traded volume.
  *
  * The reference fixture needs downloaded tick data (RealTradeTests); here
  * an equivalent in-memory fixture with hand-computed goldens.
  */
class ParticipationSpec extends SparkSpec {
  import spark.implicits._

  // order lifecycle for "abc" on MSFT, qty 100 (TradeAnalysis.scala:17-25)
  private def orderEvents = Seq(
    (0L, 0L, "abc", "New", "MSFT", 100L),
    (5000L, 1L, "abc", "Terminated", null.asInstanceOf[String], 0L))
    .toDF("ts", "seq", "order_id", "etype", "symbol", "order_qty")

  // market trades per symbol; cumulative MSFT volume 300, 600, 1100, 1500, 1600
  private def marketTrades = Seq(
    (500L, 0L, "MSFT", 300L, 10.0),
    (1500L, 1L, "MSFT", 300L, 11.0),
    (2500L, 2L, "MSFT", 500L, 12.0),
    (3500L, 3L, "MSFT", 400L, 13.0),
    (6000L, 4L, "MSFT", 100L, 14.0),
    (1000L, 5L, "VOD", 999L, 1.0)) // other symbol: must not leak in
    .toDF("ts", "seq", "sym", "qty", "px")

  test("participation golden: last market VWAP while order is >10% of " +
    "volume and alive (TradeAnalysis:10-66)") {
    // (2) keyToStream via derived attribute: order dim (order_id, symbol,
    // order_qty) from New events joined onto its symbol's trade stream
    val orderDim = EStream(orderEvents).filterType(col("etype"), "New")
      .df.select(col("order_id"), col("symbol"), col("order_qty"))
    val orderTrades = KStream(
      marketTrades.join(broadcast(orderDim), col("sym") === col("symbol"))
        .select("order_id", "ts", "seq", "qty", "px", "order_qty"),
      Seq("order_id"))

    // (3) running market Vwap per order: cumulative qty and qty·px sums
    val withVwap = orderTrades
      .scanAll("cum_vol", sum(col("qty")))
      .scanAll("cum_cash", sum(col("qty") * col("px")))

    // (4) as-of sample of the order's termination state at each trade
    val terms = EStream(orderEvents).filterType(col("etype"), "Terminated")
      .by(col("order_id"), "order_id")
    val sampled = withVwap
      .take(terms, Seq(col("order_id")), Seq("term_seen" -> lit(1)))

    // (5) participation gate + window(...).last
    val gate = col("term_seen").isNull &&
      col("cum_vol").cast("double") * 0.10 < col("order_qty")
    val got = KStream(sampled.df, Seq("order_id"))
      .window(gate)
      .reduce(
        "ten_pct_px" -> max_by(col("cum_cash") / col("cum_vol"),
          struct(col("ts"), col("seq"))),
        "n_trades" -> count(lit(1)))
      .orderBy("order_id", "session_id")
      .select("order_id", "ten_pct_px", "n_trades")
      .as[(String, Double, Long)].collect().toSeq

    // window = trades 1-2 only (vol 300, 600 < 1000; trade 3 closes at
    // 1100; trades 4-5 stay out — and trade 5 is post-termination anyway)
    got shouldBe Seq(("abc", (300 * 10.0 + 300 * 11.0) / 600.0, 2L))
  }
}
