package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable operator query: a Spark implementation + (usually) an
  * equivalent DuckDB oracle SQL. Names of output columns MUST match between
  * the two — the driver sorts columns by name and hash-compares values.
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

  def lineitem(s: SparkSession, dir: String): DataFrame = graft.core.Tables.lineitem(s, dir)
  def events(s: SparkSession, dir: String): DataFrame = graft.core.Tables.events(s, dir)
  def documents(s: SparkSession, dir: String): DataFrame = graft.core.Tables.documents(s, dir)
  def embeddings(s: SparkSession, dir: String): DataFrame = graft.core.Tables.embeddings(s, dir)
}
