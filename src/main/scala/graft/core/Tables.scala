package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (`TESTDATA.md`).
  *
  * Conventions for event streams (scespet `HasVal`/`MacroTerm` analog —
  * reference: /root/reference/src/scespet/core/types.scala:63-75):
  *   - `ts: Long`  — event time as an opaque ordered long (here: epoch nanos).
  *     scespet models time as Long millis; we keep the same contract.
  *   - `seq: Long` — stable arrival-order tie-break. Reproduces scespet's
  *     deterministic source merge (SimpleEnv.scala:33-38,80-92).
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** `events` is written with nanosecond parquet timestamps, which Spark's
    * vectorized reader rejects by default; read them as Long nanos, then
    * truncate to epoch MICROS as the canonical `ts` ordering column: DuckDB
    * (the correctness oracle) reads ns parquet as µs TIMESTAMP, so µs is the
    * finest resolution both engines agree on exactly (`epoch_us(ts)` twin).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(path(dir, "events"))
      .withColumn("ts", expr("ts div 1000"))
      .withColumn("seq", col("event_id"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
