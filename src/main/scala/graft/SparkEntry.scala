package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query catalog lives in graft.queries.*; each QueryDef pairs a Spark
  * implementation (through the graft library surface) with a DuckDB oracle.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    CoreQueries.defs ++ RelationalQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ ParityQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * scespet's flagship pattern (SURVEY §7.3): per-key bucketed sum —
    * `events.by(user_id).group(1.day).reduce(Sum)`.
    */
  def entry(spark: SparkSession): DataFrame =
    KStream(Tables.events(spark, "/root/testdata/sf0.001"), Seq("user_id"))
      .group(Slice.Tumbling(86400L * 1000 * 1000))
      .reduce("sum_value" -> Q.dsumD(col("value")), "n" -> count(lit(1)))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin)).toMap
}
