package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DETERMINISTIC range sharding — the reproducible form of
  * `repartitionByRange` for curriculum ordering / sorted-shard writes.
  *
  * Spark's own range partitioner draws a reservoir SAMPLE, so shard
  * boundaries differ run to run — useless when the shard layout is part
  * of a dataset's contract. The scalable deterministic recipe is the
  * classic two-pass histogram sort: (1) build the EXACT value histogram
  * of the (bounded-cardinality, integral) score — one partial-agg
  * shuffle of |distinct scores| cells; (2) running-count the tiny
  * histogram into cut points (a single-partition window over the
  * histogram only, never the data); (3) broadcast the score→shard map
  * back onto the corpus as a pure-map gate. Rows with equal scores land
  * in the same shard by construction (whole-key granularity), shards are
  * balanced up to the largest tie group, and the assignment is identical
  * on any cluster, any partitioning, any run.
  */
object RangeShards {

  /** Adds a `shard` column: shard = floor(rowsBefore · n / total), where
    * rowsBefore counts rows with strictly smaller `scoreCol`.
    *
    * NULL scores (ADVICE r4: the old equality join silently DROPPED them)
    * are an explicit policy: NULL sorts first (Spark's default null
    * ordering), so NULL-score rows form the lowest whole-key group and
    * land in shard 0 — no row ever disappears from a sharding pass. The
    * histogram's NULL group and the null-safe `<=>` join keep the law
    * shard = floor(rowsBefore·n/total) exact for them too.
    */
  def assign(df: DataFrame, scoreCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = df.groupBy(col(scoreCol).as("s")).agg(count(lit(1)).as("c"))
    // tiny frame: |distinct scores| rows — the only place a global
    // window runs, by design (the data itself never single-partitions)
    val before = Window.orderBy(col("s").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = h
      .withColumn("cb", coalesce(sum(col("c")).over(before), lit(0L)))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy(lit(1))))
      .withColumn("shard", expr(s"cb * $nShards DIV tot"))
      .select(col("s"), col("shard"))
    df.join(broadcast(cuts), col(scoreCol) <=> col("s")).drop("s")
  }
}
