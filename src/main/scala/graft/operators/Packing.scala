package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing — fitting variable-length chunks into fixed-capacity
  * context windows (the training-batch construction step downstream of
  * chunking). Exact bin packing is NP-hard and inherently sequential;
  * the scalable shape is GREEDY WITHIN BOUNDED SHARDS:
  *
  *   1. shard items by hash (shard count scales with the corpus — each
  *      shard's items fit one task);
  *   2. within a shard, next-fit-decreasing over a SORTED group iterator
  *      (`flatMapSortedGroups` — Spark sorts within groups at shuffle
  *      time, no driver state, no per-group collect);
  *   3. bin ids are (shard, seq-within-shard) — globally unique without
  *      coordination.
  *
  * Deterministic: the shard assignment is a hash of the item id and the
  * within-shard order is total (len desc, then id), so the packing is
  * independent of partitioning and scheduling — asserted in PackingSpec.
  *
  * Reference analog: none (beyond-reference pipeline surface).
  */
object Packing {

  final case class Item(id: Long, len: Int)
  final case class Packed(shard: Int, bin: Long, id: Long, len: Int)

  /** Pack items (id, len) into bins of `capacity` tokens; items with
    * len > capacity are dropped (count them upstream). Returns one row
    * per item with its (shard, bin) assignment.
    */
  def nextFitDecreasing(items: DataFrame, capacity: Int, shards: Int): DataFrame = {
    implicit val itemEnc = Encoders.product[Item]
    implicit val packedEnc = Encoders.product[Packed]
    implicit val keyEnc = Encoders.scalaInt
    val ds = items.select(col("id").cast("long"), col("len").cast("int"))
      .as[Item].filter(_.len <= capacity)
    // a REAL hash (not plain modulo): negative ids stay non-negative and
    // id-correlated length patterns (monotone ids with structured lengths)
    // can't skew shards
    ds.groupByKey(i =>
      Math.floorMod(scala.util.hashing.byteswap64(i.id), shards.toLong).toInt)
      .flatMapSortedGroups(desc("len"), asc("id")) { (shard, it) =>
        var bin = 0L
        var fill = 0
        it.map { i =>
          if (fill + i.len > capacity) { bin += 1; fill = 0 }
          fill += i.len
          Packed(shard, bin, i.id, i.len)
        }
      }.toDF()
  }

  /** Per-bin utilization summary of a packing. */
  def utilization(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_items"), sum(col("len")).as("fill"))
      .withColumn("util_pct", expr(s"fill * 100 div $capacity"))
}
