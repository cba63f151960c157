package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector realizing the reference's `EventSourceX`
  * contract (/root/reference/src/scespet/core/SimpleEvaluator.scala:21-31 —
  * a pull source `init(startTime, endTime)` / `advanceState()` /
  * `getNextTime()`) as a first-class Spark table:
  *
  *   - `init(start, end)` becomes FILTER PUSHDOWN: `ts >= a` / `ts <= b`
  *     predicates reach [[WalkScanBuilder.pushFilters]] and bound event
  *     generation inside each reader — Catalyst never sees out-of-range
  *     rows, exactly like the reference source never fires them;
  *   - the per-key cell layout becomes PARTITION PLANNING: one
  *     [[InputPartition]] per key, so a 1000-key source reads with
  *     1000-way parallelism on a cluster;
  *   - `advanceState()` is the reader's `next()`.
  *
  * The table is the seeded quantized random walk (`Sources.randomWalk`'s
  * DSv2 twin): step_i = md5-derived int in [-1000, 1000], v = Σ steps —
  * exact int64, so any two readers (any partitioning, any engine) produce
  * bit-identical rows. Skipped prefixes still accumulate state (a walk is
  * cumulative) — pushdown prunes OUTPUT, the spec pins that semantics.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.WalkDataSource")
  *   .option("keys", "A,B").option("steps", "1000").option("seed", "s1")
  *   .load().filter($"ts" >= 100 && $"ts" <= 199)
  * }}}
  */
class WalkDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalkDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WalkTable(
      Option(properties.get("keys")).getOrElse("K").split(",").toSeq,
      Option(properties.get("steps")).getOrElse("100").toLong,
      Option(properties.get("seed")).getOrElse("42"))
}

object WalkDataSource {
  val schema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("k", StringType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** Deterministic step in [-1000, 1000]: first 15 hex chars of
    * md5(seed|key|i) as int64, mod 2001, minus 1000.
    */
  def step(seed: String, key: String, i: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed|$key|$i".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }
}

final class WalkTable(keys: Seq[String], steps: Long, seed: String)
    extends Table with SupportsRead {
  override def name(): String = s"walk(${keys.mkString(",")})"
  override def schema(): StructType = WalkDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WalkScanBuilder(keys, steps, seed)
}

/** Captures ts-range predicates — the `init(start, end)` of the contract —
  * and column pruning (a projection like `select(k, v)` reaches the reader,
  * which then never materializes the dropped fields).
  */
final class WalkScanBuilder(keys: Seq[String], steps: Long, seed: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = Long.MaxValue
  private var accepted = Array.empty[Filter]
  private var required: StructType = WalkDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThanOrEqual("ts", _: Long) | GreaterThan("ts", _: Long) |
          LessThanOrEqual("ts", _: Long) | LessThan("ts", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThanOrEqual("ts", v: Long) => lo = math.max(lo, v)
      case GreaterThan("ts", v: Long) => lo = math.max(lo, v + 1)
      case LessThanOrEqual("ts", v: Long) => hi = math.min(hi, v)
      case LessThan("ts", v: Long) => hi = math.min(hi, v - 1)
      case _ =>
    }
    accepted = ours
    rest // nothing left for Spark to re-check on our columns
  }

  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan = new WalkScan(keys, steps, seed, lo, hi, required)
}

final class WalkScan(keys: Seq[String], steps: Long, seed: String, lo: Long,
    hi: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WalkScan[keys=${keys.size}, steps=$steps, lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    keys.map(k => WalkPartition(k, 0L, steps): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WalkReaderFactory(steps, seed, lo, hi, required)

  /** The STREAMING face of the same table (EventSourceX is a streaming
    * contract): offsets are step indices; each micro-batch plans the
    * per-key partitions for its (start, end] step range, and the reader
    * carries the cumulative walk state across batches by replaying the
    * integer prefix (cheap, deterministic — no state store needed for a
    * pure function of the offset).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new WalkMicroBatchStream(keys, steps, seed, lo, hi, required)
}

final case class WalkOffset(step: Long) extends Offset {
  override def json(): String = step.toString
}

final class WalkMicroBatchStream(
    keys: Seq[String], steps: Long, seed: String, lo: Long, hi: Long,
    required: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  override def initialOffset(): Offset = WalkOffset(0L)
  override def latestOffset(): Offset = WalkOffset(steps)
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    WalkOffset(steps) // bounded table: everything is available immediately
  override def deserializeOffset(json: String): Offset = WalkOffset(json.toLong)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (a, b) = (start.asInstanceOf[WalkOffset].step, end.asInstanceOf[WalkOffset].step)
    keys.map(k => WalkPartition(k, a, b): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WalkReaderFactory(steps, seed, lo, hi, required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class WalkPartition(key: String, from: Long, until: Long) extends InputPartition

final class WalkReaderFactory(steps: Long, seed: String, lo: Long, hi: Long,
    required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WalkPartition]
    new WalkReader(p.key, steps, seed, math.max(lo, p.from),
      math.min(hi, p.until - 1), required)
  }
}

/** One key's walk over emit range [lo, hi] (pushdown bounds ∩ the
  * micro-batch's offset range). The cumulative value accumulates through
  * the pruned prefix (cheap integer ops, no row materialization), then
  * rows emit only inside the range — `advanceState()`/`getNextTime()` as
  * an iterator.
  */
final class WalkReader(key: String, steps: Long, seed: String, lo: Long,
    hi: Long, required: StructType)
    extends PartitionReader[InternalRow] {
  private val last = math.min(steps - 1, hi)
  private var i = -1L
  private var v = 0L
  private val k8 = UTF8String.fromString(key)
  // pruned projection, resolved once per reader (not per row)
  private val cols: Array[Int] =
    required.fieldNames.map(WalkDataSource.schema.fieldIndex)

  override def next(): Boolean = {
    i += 1
    // burn through the pruned prefix, carrying the walk state
    while (i < lo && i <= last) { v += WalkDataSource.step(seed, key, i); i += 1 }
    if (i > last) return false
    v += WalkDataSource.step(seed, key, i)
    true
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(cols.toSeq.map {
      case 0 => i // ts
      case 1 => i // seq
      case 2 => k8
      case 3 => v
    })

  override def close(): Unit = ()
}
