package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{EStream, KStream}

/** Source constructors — the scespet source surface (SURVEY §2.1)
  * re-expressed as DataFrame builders.
  */
object Sources {

  /** IteratorEvents analog (SimpleEvaluator.scala:33-62): lift an in-memory
    * sequence into a timestamped stream; `tsOf(value, index)` assigns event
    * time exactly like the reference's `(value, index) => ts` lambda, and
    * the index becomes `seq` (the deterministic merge tie-break).
    */
  def fromSeq[T: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      values: Seq[T],
      tsOf: (T, Int) => Long): EStream = {
    import org.apache.spark.sql.Encoders
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      implicitly[org.apache.spark.sql.Encoder[T]])
    val rows = values.zipWithIndex.map { case (v, i) => (tsOf(v, i), i.toLong, v) }
    // coalesce(1): a driver-side literal Seq is driver-bounded by
    // construction; the default leaf parallelism spread 200 rows over 32
    // tasks and every downstream map stage inherited the storm (r15 stage
    // probe: 130 tasks / 5-7 s summed task time for a 200-row stream).
    // One slice is the scale-correct shape at ANY volume — a bigger-than-
    // driver source belongs to the parquet/DSv2 loaders, not fromSeq.
    EStream(spark.createDataset(rows)(enc).toDF("ts", "seq", "v").coalesce(1))
  }

  /** Timer analog (util/Timer.scala:10-30): a periodic event grid over
    * [start, end) every `interval` — batch form of the unbounded periodic
    * source (streaming twin: `spark.readStream.format("rate")`).
    * Generated distributively via spark.range — no driver-side collection.
    */
  def timeGrid(spark: SparkSession, start: Long, end: Long, interval: Long): EStream = {
    val n = math.max(0L, (end - start + interval - 1) / interval)
    EStream(
      spark.range(n)
        .select((col("id") * interval + start).as("ts"), col("id").as("seq")))
  }

  /** asVector analog (EnvTermBuilder.scala:59-62): a static key universe as
    * a keyed stream of key==value cells (small dimension — broadcastable).
    */
  def asVector[K: org.apache.spark.sql.Encoder](spark: SparkSession, keys: Seq[K]): KStream = {
    import org.apache.spark.sql.Encoders
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      implicitly[org.apache.spark.sql.Encoder[K]])
    KStream(
      spark.createDataset(keys.zipWithIndex.map { case (k, i) => (0L, i.toLong, k) })(enc)
        .toDF("ts", "seq", "k").coalesce(1), // literal key universe: one slice (see fromSeq)
      Seq("k"))
  }

  /** Seeded per-key random-walk source (test/programs/package.scala:16-52,
    * RandomWalkTests.scala:19-24): `n` steps per key, deterministic for a
    * given seed AND partitioning-independent — the per-step noise is a
    * pure hash of (seed, key, step), not a stateful RNG, so the walk is
    * reproducible on any cluster layout. Generated distributively.
    */
  def randomWalk(
      spark: SparkSession,
      keys: Seq[String],
      n: Int,
      seed: Long,
      stepTs: Long = 1000000L): KStream = {
    val keyDf = spark.createDataset(keys)(org.apache.spark.sql.Encoders.STRING).toDF("k")
    val steps = keyDf
      .crossJoin(spark.range(n).select(col("id").as("step")))
      .withColumn("ts", col("step") * stepTs)
      .withColumn("seq", col("step"))
      // uniform [-0.5, 0.5) step from a 60-bit hash
      .withColumn("noise",
        (conv(substring(md5(concat_ws("|", lit(seed), col("k"), col("step"))), 1, 15), 16, 10)
          .cast("long").cast("double") / 1.152921504606847e18) - 0.5)
      .withColumn("v", sum(col("noise")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("step")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .select("k", "ts", "seq", "v")
    KStream(steps, Seq("k"))
  }

  /** keyToStream / lazyVect analog (VectTerm.scala:424-440,
    * EnvTermBuilder.scala:73-98): replace each key of a key set with a
    * generated stream. The reference creates graph cells on demand; in
    * plan-space the registry is materialized once per key and unioned —
    * "effectively a left join of this vector onto vector[domain, gen(k)]".
    * Use only with a bounded key domain (the reference has the same
    * constraint: one live cell per key).
    */
  def keyToStream[K](
      keys: Seq[K],
      gen: K => DataFrame,
      keyCol: String = "k"): KStream = {
    val frames = keys.map { k =>
      gen(k).withColumn(keyCol, lit(k))
    }
    KStream(frames.reduce(_.unionByName(_)), Seq(keyCol))
  }

  /** Driver-gate twin of [[randomWalk]]: the per-step noise quantizes to
    * integer nano-steps (`floor(noise·1e9)` — floor is rounding-mode-free
    * in every engine), so the cumulative walk is an EXACT bigint window
    * sum — bit-stable across engines AND partitionings, where a raw
    * double cumsum is fold-order-sensitive. Same hash-derived noise
    * (one md5 per (seed, key, step)), generated distributively.
    */
  def randomWalkQ(
      spark: SparkSession,
      keys: Seq[String],
      n: Int,
      seed: Long,
      stepTs: Long = 1000000L): KStream = {
    val keyDf = spark.createDataset(keys)(org.apache.spark.sql.Encoders.STRING).toDF("k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("step")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val steps = keyDf
      .crossJoin(spark.range(n).select(col("id").as("step")))
      .withColumn("ts", col("step") * stepTs)
      .withColumn("seq", col("step"))
      .withColumn("noise_q",
        floor(((conv(substring(md5(concat_ws("|", lit(seed), col("k"), col("step"))), 1, 15), 16, 10)
          .cast("long").cast("double") / 1.152921504606847e18) - 0.5) * 1e9))
      .withColumn("walk_q", sum(col("noise_q")).over(w))
      .select("k", "ts", "seq", "walk_q")
    KStream(steps, Seq("k"))
  }

  /** UNBOUNDED keyToStream — the lazyVect flavor (EnvTermBuilder.scala:
    * 73-98, VectTerm.scala:424-440): the key DOMAIN comes from DATA (e.g.
    * `KStream.toKeySet`, or any frame of discovered keys), not a driver-
    * side list, and the per-key stream is a PLAN-SPACE generator — a
    * Column function from the key to an `array<struct<ts,seq,…>>` of its
    * events. The reference creates one live cell per key on first
    * `indexOf` miss; here a key's stream materializes distributively via
    * explode, so a billion discovered keys never touch the driver.
    *
    * @param gen key column → array of event structs; each struct MUST
    *            carry `ts` and `seq` fields (the stream contract).
    */
  def keyToStreamDynamic(
      keySet: DataFrame,
      keyCol: String,
      gen: Column => Column): KStream = {
    val exploded = keySet
      .select(col(keyCol), explode(gen(col(keyCol))).as("__e"))
      .select(col(keyCol), col("__e.*"))
    KStream(exploded, Seq(keyCol))
  }
}
