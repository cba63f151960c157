package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.queries.Q

/** Deterministic sampling/splitting for corpus prep: md5-derived hash
  * gates instead of seeded RNG, so the SAME rows are selected on any
  * engine, any partitioning, any rerun (leak-free splits by construction).
  */
object Sampling {

  /** Hash of (salt, key) in [0, 100). */
  def pctHash(salt: String, key: Column): Column =
    Q.hash60(concat(lit(salt + "|"), key)) % 100

  /** Boolean gate keeping ~pct% of rows. */
  def sampleGate(salt: String, key: Column, pct: Int): Column =
    pctHash(salt, key) < pct

  /** Hash of (salt, key) in [0, 1000) — the per-mille gate for rates
    * finer than whole percents (mixture sampling needs ~0.1% steps).
    */
  def permilleHash(salt: String, key: Column): Column =
    Q.hash60(concat(lit(salt + "|"), key)) % 1000

  /** Split assignment by cumulative percentage ranges, e.g.
    * splits = Seq("train" -> 80, "val" -> 10, "test" -> 10).
    */
  def splitAssign(salt: String, key: Column, splits: Seq[(String, Int)]): Column = {
    val h = pctHash(salt, key)
    val cum = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    splits.map(_._1).zip(cum).init.foldRight(lit(splits.last._1)) {
      case ((name, bound), acc) => when(h < bound, name).otherwise(acc)
    }
  }
}
