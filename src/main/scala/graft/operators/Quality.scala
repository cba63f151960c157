package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality audit — the pre-training gate a corpus runs
  * through before it is allowed into a pipeline (Deequ-style constraints,
  * re-expressed as ONE aggregation).
  *
  * Every metric is an aggregate over the same scan, so N constraints cost
  * one job with map-side partial aggregation — never N passes. Metrics are
  * kept as exact integer pairs (numerator, denominator) and thresholds
  * compare integrally (`num * den_scale >= den * num_scale`), so a verdict
  * is bit-stable across engines and partitionings — an oracle can re-derive
  * it in SQL.
  *
  * Reference analog: none (beyond-reference pipeline surface).
  */
object Quality {

  /** One constraint: a named integer metric pair and a threshold ratio.
    * Passes iff `num * ratioDen >= den * ratioNum` (i.e. num/den >=
    * ratioNum/ratioDen with no float at the boundary).
    */
  final case class Check(
      name: String,
      num: Column,
      den: Column,
      ratioNum: Long,
      ratioDen: Long)

  /** Completeness: non-null fraction of `c` at least ratio. */
  def complete(name: String, c: Column, rn: Long, rd: Long): Check =
    Check(name, count(c), count(lit(1)), rn, rd)

  /** Uniqueness: distinct fraction of `c` at least ratio. */
  def unique(name: String, c: Column, rn: Long, rd: Long): Check =
    Check(name, countDistinct(c), count(lit(1)), rn, rd)

  /** Satisfaction: fraction of rows where `pred` holds at least ratio. */
  def satisfies(name: String, pred: Column, rn: Long, rd: Long): Check =
    Check(name, count(when(pred, 1)), count(lit(1)), rn, rd)

  /** Run all checks in one aggregation; result is one row per check:
    * (check, num, den, pass). The unpivot is a plan-space stack over the
    * 1-row aggregate — no second scan, no driver round-trip.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty,
      "Quality.audit needs at least one check (got an empty check list)")
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.num.cast("long").as(s"n$i"), c.den.cast("long").as(s"d$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Empty-denominator policy (explicit, Deequ-style): a check whose
    // denominator is 0 — e.g. any completeness ratio over an EMPTY corpus —
    // FAILS rather than vacuously passing (0 >= 0). An empty corpus
    // sailing through a quality gate is the silent-pipeline-break case the
    // gate exists to catch; callers wanting "empty is fine" can add an
    // explicit row-count check.
    val stacked = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col(s"n$i").as("num"),
        col(s"d$i").as("den"),
        (col(s"d$i") > 0 &&
          col(s"n$i") * c.ratioDen >= col(s"d$i") * c.ratioNum).as("pass"))
    }
    one.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check_name"), col("r.num"), col("r.den"), col("r.pass"))
  }
}
