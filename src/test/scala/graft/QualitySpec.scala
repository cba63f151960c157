package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality._

/** Quality.audit: verdict correctness on a frame with planted violations,
  * and the one-pass plan claim (a single aggregate, no per-check scans).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("aa"), 10L),
    (2L, Some("bb"), -1L), // violates positivity
    (2L, None, 5L) // duplicate key + null text
  ).toDF("id", "txt", "n")

  test("planted violations flip exactly the right checks") {
    val out = audit(df, Seq(
      complete("txt_complete", col("txt"), 1, 1),
      unique("id_unique", col("id"), 1, 1),
      satisfies("n_positive", col("n") > 0, 2, 3), // 2/3 pass => ok
      satisfies("n_positive_strict", col("n") > 0, 1, 1)))
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (k, n, d, p) => k -> ((n, d, p)) }.toMap

    out("txt_complete") shouldBe ((2L, 3L, false))
    out("id_unique") shouldBe ((2L, 3L, false))
    out("n_positive") shouldBe ((2L, 3L, true))
    out("n_positive_strict") shouldBe ((2L, 3L, false))
  }

  test("an EMPTY corpus fails every ratio check (no vacuous pass) and empty check lists are rejected") {
    val empty = df.filter(col("id") < 0)
    val out = audit(empty, Seq(
      complete("txt_complete", col("txt"), 1, 1),
      satisfies("n_positive", col("n") > 0, 1, 2)))
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (k, n, d, p) => k -> ((n, d, p)) }.toMap
    out("txt_complete") shouldBe ((0L, 0L, false)) // den=0 → explicit FAIL
    out("n_positive") shouldBe ((0L, 0L, false))

    val err = intercept[IllegalArgumentException](audit(df, Seq.empty))
    err.getMessage should include("at least one check")
  }

  test("N checks cost ONE aggregation pass (a single scan in the plan)") {
    val out = audit(df, Seq(
      complete("c1", col("txt"), 1, 1),
      unique("c2", col("id"), 1, 1),
      satisfies("c3", col("n") > 0, 1, 2)))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    withClue(plan) {
      "LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).size should be <= 1
    }
  }
}
