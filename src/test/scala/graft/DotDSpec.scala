package graft

import org.apache.spark.sql.functions._
import graft.plans.DotD

/** Native dotd expression: bit-exact parity with the higher-order-lambda
  * fold it replaces (same sequential accumulation order — the determinism
  * contract the DuckDB oracle relies on), plus codegen smoke.
  */
class DotDSpec extends SparkSpec {
  import spark.implicits._

  test("dotd equals aggregate(zip_with(...)) bit-for-bit") {
    DotD.register(spark)
    val df = spark.range(200).select(
      transform(sequence(lit(1), lit(64)),
        i => sin(col("id") * i).cast("double")).as("a"),
      transform(sequence(lit(1), lit(64)),
        i => cos(col("id") + i).cast("double")).as("b"))
    val cmp = df.select(
      DotD.dotd(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("lambda"))
    cmp.filter(col("native") =!= col("lambda")).count() shouldBe 0L
    // null propagation
    val n = cmp.sparkSession.sql("SELECT dotd(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
    n.collect().head.isNullAt(0) shouldBe true
  }

  test("dotd participates in whole-stage codegen") {
    DotD.register(spark)
    val df = spark.range(10).select(
      transform(sequence(lit(1), lit(8)), i => i.cast("double")).as("v"))
      .select(DotD.dotd(col("v"), col("v")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    withClue(plan) { plan should include regex "\\*\\(\\d+\\)" }
  }
}
