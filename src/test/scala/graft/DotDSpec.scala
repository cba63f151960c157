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

  test("RewriteDotProduct: the portable fold optimizes into dotd " +
    "(optimizer Rule via extensions)") {
    spark.experimental.extraOptimizations =
      Seq(graft.plans.RewriteDotProduct)
    try {
      val df = spark.range(50).select(
        transform(sequence(lit(1), lit(16)),
          i => sin(col("id") * i).cast("double")).as("a"),
        transform(sequence(lit(1), lit(16)),
          i => cos(col("id") + i).cast("double")).as("b"))
        .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      withClue(optimized) {
        optimized should include("dotd(")
        optimized should not include "aggregate("
      }
      // and the rewritten plan computes the same values
      DotD.register(spark)
      val direct = spark.range(50).select(
        transform(sequence(lit(1), lit(16)),
          i => sin(col("id") * i).cast("double")).as("a"),
        transform(sequence(lit(1), lit(16)),
          i => cos(col("id") + i).cast("double")).as("b"))
        .select(DotD.dotd(col("a"), col("b")).as("d"))
      df.as[Double].collect().toSeq shouldBe direct.as[Double].collect().toSeq
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("dotd null-poisons exactly like the fold (length mismatch, null element)") {
    DotD.register(spark)
    val r = spark.sql(
      """SELECT dotd(array(1.0d, 2.0d), array(3.0d)) AS len_mismatch,
                dotd(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS null_elem,
                dotd(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS ok""").collect().head
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
    r.getDouble(2) shouldBe 11.0
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
