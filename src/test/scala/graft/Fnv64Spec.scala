package graft

import org.apache.spark.sql.functions._
import graft.plans.Fnv64
import graft.multimodal.Multimodal

/** Native fnv64 Expression: codegen path, binary input, null propagation,
  * and the SQL surface all agree with the Scala reference implementation.
  */
class Fnv64Spec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq("", "a", "hello world", "graft-engine-é中")

  test("codegen path matches the Scala reference implementation") {
    Fnv64.register(spark)
    val got = samples.toDF("s")
      .select(Fnv64.fnv64(col("s")).as("h"))
      .as[Long].collect().toSeq
    val expect = samples.map(s => Multimodal.fnv64(s.getBytes("UTF-8")))
    got shouldBe expect
  }

  test("binary input hashes raw bytes") {
    Fnv64.register(spark)
    val got = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(Fnv64.fnv64(col("b"))).as[Long].collect().head
    got shouldBe Multimodal.fnv64(Array[Byte](1, 2, 3))
  }

  test("null propagates") {
    Fnv64.register(spark)
    val got = Seq[Option[String]](None).toDF("s")
      .select(Fnv64.fnv64(col("s"))).collect().head
    got.isNullAt(0) shouldBe true
  }

  test("SQL text surface") {
    Fnv64.register(spark)
    samples.toDF("s").createOrReplaceTempView("fnv_samples")
    val got = spark.sql("SELECT fnv64(s) FROM fnv_samples").as[Long].collect().toSeq
    got shouldBe samples.map(s => Multimodal.fnv64(s.getBytes("UTF-8")))
  }
}
