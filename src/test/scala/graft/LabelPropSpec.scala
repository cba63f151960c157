package graft

import org.apache.spark.sql.functions._
import graft.operators.LabelProp

/** Deterministic synchronous LPA: hand-checked rounds on a two-triangle
  * bridge graph, and partition independence of the full assignment.
  */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // triangles {1,2,3} and {4,5,6} bridged by 3-4; undirected
  private def bridge = {
    val e0 = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("hand-checked two rounds: min-label tie-break, sync updates") {
    // r1: 1→2(tie {2,3}), 2→1, 3→1(min of {1,2,4}), 4→3, 5→4, 6→4
    // r2: 1→1(two 1s), 2→1(tie {2,1}), 3→1, 4→4(two 4s), 5→3, 6→3
    val got = LabelProp.run(bridge, rounds = 2)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L)
  }

  test("assignment is partition-independent") {
    val a = LabelProp.run(bridge.repartition(1), 3)
      .as[(Long, Long)].collect().toSet
    val b = LabelProp.run(bridge.repartition(8), 3)
      .as[(Long, Long)].collect().toSet
    a shouldBe b
  }

  test("a node with no in-neighbors keeps its label") {
    // directed: 1 -> 2 only; node 1 has no in-edges
    val got = LabelProp.run(Seq((1L, 2L)).toDF("src", "dst"), 2)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L)
  }
}
