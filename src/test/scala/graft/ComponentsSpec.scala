package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

/** Connected-components keeper assignment (ops.Components.minLabel):
  * transitive closure over near-dup PAIRS — the dedup-completion step. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain closes transitively: a~b, b~c -> one keeper, no a~c edge needed") {
    val edges = Seq((2L, 1L), (2L, 3L), (9L, 8L)).toDF("da", "db")
    val got = Components.minLabel(edges, "da", "db")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("long path converges to the global component minimum") {
    // path 10-9-8-...-1 (diameter 9) plus a disjoint triangle
    val path = (1L until 10L).map(i => (i, i + 1))
    val tri = Seq((20L, 21L), (21L, 22L), (22L, 20L))
    val got = Components.minLabel((path ++ tri).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    (1L to 10L).foreach(n => assert(got(n) == 1L, s"node $n"))
    (20L to 22L).foreach(n => assert(got(n) == 20L, s"node $n"))
  }

  test("result is partition-layout invariant") {
    val edges = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val one = Components.minLabel(edges.repartition(1), "a", "b")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val many = Components.minLabel(edges.repartition(7), "a", "b")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(one == many)
    assert(one.forall(_._2 == 1L))
  }

  test("iteration cap fails loudly instead of looping") {
    val edges = (1L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.minLabel(edges, "a", "b", maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
