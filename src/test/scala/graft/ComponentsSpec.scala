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

  test("iteration cap swaps to star contraction: path longer than the cap still resolves") {
    // path 1-2-...-120 (diameter 119) with maxIters=10: propagation cannot
    // finish, so the guard must hand off to large-star/small-star and
    // still return the exact component minima
    val edges = (1L until 120L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.minLabel(edges, "a", "b", maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 120)
    (1L to 120L).foreach(n => assert(got(n) == 1L, s"node $n"))
  }

  test("starContract equals minLabel on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 20
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toDF("a", "b")
      val viaStar = Components.starContract(edges, "a", "b")
        .orderBy("node").as[(Long, Long)].collect().toSeq
      val viaProp = Components.minLabel(edges, "a", "b")
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(viaStar == viaProp, s"trial $trial (n=$n) diverged")
    }
  }

  test("quality keeper is idempotent and quality-dominates its cluster") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_dedup_keeper_best")(spark, dir).localCheckpoint()
    // a keeper must keep itself (idempotent collapse target)
    val k = out.select(col("keeper").as("doc_id")).distinct()
      .join(out, Seq("doc_id"))
    assert(k.filter(col("keeper") =!= col("doc_id")).count() == 0,
      "a keeper mapped to a different keeper")
    // the keeper's quality dominates every member's own quality
    val q = Tables.documents(spark, dir).select(col("doc_id"),
      round(graft.functions.TextFns.qualityScore(col("text")), 6).as("q"))
    assert(out.join(q, "doc_id").filter(col("keeper_q") < col("q")).count() == 0,
      "a cluster member outranks its keeper's quality")
  }

  test("starContract handles self-loops, singleton edges and a triangle") {
    val edges = Seq((5L, 5L), (1L, 2L), (7L, 8L), (8L, 9L), (9L, 7L)).toDF("a", "b")
    val got = Components.starContract(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }
}
