package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

/** Greedy sequence packing (ops.Packing.packGreedy): fixed-capacity
  * training-bin assembly as hash-sharded sequential streams. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  test("greedy recurrence: bins fill to capacity, overflow starts a new bin") {
    // one source, one shard: tokens 3,3,3 at capacity 7 -> [3,3],[3]
    val d = docs(Seq(
      (0L, "s", "a b c"), (4L, "s", "d e f"), (8L, "s", "g h i")))
    val got = Packing.packGreedy(d, capacity = 7, nShards = 1)
      .orderBy("doc_id").collect().map(p => (p.doc_id, p.bin)).toSeq
    // 3+3=6 <= 7 so docs 0,4 share bin 1; 6+3=9 > 7 so doc 8 opens bin 2
    assert(got == Seq((0L, 1), (4L, 1), (8L, 2)))
  }

  test("oversized document gets its own bin and closes it") {
    val d = docs(Seq(
      (0L, "s", "a b"),                       // 2 tokens, bin 1
      (1L, "s", "x " * 9 + "x"),              // 10 tokens > capacity 5: own bin
      (2L, "s", "c d")))                      // fresh bin after the giant
    val got = Packing.packGreedy(d, capacity = 5, nShards = 1)
      .orderBy("doc_id").collect().map(p => (p.doc_id, p.tok_cnt, p.bin)).toSeq
    assert(got == Seq((0L, 2L, 1), (1L, 10L, 2), (2L, 2L, 3)))
  }

  test("no bin exceeds capacity unless it is a single oversized doc") {
    val rows = (0L until 200L).map(i =>
      (i, s"src${i % 3}", ("w " * ((i % 37) + 1).toInt).trim))
    val out = Packing.packGreedy(docs(rows), capacity = 60, nShards = 4)
    val bins = out.groupBy("source", "shard", "bin")
      .agg(sum("tok_cnt").as("fill"), count(lit(1)).as("n"))
      .collect()
    bins.foreach { r =>
      val fill = r.getAs[Long]("fill")
      val n = r.getAs[Long]("n")
      assert(fill <= 60 || n == 1, s"bin over capacity with $n docs: $r")
    }
  }

  test("bins are 1-based and contiguous within each stream") {
    val rows = (0L until 120L).map(i =>
      (i, "s", ("w " * ((i % 11) + 1).toInt).trim))
    val out = Packing.packGreedy(docs(rows), capacity = 20, nShards = 3)
      .collect().groupBy(p => (p.source, p.shard))
    out.foreach { case (k, ps) =>
      val bins = ps.sortBy(_.doc_id).map(_.bin)
      assert(bins.head == 1, s"stream $k starts at bin ${bins.head}")
      bins.sliding(2).foreach { case Array(a, b) =>
        assert(b == a || b == a + 1, s"stream $k jumps $a -> $b")
      case _ => ()
      }
    }
  }

  test("output is invariant under input repartitioning") {
    val rows = (0L until 150L).map(i =>
      (i, s"src${i % 2}", ("w " * ((i % 23) + 1).toInt).trim))
    val d = docs(rows)
    val one = Packing.packGreedy(d.repartition(1), 50, 4)
      .orderBy("doc_id").collect().toSeq
    val many = Packing.packGreedy(d.repartition(13), 50, 4)
      .orderBy("doc_id").collect().toSeq
    assert(one == many)
  }
}
