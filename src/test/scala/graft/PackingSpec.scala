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

  private def turns(rows: Seq[(String, Int, String)]) =
    rows.toDF("conv_id", "turn_idx", "text")

  test("turn packing: blocks respect capacity, contiguity, and turn order") {
    // tokens per turn: 3,3,3,9,2 at capacity 7 →
    // [0,1] (3+3=6), [2] (6+3>7 → new; 3), [3] (3+9>7 → own block for the
    // oversized turn... 9>7 alone too), [4] (9+2>7 → new)
    val t = turns(Seq(
      ("c", 0, "a b c"), ("c", 1, "d e f"), ("c", 2, "g h i"),
      ("c", 3, "j k l m n o p q r"), ("c", 4, "s t")))
    val got = Packing.packTurns(t, capacity = 7)
      .orderBy("turn_idx").collect().map(b => (b.turn_idx, b.block)).toSeq
    assert(got == Seq((0, 1), (1, 1), (2, 2), (3, 3), (4, 4)))
    // blocks are 1-based, monotone non-decreasing in turn order, and no
    // block's token sum exceeds capacity unless it is a single oversized turn
    val byBlock = Packing.packTurns(t, 7).collect()
      .groupBy(_.block).map { case (b, ts) => (b, ts.map(_.tok_cnt).sum, ts.length) }
    byBlock.foreach { case (b, tot, n) =>
      assert(tot <= 7 || n == 1, s"block $b over capacity with $n turns") }
  }

  test("turn packing: null text counts zero tokens and keeps its slot") {
    val t = turns(Seq(("c", 0, "a b c"), ("c", 1, null), ("c", 2, "d e f")))
    val got = Packing.packTurns(t, capacity = 6)
      .orderBy("turn_idx").collect().map(b => (b.turn_idx, b.tok_cnt, b.block)).toSeq
    assert(got == Seq((0, 3L, 1), (1, 0L, 1), (2, 3L, 1)))
  }

  test("turn packing equals a plain sequential fold on seeded-random conversations") {
    // differential oracle: the distributed packer against an in-memory
    // walk of the same greedy recurrence, across 30 random (seeded)
    // conversations with token counts spanning under/at/over capacity
    var x = 42L
    def nxt(mod: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      java.lang.Long.remainderUnsigned(x >>> 16, mod).toInt
    }
    val cap = 9L
    val rows = for (c <- 0 until 30; t <- 0 until (nxt(12) + 1)) yield
      (s"c$c", t, ("w " * (nxt(13) + 1)).trim)
    val expected = rows.groupBy(_._1).flatMap { case (conv, ts) =>
      var c = Packing.Carry(0, 0L)
      ts.sortBy(_._2).map { case (_, idx, text) =>
        val tok = text.split(" ").length.toLong
        c = Packing.advance(c, tok, cap)
        (conv, idx, c.id)
      }
    }.toSeq.sorted
    val got = Packing.packTurns(rows.toDF("conv_id", "turn_idx", "text"), cap)
      .collect().map(b => (b.conv_id, b.turn_idx, b.block)).toSeq.sorted
    assert(got == expected)
  }

  test("turn packing is invariant under input repartitioning") {
    val rows = (0 until 200).map(i =>
      (s"c${i % 7}", i / 7, ("w " * ((i % 11) + 1)).trim))
    val t = turns(rows)
    val one = Packing.packTurns(t.repartition(1), 10)
      .orderBy("conv_id", "turn_idx").collect().toSeq
    val many = Packing.packTurns(t.repartition(13), 10)
      .orderBy("conv_id", "turn_idx").collect().toSeq
    assert(one == many)
  }
}
