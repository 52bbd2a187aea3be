package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the LLM-training-pipeline operator that turns
  * a corpus of variable-length documents into fixed-capacity training
  * sequences ("bins"): walk documents in a deterministic order, accumulate
  * token counts, and start a new bin whenever the next document would
  * overflow the capacity. A document larger than the capacity gets a bin
  * of its own (truncation is the trainer's decision, not the packer's).
  *
  * Greedy packing is an inherently sequential prefix scan (the bin of doc
  * i depends on every doc before it — non-associative, so no window
  * function expresses it). The scale story is the same sharding trick the
  * production pipelines use: documents are hash-sharded into
  * `nShards` independent streams per source, each packed sequentially.
  * Packing quality is unaffected in expectation (shards see an unbiased
  * sample of the same length distribution) and the shape is exactly one
  * hash exchange on (source, shard) + an in-partition sort — a window
  * function's shuffle — with O(1) state per group. At 100 TB, nShards is
  * sized to the cluster (thousands), not the data; per-shard memory stays
  * one open bin's bookkeeping.
  *
  * This is the documented last-resort tier (d) of the custom-operator
  * preference order (same as W6 `StatefulScan`): the per-group scan is
  * imperative Scala, but everything around it — the token counting, the
  * shard assignment, the exchange — is Column algebra. Output is
  * invariant under input repartitioning (sorted-groups contract).
  */
object Packing {

  case class DocTok(source: String, shard: Int, doc_id: Long, tok_cnt: Long)
  case class Packed(source: String, shard: Int, doc_id: Long, tok_cnt: Long,
                    bin: Int)

  /** Pack `docs` (needs `source`, `doc_id`, `text`) into bins of at most
    * `capacity` whitespace tokens, `nShards` independent greedy streams
    * per source, documents walked in ascending `doc_id` within a stream.
    * `bin` is 1-based within each (source, shard) stream.
    */
  case class TurnTok(conv_id: String, turn_idx: Int, tok_cnt: Long)
  case class TurnBlock(conv_id: String, turn_idx: Int, tok_cnt: Long,
                       block: Int)

  /** Context assembly for transcripts: greedily chunk each conversation's
    * turns, IN ORDER, into blocks of at most `capacity` whitespace tokens
    * without ever splitting a turn — the SFT-context analog of [[packGreedy]]
    * (there, order within a stream is a free choice; here, turn order is
    * the semantics, so the conversation IS the stream and the natural
    * parallelism). One hash exchange on conv_id + in-partition sort —
    * identical layout to the rest of the turn pipeline, so upstream
    * derivation sorts are reused. A turn larger than the capacity gets a
    * block of its own; null-text turns count zero tokens but keep their
    * place. `block` is 1-based per conversation. A giant conversation
    * serializes on one task like any per-conv ordered scan — the
    * [[BlockedScan]] boundary-carry story applies unchanged if profiling
    * demands it.
    */
  def packTurns(turns: DataFrame, capacity: Long): Dataset[TurnBlock] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val ds = turns.select(
      col("conv_id").cast("string").as("conv_id"),
      col("turn_idx").cast("int").as("turn_idx"),
      coalesce(size(split(col("text"), " ")).cast("long"), lit(0L)).as("tok_cnt"))
      .as[TurnTok]
    ds.groupByKey(_.conv_id)
      .flatMapSortedGroups(col("turn_idx")) { (conv: String, it: Iterator[TurnTok]) =>
        var block = 0
        var fill = 0L
        it.map { t =>
          if (block == 0 || fill + t.tok_cnt > capacity) {
            block += 1; fill = t.tok_cnt
          } else fill += t.tok_cnt
          TurnBlock(conv, t.turn_idx, t.tok_cnt, block)
        }
      }
  }

  def packGreedy(docs: DataFrame, capacity: Long, nShards: Int): Dataset[Packed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs.select(
      col("source"),
      pmod(col("doc_id"), lit(nShards)).cast("int").as("shard"),
      col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("tok_cnt")).as[DocTok]
    ds.groupByKey(d => (d.source, d.shard))
      .flatMapSortedGroups(col("doc_id")) {
        (key: (String, Int), it: Iterator[DocTok]) =>
          var bin = 0
          var fill = 0L
          it.map { d =>
            if (bin == 0 || fill + d.tok_cnt > capacity) {
              bin += 1; fill = d.tok_cnt
            } else fill += d.tok_cnt
            Packed(key._1, key._2, d.doc_id, d.tok_cnt, bin)
          }
      }
  }
}
