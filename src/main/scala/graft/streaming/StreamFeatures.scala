package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's windowed operators
  * (SURVEY.md §2.10). The reference is pure batch; these are the streaming
  * ports the batch operators were designed to share Column logic with:
  * the same gap-sessionization semantics as [[graft.ops.Sessionize]] but
  * via `session_window` + watermark, and sliding-window aggregates via
  * `window()`.
  *
  * Inputs are streaming DataFrames (`readStream`/MemoryStream) with the
  * canonical turns schema.
  */
object StreamFeatures {

  /** Per-(conv, session) aggregate stream: session windows close `gap`
    * after the last event under a `watermark` lateness bound.
    */
  def sessionStats(turns: DataFrame, gap: String = "24 hours",
                   watermark: String = "1 hour"): DataFrame =
    turns
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), session_window(col("ts"), gap).as("session"))
      .agg(
        count(lit(1)).as("n_turns"),
        count(col("tool")).as("n_tool_calls"),
        avg(length(col("text"))).as("len_mean"))
      .select(col("conv_id"), col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_turns"), col("n_tool_calls"), col("len_mean"))

  case class AsOfEvent(conv_id: String, ts_us: Long, is_state: Boolean,
                       turn_idx: Option[Int], state_val: Option[String])
  case class AsOfOut(conv_id: String, turn_idx: Int, state_val: Option[String])
  case class AsOfCarry(ts_us: Long, state_val: Option[String])

  /** Streaming as-of (J1 on a stream): one merged event stream of turns and
    * state changes, keyed by conv_id; `flatMapGroupsWithState` carries the
    * latest-seen state across micro-batches and annotates each turn with
    * the state at-or-before its timestamp — the streaming form of
    * [[graft.ops.AsOf]], now in ALL THREE batch modes (r3 VERDICT #3):
    *
    *  - `strict = false` (default): AtOrBefore — state wins a timestamp
    *    tie, same tie rule and Long.MinValue "no state yet" semantics;
    *  - `strict = true`: StrictlyBefore — a same-ts state event is
    *    invisible to the turn (zero temporal leakage), enforced BOTH by
    *    the in-batch sort (turns before same-ts state) and by the emit
    *    check `carry.ts < turn.ts` (so a same-ts state carried from an
    *    earlier micro-batch cannot leak either);
    *  - `toleranceUs = Some(t)`: bounded staleness measured from the
    *    MATCHED state row — older state yields None, exactly the batch
    *    tolerance contract.
    *
    * Ordering contract: events are sorted (ts, tie-tag) WITHIN each
    * micro-batch group, and state only advances forward, so the output
    * equals batch AsOf.join whenever each key's events arrive in order
    * across batches (transcript streams are per-conversation ordered at
    * the source). A state event older than the carried state is ignored,
    * never applied retroactively, and a carried state NEWER than a
    * late-arriving turn yields None rather than leaking the future —
    * late data beyond that needs the batch path, the standard
    * streaming-asof tradeoff.
    *
    * Memory: per-key state is ONE (ts, value) pair; the per-batch sort is
    * bounded by a key's events within one micro-batch. The state STORE,
    * however, holds one entry per conversation ever seen — at transcript-
    * stream scale (billions of conversations, most finished) that is the
    * real memory bound, so `stateTtl` (e.g. "2 hours") arms a processing-
    * time timeout that evicts a conversation's carry after it goes quiet;
    * a turn arriving later than the TTL re-enters as "no state yet" (the
    * same answer the batch path gives a conversation whose state was
    * archived). None = keep state forever (test/demo default).
    */
  def asOfState(events: Dataset[AsOfEvent], strict: Boolean = false,
                toleranceUs: Option[Long] = None,
                stateTtl: Option[String] = None): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    // tie tag at equal ts: AtOrBefore applies state first (turn sees it);
    // StrictlyBefore emits the turn first (state invisible) — the same
    // rule AsOf.join encodes in its __is_state sort direction
    val stateTag = if (strict) 1 else 0
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: String, it: Iterator[AsOfEvent], gs: GroupState[AsOfCarry]) =>
          if (gs.hasTimedOut) {
            gs.remove()
            Iterator.empty
          } else {
            var carry = gs.getOption.getOrElse(AsOfCarry(Long.MinValue, None))
            val out = Vector.newBuilder[AsOfOut]
            it.toVector
              .sortBy(e => (e.ts_us, if (e.is_state) stateTag else 1 - stateTag))
              .foreach { e =>
                if (e.is_state) {
                  if (e.ts_us >= carry.ts_us) carry = AsOfCarry(e.ts_us, e.state_val)
                } else {
                  val visible = carry.ts_us != Long.MinValue &&
                    (if (strict) carry.ts_us < e.ts_us else carry.ts_us <= e.ts_us) &&
                    toleranceUs.forall(t => e.ts_us - carry.ts_us <= t)
                  out += AsOfOut(key, e.turn_idx.get,
                    if (visible) carry.state_val else None)
                }
              }
            gs.update(carry)
            stateTtl.foreach(gs.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Column-level adapter: merge turns/state streams of the canonical
    * schemas into the AsOfEvent stream `asOfState` consumes.
    */
  def mergeForAsOf(turns: DataFrame, state: DataFrame): Dataset[AsOfEvent] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val t = turns.select(col("conv_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      lit(false).as("is_state"),
      col("turn_idx").cast("int").as("turn_idx"),
      lit(null).cast("string").as("state_val"))
    val s = state.select(col("conv_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      lit(true).as("is_state"),
      lit(null).cast("int").as("turn_idx"),
      col("state_val"))
    t.unionByName(s).as[AsOfEvent]
  }

  /** Sliding event-time windows (the streaming form of W8): turn counts per
    * role per 1h window sliding 15min.
    */
  def slidingRoleCounts(turns: DataFrame, size: String = "1 hour",
                        slide: String = "15 minutes",
                        watermark: String = "1 hour"): DataFrame =
    turns
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("conv_id"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("window.start").as("w_start"), col("conv_id"), col("role"), col("n_turns"))

  /** Streaming exact dedup over an incoming document stream — the
    * ingestion-time form of the batch `q_dedup_exact` keeper mapping: keep
    * the FIRST document per content fingerprint, drop later exact copies
    * across micro-batches.
    *
    * State shape at web scale: `dropDuplicatesWithinWatermark` keys the
    * dedup state on the 8-byte fingerprint plus the text LENGTH (a second,
    * independent signal: dropping on fingerprint equality alone would
    * silently discard a distinct document on a 60-bit collision — with
    * the length in the key, a collision must also match byte length, and
    * the state cost is one long per entry; the batch `q_dedup_exact` twin
    * resolves full text equality, which streaming state cannot afford to
    * carry) and EVICTS entries once the watermark passes them — bounded
    * state for an unbounded stream (a plain `dropDuplicates` on a stream
    * retains every key forever, which cannot run against a 10¹²-doc
    * firehose). The contract is therefore time-bounded exactness modulo
    * joint (fingerprint, length) collisions: copies arriving within the
    * watermark bound of the original are dropped; a copy arriving later
    * than the bound may re-emit — the same contract batch re-dedup on the
    * sink closes.
    */
  def dedupExact(docs: DataFrame, watermark: String = "24 hours",
                 textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withColumn("fp", graft.functions.TextFns.fingerprint(col(textCol)))
      .withColumn("fp_len", length(col(textCol)).cast("long"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp", "fp_len")

  /** Streaming feature-store maintenance: each micro-batch of turns is one
    * append slice merged into the [[graft.features.IncrementalStore]]
    * generation store via `foreachBatch` — the ingestion loop that keeps
    * the feature matrix current without ever re-aggregating the corpus
    * (cycle cost O(batch) + O(|touched conversations|)).
    *
    * Exactly-once: `foreachBatch` is an AT-LEAST-ONCE sink (a crash after
    * the store flip but before the checkpoint commit replays the batch on
    * restart), and the store's slice fingerprint in `_CURRENT` is what
    * closes the gap — the replayed batch produces the same partials
    * fingerprint and upsert detects it as already-merged, a no-op. The
    * sink is idempotent per batch, so at-least-once delivery composes to
    * exactly-once store state.
    *
    * Ordering contract: inherited from [[graft.features.Incremental.merge]]
    * — each batch's turns must be at-or-after the stored turns per
    * conversation (append-only ingestion; true of per-conversation-ordered
    * transcript streams). Empty batches are skipped, not merged (an empty
    * slice would burn a generation and a fingerprint on no data).
    */
  /** Streaming context assembly: the flatMapGroupsWithState form of
    * [[graft.ops.Packing.packTurns]] — turns stream in per-conversation
    * order (append-only transcript ingestion, the same contract as
    * [[incrementalUpsert]]). Projection and greedy step are the SHARED
    * [[graft.ops.Packing.turnToks]] / [[graft.ops.Packing.advance]], so
    * stream-equals-batch cannot drift on tokenization or the overflow
    * rule; the carried [[graft.ops.Packing.Carry]] is the only state
    * (O(1) per conversation), and each micro-batch's slice is sorted in
    * memory before the walk (bounded by the batch, not the conversation).
    * Cross-batch greedy continuity is exact: a block split across
    * micro-batches fills to the same boundary the batch operator computes
    * on the union. `stateTtl` bounds the state store on an unbounded
    * conversation population (the [[dedupExact]] bounded-state contract):
    * a conversation idle past the TTL is evicted, and a turn arriving
    * after eviction restarts block numbering — set it to the ingestion
    * pipeline's conversation-closed horizon.
    */
  def packTurns(turns: DataFrame, capacity: Long,
                stateTtl: Option[String] = None): DataFrame = {
    import graft.ops.Packing
    val spark = turns.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    Packing.turnToks(turns).groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (conv: String, it: Iterator[Packing.TurnTok],
         gs: GroupState[Packing.Carry]) =>
          if (gs.hasTimedOut) {
            gs.remove()
            Iterator.empty
          } else {
            var carry = gs.getOption.getOrElse(Packing.Carry(0, 0L))
            val out = it.toVector.sortBy(_.turn_idx).map { t =>
              carry = Packing.advance(carry, t.tok_cnt, capacity)
              Packing.TurnBlock(conv, t.turn_idx, t.tok_cnt, carry.id)
            }
            gs.update(carry)
            stateTtl.foreach(gs.setTimeoutDuration)
            out.iterator
          }
      }.toDF()
  }

  /** Streaming incremental near-dup: each micro-batch of NEW documents is
    * MinHash-signed once ([[graft.SparkEntry.lshBandSigs]] over the slice
    * alone — old documents are never re-tokenized), band-joined against the
    * durable [[graft.features.SignatureStore]] plus its own signatures
    * (old↔new AND new↔new candidates in one join), exact-Jaccard-verified
    * against the corpus lookup, and appended to the store. Verified pairs
    * `(da, db, jaccard, batch_id)` append to `outDir` as parquet.
    *
    * `corpus` is the batch-readable document lake (doc_id, text, …); the
    * verify lookup is corpus ∪ current slice, so a pair can verify before
    * the slice lands in the lake. At web scale the stored-signature side is
    * an Iceberg table bucketed on `bkey`, so the band-join prunes to
    * matching buckets and the per-cycle cost is O(slice) signatures plus a
    * candidate-proportional join — never a corpus-wide recompute.
    *
    * Delivery contract: AT-LEAST-ONCE on the pair output (a foreachBatch
    * replay re-emits its batch's pairs; downstream dedups on (da, db)),
    * EXACTLY-ONCE on the store (upsert is epoch-fingerprint idempotent, so
    * the replay's store append no-ops). The store upsert runs AFTER the
    * pair write: if the job dies between them, the replay recomputes the
    * same candidates — the store not yet containing the slice's own
    * signatures is harmless because the join's right side is stored ∪ new.
    */
  def neardupIncremental(docs: DataFrame, corpus: DataFrame, storeDir: String,
                         outDir: String, checkpointDir: String) =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // one signature computation per slice, reused by the join AND the
          // store append (localCheckpoint cuts the streaming-source lineage,
          // which a second action could not re-read)
          val slice = batch.toDF().localCheckpoint()
          val newSigs = graft.SparkEntry.lshBandSigs(slice).localCheckpoint()
          // None ONLY for a genuinely empty store; a broken pointer or
          // unreadable generation fails the batch instead of silently
          // dropping every old↔new pair of the cycle (review r6)
          val stored = graft.features.SignatureStore.sigsIfAny(s, storeDir)
          val all = stored.fold(newSigs)(_.unionByName(newSigs))
          val cand = newSigs.as("n").join(all.as("o"),
              col("n.source") === col("o.source") &&
                col("n.band") === col("o.band") &&
                col("n.bkey") === col("o.bkey") &&
                col("n.doc_id") =!= col("o.doc_id"))
            .select(least(col("n.doc_id"), col("o.doc_id")).as("da"),
              greatest(col("n.doc_id"), col("o.doc_id")).as("db"))
            .distinct().localCheckpoint()
          // restrict the verify lookup to candidate ids BEFORE deduping:
          // the dedup (guards a doc present in both lake and slice) then
          // runs on a candidate-sized frame, not the corpus — keeping the
          // per-cycle cost O(slice + candidates), not O(lake) (review r6)
          val ids = cand.select(col("da").as("doc_id"))
            .unionByName(cand.select(col("db").as("doc_id"))).distinct()
          val lookup = corpus.select(col("doc_id"), col("text"))
            .unionByName(slice.select(col("doc_id"), col("text")))
            .join(ids, Seq("doc_id"), "left_semi")
            .dropDuplicates("doc_id")
          graft.SparkEntry.lshVerify(lookup, cand)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outDir)
          graft.features.SignatureStore.upsert(s, storeDir, newSigs,
            epochId = Some(batchId))
          ()
        }
      }
      .start()

  def incrementalUpsert(turns: DataFrame, storeDir: String,
                        checkpointDir: String,
                        gapSeconds: Long = graft.SparkEntry.SessionGapSeconds) =
    turns.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          // batchId rides into the recorded slice id: a foreachBatch replay
          // re-delivers the SAME id (stays a detected no-op) while a new
          // batch with coincidentally identical content merges (ADVICE r5)
          graft.features.IncrementalStore.upsert(
            batch.sparkSession, storeDir, batch.toDF(), gapSeconds,
            epochId = Some(batchId))
          ()
        }
      }
      .start()
}
