package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Cross-document duplicated-span detection over tokenized documents — the
  * span-level dedup granularity between whole-document fingerprints, CDC
  * chunks, and MinHash near-dup (the shuffle-friendly shingle-hash form of
  * Lee et al. 2022's suffix-array substring dedup).
  *
  * Scale shape: shingles are built ROW-LOCALLY from the token array (one
  * corpus tokenize pass, no fan-out join); cross-document occurrence is
  * decided by min(doc)≠max(doc); marked positions merge into maximal spans
  * with the sessionize island trick on the doc_id exchange. Every frame
  * after the shingle explode is token-stream-sized and hash-partitioned;
  * nothing is broadcast or collected.
  *
  * TWO marking strategies, one contract (`DupSpansSkewSpec` pins their
  * equivalence row-for-row):
  *
  *  - `skewSafe = false` (default): two window aggregates sharing ONE
  *    exchange on the 60-bit shingle hash. One pass over the shingle
  *    projection — the cheapest plan when no single shingle is hot.
  *    EXPOSURE: a hot boilerplate shingle (license headers, navigation
  *    chrome) sends every one of its occurrences to ONE window partition,
  *    and AQE cannot split a window partition the way it splits a skewed
  *    join.
  *  - `skewSafe = true`: the shingle projection is MATERIALIZED once
  *    (localCheckpoint — the md5-per-token projection is the dominant
  *    cost, so recomputing it on the aggregate side loses more than any
  *    skew win; measured 0.58× before materialization), then
  *    `groupBy(sig).agg(min,max)` — partial (map-side) aggregation
  *    collapses a hot key to one row per input partition — and a
  *    positions⋈dupSigs equi-join that AQE broadcasts when dupSigs is
  *    small (the usual case: duplicated-shingle-sized) and skew-splits if
  *    it shuffles. With a broadcast probe the marking performs NO
  *    exchange of the token stream at all. `graft.tools.DupSkewBench`
  *    measures the crossover on a corpus whose single boilerplate shingle
  *    carries tens of millions of occurrences. On a multi-executor
  *    cluster, swap localCheckpoint for a persisted temp table /
  *    `persist(DISK_ONLY)` — executor-local checkpoint blocks do not
  *    survive executor loss.
  *
  * At the 100-TB tier the choice is a profile question: web-scale corpora
  * WILL contain hot shingles, so `skewSafe = true` is the deployment
  * default there; the window form remains right for curated or
  * pre-sharded corpora where the hot tail is bounded.
  */
object DupSpans {

  /** Row-local k-shingle projection: one (doc_id, pos, sig) row per
    * k-window of the token array, sig = engine-portable 60-bit hash of the
    * space-joined shingle.
    */
  def shingles(docs: DataFrame, k: Int, tokensCol: String = "a"): DataFrame = {
    val a = col(tokensCol)
    docs.filter(size(a) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(a) - k),
        i => struct(i.as("pos"),
          TextFns.md5Long(concat_ws(" ", slice(a, i + 1, lit(k))))
            .as("sig")))).as("sh"))
      .select(col("doc_id"), col("sh.pos").as("pos"), col("sh.sig").as("sig"))
  }

  /** The MARKING stage: (doc_id, pos) of every shingle that also appears
    * in at least one other document — the stage the `skewSafe` swap
    * targets (and the stage `graft.tools.DupSkewBench` times in
    * isolation; the island merge downstream is identical in both forms).
    */
  def dupPositions(docs: DataFrame, k: Int, tokensCol: String = "a",
                   skewSafe: Boolean = false): DataFrame =
    if (skewSafe) {
      // aggregate+join marking over the ONCE-materialized projection:
      // hot sigs collapse map-side, the join is AQE-broadcastable /
      // skew-splittable (no hint: dupSigs is data-sized, let AQE pick)
      val sh = shingles(docs, k, tokensCol).localCheckpoint()
      val dupSigs = sh.groupBy(col("sig"))
        .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
        .filter(col("__mn") =!= col("__mx"))
        .select(col("sig"))
      sh.join(dupSigs, Seq("sig")).select(col("doc_id"), col("pos"))
    } else {
      val sh = shingles(docs, k, tokensCol)
      val wSig = Window.partitionBy(col("sig"))
      sh.withColumn("dup",
          min(col("doc_id")).over(wSig) =!= max(col("doc_id")).over(wSig))
        .filter(col("dup"))
        .select(col("doc_id"), col("pos"))
    }

  /** Maximal duplicated spans per document: (doc_id, s, e) with 0-based
    * inclusive token positions. Input: (doc_id, tokens array) as `a`.
    * A span is the union of overlapping-or-adjacent k-shingle windows
    * whose shingle also appears in at least one OTHER document.
    */
  def spans(docs: DataFrame, k: Int, tokensCol: String = "a",
            skewSafe: Boolean = false): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPositions(docs, k, tokensCol, skewSafe)
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(wDoc) + k, 1L)
          .when(lag(col("pos"), 1).over(wDoc).isNull, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
      .select(col("doc_id"), col("s").cast("long").as("s"), col("e").cast("long").as("e"))
  }

  /** True iff 0-based token index `i` falls inside any span of `spansArr`
    * (array<struct<s,e>>, null-safe: a doc with no spans keeps everything).
    */
  def covered(i: Column, spansArr: Column): Column =
    exists(coalesce(spansArr, array().cast("array<struct<s:bigint,e:bigint>>")),
      sp => i >= sp("s") && i <= sp("e"))
}
