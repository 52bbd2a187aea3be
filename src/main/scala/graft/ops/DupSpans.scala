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
  * decided by min(doc)≠max(doc) — two window aggregates sharing ONE
  * exchange on the 60-bit shingle hash, exact and cheaper than a
  * distinct-count; marked positions merge into maximal spans with the
  * sessionize island trick on the doc_id exchange. Every frame after the
  * shingle explode is token-stream-sized and hash-partitioned; nothing is
  * broadcast or collected.
  *
  * Skew note for the 100-TB tier: a hot boilerplate shingle (license
  * headers, navigation chrome) sends every one of its occurrences to ONE
  * window partition, and AQE cannot split a window partition the way it
  * splits a skewed join. If profiling shows a hot sig, swap the window
  * marking for the aggregate+join form — `groupBy(sig).agg(min, max)`
  * collapses the hot key map-side (partial aggregation), and the
  * positions⋈dupSigs join that replaces the window is skew-splittable by
  * AQE — at the cost of computing the shingle projection twice (the same
  * single-computation-vs-skew trade [[BlockedScan]] documents for ordered
  * scans). The fixture-scale corpora nowhere near that regime, so this
  * implementation keeps the one-pass window form.
  */
object DupSpans {

  /** Maximal duplicated spans per document: (doc_id, s, e) with 0-based
    * inclusive token positions. Input: (doc_id, tokens array) as `a`.
    * A span is the union of overlapping-or-adjacent k-shingle windows
    * whose shingle also appears in at least one OTHER document.
    */
  def spans(docs: DataFrame, k: Int, tokensCol: String = "a"): DataFrame = {
    val a = col(tokensCol)
    val sh = docs.filter(size(a) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(a) - k),
        i => struct(i.as("pos"),
          TextFns.md5Long(concat_ws(" ", slice(a, i + 1, lit(k))))
            .as("sig")))).as("sh"))
      .select(col("doc_id"), col("sh.pos").as("pos"), col("sh.sig").as("sig"))
    val wSig = Window.partitionBy(col("sig"))
    val dupPos = sh
      .withColumn("dup", min(col("doc_id")).over(wSig) =!= max(col("doc_id")).over(wSig))
      .filter(col("dup"))
      .select(col("doc_id"), col("pos"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPos
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
