package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DupSpans

/** Hot-shingle skew-crossover experiment (r5 VERDICT → r6 #1): demonstrate
  * that the aggregate+join marking of [[DupSpans.spans]] wins where it
  * exists to win — a corpus where a handful of boilerplate shingles carry
  * millions of occurrences.
  *
  * Differential tests (CorpusStatsSpec) pin row-identity of the two forms
  * at fixture scale; this pins the PERFORMANCE claim. The corpus: every
  * document opens with ONE boilerplate token repeated `5×reps` times (a
  * license-header/navigation-chrome stand-in — period 1 means the entire
  * repeated region collapses onto a SINGLE shingle sig with ~5×reps
  * occurrences PER DOCUMENT), followed by a unique tail. The window form
  * must sort that sig's tens of millions of rows on ONE task (AQE cannot
  * split a window partition); the skew form materializes the projection
  * once, collapses the hot sig map-side in a partial aggregate, and
  * probes with an AQE-planned (broadcast) join — no token-stream
  * exchange at all.
  *
  * Usage: runMain graft.tools.DupSkewBench [nDocs] [boilerReps] [timedReps]
  * Prints one JSON line: window/skew medians, speedup, hot-sig row count,
  * and the row-identity digest check on the full span result.
  */
object DupSkewBench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nDocs = args.lift(0).map(_.toLong).getOrElse(100000L)
    val boilerReps = args.lift(1).map(_.toInt).getOrElse(50)
    val timedReps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-dup-skew-bench")
      .config("spark.sql.shuffle.partitions", "192")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus: ONE boilerplate token × 5·reps (period 1 → a single hot
    // sig), then a 10-token unique tail per doc — generated columnar,
    // written pruned to the operator's working set (doc_id, token array)
    val dir = sys.env.getOrElse("SPARK_GRAFT_DUPSKEW_DIR", "/tmp/graft_dupskew_corpus")
    spark.range(nDocs).select(col("id").as("doc_id"),
        concat(
          array_repeat(lit("B"), 5 * boilerReps),
          transform(sequence(lit(0), lit(9)),
            i => concat_ws("_", lit("u"), col("id"), i))).as("a"))
      .repartition(64)
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val toks = docs.select(sum(size(col("a")))).head.getLong(0)
    // hot rows = shingle positions fully inside the repeated region
    val hotRows = nDocs * (5L * boilerReps - 4L)

    // time the MARKING stage in isolation: the island merge downstream is
    // identical in both forms (24M+ marked rows through the per-doc
    // window either way) and would dilute the signal the swap targets.
    // The thunk is evaluated INSIDE the timed section — the skew form's
    // localCheckpoint runs eagerly at DataFrame construction.
    def timeNoop(build: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      build().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val winF = () => DupSpans.dupPositions(docs, k = 5, skewSafe = false)
    val skewF = () => DupSpans.dupPositions(docs, k = 5, skewSafe = true)

    // row-identity on THIS corpus before timing anything: full-span digest
    // (exercises the island merge too, so the END-TO-END results agree)
    val dig = (skewSafe: Boolean) =>
      DupSpans.spans(docs, k = 5, skewSafe = skewSafe)
        .agg(count(lit(1)), sum(col("s")), sum(col("e")),
          countDistinct(col("doc_id"))).head.toSeq
    val (dW, dS) = (dig(false), dig(true))
    require(dW == dS, s"skew != window: $dW vs $dS")

    timeNoop(winF); timeNoop(skewF) // warm both paths
    val (tW, tS) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to timedReps).foreach { r =>
      val w = timeNoop(winF); val sk = timeNoop(skewF)
      tW += w; tS += sk
      System.err.println(f"[dupskew] rep $r: window=$w%.1fs skew_safe=$sk%.1fs")
    }
    val (mW, mS) = (median(tW.result()), median(tS.result()))
    println(f"""{"metric":"skew_dup_spans_marking","docs":$nDocs,"tokens":$toks,"hot_sig_rows":$hotRows,"hot_sigs":1,"window_sec":$mW%.2f,"skew_safe_sec":$mS%.2f,"speedup":${mW / mS}%.2f,"reps":$timedReps,"identical":true}""")
    spark.stop()
  }
}
