package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-shingle immunity experiment for the containment family: the
  * q_containment registry comment claims its blocking predicate is
  * skew-immune BY CONSTRUCTION — a corpus-hot boilerplate trigram has
  * df > 10, so it produces ZERO candidate pairs and no salting is needed.
  * This measures that claim on a corpus built to break naive blocking:
  * every document opens with the same boilerplate prefix (its trigrams
  * are shared by ALL docs), and every 100th document is an exact copy of
  * its successor (the planted recall targets — their unique-tail trigrams
  * are exactly the df=2 rare shingles the blocker keys on).
  *
  * Two numbers make the case:
  *   - `naive_pairs`: what candidate generation WITHOUT the df ≤ 10 cap
  *     would emit — Σ C(df, 2) over shingles with df ≥ 2, computed as an
  *     aggregate (never materialized; at 100k docs the hot trigrams alone
  *     contribute ~5×10⁹ pairs — the join that plan would have to verify).
  *   - `blocked_pairs`: what the shipped blocker emits (planted-pair
  *     sized — each planted copy shares ~10 rare trigrams with its twin).
  * plus wall-clock of the full shipped query at nDocs and 2·nDocs: the
  * hot shingle's multiplicity grows with the corpus, so near-linear total
  * growth IS the flatness claim (a window/salting-shaped plan would grow
  * with the hot key's square or pile it on one task).
  *
  * Usage: runMain graft.tools.ContainSkewBench [nDocs] [timedReps]
  * Prints one JSON line.
  */
object ContainSkewBench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nDocs = args.lift(0).map(_.toLong).getOrElse(100000L)
    val timedReps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-contain-skew-bench")
      .config("spark.sql.shuffle.partitions", "192")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // every doc: 12-token boilerplate prefix (1 corpus-hot trigram —
    // 'boiler boiler boiler' with df = nDocs after trigramArr's
    // array_distinct — plus 2 per-doc boundary trigrams; ADVICE r6) +
    // 12-token unique tail; doc 100k is an exact copy of doc 100k+1
    // (same tail), so each planted pair shares ~10 df=2 trigrams
    def corpus(n: Long): org.apache.spark.sql.DataFrame = {
      val dir = s"/tmp/graft_containskew_$n"
      spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ",
            (concat(array_repeat(lit("boiler"), 12),
              transform(sequence(lit(0), lit(11)),
                i => concat_ws("_", lit("u"),
                  when(col("id") % 100 === 0, col("id") + 1).otherwise(col("id")),
                  i)))).cast("array<string>")).as("text"))
        .repartition(64)
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val docs = corpus(nDocs)

    // the df histogram the blocker sees (one postings aggregate):
    // pairs a naive df>=2 blocker would emit vs the shipped df<=10 gate
    // the SHIPPED shingling (SparkEntry.trigramArr + md5Long), so the df
    // histogram this bench reports cannot drift from what the blocker
    // actually sees
    import graft.functions.TextFns.md5Long
    val dfh = docs
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"),
        explode(graft.SparkEntry.trigramArr(col("a"))).as("gram"))
      .select(md5Long(col("gram")).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("df"))
    val agg = dfh.filter(col("df") >= 2).agg(
      sum(expr("df * (df - 1) div 2")).as("naive_pairs"),
      sum(when(col("df") <= 10, expr("df * (df - 1) div 2"))
        .otherwise(0L)).as("blocked_pair_slots"),
      max(col("df")).as("hot_df")).head
    val (naive, blockedSlots, hotDf) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))

    // recall on the planted pairs + shipped-form pair count: every
    // planted exact-copy pair is mutual containment → two directed rows
    require(nDocs % 100 == 0, "nDocs must be a multiple of 100")
    val pairs = graft.SparkEntry.containmentPairs(docs)
    val planted = nDocs / 100
    val found = pairs.filter(
      (col("inner_doc") % 100 === 0 && col("outer_doc") === col("inner_doc") + 1) ||
      (col("outer_doc") % 100 === 0 && col("inner_doc") === col("outer_doc") + 1))
      .count()
    val total = pairs.count()
    require(found == 2 * planted,
      s"planted recall broke: found $found of ${2 * planted} directed rows")

    def timeNoop(d: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.containmentPairs(d)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val docs2 = corpus(nDocs * 2)
    timeNoop(docs); timeNoop(docs2) // warm
    val (t1, t2) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to timedReps).foreach { r =>
      val a = timeNoop(docs); val b = timeNoop(docs2)
      t1 += a; t2 += b
      System.err.println(f"[containskew] rep $r: n=$a%.1fs 2n=$b%.1fs")
    }
    val (m1, m2) = (median(t1.result()), median(t2.result()))
    println(f"""{"metric":"contain_skew","docs":$nDocs,"hot_df":$hotDf,"naive_pairs":$naive,"blocked_pairs":$total,"blocked_pair_slots":$blockedSlots,"planted_directed_rows":$found,"sec_n":$m1%.2f,"sec_2n":$m2%.2f,"growth":${m2 / m1}%.2f,"reps":$timedReps}""")
    spark.stop()
  }
}
