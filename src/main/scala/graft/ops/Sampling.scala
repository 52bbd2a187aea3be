package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-k-per-stratum deterministic sampling (the engine behind
  * `q_sample_topk` / `q_sample_topk_prefilter`): rank each stratum's rows
  * by a caller-supplied uniform hash column and keep the k smallest —
  * exactly min(k, |stratum|) rows, identical at any parallelism, re-run,
  * or engine, and maximally overlapping under corpus append (a row's rank
  * only ever grows). No reference analog (musiF's corpus is curated);
  * part of the training-data curation tier (SURVEY.md §6).
  */
object Sampling {

  /** Plain form: one per-stratum sort (Spark plans the rank ≤ k filter as
    * WindowGroupLimit top-k pushdown, so no task sorts more than k rows).
    */
  def topKByHash(d: DataFrame, strata: String, hash: String, k: Long,
                 tiebreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(strata))
      .orderBy((col(hash).asc +: tiebreak.map(col(_).asc)): _*)
    d.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Scale form, output identical BY CONSTRUCTION: a hash-threshold
    * prefilter at `margin`×k expected survivors shrinks the per-stratum
    * top-k to a ~margin·k-row set, and exactness is restored
    * DECLARATIVELY — any stratum whose survivor count underfills
    * min(k, n) (possible only under pathological hash clustering,
    * P ≈ e^{-k} per stratum at margin 4) re-ranks from the full table via
    * a unioned fallback branch that stays empty in any non-adversarial
    * run. `hashSpace` is the exclusive upper bound of the hash column's
    * range (2⁶⁰ for `TextFns.md5Long`).
    *
    * The hash column is an argument precisely so the fallback is
    * TESTABLE: a crafted hash that defeats the threshold must still yield
    * exactly min(k, n) rows per stratum (SamplingSpec forces this).
    */
  def topKByHashPrefiltered(d: DataFrame, strata: String, hash: String,
                            k: Long, margin: Long = 4L,
                            hashSpace: Long = 1L << 60,
                            tiebreak: Seq[String] = Nil): DataFrame = {
    val sizes = d.groupBy(col(strata)).agg(count(lit(1)).as("__n"))
    val thr = sizes.select(col(strata), col("__n"),
      when(col("__n") <= k * margin, lit(hashSpace))
        .otherwise((lit(hashSpace) / col("__n")) * (k * margin)).as("__thr"))
    val surv = d.join(broadcast(thr), Seq(strata))
      .filter(col(hash) < col("__thr")).drop("__n", "__thr")
    // status derives from SIZES (every stratum present), not from surv: a
    // stratum with ZERO survivors would otherwise vanish from both
    // branches' inner joins instead of falling back
    val status = sizes
      .join(surv.groupBy(col(strata)).agg(count(lit(1)).as("__m")),
        Seq(strata), "left")
      .select(col(strata),
        (coalesce(col("__m"), lit(0L)) >= least(lit(k), col("__n"))).as("__ok"))
    val w = Window.partitionBy(col(strata))
      .orderBy((col(hash).asc +: tiebreak.map(col(_).asc)): _*)
    def topk(df: DataFrame) = df
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
    val fast = topk(surv.join(broadcast(status), Seq(strata))
      .filter(col("__ok")).drop("__ok"))
    val slow = topk(d.join(broadcast(status), Seq(strata))
      .filter(!col("__ok")).drop("__ok"))
    fast.unionByName(slow)
  }
}
