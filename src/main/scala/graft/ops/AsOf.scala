package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the engine centerpiece (SURVEY.md J1, §4.3).
  *
  * Aligns each left row (entity × timestamp) with the latest right-side
  * state at-or-before (`AtOrBefore`) or strictly-before (`StrictlyBefore`,
  * zero temporal leakage) its timestamp. Reference semantics: musiF's
  * latest-beat-≤-note harmonic lookup
  * (musif/extract/features/scale_relative/utils.py:47-126).
  *
  * Implementation is the union-and-window form — 100% Catalyst-native:
  * tag both sides, union, one window `last(value, ignoreNulls)` over
  * `(key) ORDER BY (ts, tiebreak)`, filter back to left rows. Cost at
  * scale: ONE exchange of the (small) state table into the turns
  * partitioning; if both inputs are already range-partitioned and sorted by
  * `(key, ts)` (the engine's storage contract, [[Ordered]]), AQE sees
  * co-partitioned children and the window sort is a cheap merge. This beats
  * an equi-join + max-filter (which would shuffle both sides AND blow up on
  * many-to-many) and needs no custom SparkPlan for correctness; a fused
  * AsOfMergeExec strategy remains an optional optimization (SURVEY.md §7.3).
  *
  * Tie rule at equal ts: `AtOrBefore` sorts state rows BEFORE the turn at
  * the same ts (turn sees it); `StrictlyBefore` sorts them AFTER (turn
  * cannot see same-instant state — zero leakage, the north-rule tightening).
  */
object AsOf {
  sealed trait Semantics
  case object AtOrBefore extends Semantics
  case object StrictlyBefore extends Semantics

  /** @param left        turn-like rows (kept, one output row each)
    * @param right       state rows: must contain `key`, `ts`, and `valueCols`
    * @param valueCols   state columns to carry onto left rows
    * @param toleranceUs max staleness in microseconds: state older than this
    *                    relative to the left timestamp yields NULL (bounded-
    *                    staleness point-in-time semantics); None = unbounded
    */
  def join(left: DataFrame, right: DataFrame,
           key: String, ts: String, valueCols: Seq[String],
           semantics: Semantics = AtOrBefore,
           toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.contains("__is_state"), "reserved column name")
    require(valueCols.forall(!leftCols.contains(_)),
      s"left already contains one of $valueCols")
    val l = left.withColumn("__is_state", lit(0))
    val r = right.select((Seq(key, ts) ++ valueCols).map(col): _*)
      .withColumn("__is_state", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // AtOrBefore: state first at equal ts (desc on the 0/1 tag);
    // StrictlyBefore: state last → invisible to same-ts turns.
    val tieOrder = semantics match {
      case AtOrBefore     => col("__is_state").desc
      case StrictlyBefore => col("__is_state").asc
    }
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, tieOrder)
      .rowsBetween(Window.unboundedPreceding, 0)

    // Track the matched state row as ONE struct(ts, values...): the carried
    // values and the staleness timestamp always come from the SAME (latest)
    // state row. Tracking each value column with its own last(ignoreNulls)
    // would skip state rows whose value is NULL — an older non-NULL value
    // would leak through the latest state's explicit NULL, diverging from
    // DuckDB/pandas ASOF semantics.
    val stRow = struct((ts +: valueCols).map(col): _*)
    val matched = unioned
      .withColumn("__st",
        last(when(col("__is_state") === 1, stRow), ignoreNulls = true).over(w))
      .filter(col("__is_state") === 0)
    val result = toleranceUs match {
      case None =>
        valueCols.foldLeft(matched)((df, v) => df.withColumn(v, col("__st").getField(v)))
      case Some(tol) =>
        val fresh = unix_micros(col(ts).cast("timestamp")) -
          unix_micros(col("__st").getField(ts).cast("timestamp")) <= tol
        valueCols.foldLeft(matched)((df, v) =>
          df.withColumn(v, when(fresh, col("__st").getField(v))))
    }
    result.select((leftCols ++ valueCols).map(col): _*)
  }
}
