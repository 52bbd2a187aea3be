package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical aggregate expressions with reference-parity semantics.
  *
  * musiF uses scipy with `bias=False` (sample moments) —
  * musif/extract/features/melody/handler.py:577-607 — while Spark's
  * `skewness`/`kurtosis` are the biased population estimators (g1, g2).
  * The bias corrections are plain column math (SURVEY.md §7.4#3), so the
  * whole thing stays inside one HashAggregate + project — no UDAF.
  */
object Stats {

  /** Sample (bias-corrected) skewness: G1 = g1 * sqrt(n(n-1)) / (n-2).
    * Null when n < 3 or variance is 0 (matches DuckDB/pandas).
    */
  def skewnessSample(x: Column): Column = {
    val n = count(x).cast("double")
    val g1 = skewness(x)
    when(n >= 3 && stddev_samp(x) > 0,
      g1 * sqrt(n * (n - 1)) / (n - 2))
  }

  /** Sample excess kurtosis: G2 = ((n+1) g2 + 6) (n-1) / ((n-2)(n-3)).
    * Null when n < 4 or variance is 0.
    */
  def kurtosisSample(x: Column): Column = {
    val n = count(x).cast("double")
    val g2 = kurtosis(x)
    when(n >= 4 && stddev_samp(x) > 0,
      ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3)))
  }

  /** Power-sum (raw-moment) forms of std/skew/kurt for SMALL groups of
    * integer-valued data (window mode: ≤ windowSize turns, text lengths):
    * every power sum is an exact integer in double, so the whole formula is
    * the same IEEE op sequence in any engine — bit-identical against an
    * oracle that writes the same expression, immune to the last-ulp
    * rounding ties that the engines' streaming moment aggregates hit
    * (observed: sample skew of an 8-value window landing exactly on a
    * round(x,6) half-way point, rounded oppositely by Spark and DuckDB).
    * NOT for large groups: raw-moment cancellation is catastrophic there —
    * use the streaming forms above.
    *
    * No `pow` (libm, not correctly rounded — may differ across engines):
    * only *, /, sqrt (IEEE correctly rounded).
    */
  def stddevSampPow(x: Column): Column = {
    val n = count(x).cast("double")
    when(n >= 2, sqrt((sum(x * x) - sum(x) * sum(x) / n) / (n - 1)))
  }

  def skewnessSamplePow(x: Column): Column = {
    val n = count(x).cast("double")
    val m = sum(x) / n
    val v = sum(x * x) / n - m * m
    val m3 = sum(x * x * x) / n - lit(3) * m * (sum(x * x) / n) + lit(2) * m * m * m
    when(n >= 3 && v > 0,
      (m3 / (v * sqrt(v))) * sqrt(n * (n - 1)) / (n - 2))
  }

  def kurtosisSamplePow(x: Column): Column = {
    val n = count(x).cast("double")
    val m = sum(x) / n
    val v = sum(x * x) / n - m * m
    val m4 = sum(x * x * x * x) / n - lit(4) * m * (sum(x * x * x) / n) +
      lit(6) * m * m * (sum(x * x) / n) - lit(3) * m * m * m * m
    when(n >= 4 && v > 0,
      ((n + 1) * (m4 / (v * v) - 3) + lit(6)) * (n - 1) / ((n - 2) * (n - 3)))
  }

  /** Exact two-sided trimmed mean (musiF A6, melody/handler.py:172-194):
    * drop floor(p*n) values from each tail of the sorted stream, average
    * the rest. Exact — not `percentile_approx` (allclose-unsafe, SURVEY.md
    * §7.4#4). One extra window pass per key; values stay distributed.
    *
    * @return per-key DataFrame (keyCols..., outCol)
    */
  def trimmedMean(df: DataFrame, valueCol: String, p: Double,
                  outCol: String, keyCols: String*): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(valueCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keys: _*)))
      .withColumn("__k", floor(col("__n") * p))
    ranked
      .filter(col("__rn") > col("__k") && col("__rn") <= col("__n") - col("__k"))
      .groupBy(keys: _*)
      .agg(round(avg(col(valueCol)), 6).as(outCol))
  }
}
