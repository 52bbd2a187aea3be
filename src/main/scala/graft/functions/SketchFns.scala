package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch — the mergeable
  * cardinality summary for the incremental feature store.
  *
  * Why KMV and not HLL here: Spark's `hll_sketch_agg` uses the
  * DataSketches HIP estimator, whose estimate depends on the ORDER items
  * were absorbed — a direct sketch and a union of slice sketches give
  * different numbers, which breaks the store's merge-equals-direct
  * correctness statement, and no oracle can reproduce it. A KMV sketch is
  * a pure SET function: keep the k smallest distinct 60-bit hashes; the k
  * smallest of a union are always contained in the union of each side's k
  * smallest, so slice-wise sketches merge to EXACTLY the direct sketch
  * (array equality, not estimate-tolerance), any engine with the same
  * hash reproduces it bit-for-bit, and the estimator
  * (k-1) / normalized_kth_min is a deterministic arithmetic expression
  * both engines evaluate identically. Trade-off vs HLL: k longs instead
  * of registers (larger), and ~1/sqrt(k-2) relative error — the right
  * trade when verifiability and mergeability are the point.
  *
  * Scale shape: building a sketch is distinct + rank-k per key — one
  * exchange on (key, hash) for the distinct, a sort-based window filter
  * (spillable, no per-group memory), then a k-bounded collect per key.
  * Merging is pure Column algebra over two k-length arrays.
  */
object Kmv {

  /** 2^60 as an exact double — hashes are 60-bit ([[TextFns.md5Long]]),
    * so h / 2^60 normalizes to [0, 1). The DuckDB twin spells the same
    * literal: 1152921504606846976.0.
    */
  val TwoPow60: Double = 1152921504606846976.0

  /** Per-key KMV sketch over the whitespace tokens of `textCol`: the
    * sorted array of the k smallest distinct md5Long token hashes.
    * Keys whose rows have only null text produce no output row.
    */
  def tokenSketch(df: DataFrame, keyCol: String, textCol: String, k: Int): DataFrame = {
    val h = df
      .select(col(keyCol), explode(split(col(textCol), " ")).as("__tok"))
      .select(col(keyCol), TextFns.md5Long(col("__tok")).as("__h"))
      .distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__h"))
    h.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("__h"))).as("tok_kmv"))
  }

  /** Merge two sketches (either may be null — a key absent from one
    * slice): k smallest of the distinct union. Exactly equals the sketch
    * built directly over both slices' tokens.
    */
  def mergeSketches(a: Column, b: Column, k: Int): Column =
    when(a.isNull && b.isNull, lit(null))
      .when(a.isNull, b)
      .when(b.isNull, a)
      .otherwise(slice(array_sort(array_distinct(concat(a, b))), 1, k))

  /** Distinct-count estimate from a sketch: exact size when the sketch is
    * not full (every distinct hash is present), else the classic KMV
    * estimator (k-1) / (kth_min / 2^60), written as
    * (k-1) * 2^60 / kth_min — (k-1)·2^60 is exactly representable and the
    * whole expression is one multiply + one divide in the same order in
    * both engines, so the rounded value hash-matches the oracle.
    */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) /
        element_at(sketch, k).cast("double"))
}
