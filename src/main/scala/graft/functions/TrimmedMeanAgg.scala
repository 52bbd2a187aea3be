package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass exact trimmed mean as a custom typed aggregate (SURVEY.md A6 /
  * §7.3 "custom Catalyst (deferred, optional)"): musiF's scipy
  * trimmed_mean(limits=(p,p)) (melody/handler.py:172-194) drops ⌊p·n⌋
  * values from each sorted tail.
  *
  * The window-rank formulation (Stats.trimmedMean) costs an extra sort of
  * the fact table per key ordering; this Aggregator instead buffers the
  * group's values (bounded by conversation length) and sorts per group at
  * finish — one aggregation pass, no global sort. Spark's built-in
  * `percentile` machinery (TypedImperativeAggregate) uses the same
  * buffer-then-finish shape.
  *
  * Buffers merge associatively (concatenation) so partial aggregation and
  * AQE-combined partials stay correct at any parallelism.
  */
class TrimmedMeanAgg(p: Double) extends Aggregator[java.lang.Double, Array[Double], java.lang.Double] {
  require(p >= 0 && p < 0.5, s"trim fraction $p must be in [0, 0.5)")

  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: java.lang.Double): Array[Double] =
    if (v == null) buf else buf :+ v.doubleValue()

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = a ++ b

  override def finish(buf: Array[Double]): java.lang.Double = {
    if (buf.isEmpty) return null
    val sorted = buf.sorted
    val k = math.floor(sorted.length * p).toInt
    val kept = sorted.slice(k, sorted.length - k)
    if (kept.isEmpty) null else kept.sum / kept.length
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object TrimmedMeanAgg {
  /** Column form: `trimmedMean(0.1)(col)`; also registrable for SQL via
    * `spark.udf.register("trimmed_mean_10", udaf(new TrimmedMeanAgg(0.1)))`.
    */
  def apply(p: Double)(c: Column): Column = udaf(new TrimmedMeanAgg(p)).apply(c)
}
