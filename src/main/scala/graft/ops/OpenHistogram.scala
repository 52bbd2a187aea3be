package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Open-set histograms as MapType (SURVEY.md G1/A3 full parity).
  *
  * musiF emits DATA-DEPENDENT column families — one scalar column per
  * observed interval/chord/numeral (`melody/handler.py:315-326`,
  * `harmony/utils.py:473-485`, names assembled by `prefix.py:64-126`).
  * Wide data-dependent columns are hostile to a columnar engine (schema
  * explosion, nulls everywhere), so the engine's native form is ONE
  * `map<key, count>` column per histogram family:
  *
  *   groupBy(keys, val).count → groupBy(keys).map_from_entries(...)
  *
  * — two partial-aggregable passes that extend the entity partitioning
  * (second groupBy is a prefix of the first's key: no extra exchange).
  * The reference's wide scalar layout is reproduced only AT EXPORT by
  * [[graft.process.PostProcess.explodeMapToColumns]], the analog of
  * prefix.py's name rendering.
  */
object OpenHistogram {

  /** One row per `keys`; `out` = sorted map of value → count. Entries are
    * sorted by key (array_sort on the struct's first field) so the map's
    * binary layout is deterministic at any parallelism.
    */
  def histMap(df: DataFrame, keys: Seq[String], valCol: String,
              out: String = "hist"): DataFrame =
    df.groupBy((keys :+ valCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(
        array_sort(collect_list(struct(col(valCol), col("__n"))))).as(out))

  /** Normalized variant: map of value → share of the key's total. */
  def histMapShare(df: DataFrame, keys: Seq[String], valCol: String,
                   out: String = "hist_share", dp: Int = 6): DataFrame =
    df.groupBy((keys :+ valCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(map_from_entries(array_sort(collect_list(
        struct(col(valCol), col("__n"))))).as("__m"))
      .withColumn(out,
        transform_values(col("__m"),
          (_, v) => round(v.cast("double") / aggregate(map_values(col("__m")),
            lit(0L), (acc, x) => acc + x).cast("double"), dp)))
      .drop("__m")
}
