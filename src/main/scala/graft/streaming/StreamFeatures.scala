package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the engine's windowed operators
  * (SURVEY.md §2.10). The reference is pure batch; these are the streaming
  * ports the batch operators were designed to share Column logic with:
  * the same gap-sessionization semantics as [[graft.ops.Sessionize]] but
  * via `session_window` + watermark, and sliding-window aggregates via
  * `window()`.
  *
  * Inputs are streaming DataFrames (`readStream`/MemoryStream) with the
  * canonical turns schema.
  */
object StreamFeatures {

  /** Per-(conv, session) aggregate stream: session windows close `gap`
    * after the last event under a `watermark` lateness bound.
    */
  def sessionStats(turns: DataFrame, gap: String = "24 hours",
                   watermark: String = "1 hour"): DataFrame =
    turns
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(col("conv_id"), session_window(col("ts"), gap).as("session"))
      .agg(
        count(lit(1)).as("n_turns"),
        count(col("tool")).as("n_tool_calls"),
        avg(length(col("text"))).as("len_mean"))
      .select(col("conv_id"), col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_turns"), col("n_tool_calls"), col("len_mean"))

  /** Sliding event-time windows (the streaming form of W8): turn counts per
    * role per 1h window sliding 15min.
    */
  def slidingRoleCounts(turns: DataFrame, size: String = "1 hour",
                        slide: String = "15 minutes",
                        watermark: String = "1 hour"): DataFrame =
    turns
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("conv_id"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("window.start").as("w_start"), col("conv_id"), col("role"), col("n_turns"))
}
