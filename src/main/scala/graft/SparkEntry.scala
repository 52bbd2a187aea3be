package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — one entry per implemented operator (SURVEY.md §2), an
  * equivalent DuckDB oracle SQL for each, and the flagship pipeline.
  *
  * Conventions for oracle parity (the driver hash-compares values):
  *  - every count-like output is LONG/BIGINT in both engines;
  *  - every float output is `round(x, 6)` in both engines;
  *  - every query has a deterministic total ORDER BY on its key columns;
  *  - time deltas are exact integer microseconds (`unix_micros` ↔
  *    `epoch_us`), never float seconds.
  */
object SparkEntry {

  /** Session gap threshold: 24h (fixture gaps median ≈ 8.5h → ~9 sessions
    * per conversation at sf0.01).
    */
  val SessionGapSeconds: Long = 86400L

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_census_role")(spark, "/root/testdata/sf0.001")

  private def turnsOrdered(s: SparkSession, dir: String): DataFrame =
    Ordered.orderedPartitions(Tables.turns(s, dir), "conv_id", "turn_idx")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ——— ingest normalization (S2 analog): per-turn text equality gate ———
    "q_turns_base" -> ((s, dir) =>
      Tables.turns(s, dir)
        .orderBy("conv_id", "turn_idx")),

    // ——— W1/W10 lag/lead turn features ———
    "q_lag_features" -> ((s, dir) =>
      LagLead.turnLagFeatures(turnsOrdered(s, dir))
        .select(col("conv_id"), col("turn_idx"), col("prev_role"), col("next_role"),
          col("delta_ts_us"), col("prev_text_len").cast("long").as("prev_text_len"))
        .orderBy("conv_id", "turn_idx")),

    // ——— W9 ts-gap sessionization ———
    "q_sessionize" -> ((s, dir) =>
      Sessionize.byGap(turnsOrdered(s, dir), SessionGapSeconds)
        .select("conv_id", "turn_idx", "session_id")
        .orderBy("conv_id", "turn_idx")),

    // ——— A19-style per-conversation session stats ———
    "q_session_stats" -> ((s, dir) =>
      Sessionize.byGap(turnsOrdered(s, dir), SessionGapSeconds)
        .groupBy("conv_id", "session_id").agg(count(lit(1)).as("n"))
        .groupBy("conv_id").agg(
          count(lit(1)).as("n_sessions"),
          round(avg(col("n")), 6).as("sess_len_mean"),
          max(col("n")).as("sess_len_max"))
        .orderBy("conv_id")),

    // ——— J1 as-of join, at-or-before semantics ———
    "q_asof_state" -> ((s, dir) =>
      AsOf.join(turnsOrdered(s, dir), Tables.state(s, dir),
          "conv_id", "ts", Seq("state_val"), AsOf.AtOrBefore)
        .select("conv_id", "turn_idx", "state_val")
        .orderBy("conv_id", "turn_idx")),

    // ——— J1 as-of join, strictly-before (zero temporal leakage) ———
    "q_asof_strict" -> ((s, dir) =>
      AsOf.join(turnsOrdered(s, dir), Tables.state(s, dir),
          "conv_id", "ts", Seq("state_val"), AsOf.StrictlyBefore)
        .select("conv_id", "turn_idx", "state_val")
        .orderBy("conv_id", "turn_idx")),

    // ——— W5 forward-fill (backfilled feature column) ———
    "q_backfill_tool" -> ((s, dir) =>
      Backfill.ffill(turnsOrdered(s, dir), "tool", "tool_ff")
        .select("conv_id", "turn_idx", "tool_ff")
        .orderBy("conv_id", "turn_idx")),

    // ——— A1/A25 census: per-conversation×role counts + text-length stats ———
    "q_census_role" -> ((s, dir) =>
      Tables.turns(s, dir)
        .groupBy("conv_id", "role").agg(
          count(lit(1)).as("n_turns"),
          count(col("tool")).as("n_tool_calls"),
          countDistinct(col("tool")).as("n_distinct_tools"),
          min(length(col("text"))).cast("long").as("text_len_min"),
          max(length(col("text"))).cast("long").as("text_len_max"),
          round(avg(length(col("text"))), 6).as("text_len_mean"),
          round(stddev_samp(length(col("text"))), 6).as("text_len_std"))
        .orderBy("conv_id", "role")),
  )

  def oracleSql: Map[String, String] = Map(
    "q_turns_base" -> Oracle.withTurns(
      "SELECT conv_id, turn_idx, role, text, tool, ts FROM turns ORDER BY conv_id, turn_idx"),

    "q_lag_features" -> Oracle.withTurns(
      """SELECT conv_id, turn_idx,
        |  lag(role) OVER w AS prev_role,
        |  lead(role) OVER w AS next_role,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS delta_ts_us,
        |  lag(length(text)) OVER w AS prev_text_len
        |FROM turns
        |WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        |ORDER BY conv_id, turn_idx""".stripMargin),

    "q_sessionize" -> Oracle.withTurns(
      s"""SELECT conv_id, turn_idx,
        |  CAST(sum(CASE WHEN gap_us > ${SessionGapSeconds}000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
        |FROM (SELECT conv_id, turn_idx,
        |        epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)) AS gap_us
        |      FROM turns)
        |ORDER BY conv_id, turn_idx""".stripMargin),

    "q_session_stats" -> (s"WITH ${Oracle.turnsCte},\n" +
      s"""sess AS (
        |  SELECT conv_id, turn_idx,
        |    sum(CASE WHEN gap_us > ${SessionGapSeconds}000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM (SELECT conv_id, turn_idx,
        |          epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)) AS gap_us
        |        FROM turns)
        |), per AS (SELECT conv_id, session_id, count(*) AS n FROM sess GROUP BY 1, 2)
        |SELECT conv_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |       round(avg(n), 6) AS sess_len_mean,
        |       CAST(max(n) AS BIGINT) AS sess_len_max
        |FROM per GROUP BY conv_id ORDER BY conv_id""".stripMargin),

    "q_asof_state" -> Oracle.withTurnsAndState(
      """SELECT t.conv_id, t.turn_idx, s.state_val
        |FROM turns t ASOF LEFT JOIN state s
        |  ON t.conv_id = s.conv_id AND t.ts >= s.ts
        |ORDER BY t.conv_id, t.turn_idx""".stripMargin),

    "q_asof_strict" -> Oracle.withTurnsAndState(
      """SELECT t.conv_id, t.turn_idx, s.state_val
        |FROM turns t ASOF LEFT JOIN state s
        |  ON t.conv_id = s.conv_id AND t.ts > s.ts
        |ORDER BY t.conv_id, t.turn_idx""".stripMargin),

    "q_backfill_tool" -> Oracle.withTurns(
      """SELECT conv_id, turn_idx,
        |  last_value(tool IGNORE NULLS)
        |    OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) AS tool_ff
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin),

    "q_census_role" -> Oracle.withTurns(
      """SELECT conv_id, role,
        |  CAST(count(*) AS BIGINT) AS n_turns,
        |  CAST(count(tool) AS BIGINT) AS n_tool_calls,
        |  CAST(count(DISTINCT tool) AS BIGINT) AS n_distinct_tools,
        |  CAST(min(length(text)) AS BIGINT) AS text_len_min,
        |  CAST(max(length(text)) AS BIGINT) AS text_len_max,
        |  round(avg(length(text)), 6) AS text_len_mean,
        |  round(stddev_samp(length(text)), 6) AS text_len_std
        |FROM turns GROUP BY conv_id, role ORDER BY conv_id, role""".stripMargin),
  )
}
