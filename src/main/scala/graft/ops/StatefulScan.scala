package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** W6 escape hatch — the stateful ordered scan that Column algebra can't
  * express (SURVEY.md §2.5 W6): musiF's dynamics machine walks a score in
  * order, assembling multi-element dynamic names and resetting on silence
  * (musif/extract/features/dynamics/handler.py:18-151). The transcript
  * analog here assembles TOOL-CALL EPISODES: consecutive tool calls within
  * a reset window fuse into one episode whose name is the ordered tool
  * chain; a long tool silence closes the episode.
  *
  * Implementation: `groupByKey(conv_id).flatMapSortedGroups(turn_idx)` —
  * one hash exchange on the entity key, an in-partition sort, then a plain
  * imperative scan per group. This is the documented LAST-resort tier
  * ((d) in the custom-operator preference order): the scan leaves
  * whole-stage codegen, but state is arbitrary Scala, the shuffle shape is
  * identical to a window function's, and per-group memory is O(1) —
  * nothing is buffered but the open episode. Output is invariant under
  * input repartitioning (the sorted-groups contract), property-tested.
  */
object StatefulScan {

  case class TurnCall(conv_id: String, turn_idx: Int, tool: Option[String], ts_us: Long)
  case class Episode(conv_id: String, episode_id: Int, name: String,
                     n_calls: Long, start_idx: Int, end_idx: Int)

  /** Episodes of consecutive tool calls separated by ≤ `resetSeconds` of
    * tool silence. Turns without a tool call advance time but carry no
    * state (the "silence" the reset measures).
    */
  def toolEpisodes(turns: DataFrame, resetSeconds: Long): Dataset[Episode] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val resetUs = resetSeconds * 1000000L
    // non-call turns carry no state and can't move lastCallUs — filter
    // BEFORE the exchange so only call rows shuffle (predicate pushdown
    // reaches the scan)
    val ds = turns.filter(col("tool").isNotNull)
      .select(
        col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("tool"), LagLead.micros(col("ts")).as("ts_us"))
      .as[TurnCall]
    ds.groupByKey(_.conv_id)
      .flatMapSortedGroups(col("turn_idx")) { (conv: String, it: Iterator[TurnCall]) =>
        val out = scala.collection.mutable.ArrayBuffer[Episode]()
        var epId = -1
        var names = List.empty[String] // reverse order
        var nCalls = 0L
        var startIdx = 0
        var endIdx = 0
        var lastCallUs = Long.MinValue
        def flush(): Unit = if (nCalls > 0)
          out += Episode(conv, epId, names.reverse.mkString("+"), nCalls, startIdx, endIdx)
        it.foreach { t =>
          t.tool.foreach { tool =>
            if (lastCallUs == Long.MinValue || t.ts_us - lastCallUs > resetUs) {
              flush()
              epId += 1; names = Nil; nCalls = 0; startIdx = t.turn_idx
            }
            names ::= tool
            nCalls += 1
            endIdx = t.turn_idx
            lastCallUs = t.ts_us
          }
        }
        flush()
        out
      }
  }
}
