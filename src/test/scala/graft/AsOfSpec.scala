package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics, incl. the zero-leakage tie rule (SURVEY.md §4.3,
  * FIXTURES.md §4: tie_ts / no_state cases).
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def turns = Seq(
    ("a", 0, ts("2024-01-01 00:00:10")),
    ("a", 1, ts("2024-01-01 00:00:20")), // exactly at state change
    ("a", 2, ts("2024-01-01 00:00:30")),
    ("b", 0, ts("2024-01-01 00:00:05")), // before any state
    ("c", 0, ts("2024-01-01 00:00:10"))  // conversation with no state at all
  ).toDF("conv_id", "turn_idx", "ts")

  private def state = Seq(
    ("a", ts("2024-01-01 00:00:00"), "s0"),
    ("a", ts("2024-01-01 00:00:20"), "s1"),
    ("b", ts("2024-01-01 00:00:07"), "s2")
  ).toDF("conv_id", "ts", "state_val")

  private def vals(sem: AsOf.Semantics): Map[(String, Int), String] =
    AsOf.join(turns, state, "conv_id", "ts", Seq("state_val"), sem)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> Option(r.getAs[String]("state_val")).orNull)
      .toMap

  test("at-or-before picks state at equal ts") {
    val m = vals(AsOf.AtOrBefore)
    assert(m(("a", 0)) == "s0")
    assert(m(("a", 1)) == "s1") // tie: sees same-instant state
    assert(m(("a", 2)) == "s1")
    assert(m(("b", 0)) == null) // no state yet
    assert(m(("c", 0)) == null) // no state ever
  }

  test("strictly-before never leaks same-instant state") {
    val m = vals(AsOf.StrictlyBefore)
    assert(m(("a", 1)) == "s0") // tie excluded → previous state
    assert(m(("a", 2)) == "s1")
  }

  test("left row count preserved and no future state ever selected (property)") {
    val joined = AsOf.join(turns, state, "conv_id", "ts", Seq("state_val"))
    assert(joined.count() == turns.count())
    // re-derive the chosen state ts by joining back; assert <= turn ts
    val chosen = joined.join(
        state.withColumnRenamed("ts", "state_ts"), Seq("conv_id", "state_val"), "inner")
    assert(chosen.filter(col("state_ts") > col("ts")).count() == 0)
  }

  test("invariant under repartitioning (determinism across parallelism)") {
    val a = AsOf.join(turns.repartition(1), state, "conv_id", "ts", Seq("state_val"))
    val b = AsOf.join(turns.repartition(7), state.repartition(3), "conv_id", "ts", Seq("state_val"))
    assert(a.orderBy("conv_id", "turn_idx").collect().toSeq ==
           b.orderBy("conv_id", "turn_idx").collect().toSeq)
  }
}
