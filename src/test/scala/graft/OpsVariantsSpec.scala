package graft

import graft.ops._
import org.apache.spark.sql.functions._

class OpsVariantsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join with tolerance: stale state yields null") {
    val turns = Seq(
      ("a", 0, ts("2024-01-01 00:00:10")),
      ("a", 1, ts("2024-01-01 02:00:00"))  // state 2h old > 1h tolerance
    ).toDF("conv_id", "turn_idx", "ts")
    val state = Seq(("a", ts("2024-01-01 00:00:00"), "s0")).toDF("conv_id", "ts", "state_val")
    val m = AsOf.join(turns, state, "conv_id", "ts", Seq("state_val"),
        AsOf.AtOrBefore, toleranceUs = Some(3600L * 1000000))
      .collect().map(r => r.getInt(1) -> Option(r.getAs[String]("state_val"))).toMap
    assert(m(0).contains("s0"))
    assert(m(1).isEmpty)
  }

  test("bfill picks first non-null at-or-after") {
    val t = Seq(("a", 0, null.asInstanceOf[String]), ("a", 1, "x"),
      ("a", 2, null.asInstanceOf[String]))
      .toDF("conv_id", "turn_idx", "tool")
    val got = Backfill.bfill(t, "tool", "bf").select("turn_idx", "bf")
      .as[(Int, Option[String])].collect().toMap
    assert(got(0).contains("x"))
    assert(got(1).contains("x"))
    assert(got(2).isEmpty)
  }

  test("salted aggregation equals direct groupBy on skewed data") {
    val turns = graft.datagen.TranscriptGen.turns(spark, 30, skewEvery = 29)
      .withColumn("text_len", length(col("text")).cast("long"))
    val salted = Salted.countsAndSums(turns, "conv_id", "turn_idx", 16,
      "n_turns", Map("sum_text_len" -> "text_len"))
      .orderBy("conv_id").collect().toSeq
    val direct = turns.groupBy("conv_id").agg(
      count(lit(1)).as("n_turns"), sum(col("text_len")).as("sum_text_len"))
      .orderBy("conv_id").collect().toSeq
    assert(salted == direct)
  }
}
