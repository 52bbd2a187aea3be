package graft

import graft.features._
import org.apache.spark.sql.functions._

class FeatureMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("toposort honors deps and rejects cycles") {
    val order = FeatureRegistry.toposort(FeatureRegistry.all).map(_.name)
    assert(order.indexOf("asofstate") < order.indexOf("lag"))
    assert(order.indexOf("lag") < order.indexOf("sessions"))
    object A extends FeatureModule { val name = "a"; override val deps = Seq("b") }
    object B extends FeatureModule { val name = "b"; override val deps = Seq("a") }
    intercept[IllegalArgumentException](FeatureRegistry.toposort(Seq(A, B)))
    intercept[IllegalArgumentException](FeatureRegistry.toposort(Seq(A)))
  }

  test("feature matrix: one row per conversation, sane values") {
    val turns = Seq(
      ("a", 0, "user", "hi", null.asInstanceOf[String], ts("2024-01-01 00:00:00")),
      ("a", 1, "assistant", "hello there", null.asInstanceOf[String], ts("2024-01-01 00:00:10")),
      ("a", 2, "assistant", "x", "search", ts("2024-01-01 00:00:20")),
      ("a", 3, "user", "ok then", null.asInstanceOf[String], ts("2024-01-03 00:00:20")), // new session
      ("b", 0, "user", "solo", null.asInstanceOf[String], ts("2024-01-01 00:00:00"))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val state = Seq(("a", ts("2024-01-01 00:00:05"), "s1")).toDF("conv_id", "ts", "state_val")

    val m = FeatureRegistry.featureMatrix(turns, Some(state)).collect()
      .map(r => r.getAs[String]("conv_id") -> r).toMap
    assert(m.size == 2)
    val a = m("a")
    assert(a.getAs[Long]("n_turns") == 4)
    assert(a.getAs[Long]("role_user_n_turns") == 2)
    assert(a.getAs[Long]("role_assistant_n_turns") == 2)
    assert(a.getAs[Long]("n_tool_calls") == 1)
    assert(a.getAs[Long]("n_sessions") == 2)
    assert(a.getAs[Long]("n_runs") == 3)       // user | assistant,assistant | user
    assert(a.getAs[Long]("run_len_max") == 2)
    assert(a.getAs[Long]("n_turns_with_state") == 3) // turns 1,2,3 after state s1
    assert(a.getAs[String]("first_role") == "user")
    assert(a.getAs[String]("last_role") == "user")
    val b = m("b")
    assert(b.getAs[Long]("n_turns") == 1)
    assert(b.getAs[Long]("n_sessions") == 1)
    assert(b.isNullAt(b.fieldIndex("len_std"))) // single value → null std
  }

  test("feature matrix without state table (missing-annotation path)") {
    val turns = Seq(("a", 0, "user", "hi", null.asInstanceOf[String], ts("2024-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val r = FeatureRegistry.featureMatrix(turns, None).collect().head
    assert(r.getAs[Long]("n_turns_with_state") == 0)
    assert(r.getAs[Long]("n_distinct_states") == 0)
  }

  test("matrix invariant under input partitioning (scaling determinism)") {
    val turns = Tables.turns(spark, "/root/testdata/sf0.001")
    val state = Tables.state(spark, "/root/testdata/sf0.001")
    val m1 = FeatureRegistry.featureMatrix(turns.repartition(1), Some(state))
      .orderBy("conv_id").collect().toSeq
    val m2 = FeatureRegistry.featureMatrix(turns.repartition(13), Some(state.repartition(5)))
      .orderBy("conv_id").collect().toSeq
    assert(m1 == m2)
  }
}
