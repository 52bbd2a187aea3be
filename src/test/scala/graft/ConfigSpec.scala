package graft

import graft.config.{GraftConfig, MiniYaml}
import graft.features.FeatureRegistry

/** Config layer: YAML subset, musiF merge semantics (defaults ← file ←
  * overrides, config.py:96-158), module selection with dep closure, and
  * the config-driven Main end-to-end.
  */
class ConfigSpec extends SparkSpec {

  test("yaml subset: nesting, inline + block lists, comments, scalars") {
    val m = MiniYaml.parse(
      """# header comment
        |input: /data/in
        |mode: windowed   # trailing comment
        |window:
        |  size: 12
        |  overlap: 4
        |modules: [census, lag]
        |post:
        |  drop_prefixes:
        |    - role_tool
        |    - "role_system"
        |  reference_names: true
        |ratio: 0.25
        |""".stripMargin)
    assert(m("input") == "/data/in")
    assert(m("mode") == "windowed")
    assert(m("window").asInstanceOf[Map[String, Any]]("size") == 12L)
    assert(m("modules") == Seq("census", "lag"))
    val post = m("post").asInstanceOf[Map[String, Any]]
    assert(post("drop_prefixes") == Seq("role_tool", "role_system"))
    assert(post("reference_names") == true)
    assert(m("ratio") == 0.25)
  }

  test("bare `key:` with no children parses as null, not an empty map") {
    val cfg = GraftConfig.fromLayers(MiniYaml.parse(
      """input:
        |mode: windowed
        |""".stripMargin))
    assert(cfg.str("input").isEmpty) // was Some("Map()") — ADVICE r2
    assert(cfg.str("mode").contains("windowed"))
    // a key WITH children still nests
    val nested = GraftConfig.fromLayers(MiniYaml.parse("window:\n  size: 9\n"))
    assert(nested.int("window.size", -1) == 9)
  }

  test("sharded path fails fast on csv format and per-shard col_null_max") {
    def cfg(extra: String) = GraftConfig.fromLayers(MiniYaml.parse(
      s"""input: /root/testdata/sf0.001
         |output: /tmp/graft_failfast
         |shards: 2
         |$extra
         |""".stripMargin))
    val e1 = intercept[IllegalArgumentException] { Main.run(spark, cfg("format: csv")) }
    assert(e1.getMessage.contains("format=csv"))
    val e2 = intercept[IllegalArgumentException] {
      Main.run(spark, cfg("post:\n  col_null_max: 0.5"))
    }
    assert(e2.getMessage.contains("col_null_max"))
  }

  test("merge order: defaults <- file <- overrides, deep per-field") {
    val file = MiniYaml.parse(
      """mode: windowed
        |window:
        |  size: 16
        |""".stripMargin)
    val over = GraftConfig.overridesFromArgs(Seq("window.overlap=6", "format=csv"))
    val cfg = GraftConfig.fromLayers(file, over)
    assert(cfg.str("mode").contains("windowed"))   // file beats default
    assert(cfg.int("window.size", -1) == 16)       // file beats default
    assert(cfg.int("window.overlap", -1) == 6)     // override beats default
    assert(cfg.str("format").contains("csv"))      // override beats default
    assert(cfg.long("session_gap_seconds", -1) == 86400L) // default survives
    // override beats file:
    val cfg2 = GraftConfig.fromLayers(file, GraftConfig.overridesFromArgs(Seq("mode=conversation")))
    assert(cfg2.str("mode").contains("conversation"))
  }

  test("module selection resolves transitive deps") {
    // sessions depends on lag depends on asofstate
    val mods = FeatureRegistry.modulesFor(Seq("sessions")).map(_.name).toSet
    assert(mods == Set("sessions", "lag", "asofstate"))
    val err = intercept[IllegalArgumentException] {
      FeatureRegistry.modulesFor(Seq("nope"))
    }
    assert(err.getMessage.contains("unknown modules"))
  }

  test("Main end-to-end: config-selected modules, windowed mode, csv sink") {
    val out = java.nio.file.Files.createTempDirectory("graft_main").toString + "/mx"
    val cfg = GraftConfig.fromLayers(
      MiniYaml.parse(
        s"""input: /root/testdata/sf0.001
           |output: $out
           |mode: windowed
           |format: csv
           |modules: [census]
           |window:
           |  size: 10
           |  overlap: 5
           |""".stripMargin))
    Main.run(spark, cfg)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() > 0)
    assert(back.columns.contains("n_turns"))
    assert(back.columns.contains("window_id"))
    assert(!back.columns.contains("len_mean")) // textstats not selected
  }

  test("Main incremental mode: two slice upserts equal the single-pass features") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val t = Tables.turns(spark, "/root/testdata/sf0.001")
    t.filter(col("turn_idx") < 10).write.parquet(s"$base/slice1/turns")
    t.filter(col("turn_idx") >= 10).write.parquet(s"$base/slice2/turns")
    def cycle(slice: String, out: String): Unit = Main.run(spark, GraftConfig.fromLayers(
      MiniYaml.parse(
        s"""input: $base/$slice
           |output: $base/$out
           |mode: incremental
           |state_dir: $base/state
           |""".stripMargin)))
    cycle("slice1", "out1")
    cycle("slice2", "out2")
    val got = spark.read.parquet(s"$base/out2")
      .orderBy("conv_id").collect().map(_.toString).toSeq
    val direct = graft.process.PostProcess.orderColumns(
        graft.features.Incremental.finalize(graft.features.Incremental.partials(t)))
      .orderBy("conv_id").collect().map(_.toString).toSeq
    assert(got == direct)
  }

  test("Main resumable shards: config shards>1 writes manifest lineage") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString + "/mx"
    val cfg = GraftConfig.fromLayers(MiniYaml.parse(
      s"""input: /root/testdata/sf0.001
         |output: $out
         |modules: [census]
         |shards: 3
         |""".stripMargin))
    Main.run(spark, cfg)
    assert(graft.checkpoint.Snapshot.completedShards(out) == Set(0, 1, 2))
    val m = graft.checkpoint.Snapshot.read(spark, out)
    assert(m.select("conv_id").distinct().count() == 15) // sf0.001 conv count
  }
}
