package graft

import graft.datagen.TranscriptGen
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Storage-layout mechanics for the 100-TB path: bucketed tables make the
  * big fact⋈fact join shuffle-free (both sides pre-hashed on disk — the
  * layout a nightly feature job would maintain so every downstream join
  * and as-of reuses it), and a partitioned sink lets the scan prune whole
  * directories on the partition predicate. Neither is expressible as an
  * oracle query (they assert PLANS, not rows), so they live here.
  */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed tables: equi-join on the bucket key plans zero shuffles") {
    val wh = Files.createTempDirectory("bucketed").toString
    val turns = TranscriptGen.turns(spark, 60)
    val sums = turns.groupBy("conv_id").agg(count(lit(1)).as("n_turns"))
    turns.write.bucketBy(8, "conv_id").sortBy("conv_id", "turn_idx")
      .option("path", s"$wh/turns_b").mode("overwrite").saveAsTable("turns_b")
    sums.write.bucketBy(8, "conv_id").sortBy("conv_id")
      .option("path", s"$wh/sums_b").mode("overwrite").saveAsTable("sums_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("turns_b")
        .join(spark.table("sums_b"), Seq("conv_id"))
        .groupBy("conv_id", "n_turns").agg(max(col("turn_idx")).as("last_idx"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      // the aggregate also rides the bucket layout: one partial+final pair,
      // still no exchange between them
      val n = joined.count()
      assert(n == turns.select("conv_id").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS turns_b")
      spark.sql("DROP TABLE IF EXISTS sums_b")
    }
  }

  test("partitioned sink: a partition predicate prunes directories at plan time") {
    val out = Files.createTempDirectory("partsink").toString + "/docs"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    // pruning is real: the executed scan's numFiles metric counts files
    // actually read (inputFiles on the Dataset lists the whole relation
    // unpruned, so it can't witness this)
    val rows = en.collect()
    val scan = en.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val read = scan.metrics("numFiles").value
    assert(read < back.inputFiles.length,
      s"scan read $read/${back.inputFiles.length} files — no pruning")
    // and the data round-trips (partition column moved to directory keys)
    assert(rows.length == docs.filter(col("lang") === "en").count())
  }
}
