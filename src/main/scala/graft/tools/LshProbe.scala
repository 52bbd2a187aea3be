// Scratch stage-level timing for the LSH pair pipeline (r7 optimization
// round): times each pipeline stage in isolation with the noop sink,
// twice (cold/warm), under the bench session shape.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        System.err.println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"wall=${ms.getOrElse(-1L)}ms ${si.name.take(60)} " +
          f"rdds=${si.rddInfos.map(_.name).mkString("|").take(200)}")
      }
    })

    def time(label: String)(f: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        System.err.println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    val docs = graft.Tables.documents(spark, dir)
    time("warmup census") {
      graft.SparkEntry.queries("q_census_role")(spark, dir)
    }
    time("bandsigs") { graft.SparkEntry.lshBandSigs(docs) }
    time("bandsigs spread32") {
      graft.SparkEntry.lshBandSigs(docs.repartition(32))
    }
    time("pairs spread32") {
      graft.SparkEntry.lshVerify(docs,
        graft.SparkEntry.lshBandSigs(docs.repartition(32))
          .groupBy("source", "band", "bkey")
          .agg(collect_list(col("doc_id")).as("ds"))
          .filter(size(col("ds")) > 1)
          .select(explode(col("ds")).as("da"), col("ds"))
          .select(col("da"), explode(filter(col("ds"), d => d > col("da"))).as("db"))
          .distinct())
    }
    time("cand") {
      graft.SparkEntry.lshBandSigs(docs).groupBy("source", "band", "bkey")
        .agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(col("ds")).as("da"), col("ds"))
        .select(col("da"), explode(filter(col("ds"), d => d > col("da"))).as("db"))
        .distinct()
    }
    def candDf = graft.SparkEntry.lshBandSigs(docs).groupBy("source", "band", "bkey")
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(col("ds")).as("da"), col("ds"))
      .select(col("da"), explode(filter(col("ds"), d => d > col("da"))).as("db"))
      .distinct()
    val candCk = candDf.localCheckpoint()
    time("sets only") {
      docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("s"))
    }
    time("verify w/ checkpointed cand") {
      graft.SparkEntry.lshVerify(docs, candCk)
    }
    time("verify live cand") { graft.SparkEntry.lshVerify(docs, candDf) }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("verify ck-cand NO-broadcast") { graft.SparkEntry.lshVerify(docs, candCk) }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("verify ck-cand NO-AQE") { graft.SparkEntry.lshVerify(docs, candCk) }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val sets0 = docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("s"))
    val wanted0 = candCk.select(explode(array(col("da"), col("db"))).as("doc_id"),
      col("da"), col("db"))
    time("join bc(WANTED) explicit") {
      sets0.join(broadcast(wanted0), Seq("doc_id"))
        .groupBy("da", "db").agg(count(lit(1)).as("n"))
    }
    time("join bc(SETS) explicit") {
      broadcast(sets0).join(wanted0, Seq("doc_id"))
        .groupBy("da", "db").agg(count(lit(1)).as("n"))
    }
    time("bc(SETS) no arrays") {
      broadcast(docs.select(col("doc_id"), col("text")))
        .join(wanted0, Seq("doc_id"))
        .groupBy("da", "db").agg(count(lit(1)).as("n"))
    }
    def verifyAgg(joined: DataFrame): DataFrame =
      joined.groupBy("da", "db")
        .agg(
          first(when(col("doc_id") === col("da"), col("s")), ignoreNulls = true).as("sa"),
          first(when(col("doc_id") === col("db"), col("s")), ignoreNulls = true).as("sb"))
        .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("i").cast("double") / (size(col("sa")) + size(col("sb")) - col("i")))
        .filter(col("jaccard") >= 0.9)
        .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
    time("verifyAgg bc(WANTED)") {
      verifyAgg(sets0.join(broadcast(wanted0), Seq("doc_id")))
    }
    time("verifyAgg bc(SETS)") {
      verifyAgg(broadcast(sets0).join(wanted0, Seq("doc_id")))
    }
    time("verifyAgg shuffle") {
      verifyAgg(sets0.join(wanted0.hint("shuffle_hash"), Seq("doc_id")))
    }
    time("pairs (full)") { graft.SparkEntry.neardupLshPairs(spark, dir) }
    time("pairs+orderBy = q_neardup_lsh") {
      graft.SparkEntry.queries("q_neardup_lsh")(spark, dir)
    }
    time("q_containment") { graft.SparkEntry.queries("q_containment")(spark, dir) }
    spark.stop()
  }
}
