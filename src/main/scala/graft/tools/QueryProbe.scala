// Scratch per-stage timing probe for the optimization round:
//   sbt "runMain graft.tools.QueryProbe <q1,q2,...> [sfDir] [reps]"
// runs each registry query with the noop sink under the bench session
// shape and prints per-stage wall times from a stage listener, so hot
// stages can be attributed to plan operators without the (disabled) UI.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = (if (args.nonEmpty) args(0) else "q_containment")
      .split(",").toSeq.filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
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
        if (ms.getOrElse(0L) >= 100L)
          System.err.println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"wall=${ms.getOrElse(-1L)}ms ${si.name.take(60)} " +
            f"rdds=${si.rddInfos.map(_.name).mkString("|").take(160)}")
      }
    })

    def time(label: String)(f: => DataFrame): Unit = {
      for (i <- 1 to reps) {
        spark.sparkContext.setJobDescription(s"$label run$i")
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        val rt = Runtime.getRuntime
        System.err.println(f"[probe] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
          f"heapMB=${(rt.totalMemory - rt.freeMemory) / 1048576} " +
          f"rdds=${spark.sparkContext.getPersistentRDDs.size}")
      }
      spark.sparkContext.setJobDescription(null)
    }

    time("warmup census") { graft.SparkEntry.queries("q_census_role")(spark, dir) }
    val all = if (names == Seq("all"))
      graft.SparkEntry.queries.keys.toSeq.sorted else names
    for (n <- all) time(n) { graft.SparkEntry.queries(n)(spark, dir) }
    spark.stop()
  }
}
