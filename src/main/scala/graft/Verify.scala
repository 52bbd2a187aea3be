package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // builder-side iteration aid: SPARK_GRAFT_ONLY=<regex> restricts the
    // dump to matching query names (driver never sets it → full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // Spark-side wall time per query: min of 2 full executions through the
    // `noop` sink (whole plan runs, nothing is serialized to disk), measured
    // BEFORE the parquet dump so coalesce(1) single-writer cost never leaks
    // into the number. This is the engine half of the engine-to-engine
    // comparison (oracle half: tools/check.py's DuckDB timings); same
    // min-of-N stance — ambient noise only ever adds time.
    val sparkTimes = scala.collection.mutable.TreeMap.empty[String, Double]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
      try {
        val reps = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        sparkTimes(name) = math.round(reps.min * 1000) / 1000.0
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val times = sparkTimes
      .map { case (k, v) => s"${q(k)}: $v" }.mkString(",\n ")
    Files.writeString(Paths.get(s"$outDir/spark_times.json"),
      s"""{"sf_dir": ${q(sfDir)}, "cpus": $cpus, "unit": "sec", "runs": 2, "pick": "min", "queries": {
 $times
}}""")
    spark.stop()
  }
}
