package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Snapshot checkpointing with per-shard lineage — the batch analog of
  * musiF's parse-avoidance pickle cache + `exclude_files` resume
  * (musif/extract/extract.py:552-631, 186-189; SURVEY.md S4/J5/S7, §7.6).
  *
  * Honest sandbox implementation: Parquet shard directories plus a JSON
  * manifest (one file per completed shard — commit unit = shard). No
  * Iceberg jars exist in this environment; the layout mirrors an Iceberg
  * snapshot (data files + manifest listing row counts and timings) and the
  * write path is format-agnostic so a real `format("iceberg")` binding is
  * a one-line swap.
  *
  * Resume = anti-join of the shard work-list against the manifest: a rerun
  * recomputes only missing shards. Shards are `pmod(xxhash64(conv_id), n)`
  * so assignment is deterministic across parallelism levels.
  */
object Snapshot {

  case class ShardRecord(shard: Int, rows: Long, wallMs: Long, epochMs: Long,
                         error: Option[String] = None)

  private def manifestDir(out: String): Path = Paths.get(out, "_manifest")

  def completedShards(out: String): Set[Int] = {
    val dir = manifestDir(out)
    if (!Files.exists(dir)) Set.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("shard-") && s.endsWith(".json") =>
          s.stripPrefix("shard-").stripSuffix(".json").toInt }
        .toSet
      finally stream.close() // Files.list holds an fd until closed
    }
  }

  private def writeManifest(out: String, rec: ShardRecord): Unit = {
    Files.createDirectories(manifestDir(out))
    val err = rec.error.map(e => s""","error":"${e.replaceAll("[\"\\\n\r]", " ")}"""").getOrElse("")
    val json =
      s"""{"shard":${rec.shard},"rows":${rec.rows},"wall_ms":${rec.wallMs},"epoch_ms":${rec.epochMs}$err}"""
    Files.write(manifestDir(out).resolve(s"shard-${rec.shard}.json"),
      json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Run `job` over each shard of `input` not yet in the manifest; write
    * each result to `out/shard=K/` and record lineage. Returns the records
    * written this run.
    * @param ignoreErrors S7 error-isolation semantics (musiF
    *   `ignore_errors`, extract.py:348-354): a failing shard is recorded in
    *   the manifest error sink and skipped (it stays incomplete and will be
    *   retried on the next resume) instead of failing the batch.
    */
  def runResumable(input: DataFrame, out: String, nShards: Int,
                   ignoreErrors: Boolean = false)
                  (job: DataFrame => DataFrame): Seq[ShardRecord] = {
    require(nShards > 0)
    val done = completedShards(out)
    val todo = (0 until nShards).filterNot(done)
    todo.flatMap { k =>
      val t0 = System.currentTimeMillis()
      try {
        val shardInput = input.filter(pmod(xxhash64(col("conv_id")), lit(nShards)) === k)
        val result = job(shardInput)
        result.write.mode("overwrite").parquet(s"$out/shard=$k")
        val rows = result.sparkSession.read.parquet(s"$out/shard=$k").count()
        val rec = ShardRecord(k, rows, System.currentTimeMillis() - t0, System.currentTimeMillis())
        writeManifest(out, rec)
        Some(rec)
      } catch {
        case e: Exception if ignoreErrors =>
          // error side-sink: shard-K failure recorded next to the manifest,
          // shard NOT marked complete → retried on resume
          Files.createDirectories(manifestDir(out))
          Files.write(manifestDir(out).resolve(s"error-$k.log"),
            s"${e.getClass.getName}: ${e.getMessage}\n".getBytes("UTF-8"))
          None
      }
    }
  }

  /** The lineage/metrics table (north rule: per-partition lineage with
    * row-count and latency), readable as a DataFrame.
    */
  def lineage(spark: SparkSession, out: String): DataFrame = {
    import spark.implicits._
    val recs = completedShards(out).toSeq.sorted.map { k =>
      val txt = new String(Files.readAllBytes(manifestDir(out).resolve(s"shard-$k.json")), "UTF-8")
      def field(name: String): Long =
        s""""$name":(-?\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(-1L)
      ShardRecord(field("shard").toInt, field("rows"), field("wall_ms"), field("epoch_ms"))
    }
    recs.toDF()
  }

  /** Read the snapshot back — manifest-committed shards ONLY. A `shard=*`
    * glob would also pick up directories written but never recorded
    * (crash between data write and manifest commit), silently including
    * partial output; the manifest is the commit log, so it is the source
    * of truth for what is readable.
    */
  def read(spark: SparkSession, out: String): DataFrame = {
    val done = completedShards(out).toSeq.sorted
    require(done.nonEmpty, s"no committed shards under $out")
    // explicit roots, no basePath: no partition-column inference — schema
    // stays exactly the job's output schema, as with the old glob read.
    // mergeSchema: shard schemas are identical for schema-stable post
    // steps (Main fails fast on the data-dependent ones), but a snapshot
    // written across engine versions may legitimately differ — union the
    // schemas instead of silently sampling one shard's footer
    spark.read.option("mergeSchema", "true")
      .parquet(done.map(k => s"$out/shard=$k"): _*)
  }
}
