package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * The actual codec work is STUBBED — no image/audio libraries exist in
  * this container — but everything Spark-side is real and tested: the
  * schema contract, the binary column handling, the per-partition batched
  * iteration (the Scala analog of a `mapInPandas` batch loop), and the
  * deterministic fake "decode" so downstream plumbing has stable values to
  * verify against.
  */
object Multimodal {

  /** Typed media row: payload plus metadata, the ingest contract. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),    // decode metadata,
    StructField("height", IntegerType, nullable = true),   // filled by decode
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap a text table as fake media payloads (fixture plumbing: payload =
    * UTF-8 bytes). Real ingest would read the binary column straight from
    * parquet.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  private val featSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sig", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Batched per-partition "decode + feature extract".
    *
    * STUB: a real implementation would hand each batch of payloads to a
    * codec (libjpeg/ffmpeg) and emit real feature vectors; here decode is a
    * deterministic fold over the bytes. The distributed shape — one codec
    * context per partition, batched iteration, bounded memory per batch —
    * is the part that matters at 100 TB and is real.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      // per-partition "codec" init would go here (once, not per row)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          // ??? real decode — stubbed as a deterministic byte fold
          var sig = 1125899906842597L
          var i = 0
          while (i < bytes.length) { sig = sig * 31 + (bytes(i) & 0xff); i += 1 }
          val feat = Array.tabulate(4)(d => ((sig >>> (d * 8)) & 0xff).toDouble / 255.0)
          Row(id, bytes.length.toLong, sig, feat)
        }
      }
    }(enc)
  }
}
