package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode / feature-extract as
  * partition-local batch functions.
  *
  * The Spark-side plumbing is real (binary columns, typed Dataset,
  * mapPartitions batching, schema); the media DECODER IS A STUB — this
  * container ships no image/audio codecs — clearly marked below. Swap
  * [[StubDecoder]] for a real codec (e.g. TwelveMonkeys/JavaCV) without
  * touching the pipeline: the contract is bytes-in, metadata-out.
  *
  * Scale notes: decode is embarrassingly parallel; `mapPartitions` keeps
  * codec init per-partition (not per-row). Binary payloads should live in
  * their own parquet column so column pruning skips them when a query only
  * touches metadata.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, width: Long, height: Long, format: String)

  /** STUB decoder — deterministic arithmetic on payload size standing in
    * for a real image decode. Replace with a codec; keep the signature.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Long, Long, String) = {
      val n = payload.length.toLong
      (n % 640, (n * 7) % 480, "stub")
    }
  }

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * the fixtures ship no real media; the pipeline does not care).
    */
  def withBinaryPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast("bigint").as("doc_id"),
      encode(col(srcCol), "UTF-8").as("payload"))

  /** Decode a binary payload column into typed metadata via
    * partition-local batches. One narrow stage, no shuffle.
    */
  def extractMeta(spark: SparkSession, withPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts are
        // expensive; never per-row)
        it.map { case (id, bytes) =>
          val (w, h, f) = StubDecoder.decode(bytes)
          MediaMeta(id, w, h, f)
        }
      }
  }
}
