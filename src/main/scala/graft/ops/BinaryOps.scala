package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride as opaque `binary`
  * columns with typed metadata. The Spark side — schema, partitioning,
  * batched per-partition processing, feature schema — is real; the actual
  * media decode is STUBBED with a deterministic fake (this container ships
  * no image/audio libraries), clearly marked below.
  */
object BinaryOps {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      // stub feature vector — stands in for decoded image/audio features
      features: Array[Float],
      frames_sampled: Int
  )

  /** STUB: deterministic fake "decode + feature extraction". A real
    * deployment replaces this with the media library call (e.g. JPEG decode
    * + CNN features); the batching, schema and partition shape are what the
    * pipeline tests.
    */
  private def stubDecodeFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= payload(i)
      h *= 0x100000001b3L
      out((i % dims)) += ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Per-partition batched feature extraction (the Scala analog of a Pandas
    * UDF over mapInPandas: one batch buffer per partition, amortized setup).
    * Frame sampling: take every `frameStride`-th kilobyte as a "frame".
    */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8, frameStride: Int = 4): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "model load" happens here once in a real deployment
      rows.map { r =>
        val frames = math.max(1, r.payload.length / (1024 * frameStride))
        MediaFeature(
          r.media_id,
          r.kind,
          r.payload.length,
          stubDecodeFeatures(r.payload, dims),
          frames
        )
      }
    }
  }

  /** Derive a deterministic media table from the documents table (text bytes
    * standing in for encoded media payloads).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id").cast("long").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")
          .as("kind"),
        col("text").cast("binary").as("payload")
      )
      .as[MediaRow]
  }
}
