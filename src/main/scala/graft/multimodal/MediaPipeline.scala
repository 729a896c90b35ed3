package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-batched typed transforms (the Scala
  * analog of `mapInPandas` — one buffer per partition batch, vectorized
  * shape). The decode itself is a clearly-marked DETERMINISTIC STUB
  * (no image/audio codecs ship in this container); everything around
  * it — schema, partitioning, batch signature, output contract — is
  * real and tested (MediaPipelineSpec).
  *
  * Scale: payloads never shuffle (decode is a narrow map stage); only
  * the extracted fixed-width features move. Partition sizing for
  * ~MB-scale blobs is the input-split knob
  * (spark.sql.files.maxPartitionBytes), not row count.
  */
object MediaPipeline {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int, // images/video; 0 otherwise
      height: Int,
      sample_rate: Int, // audio; 0 otherwise
      n_frames: Int) // video; 1 for image, 0 for audio

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      checksum: Long,
      feature: Array[Float]) // fixed-width embedding-shaped output

  /** Deterministic synthetic media table (payload bytes derived from
    * media_id — no RNG state, reproducible on any layout).
    */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (id % 7).toInt * 128
      val payload = Array.tabulate[Byte](len)(j => ((id * 31 + j * 7) % 251).toByte)
      kind match {
        case "image" => MediaRow(id, kind, payload, 64 + (id % 4).toInt * 32, 64, 0, 1)
        case "audio" => MediaRow(id, kind, payload, 0, 0, 16000, 0)
        case _       => MediaRow(id, kind, payload, 128, 128, 0, 8 + (id % 5).toInt)
      }
    }
  }

  /** ======== STUB ======== The real system decodes the payload with an
    * image/audio codec here. This container ships none, so the "decode"
    * is a deterministic fake: a rolling checksum and a 16-dim feature
    * derived from payload bytes. The partition-batched signature
    * (Iterator[MediaRow] => Iterator[MediaFeatures]) is exactly what a
    * real decoder plugs into.
    */
  private def decodeBatchStub(batch: Iterator[MediaRow]): Iterator[MediaFeatures] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum = (sum * 31 + (r.payload(i) & 0xff)) % 2147483647L; i += 1 }
      val feat = Array.tabulate(16)(d =>
        ((sum % (d + 13)).toFloat / (d + 13)) * (if (d % 2 == 0) 1f else -1f))
      MediaFeatures(r.media_id, r.kind, r.payload.length, sum, feat)
    }

  /** Decode/feature-extract over partition batches. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodeBatchStub)
  }

  /** Frame sampling for video rows: every `stride`-th frame index
    * becomes a row (explode is in-plan; no UDF, no driver loop).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"))

  /** Metadata-level resize (aspect-preserving): the payload is untouched
    * (a real resize would re-encode in decodeBatchStub's slot).
    */
  def resizeMeta(media: Dataset[MediaRow], maxSide: Int): DataFrame =
    media.toDF().withColumn("scale",
      when(greatest(col("width"), col("height")) > maxSide,
        lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
        .otherwise(1.0))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
      .drop("payload")
}
