package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline

class MediaPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val media = MediaPipeline.syntheticMedia(spark, 90L).cache()

  test("synthetic media: binary payloads with typed metadata, deterministic") {
    val df = media.toDF()
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(media.count() == 90)
    val again = MediaPipeline.syntheticMedia(spark, 90L).toDF()
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("feature extraction: fixed-width output, one row per input, payload stays behind") {
    val feats = MediaPipeline.extractFeatures(media)
    assert(feats.count() == 90)
    val df = feats.toDF()
    assert(df.columns.toSet == Set("media_id", "kind", "byte_len", "checksum", "feature"))
    assert(df.filter(size(col("feature")) =!= 16).count() == 0)
    // deterministic across partitionings (batch boundaries don't leak in)
    val feats2 = MediaPipeline.extractFeatures(media.repartition(7))
    assert(feats.toDF().exceptAll(feats2.toDF()).count() == 0)
  }

  test("frame sampling explodes only video rows with the stride") {
    val frames = MediaPipeline.sampleFrames(media, stride = 2)
    val videos = media.filter(_.kind == "video").collect()
    val expected = videos.map(v => (v.n_frames + 1) / 2).sum
    assert(frames.count() == expected)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
  }

  test("resize metadata preserves aspect and caps the long side") {
    val out = MediaPipeline.resizeMeta(media, maxSide = 64)
    assert(out.filter(col("out_w") > 64 || col("out_h") > 64).count() == 0)
    assert(out.filter(col("kind") === "audio").filter(col("out_w") =!= 0).count() == 0)
  }
}
