package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.gold.FeatureWindows
import graft.silver.SilverBuilder
import graft.skew.ChunkedWindows

class ChunkedWindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val silver = SilverBuilder.build(
    // a planted "mega" conversation (500 turns) over ordinary ones
    TranscriptGen.transcripts(spark, nConvs = 20, avgTurns = 15, megaConvs = 1, megaTurns = 500))
    .cache()

  private val featureCols =
    Seq("conv_id", "turn_idx", "turns_cnt_1h", "tool_calls_1h", "chars_sum_1h",
      "tool_distinct_24h", "avg_chars_7d")

  private def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
    val ga = a.select(featureCols.map(col): _*)
    val gb = b.select(featureCols.map(col): _*)
    assert(ga.count() == gb.count())
    assert(ga.exceptAll(gb).count() == 0 && gb.exceptAll(ga).count() == 0)
  }

  test("chunked == plain at segment = max lookback (2x replication)") {
    eq(FeatureWindows.rangeFeatures(silver),
      ChunkedWindows.rangeFeaturesChunked(silver, segmentSecs = 604800L))
  }

  test("chunked == plain at small segments (high parallelism shape)") {
    eq(FeatureWindows.rangeFeatures(silver),
      ChunkedWindows.rangeFeaturesChunked(silver, segmentSecs = 86400L))
  }

  test("auto dispatch (heavy threshold splits paths) == plain") {
    eq(FeatureWindows.rangeFeatures(silver),
      ChunkedWindows.rangeFeaturesAuto(silver, heavyThreshold = 100L))
  }
}
