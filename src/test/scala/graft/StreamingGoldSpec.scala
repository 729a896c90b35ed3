package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.gold.FeatureWindows
import graft.streaming.StreamingGold

/** Append-mode streaming emits a window only once the event-time
  * watermark passes its end — the tail windows (end > max(ts) - delay)
  * are legitimately unemitted at stream end. Assertions therefore
  * check: nothing spurious (stream ⊆ batch) and completeness for every
  * finalized window (batch-finalized ⊆ stream).
  */
class StreamingGoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val bronzeDir = {
    val dir = Files.createTempDirectory("stream_bronze").toString
    TranscriptGen.transcripts(spark, nConvs = 20, avgTurns = 15)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val maxTs: java.sql.Timestamp =
    spark.read.parquet(bronzeDir).agg(max(col("ts"))).collect()(0).getTimestamp(0)

  test("streaming hourly aggregates: nothing spurious, all finalized windows present") {
    val stream = StreamingGold.readBronzeStream(spark, bronzeDir)
    val got = StreamingGold.runToMemory(StreamingGold.hourlyAgg(stream), "hourly")
    val batch = spark.read.parquet(bronzeDir)
      .groupBy(window(col("ts"), "1 hour"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        count(col("tool")).as("n_tool_calls"),
        sum(length(col("text"))).as("chars"))
      .select(col("window.start").as("hour_start"), col("window.end").as("hour_end"),
        col("conv_id"), col("n_turns"), col("n_tool_calls"), col("chars"))
    val finalized = batch
      .filter(col("hour_end") < lit(maxTs) - expr("INTERVAL 2 MINUTES"))
      .drop("hour_end")
    assert(got.count() > 0)
    assert(got.exceptAll(batch.drop("hour_end")).count() == 0, "spurious streamed windows")
    assert(finalized.exceptAll(got).count() == 0, "missing finalized windows")
  }

  test("durable parquet sink: restart resumes from checkpoint, no loss/dupes on finalized windows") {
    val inDir = Files.createTempDirectory("stream_durable_in").toString
    val outDir = Files.createTempDirectory("stream_durable_out").toString
    val ckDir = Files.createTempDirectory("stream_durable_ck").toString
    val all = TranscriptGen.transcripts(spark, nConvs = 20, avgTurns = 15).cache()
    val cut = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")

    // phase 1: only the early files exist; run to completion ("kill")
    all.filter(col("ts") < lit(cut)).write.mode("overwrite").parquet(s"$inDir/batch1")
    StreamingGold.runToParquet(
      StreamingGold.hourlyAgg(StreamingGold.readBronzeStream(spark, s"$inDir/batch*")),
      outDir, ckDir)
    val afterPhase1 = spark.read.parquet(outDir).count()
    assert(afterPhase1 > 0)

    // phase 2: the rest of the data lands; RESTART with the same checkpoint
    all.filter(col("ts") >= lit(cut)).write.mode("overwrite").parquet(s"$inDir/batch2")
    StreamingGold.runToParquet(
      StreamingGold.hourlyAgg(StreamingGold.readBronzeStream(spark, s"$inDir/batch*")),
      outDir, ckDir)

    val got = spark.read.parquet(outDir)
    assert(got.count() > afterPhase1, "restart did not process the new files")
    // exactly-once: no duplicate (hour_start, conv_id) groups
    assert(got.groupBy("hour_start", "conv_id").count().filter(col("count") > 1).count() == 0,
      "duplicate windows after restart")
    // batch truth on the full input: nothing spurious + finalized complete
    val batch = all
      .groupBy(window(col("ts"), "1 hour"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        count(col("tool")).as("n_tool_calls"),
        sum(length(col("text"))).as("chars"))
      .select(col("window.start").as("hour_start"), col("window.end").as("hour_end"),
        col("conv_id"), col("n_turns"), col("n_tool_calls"), col("chars"))
    val maxAll = all.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val finalized = batch
      .filter(col("hour_end") < lit(maxAll) - expr("INTERVAL 2 MINUTES"))
      .drop("hour_end")
    assert(got.exceptAll(batch.drop("hour_end")).count() == 0, "spurious windows")
    assert(finalized.exceptAll(got).count() == 0, "missing finalized windows after restart")
  }

  test("streaming session windows agree with the batch gap sessionizer on finalized sessions") {
    val stream = StreamingGold.readBronzeStream(spark, bronzeDir)
    val got = StreamingGold.runToMemory(StreamingGold.sessionAgg(stream), "sessions")
      .select("conv_id", "n_turns", "first_turn", "last_turn")
    // batch truth: session spans from the gap sessionizer
    val batch = FeatureWindows.sessionize(
      FeatureWindows.lagFeatures(spark.read.parquet(bronzeDir)))
      .groupBy(col("conv_id"), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        max(col("ts")).as("last_ts"))
    val finalized = batch
      .filter(col("last_ts") + expr("INTERVAL 1801 SECONDS") <
        lit(maxTs) - expr("INTERVAL 2 MINUTES"))
      .select("conv_id", "n_turns", "first_turn", "last_turn")
    assert(got.count() > 0 && finalized.count() > 0)
    assert(got.exceptAll(batch.select("conv_id", "n_turns", "first_turn", "last_turn")).count() == 0,
      "streamed session not in batch truth")
    assert(finalized.exceptAll(got).count() == 0, "missing finalized session")
    assert(got.filter(col("last_turn") < col("first_turn")).count() == 0)
  }
}
