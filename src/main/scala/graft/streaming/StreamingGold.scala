package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.schema.TranscriptSchema

/** Structured Streaming surface for the ingestion path the reference
  * drives with Kinesis/Firehose + an EventBridge-scheduled micro-batch
  * (SURVEY.md §2.10). Batch backfill stays the primary engine
  * ([[graft.Backfill]]); this module covers the live tail:
  * file-arrival streaming of bronze turns, an event-time watermark
  * (making the reference's parsed-but-unused watermark real, defect
  * D3), tumbling per-conversation aggregates, and session windows via
  * `session_window` with the same inactivity gap as the batch
  * sessionizer.
  */
object StreamingGold {

  /** Stream bronze parquet files as they land. */
  def readBronzeStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(TranscriptSchema.bronze)
      .option("maxFilesPerTrigger", "16")
      .parquet(path)

  /** Tumbling hourly per-conversation aggregates with a late-data
    * watermark (append mode emits a window only once it is final).
    */
  def hourlyAgg(bronze: DataFrame, watermarkDelay: String = "2 minutes"): DataFrame =
    bronze
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        count(col("tool")).as("n_tool_calls"),
        sum(length(col("text"))).as("chars"))
      .select(col("window.start").as("hour_start"), col("conv_id"),
        col("n_turns"), col("n_tool_calls"), col("chars"))

  /** Session windows (inactivity gap) — the streaming twin of the batch
    * gap sessionizer; equality of session counts is asserted in
    * StreamingGoldSpec.
    */
  def sessionAgg(
      bronze: DataFrame,
      gapSecs: Long = TranscriptSchema.DefaultSessionGapSecs,
      watermarkDelay: String = "2 minutes"): DataFrame =
    bronze
      // session_window keeps events together when diff < gap (strict);
      // the batch sessionizer breaks when gap > threshold (also keeps
      // at ==), so gap+1 aligns the two exactly — PROVIDED both sides
      // see whole-second timestamps. The batch gap floors to epoch
      // seconds (unix_timestamp), so floor here too: with sub-second
      // events a raw-ts session_window would classify boundary gaps
      // differently. The floored column carries the watermark (the
      // session column and the watermark column must coincide).
      .withColumn("ts_sec", date_trunc("second", col("ts")))
      .withWatermark("ts_sec", watermarkDelay)
      .groupBy(session_window(col("ts_sec"), s"${gapSecs + 1} seconds"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("conv_id"), col("n_turns"), col("first_turn"), col("last_turn"))

  /** The DURABLE production sink: append-mode parquet with a streaming
    * checkpoint — the pure-Spark stand-in for the reference's
    * Firehose→S3 delivery (kinesis_firehose/main.tf:109-113). Restart
    * with the same checkpointLocation resumes exactly where the last
    * run stopped: already-committed source files are not reprocessed
    * and finalized windows are emitted exactly once
    * (StreamingGoldSpec kill/restart test). Synchronous: drains all
    * currently-available input (Trigger.AvailableNow) then returns.
    */
  def runToParquet(df: DataFrame, outPath: String, checkpointPath: String): Unit = {
    val q = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain a streaming DF into an in-memory table and return the result
    * (synchronous; for tests/smoke — production uses [[runToParquet]]).
    */
  def runToMemory(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
