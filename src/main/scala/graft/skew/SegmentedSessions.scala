package graft.skew

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.TranscriptSchema

/** Two-pass lag/gap/sessionization for mega-conversations (north rule:
  * "salting for skewed mega-conversations"; round-1 verdict #5: the
  * lag/session stage still ran one task per conversation).
  *
  * A window over bare conv_id serializes a 10^8-turn conversation on a
  * single task. This splits it by time segment, exactly:
  *
  *  pass 1 (parallel, one task per (conv, segment)): within-segment
  *    lag/gap via a plain window;
  *  bridge (tiny, one row per non-empty segment): per-segment first/
  *    last (ts, role) + within-segment break count → a window over the
  *    SEGMENT SUMMARIES chains boundary gaps and prefix-sums the
  *    session offsets (carried state seeds the chain);
  *  pass 2 (parallel): broadcast the per-segment offsets back and
  *    finish with a within-segment cumulative sum.
  *
  * Result is row-identical to the single-window formulation
  * ([[graft.Backfill.withState]]) — SegmentedSessionsSpec asserts it —
  * while a conversation spanning T seconds runs as T/segmentSecs
  * tasks.
  */
object SegmentedSessions {

  /** `state` columns: conv_id, st_last_ts, st_last_role, st_sessions
    * (at most one row per conversation). Adds prev_role, gap_secs,
    * session_id to `rows`.
    */
  def withStateSegmented(
      rows: DataFrame,
      state: DataFrame,
      gapSecs: Long = TranscriptSchema.DefaultSessionGapSecs,
      segmentSecs: Long = 604800L): DataFrame = {
    val tsSec = unix_timestamp(col("ts"))
    val wSeg = Window.partitionBy(col("conv_id"), col("_seg")).orderBy(col("turn_idx"))

    val r1 = rows
      .withColumn("_ts_sec", tsSec)
      .withColumn("_seg", floor(col("_ts_sec") / segmentSecs).cast("long"))
      .withColumn("_lag_ts", lag(col("_ts_sec"), 1).over(wSeg))
      .withColumn("_lag_role", lag(col("role"), 1).over(wSeg))

    // one row per non-empty (conv, segment): boundary material + breaks
    val summary = r1.groupBy(col("conv_id"), col("_seg")).agg(
      min_by(col("_ts_sec"), col("turn_idx")).as("_first_ts"),
      max_by(col("_ts_sec"), col("turn_idx")).as("_last_ts"),
      max_by(col("role"), col("turn_idx")).as("_last_role"),
      sum(when(col("_lag_ts").isNotNull && col("_ts_sec") - col("_lag_ts") > gapSecs, 1)
        .otherwise(0)).as("_breaks_within"))

    // chain across segments (tiny table): previous segment's tail, the
    // boundary break, and the cumulative session offset before each
    // segment; carried state is the virtual segment -inf
    val wConv = Window.partitionBy(col("conv_id")).orderBy(col("_seg"))
    val chained = summary
      .join(state.select(col("conv_id"), unix_timestamp(col("st_last_ts")).as("_st_ts"),
        col("st_last_role").as("_st_role"), col("st_sessions").as("_st_sessions")),
        Seq("conv_id"), "left")
      .withColumn("_prev_ts", coalesce(lag(col("_last_ts"), 1).over(wConv), col("_st_ts")))
      .withColumn("_prev_role", coalesce(lag(col("_last_role"), 1).over(wConv), col("_st_role")))
      .withColumn("_boundary_gap", col("_first_ts") - col("_prev_ts"))
      .withColumn("_boundary_break",
        when(col("_boundary_gap").isNull || col("_boundary_gap") > gapSecs, 1).otherwise(0))
      .withColumn("_breaks_total", col("_boundary_break") + col("_breaks_within"))
      .withColumn("_offset", coalesce(col("_st_sessions"), lit(0)) +
        coalesce(sum(col("_breaks_total")).over(
          wConv.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("conv_id"), col("_seg"),
        col("_prev_ts"), col("_prev_role"), col("_offset"))

    r1.join(broadcast(chained), Seq("conv_id", "_seg"))
      .withColumn("prev_role", coalesce(col("_lag_role"), col("_prev_role")))
      .withColumn("gap_secs",
        when(col("_lag_ts").isNotNull, col("_ts_sec") - col("_lag_ts"))
          .otherwise(col("_ts_sec") - col("_prev_ts")))
      .withColumn("session_id", (col("_offset") +
        sum(when(col("gap_secs").isNull || col("gap_secs") > gapSecs, 1).otherwise(0))
          .over(wSeg.rowsBetween(Window.unboundedPreceding, Window.currentRow))).cast("int"))
      .drop("_ts_sec", "_seg", "_lag_ts", "_lag_role", "_prev_ts", "_prev_role", "_offset")
  }

  /** Empty state with the right shape, for standalone use. */
  def emptyState(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(graft.meta.Checkpoint.convStateSchema.fields
        .filterNot(_.name == "st_last_turn_idx")))
}
