package graft.schema

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Single source of truth for the medallion table schemas.
  *
  * Replaces the reference's externally-registered feature-group schema
  * (feature_store/register_feature_groups.py:84-97) with a compile-time
  * Scala module. Input shape is authoritative per BASELINE.json
  * `input_hint`: (conv_id:string, turn_idx:int32, role:string,
  * text:string, tool:string, ts:timestamp).
  */
object TranscriptSchema {

  /** Bronze: raw transcript turns as landed (reference bronze NDJSON
    * schema, README.md:162-170). Explicit — never inferred (the
    * reference infers, silver_and_gold.py:53; we pin it for
    * determinism).
    */
  val bronze: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = true),
    StructField("turn_idx", IntegerType, nullable = true),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)
  ))

  /** Silver: validated + deduplicated + stably ordered; adds the daily
    * partition column (reference intent silver_and_gold.py:70-77,
    * D2-corrected: `dt` is a real column).
    */
  val silver: StructType = StructType(
    bronze.fields.map(f => f.copy(nullable = f.name == "tool")) :+
      StructField("dt", DateType, nullable = false))

  /** Gold feature columns appended to silver (reference gold projection
    * silver_and_gold.py:100-121, mapped to transcripts per SURVEY.md §0).
    * All features are trailing-only (leakage rule §4.4).
    */
  val goldFeatures: Seq[StructField] = Seq(
    StructField("turns_cnt_1h", LongType),        // W1: count(*) over [-3600, 0]
    StructField("tool_calls_1h", LongType),       // W1': count(tool) over [-3600, 0]
    StructField("chars_sum_1h", LongType),        // W2: sum(length(text)) over [-3600, 0]
    StructField("tool_distinct_24h", IntegerType),// W3: exact distinct tools over [-86400, 0] (D1-corrected)
    StructField("avg_chars_7d", DoubleType),      // W4: avg(length(text)) over [-604800, 0]
    StructField("prev_role", StringType),         // lag(role, 1) by turn_idx
    StructField("gap_secs", LongType),            // ts - lag(ts) in whole seconds
    StructField("session_id", IntegerType)        // cumulative inactivity-gap breaks
  )

  val gold: StructType = StructType(silver.fields ++ goldFeatures.map(_.copy(nullable = true)))

  /** Typed row for the bronze/silver layers. Option-typed where the
    * contract allows null.
    */
  final case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: Option[String],
      ts: Timestamp)

  /** Inactivity gap (seconds) that breaks a session. */
  val DefaultSessionGapSecs: Long = 1800L
}
