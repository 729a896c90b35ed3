package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gold.{AsOfJoin, FeatureWindows}
import graft.silver.SilverBuilder
import graft.sources.TranscriptSource

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query runs the engine's own operators over the deterministic
  * transcript view of the driver's `events` table
  * ([[TranscriptSource.fromEvents]]); each oracle replays the exact
  * semantics in DuckDB SQL over the same parquet. Column names and
  * types are kept identical on both sides (the driver hashes values
  * after sorting columns by name).
  */
object SparkEntry {

  /** Shared epoch-seconds helper (Spark unix_timestamp truncates to
    * seconds; oracles use floor(epoch(ts))::BIGINT to match).
    */
  private def tsSec(c: String = "ts") = unix_timestamp(col(c))

  /** Transcript view of the events table (see TranscriptSource for the
    * mapping contract).
    */
  private def transcripts(s: SparkSession, dir: String): DataFrame =
    TranscriptSource.fromEvents(s, dir)

  /** Flagship: full bronze→silver→gold pipeline on sf0.001; driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val bronze = transcripts(spark, "/root/testdata/sf0.001")
    FeatureWindows.gold(SilverBuilder.build(bronze))
  }

  // ---- q1: silver dedup (D4-corrected deterministic semantics) ----
  private def q1(s: SparkSession, dir: String): DataFrame = {
    val t = transcripts(s, dir)
    // inject near-duplicates: every 7th turn reappears 1s later with
    // altered text; deterministic dedup must keep the original row.
    val dupes = t.filter(pmod(col("turn_idx"), lit(7)) === 0)
      .withColumn("text", concat(col("text"), lit(" dup")))
      .withColumn("ts", col("ts") + expr("INTERVAL 1 SECOND"))
    SilverBuilder.build(t.unionByName(dupes))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"), col("dt"))
  }

  // ---- q2: the reference's four trailing range-window features + tool-call count ----
  private def q2(s: SparkSession, dir: String): DataFrame =
    FeatureWindows.rangeFeatures(transcripts(s, dir)).select(
      col("conv_id"), col("turn_idx"), col("ts"),
      col("turns_cnt_1h"), col("tool_calls_1h"),
      col("chars_sum_1h").cast("long").as("chars_sum_1h"),
      col("tool_distinct_24h"),
      round(col("avg_chars_7d"), 6).as("avg_chars_7d"))

  // ---- q3: lag features (prev_role, inactivity gap) ----
  private def q3(s: SparkSession, dir: String): DataFrame =
    FeatureWindows.lagFeatures(transcripts(s, dir))
      .select(col("conv_id"), col("turn_idx"), col("prev_role"), col("gap_secs"))

  // ---- q4: inactivity-gap sessionization (1800 s threshold) ----
  private def q4(s: SparkSession, dir: String): DataFrame =
    FeatureWindows.sessionize(FeatureWindows.lagFeatures(transcripts(s, dir)))
      .select(col("conv_id"), col("turn_idx"), col("session_id"))

  // ---- q5: as-of (point-in-time) join of feature queries vs gold history ----
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val gold = FeatureWindows.rangeFeatures(transcripts(s, dir))
      .select(col("conv_id"), col("turn_idx"), col("ts"),
        col("turns_cnt_1h"), col("tool_distinct_24h"))
    val t = transcripts(s, dir)
    val mid = t.filter(pmod(col("turn_idx"), lit(5)) === 2)
      .select(concat(col("conv_id"), lit("#"), col("turn_idx").cast("string")).as("q_id"),
        col("conv_id"), (col("ts") + expr("INTERVAL 90 SECONDS")).as("ts"))
    // plus one query per conversation before its first turn (must yield
    // null features — the "no history yet" case)
    val pre = t.groupBy(col("conv_id"))
      .agg(min(col("ts")).as("ts0"))
      .select(concat(col("conv_id"), lit("#pre")).as("q_id"),
        col("conv_id"), (col("ts0") - expr("INTERVAL 1 HOUR")).as("ts"))
    val queries = mid.unionByName(pre)
    AsOfJoin.asOf(queries, gold, Seq("turn_idx", "turns_cnt_1h", "tool_distinct_24h"))
      .withColumnRenamed("turn_idx", "matched_turn_idx")
  }

  // ---- q6: latest feature row per conversation (online-store read, J2) ----
  private def q6(s: SparkSession, dir: String): DataFrame =
    AsOfJoin.latestPerKey(FeatureWindows.rangeFeatures(transcripts(s, dir)))
      .select(col("conv_id"), col("turn_idx"), col("ts"),
        col("turns_cnt_1h"), col("chars_sum_1h").cast("long").as("chars_sum_1h"))

  // ---- q7: deterministic train-split with label (replaces randomSplit, D-R1) ----
  private def q7(s: SparkSession, dir: String): DataFrame =
    transcripts(s, dir)
      .withColumn("label", (length(col("text")) > 40).cast("int"))
      .filter(pmod(col("turn_idx") + pmod(tsSec(), lit(1000)).cast("int"), lit(10)) < 8)
      .select(col("conv_id"), col("turn_idx"), col("label"))

  // ---- q8: tumbling hourly per-conversation aggregate ----
  private def q8(s: SparkSession, dir: String): DataFrame =
    transcripts(s, dir)
      .groupBy(col("conv_id"),
        // keep NTZ: parquet ts reads as timestamp_ntz, date_trunc would
        // promote to session-tz timestamp and break type parity
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_start"))
      .agg(count(lit(1)).as("n_turns"),
        count(col("tool")).as("n_tool_calls"),
        sum(length(col("text"))).cast("long").as("chars"))

  // ---- q19: session-level rollup (sessionize -> per-session features) ----
  private def q19(s: SparkSession, dir: String): DataFrame =
    FeatureWindows.sessionize(FeatureWindows.lagFeatures(transcripts(s, dir)))
      .groupBy(col("conv_id"), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        (max(tsSec()) - min(tsSec())).as("duration_secs"),
        count(col("tool")).as("n_tool_calls"))

  // ---- q20: conversation-level rollup ----
  private def q20(s: SparkSession, dir: String): DataFrame =
    transcripts(s, dir)
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(length(col("text"))).cast("long").as("total_chars"),
        countDistinct(col("tool")).cast("int").as("n_tools"),
        (max(tsSec()) - min(tsSec())).as("duration_secs"),
        sum(when(col("role") === "tool", 1).otherwise(0)).cast("long").as("n_tool_turns"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_silver_dedup" -> (q1 _),
    "q2_window_features" -> (q2 _),
    "q3_lag_gap" -> (q3 _),
    "q4_sessionize" -> (q4 _),
    "q5_asof_join" -> (q5 _),
    "q6_latest_per_key" -> (q6 _),
    "q7_train_split" -> (q7 _),
    "q8_tumbling_hourly" -> (q8 _),
    "q19_session_stats" -> (q19 _),
    "q20_conv_stats" -> (q20 _)
  ) ++ TrainingDataQueries.queries

  /** DuckDB oracle SQL, one per query above. The `transcripts` CTE is
    * the SQL twin of TranscriptSource.fromEvents.
    */
  def oracleSql: Map[String, String] = {
    val cte = TranscriptSource.eventsCte
    Map(
      "q1_silver_dedup" ->
        s"""$cte, with_dupes AS (
           |  SELECT * FROM transcripts
           |  UNION ALL
           |  SELECT conv_id, turn_idx, role, text || ' dup' AS text, tool, ts + INTERVAL 1 SECOND AS ts
           |  FROM transcripts WHERE turn_idx % 7 = 0
           |)
           |SELECT conv_id, turn_idx, role, text, tool, ts, CAST(ts AS DATE) AS dt
           |FROM with_dupes
           |QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx
           |  ORDER BY ts, role, coalesce(tool, ''), text) = 1""".stripMargin,

      "q2_window_features" ->
        s"""$cte
           |SELECT conv_id, turn_idx, ts,
           |  count(*) OVER w1 AS turns_cnt_1h,
           |  count(tool) OVER w1 AS tool_calls_1h,
           |  CAST(sum(length(text)) OVER w1 AS BIGINT) AS chars_sum_1h,
           |  CAST(count(DISTINCT tool) OVER w24 AS INT) AS tool_distinct_24h,
           |  round(avg(length(text)) OVER w7, 6) AS avg_chars_7d
           |FROM transcripts
           |WINDOW
           |  w1 AS (PARTITION BY conv_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
           |  w24 AS (PARTITION BY conv_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
           |  w7 AS (PARTITION BY conv_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""".stripMargin,

      "q3_lag_gap" ->
        s"""$cte
           |SELECT conv_id, turn_idx,
           |  lag(role, 1) OVER w AS prev_role,
           |  CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w AS gap_secs
           |FROM transcripts
           |WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)""".stripMargin,

      "q4_sessionize" ->
        s"""$cte, gaps AS (
           |  SELECT conv_id, turn_idx,
           |    CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
           |      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_secs
           |  FROM transcripts
           |)
           |SELECT conv_id, turn_idx,
           |  CAST(sum(CASE WHEN gap_secs IS NULL OR gap_secs > 1800 THEN 1 ELSE 0 END)
           |    OVER (PARTITION BY conv_id ORDER BY turn_idx
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
           |FROM gaps""".stripMargin,

      "q5_asof_join" ->
        s"""$cte, gold AS (
           |  SELECT conv_id, turn_idx, ts,
           |    count(*) OVER w1 AS turns_cnt_1h,
           |    CAST(count(DISTINCT tool) OVER w24 AS INT) AS tool_distinct_24h
           |  FROM transcripts
           |  WINDOW
           |    w1 AS (PARTITION BY conv_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
           |    w24 AS (PARTITION BY conv_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
           |), queries AS (
           |  SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR) AS q_id, conv_id,
           |         ts + INTERVAL 90 SECOND AS ts
           |  FROM transcripts WHERE turn_idx % 5 = 2
           |  UNION ALL
           |  SELECT conv_id || '#pre' AS q_id, conv_id, min(ts) - INTERVAL 1 HOUR AS ts
           |  FROM transcripts GROUP BY conv_id
           |)
           |SELECT q.q_id, q.conv_id, q.ts,
           |       g.turn_idx AS matched_turn_idx, g.turns_cnt_1h, g.tool_distinct_24h
           |FROM queries q LEFT JOIN LATERAL (
           |  SELECT turn_idx, turns_cnt_1h, tool_distinct_24h
           |  FROM gold g WHERE g.conv_id = q.conv_id AND g.ts <= q.ts
           |  ORDER BY g.ts DESC, g.turn_idx DESC LIMIT 1
           |) g ON true""".stripMargin,

      "q6_latest_per_key" ->
        s"""$cte, gold AS (
           |  SELECT conv_id, turn_idx, ts,
           |    count(*) OVER w1 AS turns_cnt_1h,
           |    CAST(sum(length(text)) OVER w1 AS BIGINT) AS chars_sum_1h
           |  FROM transcripts
           |  WINDOW w1 AS (PARTITION BY conv_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
           |)
           |SELECT conv_id, turn_idx, ts, turns_cnt_1h, chars_sum_1h
           |FROM gold
           |QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, turn_idx DESC) = 1""".stripMargin,

      "q7_train_split" ->
        s"""$cte
           |SELECT conv_id, turn_idx,
           |  CAST(length(text) > 40 AS INT) AS label
           |FROM transcripts
           |WHERE (turn_idx + CAST(CAST(floor(epoch(ts)) AS BIGINT) % 1000 AS INT)) % 10 < 8""".stripMargin,

      "q8_tumbling_hourly" ->
        s"""$cte
           |SELECT conv_id, date_trunc('hour', ts) AS hour_start,
           |  count(*) AS n_turns, count(tool) AS n_tool_calls,
           |  CAST(sum(length(text)) AS BIGINT) AS chars
           |FROM transcripts GROUP BY conv_id, date_trunc('hour', ts)""".stripMargin,

      "q19_session_stats" ->
        s"""$cte, gaps AS (
           |  SELECT conv_id, turn_idx, tool, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
           |    CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
           |      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_secs
           |  FROM transcripts
           |), sess AS (
           |  SELECT conv_id, turn_idx, tool, tsec,
           |    CAST(sum(CASE WHEN gap_secs IS NULL OR gap_secs > 1800 THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY conv_id ORDER BY turn_idx
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
           |  FROM gaps
           |)
           |SELECT conv_id, session_id, count(*) AS n_turns,
           |  min(turn_idx) AS first_turn, max(turn_idx) AS last_turn,
           |  max(tsec) - min(tsec) AS duration_secs,
           |  count(tool) AS n_tool_calls
           |FROM sess GROUP BY conv_id, session_id""".stripMargin,

      "q20_conv_stats" ->
        s"""$cte
           |SELECT conv_id, count(*) AS n_turns,
           |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
           |  CAST(count(DISTINCT tool) AS INT) AS n_tools,
           |  max(CAST(floor(epoch(ts)) AS BIGINT)) - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_secs,
           |  CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_turns
           |FROM transcripts GROUP BY conv_id""".stripMargin
    ) ++ TrainingDataQueries.oracleSql
  }
}
