package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.TranscriptSchema

/** Bronze readers. The reference reads gzipped NDJSON with an inferred
  * schema and a shallow glob (silver_and_gold.py:53, defects D8);
  * we read with the explicit schema and recursive lookup, and also
  * support parquet bronze (what the deterministic generator writes).
  */
object TranscriptSource {

  /** Bronze NDJSON (optionally .gz — decompression is automatic). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(TranscriptSchema.bronze)
      .option("recursiveFileLookup", "true") // D8-corrected: bronze is 5 dirs deep in the reference layout
      .json(path)

  /** Bronze parquet. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(TranscriptSchema.bronze).parquet(path)

  /** Deterministic transcript view over the driver's `events` test table
    * (/root/testdata/sf{N}/events.parquet — event_id:int64, ts:timestamp,
    * user_id:int64, event_type:string, value:double, props:string).
    *
    * This mapping is the Spark twin of the CTE used in every DuckDB
    * oracle in [[graft.SparkEntry.oracleSql]]; the two must stay
    * byte-for-byte semantically identical:
    *
    * {{{
    * conv_id  = 'conv_' || lpad(user_id, 5, '0')
    * turn_idx = row_number() over (partition by user_id order by ts, event_id) - 1
    * role     = user | tool | assistant  (by event_type)
    * text     = props
    * tool     = event_type when in (purchase, signup, error) else null
    * ts       = ts
    * }}}
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val wTurn = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
      concat(lit("conv_"), lpad(col("user_id").cast("string"), 5, "0")).as("conv_id"),
      (row_number().over(wTurn) - 1).cast("int").as("turn_idx"),
      when(col("event_type").isin("click", "view"), "user")
        .when(col("event_type") === "error", "tool")
        .otherwise("assistant").as("role"),
      col("props").as("text"),
      when(col("event_type").isin("purchase", "signup", "error"), col("event_type")).as("tool"),
      col("ts"))
  }

  /** The CTE prefix shared by the DuckDB oracles (must mirror
    * [[fromEvents]] exactly).
    */
  val eventsCte: String =
    """WITH transcripts AS (
      |  SELECT 'conv_' || lpad(CAST(user_id AS VARCHAR), 5, '0') AS conv_id,
      |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |         CASE WHEN event_type IN ('click','view') THEN 'user'
      |              WHEN event_type = 'error' THEN 'tool'
      |              ELSE 'assistant' END AS role,
      |         props AS text,
      |         CASE WHEN event_type IN ('purchase','signup','error') THEN event_type END AS tool,
      |         ts
      |  FROM events
      |)""".stripMargin
}
