package graft.meta

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Self-managed checkpoint/lineage metadata tables (parquet under
  * `<table>/_meta/`), emulating Iceberg snapshot/metadata tables (no
  * Iceberg jar ships in /opt/spark/jars; the mapping is
  * `snapshots`≈watermarks, `files`≈lineage so a real deployment can
  * swap Iceberg in).
  *
  * Replaces the reference's parsed-but-unused watermark parameter
  * (silver_and_gold.py:31, defect D3) with real semantics: a slice is
  * the unit of progress; its watermark row is flipped to `committed`
  * only AFTER data + lineage land, so any interrupted backfill resumes
  * by re-running exactly the uncommitted slices (idempotent via
  * dynamic partition overwrite). Also replaces the driver-side metrics
  * JSON sink (build_datasets.py:126-139) and CloudWatch PutMetricData
  * (stream_pipeline.asl.json:94-108) with queryable tables.
  */
object Checkpoint {

  private def wmPath(outDir: String) = s"$outDir/_meta/watermarks"
  private def linPath(outDir: String) = s"$outDir/_meta/lineage"
  private def statePath(outDir: String, sliceId: String) = s"$outDir/_meta/conv_state/slice_id=$sliceId"

  val watermarkSchema: StructType = StructType(Seq(
    StructField("slice_id", StringType, nullable = false),
    StructField("slice_start", TimestampType, nullable = false),
    StructField("slice_end", TimestampType, nullable = false),
    StructField("high_watermark_ts", TimestampType, nullable = true),
    StructField("row_count", LongType, nullable = false),
    StructField("status", StringType, nullable = false)))

  val convStateSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("st_last_ts", TimestampType, nullable = false),
    StructField("st_last_turn_idx", IntegerType, nullable = false),
    StructField("st_last_role", StringType, nullable = false),
    StructField("st_sessions", IntegerType, nullable = false)))

  def pathExists(spark: SparkSession, path: String): Boolean = exists(spark, path)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (exists(spark, path)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Slice ids whose watermark row reached `committed`. */
  def committedSlices(spark: SparkSession, outDir: String): Set[String] =
    readOrEmpty(spark, wmPath(outDir), watermarkSchema)
      .filter(col("status") === "committed")
      .select("slice_id").distinct()
      .collect().map(_.getString(0)).toSet

  /** Append the committed watermark row — the LAST write of a slice. */
  def commitSlice(
      spark: SparkSession,
      outDir: String,
      sliceId: String,
      sliceStart: java.sql.Timestamp,
      sliceEnd: java.sql.Timestamp,
      highWatermark: Option[java.sql.Timestamp],
      rowCount: Long): Unit = {
    import spark.implicits._
    Seq((sliceId, sliceStart, sliceEnd, highWatermark.orNull, rowCount, "committed"))
      .toDF("slice_id", "slice_start", "slice_end", "high_watermark_ts", "row_count", "status")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(wmPath(outDir))
  }

  /** Per-(slice, dt-partition) row counts, content hashes and
    * throughput — the "per-partition lineage + metrics" the north rule
    * asks for. Content hash is order-insensitive and ANSI-overflow-safe
    * (sum of 31-bit xxhash64 residues).
    */
  def appendLineage(outDir: String, gold: DataFrame, sliceId: String, wallMs: Long)
      : (Long, Option[java.sql.Timestamp]) = {
    val cols = gold.columns.map(col).toSeq
    val stats = gold.groupBy(col("dt"))
      .agg(count(lit(1)).as("row_count"),
        sum(pmod(xxhash64(cols: _*), lit(2147483647L))).as("content_hash"),
        max(col("ts")).as("hw_ts"))
      .withColumn("slice_id", lit(sliceId))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("rows_per_sec",
        round(col("row_count") * 1000.0 / greatest(lit(wallMs), lit(1L)), 2))
      .cache()
    stats.select("slice_id", "dt", "row_count", "content_hash", "wall_ms", "rows_per_sec")
      .coalesce(1).write.mode(SaveMode.Append).parquet(linPath(outDir))
    // slice totals in one pass over the (tiny, cached) stats
    val tot = stats.agg(coalesce(sum("row_count"), lit(0L)), max("hw_ts")).collect()(0)
    stats.unpersist()
    (tot.getLong(0), Option(tot.getTimestamp(1)))
  }

  def readLineage(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(linPath(outDir))

  def readWatermarks(spark: SparkSession, outDir: String): DataFrame =
    readOrEmpty(spark, wmPath(outDir), watermarkSchema)

  /** Conversation state as of the END of `sliceId` (last ts/turn/role +
    * session count per conv) — the cross-slice carry that makes
    * lag/gap/sessionization exact without re-reading full history.
    */
  def writeConvState(outDir: String, sliceId: String, state: DataFrame): Unit =
    state.write.mode(SaveMode.Overwrite).parquet(statePath(outDir, sliceId))

  def readConvState(spark: SparkSession, outDir: String, sliceId: Option[String]): DataFrame =
    sliceId match {
      case Some(id) if exists(spark, statePath(outDir, id)) =>
        spark.read.schema(convStateSchema).parquet(statePath(outDir, id))
      case _ =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], convStateSchema)
    }
}
