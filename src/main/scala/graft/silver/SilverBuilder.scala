package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bronze → silver promotion: validity filters, deterministic dedup,
  * stable (conv_id, turn_idx) ordering, real `dt` partition column.
  *
  * Reference: spark_jobs/silver_and_gold.py:45-79, with defects
  * corrected (SURVEY.md §2.1):
  *   - D4: `dropDuplicates(["event_id"])` keeps an arbitrary row; ours
  *     keeps the deterministic minimum of (ts, role, tool, text) per
  *     (conv_id, turn_idx) — stable under any partition layout.
  *   - D2: `dt` is derived as a real column before partitionBy.
  *   - D7: no wall-clock `processed_at`; batch ids are parameters.
  *
  * Scale note: dedup is expressed as a window over `conv_id` alone
  * (ordered by turn_idx + tiebreak), NOT over (conv_id, turn_idx).
  * Result is identical, but the exchange hash-partitions by conv_id —
  * the same partitioning every downstream gold window needs — so
  * bronze→silver→gold plans exactly ONE shuffle.
  */
object SilverBuilder {

  /** Validity filters (reference F2/F3, silver_and_gold.py:63-65). */
  def validate(bronze: DataFrame): DataFrame =
    bronze.filter(
      col("conv_id").isNotNull && col("turn_idx").isNotNull &&
        col("ts").isNotNull && col("role").isNotNull && col("text").isNotNull)

  /** Deterministic dedup: keep the row with min (ts, role, tool, text)
    * per (conv_id, turn_idx). Nulls in `tool` are normalized with
    * coalesce so ordering is engine-agnostic (Spark sorts nulls first,
    * DuckDB last).
    */
  def dedup(validated: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("conv_id"))
      .orderBy(col("turn_idx"), col("ts"), col("role"), coalesce(col("tool"), lit("")), col("text"))
    validated
      .withColumn("_prev_turn", lag(col("turn_idx"), 1).over(w))
      .filter(col("_prev_turn").isNull || col("_prev_turn") =!= col("turn_idx"))
      .drop("_prev_turn")
  }

  /** Full bronze → silver: validate, dedup, derive `dt`. */
  def build(bronze: DataFrame): DataFrame =
    dedup(validate(bronze)).withColumn("dt", to_date(col("ts")))

  /** Write silver with the scale layout: range-partitioned by conv_id,
    * sorted within partitions by (conv_id, turn_idx) — the "stable
    * ordering" invariant plus near-local downstream shuffles and good
    * RLE/dictionary compression of conv_id.
    */
  def write(silver: DataFrame, path: String, rangePartitions: Option[Int] = None): Unit = {
    val laid = rangePartitions match {
      case Some(n) => silver.repartitionByRange(n, col("conv_id"))
      case None    => silver.repartitionByRange(col("conv_id"))
    }
    laid
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .write.mode("overwrite")
      .partitionBy("dt")
      .parquet(path)
  }
}
