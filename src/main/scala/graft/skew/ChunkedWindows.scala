package graft.skew

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gold.FeatureWindows

/** Skew lever for window-over-partition (north rule: "range-partitions
  * by conv_id with salting for skewed mega-conversations").
  *
  * AQE cannot split a skewed window partition (it only splits joins and
  * aggregates), so a single 10^8-turn conversation would serialize on
  * one task under the plain plan. This implements the
  * segment-with-context scheme (SURVEY.md §4.2.3): salt each row by its
  * time segment `seg = floor(unix_ts / segmentSecs)`, replicate each
  * row into the following `ceil(maxLookback / segmentSecs)` segments as
  * *context*, window over (conv_id, seg), and keep only each segment's
  * *owner* rows. Because every trailing frame of an owner row lies
  * entirely within [segStart - maxLookback, ts], the result is EXACT
  * for every frame aggregate — count, sum, avg, and collect_set alike —
  * at the cost of a bounded replication factor
  * (1 + maxLookback/segmentSecs; = 2x at segmentSecs = maxLookback).
  *
  * Equivalence to the plain path is property-tested
  * (ChunkedWindowsSpec). Parallelism for a conversation spanning T
  * seconds becomes T / segmentSecs tasks instead of 1.
  */
object ChunkedWindows {

  /** Exact range features via time-segment salting. Any `segmentSecs`
    * works (context reaches back ceil(maxLookback/segmentSecs)
    * segments); smaller segments buy more parallelism at a higher
    * replication factor.
    */
  def rangeFeaturesChunked(
      silver: DataFrame,
      segmentSecs: Long = 604800L,
      maxLookbackSecs: Long = 604800L): DataFrame = {
    require(segmentSecs > 0 && maxLookbackSecs > 0)
    val reach = ((maxLookbackSecs + segmentSecs - 1) / segmentSecs).toInt
    val ownerSeg = floor(unix_timestamp(col("ts")) / segmentSecs).cast("long")

    val replicated = silver
      .withColumn("_owner_seg", ownerSeg)
      .withColumn("_seg", explode(sequence(col("_owner_seg"), col("_owner_seg") + reach)))

    // Same frames as FeatureWindows.rangeFeatures, but partitioned by
    // (conv_id, _seg) — the salt splits mega-conversations across tasks.
    val tsSec = unix_timestamp(col("ts"))
    def w(n: Long) =
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("conv_id"), col("_seg"))
        .orderBy(tsSec)
        .rangeBetween(-n, 0)

    replicated
      .withColumn("turns_cnt_1h", count(lit(1)).over(w(3600L)))
      .withColumn("tool_calls_1h", count(col("tool")).over(w(3600L)))
      .withColumn("chars_sum_1h", sum(length(col("text")).cast("long")).over(w(3600L)))
      .withColumn("tool_distinct_24h", size(collect_set(col("tool")).over(w(86400L))))
      .withColumn("avg_chars_7d", avg(length(col("text"))).over(w(604800L)))
      .filter(col("_seg") === col("_owner_seg"))
      .drop("_seg", "_owner_seg")
  }

  /** Heavy-hitter dispatch: conversations with more than
    * `heavyThreshold` turns take the chunked path, the rest the plain
    * single-sort path; results are unioned. The heavy-key set is tiny
    * by construction (it is the skew tail) and is broadcast.
    */
  def rangeFeaturesAuto(
      silver: DataFrame,
      heavyThreshold: Long = 2000000L,
      segmentSecs: Long = 604800L): DataFrame = {
    val heavyKeys = silver
      .groupBy(col("conv_id")).count()
      .filter(col("count") > heavyThreshold)
      .select(col("conv_id"))
    val light = silver.join(broadcast(heavyKeys), Seq("conv_id"), "left_anti")
    val heavy = silver.join(broadcast(heavyKeys), Seq("conv_id"), "left_semi")
    FeatureWindows
      .rangeFeatures(light)
      .unionByName(rangeFeaturesChunked(heavy, segmentSecs))
  }
}
