package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.FeatureWindows

/** Error-bound property for the W3 approx_count_distinct escape hatch:
  * on a conversation with HIGH distinct-tool cardinality, the HLL
  * estimate of tool_distinct_24h stays within a few standard errors of
  * the exact count at every row, and the dispatch routes only
  * high-cardinality conversations onto it.
  */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // one dense conversation: 5000 turns, 10 s apart (all inside 24 h
  // windows early on), EVERY turn a distinct tool — the regime where
  // exact per-frame distinct state grows without bound
  private lazy val dense = spark.range(5000).select(
    lit("conv_hot").as("conv_id"),
    col("id").cast("int").as("turn_idx"),
    lit("tool").as("role"),
    concat(lit("call "), col("id")).as("text"),
    concat(lit("tool_"), col("id")).as("tool"),
    timestamp_seconds(lit(1704067200L) + col("id") * 10L).as("ts")).cache()

  test("HLL tool_distinct_24h within 3*rsd of exact at every row") {
    val rsd = 0.05
    val exact = FeatureWindows.rangeFeatures(dense)
      .select(col("turn_idx"), col("tool_distinct_24h").as("exact"))
    val approx = FeatureWindows.rangeFeaturesApproxDistinct(dense, rsd)
      .select(col("turn_idx"), col("tool_distinct_24h").as("approx"))
    val joined = exact.join(approx, "turn_idx")
      .withColumn("rel_err", abs(col("approx") - col("exact")) / greatest(col("exact"), lit(1)))
    val worst = joined.agg(max("rel_err")).head().getDouble(0)
    assert(worst <= 3 * rsd, s"worst relative error $worst > ${3 * rsd}")
  }

  test("dispatch: low-cardinality conversations stay exact, hot ones take HLL") {
    val normal = spark.range(50).select(
      lit("conv_cold").as("conv_id"),
      col("id").cast("int").as("turn_idx"),
      lit("tool").as("role"),
      lit("x").as("text"),
      concat(lit("tool_"), pmod(col("id"), lit(3))).as("tool"),
      timestamp_seconds(lit(1704067200L) + col("id") * 10L).as("ts"))
    val both = dense.unionByName(normal)
    val out = FeatureWindows.rangeFeaturesAutoApprox(both, cardinalityThreshold = 100L)
    // cold conversation result must be bit-identical to the exact path
    val coldGot = out.filter(col("conv_id") === "conv_cold")
      .select("turn_idx", "tool_distinct_24h")
    val coldExact = FeatureWindows.rangeFeatures(normal)
      .select("turn_idx", "tool_distinct_24h")
    assert(coldGot.exceptAll(coldExact).count() == 0 &&
      coldExact.exceptAll(coldGot).count() == 0)
    assert(out.count() == both.count())
  }
}
