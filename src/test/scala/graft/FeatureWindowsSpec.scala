package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.gold.FeatureWindows
import graft.guard.LeakageGuard
import graft.silver.SilverBuilder

class FeatureWindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val silver =
    SilverBuilder.build(TranscriptGen.transcripts(spark, nConvs = 40, avgTurns = 25)).cache()

  test("range features match the O(n^2) self-join oracle") {
    val got = FeatureWindows.rangeFeatures(silver)
      .select("conv_id", "turn_idx", "turns_cnt_1h", "chars_sum_1h", "tool_distinct_24h", "avg_chars_7d")
    // brute-force oracle: join every row with all frame-mates
    val l = silver.select(col("conv_id"), col("turn_idx"), unix_timestamp(col("ts")).as("t"))
    val r = silver.select(col("conv_id").as("c2"), unix_timestamp(col("ts")).as("t2"),
      col("tool").as("tool2"), length(col("text")).cast("long").as("len2"))
    val exp = l.join(r, col("conv_id") === col("c2") && col("t2") >= col("t") - 604800 && col("t2") <= col("t"))
      .groupBy("conv_id", "turn_idx", "t")
      .agg(
        sum(when(col("t2") >= col("t") - 3600, 1L).otherwise(0L)).as("turns_cnt_1h"),
        sum(when(col("t2") >= col("t") - 3600, col("len2")).otherwise(0L)).as("chars_sum_1h"),
        size(array_distinct(collect_list(when(col("t2") >= col("t") - 86400, col("tool2"))))).as("tool_distinct_24h"),
        avg(col("len2")).as("avg_chars_7d"))
      .drop("t")
    val joined = got.as("g").join(exp.as("e"), Seq("conv_id", "turn_idx"))
    val bad = joined.filter(
      col("g.turns_cnt_1h") =!= col("e.turns_cnt_1h") ||
        col("g.chars_sum_1h") =!= col("e.chars_sum_1h") ||
        col("g.tool_distinct_24h") =!= col("e.tool_distinct_24h") ||
        abs(col("g.avg_chars_7d") - col("e.avg_chars_7d")) > 1e-9)
    assert(bad.count() == 0)
    assert(got.count() == silver.count())
  }

  test("no temporal leakage: features at ts<=T identical on truncated input (D5 guard)") {
    val cut = silver.selectExpr("percentile_approx(unix_timestamp(ts), 0.6)").first().getLong(0)
    val full = FeatureWindows.gold(silver).filter(unix_timestamp(col("ts")) <= cut)
    val trunc = FeatureWindows.gold(silver.filter(unix_timestamp(col("ts")) <= cut))
    assert(full.exceptAll(trunc).count() == 0 && trunc.exceptAll(full).count() == 0)
  }

  test("gold plan passes the static leakage guard") {
    LeakageGuard.validate(FeatureWindows.gold(silver))
  }

  test("sessionization edge cases: gap == threshold stays in session, first turn opens session 1") {
    import spark.implicits._
    val ts0 = 1704067200L
    val rows = Seq(
      ("c1", 0, ts0), ("c1", 1, ts0 + 1800), // gap exactly 1800 -> same session
      ("c1", 2, ts0 + 1800 + 1801), // gap 1801 -> new session
      ("c2", 0, ts0) // single-turn conversation
    ).toDF("conv_id", "turn_idx", "tsec")
      .select(col("conv_id"), col("turn_idx"), lit("user").as("role"),
        lit("x").as("text"), lit(null).cast("string").as("tool"),
        timestamp_seconds(col("tsec")).as("ts"))
    val got = FeatureWindows.sessionize(FeatureWindows.lagFeatures(rows))
      .select("conv_id", "turn_idx", "session_id").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("c1", 0, 1), ("c1", 1, 1), ("c1", 2, 2), ("c2", 0, 1)))
  }

  test("single exchange: bronze->silver->gold plans exactly one shuffle") {
    // cut the generator's own lineage so only the pipeline's plan counts
    val bronze = TranscriptGen.transcripts(spark, nConvs = 5, avgTurns = 5).localCheckpoint(true)
    val plan = FeatureWindows.gold(SilverBuilder.build(bronze))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }
}
