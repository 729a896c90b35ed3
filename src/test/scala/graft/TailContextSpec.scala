package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.gold.FeatureWindows
import graft.meta.Checkpoint
import graft.silver.SilverBuilder

/** Round-3 backfill behaviors: frame-tail context (light path reads no
  * raw silver), ts-inversion catch-and-reroute, horizon-free
  * committed-turn dedup, and tail-read partition pruning.
  */
class TailContextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val start = 1704067200L
  private val sliceSecs = 8L * 86400
  private val nSlices = 5

  private val goldCols = Seq(
    "conv_id", "turn_idx", "role", "text", "tool", "ts", "dt",
    "turns_cnt_1h", "tool_calls_1h", "chars_sum_1h", "tool_distinct_24h", "avg_chars_7d",
    "prev_role", "gap_secs", "session_id")

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val (ga, gb) = (a.select(goldCols.map(col): _*), b.select(goldCols.map(col): _*))
    assert(ga.count() == gb.count())
    assert(ga.exceptAll(gb).count() == 0 && gb.exceptAll(ga).count() == 0)
  }

  private def rows(tuples: Seq[(String, Int, String, String, Option[String], Long)]): DataFrame =
    tuples.toDF("conv_id", "turn_idx", "role", "text", "tool_s", "sec")
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool_s").as("tool"), timestamp_seconds(col("sec")).as("ts"))

  test("ts-inverted conversation is caught and rerouted; backfill == single-shot declarative") {
    val base = TranscriptGen.transcripts(spark, nConvs = 15, avgTurns = 12)
    // inversion crossing hours AND a heavy-path segment boundary:
    // turn 2 jumps back below turn 1, turn 4 below turn 3
    val inv = rows(Seq(
      ("inv_a", 0, "user", "hello there", None, start + 1000),
      ("inv_a", 1, "assistant", "reply one", None, start + 90000),
      ("inv_a", 2, "tool", "late clock", Some("t1"), start + 2000),
      ("inv_a", 3, "user", "more text here", None, start + 95000),
      ("inv_a", 4, "assistant", "back again", Some("t2"), start + 94000),
      // second inverted conversation living in a LATER slice
      ("inv_b", 0, "user", "x y z", None, start + 2 * sliceSecs + 100),
      ("inv_b", 1, "user", "w", None, start + 2 * sliceSecs + 50)))
    val bronze = base.unionByName(inv).cache()
    val dir = Files.createTempDirectory("bf_inv").toString
    val reports = Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    assert(reports.count(!_.skipped) == nSlices)
    assertSame(spark.read.parquet(s"$dir/gold"),
      FeatureWindows.gold(SilverBuilder.build(bronze)))
  }

  test("re-send of a committed turn beyond the 7d frame lookback is dropped (horizon-free dedup)") {
    val conv = rows(Seq(
      ("re_a", 0, "user", "first", None, start + 100),
      ("re_a", 1, "assistant", "second", Some("t1"), start + 200),
      ("re_a", 2, "user", "third", None, start + 300),
      // turn 1 re-sent 20 days later (two slices + beyond lookback),
      // with a text variant that would win dedup if both were visible
      ("re_a", 1, "assistant", "AAAA variant", None, start + 20 * 86400)))
    val bronze = TranscriptGen.transcripts(spark, nConvs = 8, avgTurns = 10)
      .unionByName(conv).cache()
    val dir = Files.createTempDirectory("bf_resend").toString
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    val gold = spark.read.parquet(s"$dir/gold")
    // the committed original is the single-shot winner (min ts); the
    // re-send must not appear
    assert(gold.filter(col("conv_id") === "re_a" && col("turn_idx") === 1).count() == 1)
    assert(gold.filter(col("text") === "AAAA variant").count() == 0)
    assertSame(gold, FeatureWindows.gold(SilverBuilder.build(bronze)))
  }

  test("frame-tail read prunes slice_start partitions and carries sorted arrays") {
    val bronze = TranscriptGen.transcripts(spark, nConvs = 10, avgTurns = 15)
    val dir = Files.createTempDirectory("bf_tails").toString
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices, contextStrategy = "tails")
    val lastStart = start + (nSlices - 1) * sliceSecs
    val tails = Checkpoint.readFrameTails(spark, dir, lastStart, sliceSecs, 604800L)
    val plan = tails.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("slice_start"),
      s"expected slice_start partition pruning:\n$plan")
    // only the slices overlapping [lastStart - 7d, lastStart) are read
    val starts = tails.select("slice_start").distinct().as[Long].collect().toSet
    assert(starts.forall(s => s < lastStart && s > lastStart - 604800L - sliceSecs), starts.toString)
    // arrays are ts-sorted
    val unsorted = tails.filter(exists(
      zip_with(col("tail_ts"), slice(col("tail_ts"), 2, 100000),
        (a, b) => b < a), x => x)).count()
    assert(unsorted == 0)
  }

  test("light path consumes tails, not raw silver (context scan only for routed ids)") {
    val bronze = TranscriptGen.transcripts(spark, nConvs = 10, avgTurns = 15)
    val dir = Files.createTempDirectory("bf_noctx").toString
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices, contextStrategy = "tails")
    // the fused plan over (state, empty context, bronze, tails) must not
    // touch the silver table
    val deltas = Checkpoint.readConvStateDeltas(spark, dir, start + sliceSecs)
    val tails = Checkpoint.readFrameTails(spark, dir, start + sliceSecs, sliceSecs, 604800L)
    val slice2 = SilverBuilder.validate(bronze.filter(
      col("ts") >= timestamp_seconds(lit(start + sliceSecs)) &&
        col("ts") < timestamp_seconds(lit(start + 2 * sliceSecs))))
    // the sweep's own output crosses an RDD boundary that hides its
    // input plans, so assert on the two streams the sweep zips: the
    // big exchange must not touch silver, and the tail side-stream
    // must come from the slice-meta table
    import graft.gold.FusedSweep
    val unioned = FusedSweep.stateRows(deltas)
      .unionByName(FusedSweep.contextRows(Backfill.emptySilver(spark)))
      .unionByName(FusedSweep.bronzeRows(slice2))
      .repartition(col("conv_id"))
    val bigPlan = unioned.queryExecution.executedPlan.toString
    assert(!bigPlan.contains("/silver"), bigPlan.take(4000))
    val tailPlan = FusedSweep.tailStream(tails).queryExecution.executedPlan.toString
    assert(tailPlan.contains("conv_state") && !tailPlan.contains("/silver"),
      tailPlan.take(4000))
  }

  test("rescan and tails strategies are bit-equal to the single-shot run") {
    val bronze = TranscriptGen.transcripts(spark, nConvs = 25, avgTurns = 18,
      injectAnomalies = true).cache()
    val oracle = FeatureWindows.gold(SilverBuilder.build(bronze))
    for (strategy <- Seq("rescan", "tails")) {
      val dir = Files.createTempDirectory(s"bf_$strategy").toString
      Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices, contextStrategy = strategy)
      assertSame(spark.read.parquet(s"$dir/gold"), oracle)
    }
  }

  test("auto strategy picks rescan for wide slices: state deltas carry no tail arrays") {
    // 8-day slices vs 7-day lookback -> rescan; the state delta is the
    // narrow max_by aggregate with null tail columns
    val bronze = TranscriptGen.transcripts(spark, nConvs = 10, avgTurns = 15)
    val dir = Files.createTempDirectory("bf_auto").toString
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    assert(Checkpoint.readConvStateDeltas(spark, dir, start + nSlices * sliceSecs).count() > 0)
    assert(Checkpoint.readFrameTails(spark, dir, start + (nSlices - 1) * sliceSecs,
      sliceSecs, 604800L).count() == 0,
      "auto at lookback < 2x slice width must not materialize tails")
    // and narrow slices flip it: 2-day slices -> tails (20 slices
    // cover the same 40-day span as the 8-day runs)
    val dir2 = Files.createTempDirectory("bf_auto2").toString
    Backfill.run(spark, bronze, dir2, start, 2L * 86400, 20)
    assert(Checkpoint.readFrameTails(spark, dir2, start + 10 * 2L * 86400,
      2L * 86400, 604800L).count() > 0,
      "auto at lookback >= 2x slice width must materialize tails")
    assertSame(spark.read.parquet(s"$dir2/gold"),
      FeatureWindows.gold(SilverBuilder.build(bronze)))
  }

  test("strategy guard: tails resume over a rescan-written table fails loudly; safe switches pass") {
    val bronze = TranscriptGen.transcripts(spark, nConvs = 10, avgTurns = 15).cache()
    // rescan-written table (wide slices), extended under tails -> loud failure
    val dir = Files.createTempDirectory("bf_guard").toString
    Backfill.run(spark, bronze, dir, start, sliceSecs, 3, contextStrategy = "rescan")
    val ex = intercept[IllegalArgumentException] {
      Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices, contextStrategy = "tails")
    }
    assert(ex.getMessage.contains("rescan"), ex.getMessage)
    // same extension under rescan is fine
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices, contextStrategy = "rescan")
    // tails-written table resumed under tails: fine; then downgraded to
    // rescan (safe direction); a LATER tails resume of the mixed chain
    // is rejected — the rescan-era slices wrote no tails
    val dir2 = Files.createTempDirectory("bf_guard2").toString
    Backfill.run(spark, bronze, dir2, start, sliceSecs, 2, contextStrategy = "tails")
    Backfill.run(spark, bronze, dir2, start, sliceSecs, 3, contextStrategy = "tails")
    Backfill.run(spark, bronze, dir2, start, sliceSecs, 4, contextStrategy = "rescan")
    intercept[IllegalArgumentException] {
      Backfill.run(spark, bronze, dir2, start, sliceSecs, nSlices, contextStrategy = "tails")
    }
    // pre-props table (no _meta/table_props.json): the probe decides.
    // Simulate by deleting the props file from a tails-written table.
    val dir3 = Files.createTempDirectory("bf_guard3").toString
    Backfill.run(spark, bronze, dir3, start, 2L * 86400, 10, contextStrategy = "tails")
    val props = new org.apache.hadoop.fs.Path(s"$dir3/_meta/table_props.json")
    props.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(props, false)
    Backfill.run(spark, bronze, dir3, start, 2L * 86400, 20, contextStrategy = "tails")
    assertSame(spark.read.parquet(s"$dir3/gold"),
      FeatureWindows.gold(SilverBuilder.build(bronze)))
  }

  test("a conversation heavy in one slice returns to the light path with correct frames") {
    // per-slice dispatch: heavy_x brings > thr rows in slice 1 only
    // (700 > 500); at slice 2 just 400 of them remain inside the 7d
    // lookback (< 500), so it returns to the light path — whose frames
    // must still see those 400 committed events (tails are collected
    // for routed conversations too)
    val dense = (0 until 700).map { i =>
      val sec =
        if (i < 300) start + 3600L + i * 60L // first 6h: out of slice-2 lookback
        else start + 86400L + (i - 300) * 60L // day 2: inside slice-2 lookback
      ("heavy_x", i, if (i % 3 == 0) "user" else "assistant", s"turn number $i words",
        if (i % 7 == 0) Some(s"tool_${i % 4}") else None, sec)
    }
    val lightTail = (700 until 710).map(i =>
      ("heavy_x", i, "assistant", s"late turn $i", None, start + sliceSecs + 3600L + (i - 700) * 30L))
    val bronze = TranscriptGen.transcripts(spark, nConvs = 12, avgTurns = 10)
      .unionByName(rows(dense ++ lightTail)).cache()
    val oracle = FeatureWindows.gold(SilverBuilder.build(bronze))
    for (strategy <- Seq("tails", "rescan")) {
      val dir = Files.createTempDirectory(s"bf_exheavy_$strategy").toString
      Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices,
        skewHeavyThreshold = Some(500L), segmentSecs = 2L * 86400,
        contextStrategy = strategy)
      assertSame(spark.read.parquet(s"$dir/gold"), oracle)
    }
  }
}
