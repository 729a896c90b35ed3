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
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
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
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
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
}
