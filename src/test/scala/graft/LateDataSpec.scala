package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.gold.FeatureWindows
import graft.silver.SilverBuilder

/** Late-data queue semantics (SURVEY §2.10): rows whose ts lands in an
  * already-committed slice route to `<out>/_late` instead of silently
  * vanishing; reprocessing invalidates the affected slices and
  * converges to the single-shot result on the full input.
  */
class LateDataSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val start = 1704067200L
  private val sliceSecs = 8L * 86400
  private val nSlices = 5

  private def rows(tuples: Seq[(String, Int, String, String, Option[String], Long)]): DataFrame = {
    import spark.implicits._
    tuples.toDF("conv_id", "turn_idx", "role", "text", "tool_s", "sec")
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool_s").as("tool"), timestamp_seconds(col("sec")).as("ts"))
  }

  private val goldCols = Seq(
    "conv_id", "turn_idx", "role", "text", "tool", "ts", "dt",
    "turns_cnt_1h", "tool_calls_1h", "chars_sum_1h", "tool_distinct_24h", "avg_chars_7d",
    "prev_role", "gap_secs", "session_id")

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val (ga, gb) = (a.select(goldCols.map(col): _*), b.select(goldCols.map(col): _*))
    assert(ga.count() == gb.count())
    assert(ga.exceptAll(gb).count() == 0 && gb.exceptAll(ga).count() == 0)
  }

  test("collect routes genuinely-missing turns to _late; re-sends of committed turns are not late") {
    // the full input obeys the transcript contract; one real turn is
    // withheld from the first ingest and arrives late
    val full = TranscriptGen.transcripts(spark, nConvs = 10, avgTurns = 12).cache()
    val probe = full.filter(col("turn_idx") === 3).select("conv_id", "ts").head()
    val conv = probe.getString(0)
    val missing = col("conv_id") === conv && col("turn_idx") === 3
    val base = full.filter(!missing).cache()
    val dir = Files.createTempDirectory("late_collect").toString
    Backfill.run(spark, base, dir, start, sliceSecs, nSlices)

    // second ingest: the missing turn is back, plus a re-send variant
    // of a committed turn (must NOT queue — watermark dedup semantics)
    val resend = rows(Seq((conv, 1, "assistant", "resend variant", None, start + 600)))
    val bronze2 = full.unionByName(resend)

    val n = Backfill.collectLate(spark, bronze2, dir, start, sliceSecs)
    assert(n == 1L, s"expected exactly the missing turn queued, got $n")
    val late = spark.read.parquet(s"$dir/_late")
    assert(late.head().getAs[Int]("turn_idx") == 3)
    assert(late.head().getAs[String]("conv_id") == conv)
  }

  test("reprocess converges to the single-shot result and clears the queue") {
    // withhold a real turn whose ts lands in slice 2; slices >= 2 must
    // be recomputed on reprocess, slice 1 stays committed
    val full = TranscriptGen.transcripts(spark, nConvs = 10, avgTurns = 12).cache()
    val inSlice2 = col("ts") >= timestamp_seconds(lit(start + sliceSecs)) &&
      col("ts") < timestamp_seconds(lit(start + 2 * sliceSecs))
    val probe = full.filter(inSlice2 && col("turn_idx") >= 2)
      .orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx").head()
    val (conv, turn) = (probe.getString(0), probe.getInt(1))
    val missing = col("conv_id") === conv && col("turn_idx") === turn
    val base = full.filter(!missing).cache()
    val dir = Files.createTempDirectory("late_repro").toString
    Backfill.run(spark, base, dir, start, sliceSecs, nSlices)
    val bronze2 = full

    assert(Backfill.collectLate(spark, bronze2, dir, start, sliceSecs) == 1L)
    val reports = Backfill.reprocessLate(spark, bronze2, dir, start, sliceSecs, nSlices)
    // slice 1 skipped (still committed), the rest re-ran
    assert(reports.head.skipped && reports.count(!_.skipped) == nSlices - 1)
    assert(spark.read.parquet(s"$dir/gold")
      .filter(col("conv_id") === conv && col("turn_idx") === turn).count() == 1)
    assertSame(spark.read.parquet(s"$dir/gold"),
      FeatureWindows.gold(SilverBuilder.build(bronze2)))
    assert(!graft.meta.Checkpoint.pathExists(spark, s"$dir/_late"))
    // steady state: nothing late, nothing to re-run
    assert(Backfill.collectLate(spark, bronze2, dir, start, sliceSecs) == 0L)
    assert(Backfill.run(spark, bronze2, dir, start, sliceSecs, nSlices).forall(_.skipped))
  }
}
