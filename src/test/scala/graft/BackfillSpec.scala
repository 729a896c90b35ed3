package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.gold.FeatureWindows
import graft.meta.Checkpoint
import graft.silver.SilverBuilder

/** Checkpoint/resume properties (FIXTURES.md §5): sliced backfill ==
  * single-shot run; kill-and-resume == single-shot; lineage has exactly
  * one committed row set per slice.
  */
class BackfillSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ~4 slices of 8 days over a 30-day generator span; 7d lookback
  // guarantees cross-slice window context is exercised
  private val start = 1704067200L
  private val sliceSecs = 8L * 86400
  private val nSlices = 5

  private lazy val bronze = TranscriptGen.transcripts(
    spark, nConvs = 30, avgTurns = 20, injectAnomalies = true).cache()

  private lazy val singleShot: DataFrame =
    FeatureWindows.gold(SilverBuilder.build(bronze)).cache()

  private def goldCols(df: DataFrame) = df.select(
    col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"), col("dt"),
    col("turns_cnt_1h"), col("tool_calls_1h"), col("chars_sum_1h"),
    col("tool_distinct_24h"), col("avg_chars_7d"),
    col("prev_role"), col("gap_secs"), col("session_id"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val (ga, gb) = (goldCols(a), goldCols(b))
    assert(ga.count() == gb.count())
    assert(ga.exceptAll(gb).count() == 0 && gb.exceptAll(ga).count() == 0)
  }

  test("sliced backfill output == single-shot run (D5 fix, cross-slice state)") {
    val dir = Files.createTempDirectory("bf_sliced").toString
    val reports = Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    assert(reports.count(!_.skipped) == nSlices)
    val gold = spark.read.parquet(s"$dir/gold")
    assertSame(gold, singleShot)
  }

  test("kill mid-backfill (after gold write, before commit), resume -> identical result") {
    val dir = Files.createTempDirectory("bf_resume").toString
    val failAt = Backfill.sliceId(start + 2 * sliceSecs)
    val ex = intercept[RuntimeException] {
      Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices,
        failAfterGoldWriteOfSlice = Some(failAt))
    }
    assert(ex.getMessage.contains("injected failure"))
    // only slices before the failure are committed
    val committed = Checkpoint.committedSlices(spark, dir)
    assert(committed == Set(Backfill.sliceId(start), Backfill.sliceId(start + sliceSecs)))
    // resume: re-runs the failed slice (its half-written gold is
    // idempotently overwritten) and the rest
    val reports = Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    assert(reports.count(_.skipped) == 2 && reports.count(!_.skipped) == 3)
    assertSame(spark.read.parquet(s"$dir/gold"), singleShot)
  }

  test("skew dispatch + state compaction: sliced == single-shot with a planted mega-conversation") {
    val megaBronze = TranscriptGen.transcripts(
      spark, nConvs = 20, avgTurns = 15, megaConvs = 2, megaTurns = 2000,
      injectAnomalies = true).cache()
    val oracle = FeatureWindows.gold(SilverBuilder.build(megaBronze))
    val dir = Files.createTempDirectory("bf_skew").toString
    // threshold 300 forces both mega-conversations onto the segmented
    // heavy path; compact every 2 slices exercises snapshot + delta reads
    Backfill.run(spark, megaBronze, dir, start, sliceSecs, nSlices,
      skewHeavyThreshold = Some(300L), compactStateEvery = 2, segmentSecs = 2L * 86400)
    assertSame(spark.read.parquet(s"$dir/gold"), oracle)
    // resume after a kill must read state through the snapshot + deltas
    val dir2 = Files.createTempDirectory("bf_skew_resume").toString
    val failAt = Backfill.sliceId(start + 3 * sliceSecs)
    intercept[RuntimeException] {
      Backfill.run(spark, megaBronze, dir2, start, sliceSecs, nSlices,
        skewHeavyThreshold = Some(300L), compactStateEvery = 2,
        segmentSecs = 2L * 86400, failAfterGoldWriteOfSlice = Some(failAt))
    }
    Backfill.run(spark, megaBronze, dir2, start, sliceSecs, nSlices,
      skewHeavyThreshold = Some(300L), compactStateEvery = 2, segmentSecs = 2L * 86400)
    assertSame(spark.read.parquet(s"$dir2/gold"), oracle)
  }

  test("adaptive compaction: chain longer than 4 deltas snapshots even with periodic off") {
    // 2-day slices over the full span -> ~20 slices; compactStateEvery=0
    // disables the periodic trigger, so any snapshot present proves the
    // adaptive chain-length trigger fired
    val dir = Files.createTempDirectory("bf_adaptive").toString
    Backfill.run(spark, bronze, dir, start, 2L * 86400, 20, compactStateEvery = 0)
    val snapDir = new org.apache.hadoop.fs.Path(s"$dir/_meta/conv_state_snapshot")
    val fs = snapDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(snapDir) && fs.listStatus(snapDir).nonEmpty,
      "expected the adaptive trigger to write a state snapshot")
    // and the chain a reader traverses stays bounded at <= 4 + current
    val lastStart = start + 19 * 2L * 86400
    assert(graft.meta.Checkpoint.uncompactedDeltaDirs(spark, dir, lastStart + 1) <= 5)
    assertSame(spark.read.parquet(s"$dir/gold"), singleShot)
  }

  test("empty-slice fast path: sparse backfill commits zero-row watermarks and clears stale dirs") {
    // bronze restricted to slice 0 — slices 1..4 are empty
    val sparse = bronze.filter(
      col("ts") < timestamp_seconds(lit(start + sliceSecs))).cache()
    val dir = Files.createTempDirectory("bf_sparse").toString
    val full = Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    assert(full.forall(!_.skipped) && full.head.rows > 0 && full.tail.exists(_.rows > 0))
    // drop everything after slice 0 and re-run on the sparse bronze:
    // slice 1 pays the full (empty) pipeline once, slices 2..4 take
    // the probe fast path — and every stale dir from the full run must
    // be gone so gold equals the sparse single-shot
    Checkpoint.invalidateFrom(spark, dir, start + sliceSecs)
    val rerun = Backfill.run(spark, sparse, dir, start, sliceSecs, nSlices)
    assert(rerun.count(_.skipped) == 1 && rerun.filter(!_.skipped).forall(_.rows == 0))
    assertSame(spark.read.parquet(s"$dir/gold"),
      FeatureWindows.gold(SilverBuilder.build(sparse)))
    // empty slices contribute no state-delta dirs
    val stateDir = new org.apache.hadoop.fs.Path(s"$dir/_meta/conv_state")
    val fs = stateDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(stateDir).map(_.getPath.getName).filter(_.startsWith("slice_start="))
    assert(dirs.forall(_ == s"slice_start=$start"), dirs.mkString(","))
    // and a resume over the sparse table is a no-op (zero-row slices committed)
    assert(Backfill.run(spark, sparse, dir, start, sliceSecs, nSlices).forall(_.skipped))
  }

  test("gold file count per slice is bounded by data size, not core count") {
    // simulate a big cluster: 64 shuffle partitions would give the
    // legacy 8x exchange 512 files per slice regardless of data size;
    // the size-targeted exchange writes ~bytes/8MB files (here: ~1)
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val dir = Files.createTempDirectory("bf_filecount").toString
      Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
      val goldDir = new org.apache.hadoop.fs.Path(s"$dir/gold")
      val fs = goldDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(goldDir).filter(_.getPath.getName.startsWith("slice_id=")).foreach { d =>
        val files = fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
        assert(files <= 8, s"${d.getPath.getName}: $files files for a ~kB slice")
      }
      assertSame(spark.read.parquet(s"$dir/gold"), singleShot)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("lineage content_hash is comparable across the observe and file-based fallback paths") {
    val dir = Files.createTempDirectory("bf_hashpar").toString
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    val lin = Checkpoint.readLineage(spark, dir) // observe-fused hashes
    val id = Backfill.sliceId(start)
    val goldWritten = spark.read.parquet(s"$dir/gold").filter(col("slice_id") === id)
    val alt = Files.createTempDirectory("bf_hashpar_alt").toString
    Checkpoint.appendLineage(alt, goldWritten, id, 1L) // legacy aggregate over the files
    val altLin = Checkpoint.readLineage(spark, alt)
    val obs = lin.filter(col("slice_id") === id)
      .select("dt", "row_count", "content_hash").collect().map(_.toSeq).toSet
    val fb = altLin.select("dt", "row_count", "content_hash").collect().map(_.toSeq).toSet
    assert(obs.nonEmpty && obs == fb, s"observe=$obs fallback=$fb")
  }

  test("lineage: per-(slice, dt) rows with counts, hashes, throughput; watermarks committed") {
    val dir = Files.createTempDirectory("bf_lineage").toString
    Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    val lin = Checkpoint.readLineage(spark, dir)
    assert(lin.columns.toSet == Set("dt", "row_count", "content_hash", "slice_id", "wall_ms", "rows_per_sec"))
    assert(lin.groupBy("slice_id", "dt").count().filter(col("count") > 1).count() == 0)
    assert(lin.agg(sum("row_count")).collect()(0).getLong(0) == singleShot.count())
    val wm = Checkpoint.readWatermarks(spark, dir)
    assert(wm.filter(col("status") === "committed").select("slice_id").distinct().count() == nSlices)
    // re-run is a no-op (all skipped)
    val again = Backfill.run(spark, bronze, dir, start, sliceSecs, nSlices)
    assert(again.forall(_.skipped))
  }
}
