package graft

/** Dev probe (NOT part of the frozen driver contract): A/B the
  * committed-context strategy (`tails` vs `rescan`) at an arbitrary
  * slice-width/lookback shape — docs/NEXT lead 2: the `auto` rule
  * switches to tails only at lookback >= 2x slice, so shapes in the
  * 1-2x band (the driver bench: 10d slices, 7d lookback) re-stream
  * up to a full lookback of committed context through the sweep's
  * straggler task every slice under rescan.
  *
  * Mirrors the bench backfill exactly (same slice bounds, dispatch
  * and segment parameters as [[Bench.runBackfill]]) with the
  * strategy taken from SPARK_GRAFT_CONTEXT (tails|rescan|auto).
  * Env: SPARK_GRAFT_BRONZE_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_WORK_DIR, SPARK_GRAFT_REPS, SPARK_GRAFT_SLICE_SECS,
  * SPARK_GRAFT_SLICES.
  */
object CtxProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val strategy = sys.env.getOrElse("SPARK_GRAFT_CONTEXT", "auto")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val work = Bench.newWorkDir("graft_ctx_probe")
    val bronzeDir = sys.env.getOrElse("SPARK_GRAFT_BRONZE_DIR", s"$work/bronze")
    if (!graft.meta.Checkpoint.pathExists(spark, s"$bronzeDir/_SUCCESS")) {
      val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "300000").toLong
      Bench.writeBronze(spark, bronzeDir, n)
    }
    val bronze = spark.read.parquet(bronzeDir)

    def backfill(out: String): Seq[Backfill.SliceReport] =
      Backfill.run(spark, bronze, out,
        firstStartSec = 1704067200L,
        sliceSecs = sys.env.get("SPARK_GRAFT_SLICE_SECS").map(_.toLong).getOrElse(10L * 86400),
        nSlices = sys.env.get("SPARK_GRAFT_SLICES").map(_.toInt).getOrElse(4),
        skewHeavyThreshold = Some(10000000L),
        segmentSecs = 302400L,
        contextStrategy = strategy)

    def rm(d: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }

    // untimed warmup, same protocol as Bench/BackfillOnly
    val warm = Bench.newWorkDir("ctx_warm")
    graft.gen.TranscriptGen.transcripts(spark, 20000L, avgTurns = 30, megaConvs = 1, megaTurns = 60000)
      .repartition(16).write.mode("overwrite").parquet(s"$warm/bronze")
    Backfill.run(spark, spark.read.parquet(s"$warm/bronze"), s"$warm/out",
      1704067200L, 10L * 86400, 4, skewHeavyThreshold = Some(10000000L),
      segmentSecs = 302400L, contextStrategy = strategy)
    rm(warm)

    val walls = (1 to reps).map { i =>
      val out = Bench.newWorkDir("ctx_out")
      val t0 = System.nanoTime()
      val reports = backfill(out)
      val w = (System.nanoTime() - t0) / 1e9
      val rows = reports.map(_.rows).sum
      rm(out)
      println(f"[ctxprobe] $strategy%-7s run $i: $w%6.2f s  ($rows rows)")
      w
    }
    println(f"[ctxprobe] $strategy%-7s min ${walls.min}%.2f s  median ${walls.sorted.apply(reps / 2)}%.2f s")
    rm(work)
    spark.stop()
  }
}
