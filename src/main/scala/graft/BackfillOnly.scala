package graft

/** Dev A/B harness: repeated backfills over a persistent bronze table
  * at SPARK_GRAFT_CPUS parallelism — phase-level scaling forensics
  * (pair with SPARK_GRAFT_PHASE_LOG=1).
  */
object BackfillOnly {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val bronzeDir = sys.env.getOrElse("SPARK_GRAFT_BRONZE_DIR", "/dev/shm/graft/bronze")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    if (!graft.meta.Checkpoint.pathExists(spark, s"$bronzeDir/_SUCCESS")) {
      val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "300000").toLong
      Bench.writeBronze(spark, bronzeDir, n)
    }
    val warm = Bench.newWorkDir("ab_warm")
    graft.gen.TranscriptGen.transcripts(spark, 20000L, avgTurns = 30, megaConvs = 1, megaTurns = 60000)
      .repartition(16).write.mode("overwrite").parquet(s"$warm/bronze")
    Bench.runBackfill(spark, s"$warm/bronze", s"$warm/out")
    def rm(d: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    rm(warm)
    // job-level accounting: wall spent INSIDE Spark jobs vs outside
    // (planning, driver logic, FS ops) — the outside share is the
    // per-run fixed cost that caps N->4N scaling
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStarts.put(js.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStarts.remove(je.jobId)).foreach(t0 =>
          jobNanos.addAndGet(System.nanoTime() - t0))
        ()
      }
    })

    val walls = (1 to reps).map { i =>
      val out = Bench.newWorkDir("ab_out")
      jobNanos.set(0L)
      val t0 = System.nanoTime()
      Bench.runBackfill(spark, bronzeDir, out)
      val w = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat
      Thread.sleep(300)
      println(f"[ab] jobs: ${jobNanos.get() / 1e9}%.2f s in-job, ${w - jobNanos.get() / 1e9}%.2f s outside")
      val t1 = System.nanoTime()
      val asofRows = Bench.runAsOf(spark, out)
      val asofW = (System.nanoTime() - t1) / 1e9
      // SPARK_GRAFT_KEEP_OUT=1 keeps the last run's output (e.g. to
      // inspect the lineage table afterwards)
      if (!sys.env.get("SPARK_GRAFT_KEEP_OUT").contains("1")) rm(out)
      else println(s"[ab] kept output: $out")
      println(f"[ab] run $i: $w%.2f s  (asof $asofW%.2f s, $asofRows rows)")
      w
    }
    println(f"[ab] min: ${walls.min}%.2f s  median: ${walls.sorted.apply(reps / 2)}%.2f s")
    spark.stop()
  }
}
