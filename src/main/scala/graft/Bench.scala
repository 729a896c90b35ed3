package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.gold.AsOfJoin

/** Benchmark main (driver contract): times every registered query
  * (min-of-3, per-query max published as `queries_max`) on
  * SPARK_GRAFT_SF_DIR, plus the two headline metrics from
  * BASELINE.json — gold-layer backfill throughput (turns/sec) over a
  * deterministic synthetic transcript table with planted
  * mega-conversations, and as-of join wall-time of feature queries vs
  * the full gold history. Prints ONE JSON line.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_CONVS (synthetic conversation count; turns ~= 2.9x
  * convs + mega tail).
  */
object Bench {

  /** Optional tmpfs working dir (e.g. /dev/shm/graft): removes shared-
    * disk IO noise from scaling measurements — shuffle spill and table
    * IO go to RAM, so N-vs-4N compares CPU parallelism, not disk luck.
    */
  def workBase: Option[String] = sys.env.get("SPARK_GRAFT_WORK_DIR")

  def newWorkDir(prefix: String): String = workBase match {
    case Some(base) =>
      val p = java.nio.file.Paths.get(base)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.createTempDirectory(p, prefix).toString
    case None => java.nio.file.Files.createTempDirectory(prefix).toString
  }

  def session(cpus: String): SparkSession = {
    val b = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // default 64 MB advisory size coalesces every shuffle to the SAME
    // task count at any core count, flattening N-vs-4N scaling; at
    // bench data sizes 8 MB keeps post-shuffle parallelism ~= cores
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // measured on this host: zstd (vs default lz4/snappy) costs ~10%
    // wall at both core counts with tmpfs-backed storage — bytes are
    // already DRAM here, so extra CPU buys nothing. On real
    // object-storage deployments zstd is the right default; keep the
    // bench on the stock codecs.
    //
    // commit algorithm v2: task-side renames — the v1 driver-side
    // commit is serial in the file count, which grows with cores
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    // bench tables are small-but-representative; shrink the split size
    // so scans parallelize across all cores (at real scale the default
    // 128 MB splits give the same effect for free)
    .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
    .config("spark.ui.enabled", "false")
    // dev forensics: SPARK_GRAFT_EVENT_LOG=<dir> dumps Spark event logs
    // for stage-level analysis of bench runs
    sys.env.get("SPARK_GRAFT_EVENT_LOG").foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      b.config("spark.eventLog.enabled", "true").config("spark.eventLog.dir", dir)
    }
    workBase.foreach(base => b.config("spark.local.dir", s"$base/spark-local"))
    b.getOrCreate()
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Write a deterministic synthetic bronze table; returns (path,
    * turns). Generation cost is excluded from the measured backfill.
    */
  def writeBronze(spark: SparkSession, dir: String, nConvs: Long): Long = {
    // 2M-turn planted megas: big enough that the segmented skew path
    // does real parallel work (a 100k-turn mega sat at the dispatch
    // threshold and its chunked machinery was pure fixed overhead)
    val bronze = TranscriptGen.transcripts(spark, nConvs,
      avgTurns = 30, megaConvs = 2, megaTurns = 2000000)
    // time-ranged files, like a real landed bronze layer (Firehose/
    // object-store ingest delivers by arrival time ~ event time): tight
    // per-file ts ranges let every slice scan skip ~3/4 of the table
    // via row-group stats instead of decoding all timestamps each slice
    bronze.repartitionByRange(64, col("ts"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).count()
  }

  /** The headline backfill: 4 slices of 10 days (span covers the
    * generator's 30-day stagger + conversation tails), skew dispatch on.
    * SPARK_GRAFT_SKEW_THRESHOLD / SPARK_GRAFT_SEGMENT_SECS are dev A/B
    * knobs (phase forensics); the committed defaults are the benched
    * configuration.
    */
  def runBackfill(spark: SparkSession, bronzeDir: String, outDir: String): Seq[Backfill.SliceReport] =
    Backfill.run(spark, spark.read.parquet(bronzeDir), outDir,
      firstStartSec = 1704067200L,
      sliceSecs = sys.env.get("SPARK_GRAFT_SLICE_SECS").map(_.toLong).getOrElse(10L * 86400),
      nSlices = sys.env.get("SPARK_GRAFT_SLICES").map(_.toInt).getOrElse(4),
      // per-slice dispatch threshold at the measured crossover
      // (SkewProbe, 2x-lookback segments, final round-4 engine):
      // plain sweep vs segmented heavy path = 9.9/16.6 s at 1M
      // turns-per-slice, 19.3/21.0 at 4M, 79.7/53.0 at 16M — the
      // segmented form pays in the high single-digit millions, same
      // crossover regime as the as-of dispatch. The 2M-turn planted
      // megas bring ~600-860k turns per 10-day slice and stay on the
      // plain sweep, whose 8x over-partitioning bounds their
      // straggler at the conversation's own rows.
      skewHeavyThreshold = sys.env.get("SPARK_GRAFT_SKEW_THRESHOLD") match {
        case Some("off") => None
        case Some(v) => Some(v.toLong)
        case None => Some(10000000L)
      },
      // 3.5-day segments: a routed mega runs ~6 parallel tasks per
      // slice in the chunked sweep/session stages (7d segments gave 2)
      // at a bounded 3x replication of heavy rows
      segmentSecs = sys.env.get("SPARK_GRAFT_SEGMENT_SECS").map(_.toLong).getOrElse(302400L))

  /** As-of benchmark: one query per 10th turn at ts+60s vs the full
    * gold history, through the PRODUCTION dispatching entry point
    * ([[AsOfJoin.asOfAuto]]). Per-conversation sizes come from the
    * backfill's checkpoint state (st_last_turn_idx + 1 = history
    * rows), so the dispatch reads O(conversations) metadata instead
    * of re-counting the history: a 2M-turn mega stays on the plain
    * union+window form (a single ~0.5 s running-`last` task — the
    * measured crossover to the segmented form is ~10^7 turns per
    * conversation).
    */
  def runAsOf(spark: SparkSession, outDir: String): Long = {
    val gold = spark.read.parquet(s"$outDir/gold").drop("slice_id")
    val queries = gold.filter(pmod(col("turn_idx"), lit(10)) === 3)
      .select(col("conv_id"), (col("ts") + expr("INTERVAL 60 SECONDS")).as("ts"))
    // filter-first sizes: turn ordinals only grow, so ANY delta row
    // above the threshold marks a heavy conversation — no
    // latest-per-conv aggregate needed, just a pushed narrow filter
    // over the O(convs x chain) state rows
    val sizes = graft.meta.Checkpoint.readConvStateDeltas(spark, outDir, Long.MaxValue)
      .select(col("conv_id"), (col("st_last_turn_idx") + 1L).as("count"))
    AsOfJoin.asOfAuto(queries, gold,
      Seq("turn_idx", "turns_cnt_1h", "chars_sum_1h", "tool_distinct_24h", "session_id"),
      convSizes = Some(sizes)).count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "300000").toLong
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // Untimed warmup pass at the smallest sf: JIT + codegen compilation
    // are one-time JVM costs that otherwise land entirely on whichever
    // query runs first (q10 measured ~2 s steady-state but ~9 s as the
    // session's first job). ScalingBench already excludes warmup from
    // its backfill timings; this applies the same protocol per query
    // shape. Caches are cleared so no warmup data feeds a timed run.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != "none") {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }

    // registered operator queries on the driver's tables, MIN-OF-3
    // each (round-4 drivers' single-run numbers showed +36..77% on
    // untouched code — host contention; the minimum of three
    // interleaved runs is the engine's number, and the per-query max
    // is published alongside so a hot run is visible as variance, not
    // a regression). Caches are cleared between runs so ops that
    // persist intermediates (dedup shingle sets) can't subsidize a
    // later run's number — each of the three runs is a cold pass.
    val maxes = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val (_, secs) = time {
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); -1L }
        }
        spark.catalog.clearCache()
        secs
      }
      results(name) = times.min
      maxes(name) = times.max
    }

    // headline: synthetic backfill throughput + as-of wall time.
    // Untimed warmup backfill on a tiny input first — the same
    // protocol ScalingBench uses (JIT + codegen compilation of the
    // sweep/write paths are one-time JVM costs, not engine throughput).
    val work = newWorkDir("graft_bench")
    if (warmDir != "none") {
      TranscriptGen.transcripts(spark, 20000L, avgTurns = 30, megaConvs = 1, megaTurns = 60000)
        .repartition(16).write.mode("overwrite").parquet(s"$work/warm_bronze")
      runBackfill(spark, s"$work/warm_bronze", s"$work/warm_out")
      runAsOf(spark, s"$work/warm_out")
    }
    val bronzeDir = s"$work/bronze"
    val outDir = s"$work/out"
    val turns = writeBronze(spark, bronzeDir, nConvs)
    val (reports, backfillSecs) = time(runBackfill(spark, bronzeDir, outDir))
    val goldRows = reports.map(_.rows).sum
    results("backfill_gold") = backfillSecs
    // as-of is cheap enough to min-of-3 like the query suite
    val asofRuns = (1 to 3).map(_ => time(runAsOf(spark, outDir)))
    val asofRows = asofRuns.head._1
    val asofSecs = asofRuns.map(_._2).min
    results("asof_join") = asofSecs
    maxes("asof_join") = asofRuns.map(_._2).max

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val qmax = maxes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_max":$qmax,"sf":"$sfDir","cpus":$cpus,"bench_turns":$turns,"gold_rows":$goldRows,"backfill_turns_per_sec":${(goldRows / backfillSecs).round},"asof_queries":$asofRows,"asof_queries_per_sec":${(asofRows / asofSecs).round}}""")
    // drop this run's synthetic tables — repeated bench runs otherwise
    // accumulate ~0.5 GB each on the (tmpfs) work dir
    val wp = new org.apache.hadoop.fs.Path(work)
    val fs = wp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wp)) { fs.delete(wp, true); () }
    spark.stop()
  }
}
