package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gold.{FeatureWindows, FusedSweep}
import graft.meta.Checkpoint
import graft.schema.TranscriptSchema
import graft.silver.SilverBuilder

/** Resumable, checkpointed bronze → silver → gold backfill over
  * half-open time slices `[start, end)`.
  *
  * Replaces the reference's EventBridge/Step Functions micro-batch loop
  * (state_machines/stream_pipeline.asl.json) with a pure-Spark driver,
  * and fixes its batch semantics (SURVEY.md §2.1):
  *  - D5: window features see FULL history — each slice reads a
  *    maxLookback tail of already-written silver as context, and
  *    lag/gap/session carry exact per-conversation state across slices
  *    (prev ts/role + session count), so a sliced backfill is
  *    bit-identical to a single-shot run (BackfillSpec property).
  *  - D6: half-open slices + idempotent dynamic-partition overwrite —
  *    no boundary double-counting; any slice can be re-run safely.
  *  - D3: watermark rows are real: `committed` is flipped only after
  *    data + lineage land; resume skips committed slices and recomputes
  *    the rest.
  *
  * Layout: silver/gold partitioned by (dt, slice_id) so a slice
  * overwrite replaces exactly its own files while `dt` stays prunable.
  * Per-(slice, partition) row counts / content hashes / throughput go
  * to the lineage table (Checkpoint).
  */
object Backfill {

  final case class SliceReport(sliceId: String, rows: Long, wallMs: Long, skipped: Boolean)

  private[graft] val MaxLookbackSecs = 604800L // the widest feature frame (7d)

  /** CORE-AWARE heavy dispatch (round-6): the absolute
    * `skewHeavyThreshold` was calibrated at low parallelism where
    * cpu-sum bounds the wall; at high core counts the stage wall is
    * max(task), so a conversation whose slice rows exceed a small
    * multiple of the FAIR CORE SHARE (sliceRows / cores) straggles the
    * sweep stage long before the absolute crossover — at 1000 cores an
    * absolute 10^7 threshold leaves a 10M-row task serializing while
    * every other core handles ~1M rows. Relative candidate threshold =
    * max(floor, alpha x sliceRows / cores), alpha = 2
    * (SPARK_GRAFT_SKEW_ALPHA is the dev A/B knob).
    *
    * Routing is additionally gated on the candidates being a small
    * FRACTION of the slice ([[RouteBudgetFraction]]): the segmented
    * detour only wins when it runs OFF the critical path — the light
    * sweep of the other (1 - beta) of the slice keeps the cores busy
    * while the detour's extra full-width passes process the tail.
    * Measured counter-example (this round, driver bench shape): the
    * planted 2M-turn megas are 83% of the 4.8M-turn table, and routing
    * them pushed backfill_gold 49.8 -> 71.6-134.8 s across three heavy
    * -path variants — when the "tail" IS most of the slice, every
    * extra pass over it is a pass over the whole slice, and the plain
    * sweep's single hot task is the cheaper evil. Conversations above
    * the ABSOLUTE crossover always route (the sweep would abort on
    * them anyway — cpu-sum explosion beats any detour argument).
    */
  private val SkewAlpha: Long =
    sys.env.get("SPARK_GRAFT_SKEW_ALPHA").map(_.toLong).getOrElse(2L)

  /** Routing below this many rows never pays: the segmented path's
    * fixed cost (summary pass + seed broadcast + its own exchange)
    * exceeds any possible straggle saving. Also keeps the relative rule
    * inert in small-data specs, whose dispatch behavior is pinned by
    * their explicit absolute thresholds.
    */
  private val MinRouteRows = 200000L

  /** Relative-routed rows may total at most this fraction of the
    * slice (see the critical-path rationale above).
    */
  private val RouteBudgetFraction = 0.25

  /** Relative candidate threshold for a slice, None when relative
    * dispatch cannot fire (no absolute threshold configured, no row
    * estimate, or no conversation could pass both the candidate
    * threshold and the budget: a candidate needs > relThr rows AND
    * <= beta x rows budget, impossible once relThr >= beta x rows).
    */
  private[graft] def relativeThreshold(
      absolute: Option[Long],
      rowsEst: Option[Long],
      cores: Int): Option[Long] = (absolute, rowsEst) match {
    case (Some(a), Some(r)) =>
      val rel = Math.max(MinRouteRows, SkewAlpha * r / Math.max(cores, 1))
      if (rel < a && rel < (r * RouteBudgetFraction).toLong) Some(rel) else None
    case _ => None
  }

  /** Pick the routed set from detected (conv, sliceRows) candidates:
    * every conversation above the absolute crossover, plus the largest
    * relative candidates while their cumulative rows fit the slice
    * budget, capped at `cap`.
    */
  private[graft] def selectRouted(
      candidates: Seq[(String, Long)],
      absolute: Long,
      relThr: Long,
      budgetRows: Long,
      cap: Int): Seq[String] = {
    val sorted = candidates.sortBy { case (id, n) => (-n, id) }
    val must = sorted.filter(_._2 > absolute)
    var cum = 0L
    val opt = sorted
      .filter { case (_, n) => n <= absolute && n > relThr }
      .takeWhile { case (_, n) => cum += n; cum <= budgetRows }
    (must ++ opt).take(cap).map(_._1)
  }

  def sliceId(startSec: Long): String = s"s$startSec"

  /** Opt-in per-phase wall logging (SPARK_GRAFT_PHASE_LOG=1): prints
    * `[phase] <slice> <name> <secs>` for bench forensics; zero cost
    * when unset.
    */
  private val phaseLog = sys.env.get("SPARK_GRAFT_PHASE_LOG").contains("1")
  @inline private def phase[A](id: String, name: String)(f: => A): A =
    if (!phaseLog) f
    else {
      val t0 = System.nanoTime()
      val a = f
      println(f"[phase] $id $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }

  /** Timestamp literal of `sec` matching the column's own type (ntz or
    * tz — the generator writes tz, driver parquet reads back ntz).
    * Comparing `ts` against a folded literal — instead of wrapping the
    * column in unix_timestamp() — keeps the predicate pushable into the
    * parquet scan (round-1 scale-killer #1: every slice re-scanned the
    * whole table). Equivalent to the epoch-second compare because slice
    * bounds are whole seconds.
    */
  private def tsLit(df: DataFrame, sec: Long): Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        lit(java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC))
      case _ => lit(java.time.Instant.ofEpochSecond(sec))
    }

  /** UTC calendar date containing epoch-second `sec` — the matching
    * `dt` partition predicate (dt = to_date(ts), UTC session).
    */
  private def dtLit(sec: Long): Column =
    lit(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(Math.floorDiv(sec, 86400L))))

  /** Bound on the state-delta chain length before ADAPTIVE compaction
    * fires (chain reads are O(chain x touched conversations); 4 bounds
    * the read amplification at 4x steady-state while amortizing the
    * compaction write to 1/4 per slice).
    */
  private val MaxStateChain = 4

  /** Output-file sizing targets for the sweep exchange. The sweep
    * pipeline is NARROW from its hash exchange to the gold write, so
    * files per slice == sweep partitions; sizing the exchange by data
    * volume bounds the file count independently of core count (round-4
    * verdict: the fixed 8x-cores exchange wrote 8k files/slice at 1000
    * cores regardless of slice size — a 100-slice backfill approached
    * 10^6 objects). Partition count =
    *   max(ceil(bytes/MaxFileBytes), min(ceil(bytes/MinFileBytes), 8x cores))
    *  - huge slices: bytes/128MB partitions — ample parallelism AND
    *    right-sized files (1 TB slice at 1000 cores: 8192 x 128MB);
    *  - bench-scale slices (bytes in [8x cores x 8MB, 8x cores x
    *    128MB]): exactly today's 8x-cores dilution of the mega
    *    straggler, unchanged scaling numbers;
    *  - small slices: bytes/8MB partitions at ANY core count — fewer
    *    concurrent tasks, but each holds <= 8MB, so the lost
    *    parallelism is over work that is small by construction.
    * MinFileBytes is 8MB (not a rounder 16/32) so the 1GB-per-slice
    * scaling-bench regime keeps its measured 8x-cores mega-dilution at
    * local[16] (bytes/8MB ~ 119 ~ the old 128) — at 16MB that pair
    * would halve its sweep parallelism and re-grow the mega straggler's
    * average share by ~13%.
    */
  private val MaxFileBytes = 128L << 20
  private val MinFileBytes = 8L << 20

  /** Sweep partition count for a slice whose output is estimated at
    * `estBytes` (previous slice's written bytes, or bronze-size/nSlices
    * on the first slice; None = no usable estimate -> the legacy
    * 8x-cores default).
    */
  private[graft] def sweepPartitions(spark: SparkSession, estBytes: Option[Long]): Int = {
    val cores8 = spark.conf.get("spark.sql.shuffle.partitions").toInt *
      FusedSweep.OverPartitionFactor
    estBytes match {
      case Some(b) if b > 0 =>
        val byMax = Math.ceil(b.toDouble / MaxFileBytes).toInt
        val byMin = Math.ceil(b.toDouble / MinFileBytes).toInt
        // floor 2, not 1: HashPartitioning(x, 1) degenerates to a
        // single-partition requirement that a 0-partition (empty-dir)
        // side-stream scan already satisfies — Spark then elides that
        // exchange and the sweep's three zipped streams disagree on
        // partition count. n >= 2 is a real hash requirement, never
        // elided.
        Math.max(2, Math.max(byMax, Math.min(byMin, cores8)))
      case _ => cores8
    }
  }

  /** Driver-side recursive byte count of a written dir (one FS summary
    * call; no Spark job).
    */
  private def dirBytes(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(fs.getContentSummary(p).getLength) else None
  }

  /** Run the backfill for contiguous slices covering
    * [firstStartSec, firstStartSec + nSlices * sliceSecs). `bronze` is
    * the raw input (any layout); rows are routed to slices by ts.
    *
    * `contextStrategy` picks how committed lookback events reach the
    * sliding frames of later slices:
    *  - "rescan": each slice re-reads the narrow (conv_id, ts,
    *    text_len, tool) columns of the committed gold inside the
    *    lookback window — parquet column pruning skips the dominant
    *    text column, and the rows ride a tiny side shuffle (not the
    *    big exchange). Best when slices are at least about as wide as
    *    the lookback (the re-read is < 1 slice of narrow rows).
    *  - "tails": each slice pre-aggregates its events into ts-sorted
    *    per-(conv, chunk) arrays fused with the state delta; later
    *    slices read those instead of the gold. Best when slices are
    *    much NARROWER than the lookback (hourly slices + a 7d frame
    *    would re-read ~168 slices of events every slice under
    *    rescan; tails make that O(conversations) array rows).
    *  - "auto" (default): tails iff lookback >= 2x slice width.
    *
    * `skewHeavyThreshold` routes conversations whose PER-SLICE cost —
    * rows in this slice, or committed lookback events — exceeds the
    * threshold onto the segmented heavy path. The cost of one plain
    * fused-sweep task is O(slice rows + lookback context) per
    * conversation, so the dispatch keys on exactly that; cumulative
    * conversation size is irrelevant (a 10^8-turn conversation that
    * went quiet costs nothing). Measured on this host the plain sweep
    * handles ~600k rows/conversation/slice in well under a second of
    * straggler time while the segmented machinery costs seconds of
    * fixed overhead — dispatch pays only in the millions
    * (Bench/docs/NEXT.md).
    *
    * `materializeSilver`: the gold schema is a superset of silver
    * (silver columns + features), so the silver layer is SERVED as a
    * projection of the gold files ([[readSilver]]) — zero duplicate
    * storage and one less write per slice. Set true to also write a
    * physical `silver/` copy (e.g. to serve silver to readers that
    * must not see feature columns at the storage ACL level).
    */
  def run(
      spark: SparkSession,
      bronze: DataFrame,
      outDir: String,
      firstStartSec: Long,
      sliceSecs: Long,
      nSlices: Int,
      sessionGapSecs: Long = TranscriptSchema.DefaultSessionGapSecs,
      failAfterGoldWriteOfSlice: Option[String] = None,
      skewHeavyThreshold: Option[Long] = None,
      rangeLayoutWrites: Boolean = false,
      compactStateEvery: Int = 16,
      segmentSecs: Long = 604800L,
      contextStrategy: String = "auto",
      materializeSilver: Boolean = false,
      skewDetection: String = "lazy"): Seq[SliceReport] = {

    require(skewDetection == "lazy" || skewDetection == "upfront",
      s"skewDetection must be lazy|upfront, got '$skewDetection'")
    val committed = Checkpoint.committedSlices(spark, outDir)
    val silverPath = s"$outDir/silver"
    val goldPath = s"$outDir/gold"
    val silverCols = TranscriptSchema.silver.fieldNames.toSeq
    val useTails = contextStrategy match {
      case "tails"  => true
      case "rescan" => false
      case "auto"   => MaxLookbackSecs >= 2 * sliceSecs
      case other => throw new IllegalArgumentException(
        s"contextStrategy must be auto|tails|rescan, got '$other'")
    }

    val tsType = bronze.schema("ts").dataType
    // explicit read schema for all committed-gold reads: survives empty
    // dirs (zero readable files) and pre-upgrade slices (text_len reads
    // as null instead of failing inference)
    val goldFileSchema = org.apache.spark.sql.types.StructType(
      TranscriptSchema.gold.fields.map(f =>
        if (f.name == "ts") f.copy(dataType = tsType) else f.copy(nullable = true)) ++ Seq(
        org.apache.spark.sql.types.StructField("text_len",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("slice_id",
          org.apache.spark.sql.types.StringType, nullable = true)))

    // Resuming/extending with a different slice width would silently
    // mis-prune the lookback reads (slice dirs are time ranges of the
    // width they were WRITTEN with) — fail loudly instead.
    val wmRows = Checkpoint.readWatermarks(spark, outDir)
      .filter(col("status") === "committed")
      .select(col("slice_id"), unix_timestamp(col("slice_start")).as("s"),
        unix_timestamp(col("slice_end")).as("e"), col("row_count"))
      .collect()
    wmRows
      .find(r => r.getLong(2) - r.getLong(1) != sliceSecs)
      .foreach { r =>
        throw new IllegalArgumentException(
          s"committed slice width ${r.getLong(2) - r.getLong(1)}s does not match " +
            s"sliceSecs=${sliceSecs}s; slice-granular pruning assumes uniform widths — " +
            "resume this table with its original slice width")
      }
    // committed row counts feed the empty-slice probe heuristic below
    val committedRowCounts: Map[String, Long] =
      wmRows.map(r => r.getString(0) -> r.getLong(3)).toMap

    // Strategy guard (same loud-failure class as the slice-width
    // guard): resuming a table whose committed slices wrote state-only
    // (rescan) deltas with an effective `tails` strategy would make
    // readFrameTails silently filter every null-tail row — lookback
    // frames spanning the switch would see zero committed context and
    // the 1h/24h/7d features would be silently wrong. The effective
    // strategy is persisted as a driver-written table property on
    // every run; pre-props tables are probed for written tail arrays
    // (one tiny narrow aggregate, resume-only). The reverse switch
    // (tails table resumed under rescan) is safe — rescan reads the
    // committed gold files directly — but downgrades the property, so
    // a later tails resume of the mixed chain is correctly rejected.
    val persistedTails = Checkpoint.readContextTailsProp(spark, outDir)
    // an all-empty committed history has no context to lose — the
    // guard only bites when committed DATA exists (ADVICE r5: a false
    // property left by a failed/no-op rescan invocation must not
    // reject a tails resume of an empty table)
    val committedNonEmptySecs: Set[Long] =
      wmRows.filter(_.getLong(3) > 0L).map(_.getLong(1)).toSet
    if (committedNonEmptySecs.nonEmpty && useTails) {
      val tailsAvailable = persistedTails.getOrElse(
        Checkpoint.frameTailsEverWritten(spark, outDir, committedNonEmptySecs))
      if (!tailsAvailable)
        throw new IllegalArgumentException(
          "effective contextStrategy is 'tails' but the committed slices of this table " +
            "were written under the state-only (rescan) strategy and carry no frame-tail " +
            "arrays — lookback frames would silently lose all committed context. Resume " +
            "with --context rescan, or rebuild the table from scratch under tails.")
    }

    // Table-version guard (resume across engine upgrades): the frame
    // stages read the persisted text_len of committed gold; a table
    // written before that column existed would silently zero the
    // char-length features of lookback context. Fail loudly instead.
    if (committed.nonEmpty && Checkpoint.pathExists(spark, goldPath) &&
        !spark.read.parquet(goldPath).columns.contains("text_len"))
      throw new IllegalArgumentException(
        "committed gold table lacks the text_len column (written by an older engine " +
          "version); re-run the backfill from scratch, or backfill text_len = " +
          "length(text) into the committed slices first")

    // heavy ids detected in one slice carry into the next slice's first
    // attempt: an ongoing mega keeps > thr lookback events until it
    // goes quiet, so re-detecting it from scratch every slice would pay
    // the lazy path's wasted optimistic attempt every time. Carried ids
    // EXPIRE after the lookback drains (reach slices): at expiry one
    // upfront re-detection refreshes the set, so a conversation that
    // went quiet stops paying the heavy-branch plan overhead, while a
    // sustained mega costs one count job per reach slices instead of a
    // wasted optimistic attempt per slice.
    var carriedHeavy: Seq[String] = Nil
    var heavyExpiry: Int = -1
    // relative-dispatch detection cooldown (see the decision site): set
    // after a detection round that routed nothing
    var relDetectCooldownUntil: Int = -1
    val heavyReach = (Math.ceil(MaxLookbackSecs.toDouble / sliceSecs) + 1).toInt

    // Empty-slice fast path (ADVICE r4): an empty slice run through the
    // full pipeline pays the whole fixed per-slice job overhead (a
    // 256-task write of zero rows, the observe waiter, FS commits) —
    // sparse backfills are mostly THAT overhead. A narrow limit-1 probe
    // detects emptiness for ~one file-footer read, but as an
    // unconditional per-slice job it is itself fixed Amdahl residue on
    // DENSE backfills (the round-4 win was removing exactly such jobs).
    // Heuristic: probe only when the PREVIOUS slice was empty — dense
    // runs pay zero probes, sparse runs pay full cost once at the first
    // empty slice and a cheap probe thereafter. Committed row counts
    // seed the flag across resumes.
    var prevSliceEmpty = false

    // byte size of the last slice this run wrote (sweep-exchange sizing)
    var lastGoldSliceBytes: Option[Long] = None
    // first-slice fallback: bronze plan stats / nSlices (file bytes for
    // parquet scans; the "unknown" Long.MaxValue default is discarded)
    lazy val bronzeBytesEst: Option[Long] = {
      val s = bronze.queryExecution.optimizedPlan.stats.sizeInBytes
      if (s > 0 && s < BigInt(Long.MaxValue) / 4) Some((s / BigInt(Math.max(nSlices, 1))).toLong)
      else None
    }
    // row count of the last written/committed slice (relative-dispatch
    // sizing); first-slice fallback is bronzeRows/nSlices — a parquet
    // count(*) is footer-metadata-only, one cheap job per run, and only
    // taken when the dispatch is enabled and no neighbor estimate exists
    var lastGoldSliceRows: Option[Long] = None
    lazy val bronzeRowsPerSlice: Option[Long] =
      try {
        val n = bronze.count()
        if (n > 0) Some(Math.max(1L, n / Math.max(nSlices, 1))) else None
      } catch { case _: Throwable => None }

    val reports = (0 until nSlices).map { i =>
      val start = firstStartSec + i * sliceSecs
      val end = start + sliceSecs
      val id = sliceId(start)
      val t0 = System.nanoTime()

      if (committed.contains(id)) {
        prevSliceEmpty = committedRowCounts.get(id).contains(0L)
        committedRowCounts.get(id).filter(_ > 0L).foreach(r => lastGoldSliceRows = Some(r))
        SliceReport(id, 0L, 0L, skipped = true)
      } else if (prevSliceEmpty && phase(id, "empty probe")(bronze.filter(
          bronze("ts") >= tsLit(bronze, start) && bronze("ts") < tsLit(bronze, end)).isEmpty)) {
        // commit the zero-row watermark directly; remove any stale data
        // a prior invalidated run of this slice may have left behind
        deleteDir(spark, s"$goldPath/slice_id=$id")
        if (materializeSilver) deleteDir(spark, s"$silverPath/slice_id=$id")
        Checkpoint.clearConvStateDelta(spark, outDir, start)
        Checkpoint.commitSlice(spark, outDir, id,
          new Timestamp(start * 1000L), new Timestamp(end * 1000L), None, 0L)
        SliceReport(id, 0L, (System.nanoTime() - t0) / 1000000L, skipped = false)
      } else {
        // --- the current slice, half-open [start, end), validated ---
        val rawSlice = bronze.filter(
          bronze("ts") >= tsLit(bronze, start) && bronze("ts") < tsLit(bronze, end))
        val sliceBronze = SilverBuilder.validate(rawSlice)

        // size the sweep exchange (= output file count) from the best
        // available byte estimate: this run's previous written slice,
        // a committed neighbor on resume, or bronze-size/nSlices
        val estBytes = lastGoldSliceBytes
          .orElse(if (i > 0)
            dirBytes(spark, s"$goldPath/slice_id=${sliceId(start - sliceSecs)}") else None)
          .orElse(bronzeBytesEst)
        val sweepParts = sweepPartitions(spark, estBytes)

        // --- carried per-conversation state: the delta chain of all
        // committed slices before this one (one parquet read; the
        // sweep resolves latest-per-conversation inline)
        val deltas = phase(id, "delta chain read")(Checkpoint.readConvStateDeltas(spark, outDir, start))

        // --- committed lookback context, per strategy ---
        val tails =
          if (useTails) phase(id, "tail read")(
            Checkpoint.readFrameTails(spark, outDir, start, sliceSecs, MaxLookbackSecs))
          else FusedSweep.emptyTails(spark)
        // narrow gold context: conv_id + ts + persisted text_len + tool
        // only — parquet column pruning never touches the dominant
        // text column. Used by the rescan frame stream, the heavy
        // path's frame context, and the context-size arm of the skew
        // dispatch.
        def ctxGold: DataFrame = contextRead(spark, goldPath, id, start, sliceSecs,
          Some(goldFileSchema))

        // --- relative-dispatch inputs: slice-row estimate from the
        // previous written/committed slice (first slice: parquet-
        // metadata bronzeRows/nSlices), fair-core-share threshold, and
        // the routed-fraction budget. A detection round that routes
        // NOTHING starts a cooldown — sustained shapes where routing
        // never pays (e.g. a mega that IS most of the slice) stop
        // paying the per-slice count jobs; the absolute capacity
        // backstop still guards genuine cpu-sum explosions meanwhile.
        val rowsEst: Option[Long] =
          if (skewHeavyThreshold.isEmpty) None
          else lastGoldSliceRows.orElse(bronzeRowsPerSlice)
        val relThr: Option[Long] =
          if (i < relDetectCooldownUntil) None
          else relativeThreshold(skewHeavyThreshold, rowsEst,
            spark.sparkContext.defaultParallelism)
        val routedCap = Math.max(64, 2 * spark.sparkContext.defaultParallelism)

        // --- skew dispatch on PER-SLICE cost: rows this slice, or
        // committed lookback events (what one sweep task would have to
        // stream for the conversation). Candidates above `thr` are the
        // skew TAIL — one narrow map-combined count + driver collect
        // beats re-planning broadcast joins into all split branches.
        def detectCounts(thr: Long): Seq[(String, Long)] = phase(id, "heavy ids")({
          val sliceCnt = rawSlice.groupBy(col("conv_id")).count()
          val ctxCnt =
            if (useTails)
              tails.groupBy(col("conv_id")).agg(sum(size(col("tail_ts"))).as("count"))
            else ctxGold.groupBy(col("conv_id")).count()
          sliceCnt.filter(col("count") > thr)
            .unionByName(ctxCnt.filter(col("count") > thr))
            .groupBy(col("conv_id")).agg(max(col("count")).as("count"))
            .orderBy(col("count").desc, col("conv_id"))
            .limit(2 * routedCap).collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq
        })

        // per-task state side-files: the sweep tasks emit this slice's
        // conversation-state delta (and tail arrays in tails mode) as
        // a side product of the gold WRITE job — the separate
        // slice-meta aggregate job survives only for the few
        // skew-routed conversations the sweep never sees
        val stateSink = graft.meta.StateSideSink(
          dir = Checkpoint.stateDeltaDir(outDir, start),
          minKeepSec = end - MaxLookbackSecs,
          collectTails = useTails,
          chunkTurns = 65536,
          conf = new graft.meta.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))

        // heavy-path intermediates persisted for the duration of one
        // slice write (the dedup output feeds both the owner and the
        // feeder side of the segmented exchange — uncached it computes
        // twice); released right after the write lands or the attempt
        // fails
        val slicePersists = scala.collection.mutable.Buffer[DataFrame]()
        def releasePersists(): Unit = {
          slicePersists.foreach(df => { df.unpersist(); () })
          slicePersists.clear()
        }
        def buildGold(heavy: Seq[String], inverted: Seq[String]): DataFrame = {
          val routedIds = (heavy ++ inverted).distinct
          val isRouted =
            if (routedIds.isEmpty) lit(false) else col("conv_id").isin(routedIds: _*)
          val lightCtxStream =
            if (useTails) None
            else Some(FusedSweep.ctxStreamRows(ctxGold.filter(!isRouted)))
          val light = FusedSweep.gold(
            deltas.filter(!isRouted), emptySilver(spark),
            sliceBronze.filter(!isRouted), sessionGapSecs,
            Some(tails.filter(!isRouted)), lightCtxStream,
            capacityLimit = skewHeavyThreshold,
            numPartitions = Some(sweepParts),
            stateSink = Some(stateSink))
          if (routedIds.isEmpty) light
          else {
            // routed context comes from the same narrow gold read; the
            // heavy path's dedup union additionally needs turn_idx and
            // role, with text passed as null + text_len
            val context = ctxGold
              .select(col("conv_id"), col("turn_idx"), col("role"),
                lit(null).cast("string").as("text"), col("tool"), col("ts"),
                col("dt"), col("text_len"))
              .filter(isRouted)
            // ts-inverted conversations take the plain single-window
            // session stage: SegmentedSessions chains per-segment
            // summaries in turn order within TS-based segments, which
            // an inversion crossing a segment boundary would corrupt.
            // (Anomalies are few; heavy AND inverted prefers correct.)
            val segIds = heavy.filterNot(inverted.contains)
            val parts = Seq(
              (segIds, true), (inverted, false)).filter(_._1.nonEmpty).map {
              case (ids, segmented) =>
                val in = col("conv_id").isin(ids: _*)
                heavyGold(deltas.filter(in), context.filter(in),
                  sliceBronze.filter(in), start, sessionGapSecs, segmentSecs,
                  segmentedSessions = segmented, outPartitions = Some(sweepParts),
                  persistRegistry = Some(slicePersists))
            }
            parts.foldLeft(light)((acc, h) =>
              acc.unionByName(h.select(light.columns.map(col): _*)))
          }
        }

        // optional range layout: contiguous (dt, conv) ranges per task
        // give ~1 sorted file per task (instead of tasks x days) and
        // compress better — worth the extra shuffle on real object
        // storage; skipped by default where write bandwidth dominates
        def layout(df: DataFrame): DataFrame =
          if (rangeLayoutWrites)
            df.repartitionByRange(col("dt"), col("conv_id"))
              .sortWithinPartitions(col("dt"), col("conv_id"), col("turn_idx"))
          else df

        // ONE compute pass lands gold; lineage metrics are OBSERVED on
        // the write itself (zero extra jobs), and the state delta
        // derives from the WRITTEN gold files — compressed,
        // column-pruned, partition-pruned narrow reads instead of a
        // full-width in-memory cache. Round-2 profiling showed the
        // cache write + spill + full-width cache reads were pure
        // DRAM-bandwidth burn (the non-scaling resource on one host;
        // on a real cluster, executor-local IO).
        //
        // Each slice writes into its OWN static `slice_id=` directory
        // with a plain overwrite: same idempotent-replace semantics
        // as dynamic partition overwrite, but without the staging
        // protocol whose driver-side file moves grow with task count
        // (round-2 probe: the write stage scaled at 0.43 under
        // dynamic mode — commit renames are serial on the driver and
        // 4N cores produce 4x the files). Default layout is FLAT
        // inside the slice dir (dt stays a data column): probe showed
        // partitionBy(dt) costs a hidden full-width per-task sort +
        // multi-writer overhead that does not scale. Time pruning
        // happens at slice granularity (slices ARE time ranges);
        // `rangeLayoutWrites` produces the query-optimized daily
        // layout (dt dirs + (dt, conv) clustering) when the table is
        // served to downstream readers.
        def writeSlice(df: DataFrame, base: String): Unit =
          if (rangeLayoutWrites)
            layout(df).write.mode(SaveMode.Overwrite)
              .partitionBy("dt").parquet(s"$base/slice_id=$id")
          else
            df.write.mode(SaveMode.Overwrite).parquet(s"$base/slice_id=$id")

        val lineageDays = {
          val d0 = Math.floorDiv(start, 86400L)
          val d1 = Math.floorDiv(end - 1, 86400L)
          (d0 to d1).map(java.time.LocalDate.ofEpochDay)
        }
        // observe() fuses the per-dt lineage aggregates into the write
        // job; for pathologically wide slices fall back to a separate
        // narrow aggregate over the written files
        val observeLineage = lineageDays.size <= 64

        // unique observation name per attempt: the ts-inversion retry
        // re-writes the slice, and a late listener event from the
        // failed attempt must never satisfy the retry's waiter
        var attempt = 0
        def writeGoldObserved(df: DataFrame): Option[org.apache.spark.sql.Row] =
          if (!observeLineage) { writeSlice(df, goldPath); None }
          else {
            attempt += 1
            val name = s"lineage_${id}_a$attempt"
            val exprs = Checkpoint.lineageObserveExprs(df, lineageDays)
            val waiter = new MetricsWaiter(name)
            spark.listenerManager.register(waiter)
            try {
              writeSlice(df.observe(name, exprs.head, exprs.tail: _*), goldPath)
              waiter.await()
            } finally spark.listenerManager.unregister(waiter)
          }

        // The fused sweep asserts two preconditions and the slice
        // RE-RUNS (idempotent overwrite) with the offending
        // conversations rerouted when either fails:
        //  - ts non-decreasing in turn_idx (the transcript contract;
        //    clock-skewed conversations go to the ts-sorted heavy
        //    frame path + plain turn-ordered sessions), and
        //  - per-conversation capacity (lazy skew detection: the
        //    explicit count job runs only after a conversation
        //    actually crosses the threshold; detected heavies carry
        //    into later slices' first attempts).
        // Zero cost on the contract-clean, all-light path.
        var heavyIds: Seq[String] =
          if (skewHeavyThreshold.isDefined &&
              (skewDetection == "upfront" || relThr.isDefined ||
                (carriedHeavy.nonEmpty && i >= heavyExpiry))) {
            val abs = skewHeavyThreshold.get
            val thr = relThr.getOrElse(abs)
            val cand = detectCounts(thr)
            heavyExpiry = i + heavyReach
            val routed = selectRouted(cand, abs, thr,
              rowsEst.map(r => (r * RouteBudgetFraction).toLong).getOrElse(Long.MaxValue),
              routedCap)
            if (relThr.isDefined && routed.isEmpty) {
              // suppressed candidates change slowly (a mega must halve,
              // or the slice 2x, before the budget admits it) — back
              // off harder than the carried-heavy expiry so sustained
              // unroutable shapes pay ~one count job per backfill, not
              // one per heavyReach slices
              relDetectCooldownUntil = i + Math.max(heavyReach, 4)
              if (cand.nonEmpty)
                println(s"[backfill] $id: ${cand.size} conversation(s) above the relative " +
                  s"threshold $thr but past the ${RouteBudgetFraction} slice-budget — " +
                  "keeping them on the plain sweep (detour would ride the critical path)")
            }
            routed
          } else carriedHeavy
        var invertedIds: Seq[String] = Nil
        var metrics: Option[org.apache.spark.sql.Row] = None
        var attempts = 0
        var done = false
        phase(id, "gold compute+write")(
          try while (!done) {
            attempts += 1
            // pre-clear the slice's delta dir before EVERY attempt: a
            // failed attempt's side-files (possibly for partitions the
            // retry's different routing never rewrites) must not survive
            Checkpoint.clearConvStateDelta(spark, outDir, start)
            try { metrics = writeGoldObserved(buildGold(heavyIds, invertedIds)); done = true }
            catch {
              case e: Throwable if isCapacity(e) && attempts <= 3 =>
                releasePersists()
                // capacity aborts fire at the ABSOLUTE crossover only;
                // everything detected there must route
                val detected = detectCounts(skewHeavyThreshold.get).map(_._1)
                heavyExpiry = i + heavyReach
                if (!detected.exists(d => !heavyIds.contains(d))) throw e
                println(s"[backfill] $id: routing ${detected.size} oversize " +
                  s"conversation(s) to the segmented heavy path: " +
                  detected.take(5).mkString(", ") +
                  (if (detected.size > 5) ", ..." else ""))
                heavyIds = (heavyIds ++ detected).distinct
              case e: Throwable if isTsInversion(e) && attempts <= 3 =>
                releasePersists()
                val inverted = phase(id, "inversion detect")(
                  detectInvertedConvs(sliceBronze))
                if (!inverted.exists(d => !invertedIds.contains(d))) throw e
                println(s"[backfill] $id: rerouting ${inverted.size} ts-inverted " +
                  s"conversation(s) off the fused sweep: ${inverted.take(5).mkString(", ")}" +
                  (if (inverted.size > 5) ", ..." else ""))
                invertedIds = (invertedIds ++ inverted).distinct
            }
          } finally releasePersists())
        carriedHeavy = heavyIds

        if (failAfterGoldWriteOfSlice.contains(id))
          throw new RuntimeException(s"injected failure after gold write of $id (test hook)")

        def goldWritten = spark.read.schema(goldFileSchema).parquet(goldPath)
          .filter(col("slice_id") === id)
        if (materializeSilver)
          phase(id, "silver write")(writeSlice(goldWritten.select(silverCols.map(col): _*), silverPath))

        // --- lineage: from the observed write metrics (no extra job),
        // or the legacy aggregate over the written files ---
        val wallMs = (System.nanoTime() - t0) / 1000000L
        val (rows, hw) = metrics match {
          case Some(m) =>
            Checkpoint.writeLineageFromMetrics(spark, outDir, id, lineageDays, m, wallMs)
          case None =>
            phase(id, "lineage")(Checkpoint.appendLineage(outDir, goldWritten, id, wallMs))
        }
        if (rows > 0L) {
          lastGoldSliceBytes = dirBytes(spark, s"$goldPath/slice_id=$id")
          lastGoldSliceRows = Some(rows)
        }

        // --- slice meta for later slices: the LIGHT path's state
        // delta (+ frame tails under the tails strategy) already
        // landed as per-task side-files of the gold write — zero extra
        // jobs. Only skew-routed conversations (absent from the sweep)
        // still need the aggregate, over their narrow columns only.
        val routedIds = (heavyIds ++ invertedIds).distinct
        if (rows > 0L && routedIds.nonEmpty) {
          val routedGold = goldWritten.filter(col("conv_id").isin(routedIds: _*))
          phase(id, "routed slice meta")(Checkpoint.appendSliceMeta(outDir, start,
            if (useTails) Checkpoint.sliceMetaFromGold(routedGold, end, MaxLookbackSecs)
            else Checkpoint.stateDeltaFromGold(routedGold)))
        }

        // --- the committing watermark row (atomic last) ---
        Checkpoint.commitSlice(spark, outDir, id,
          new Timestamp(start * 1000L), new Timestamp(end * 1000L), hw, rows)
        val periodic = compactStateEvery > 0 && (i + 1) % compactStateEvery == 0
        if (periodic ||
            Checkpoint.uncompactedDeltaDirs(spark, outDir, start + 1) > MaxStateChain)
          phase(id, "state compaction")(Checkpoint.compactConvState(spark, outDir, start))
        prevSliceEmpty = rows == 0L
        SliceReport(id, rows, wallMs, skipped = false)
      }
    }
    // context-strategy property, written AFTER the loop (ADVICE r5): a
    // no-op resume (nothing new committed) or a run that fails before
    // committing anything must not downgrade a true property — only a
    // run that actually committed new data pins the effective strategy;
    // a fresh table's first committing run establishes it.
    val wroteNewData = reports.exists(r => !r.skipped && r.rows > 0L)
    if (wroteNewData || (committed.isEmpty && reports.exists(!_.skipped)))
      Checkpoint.writeContextTailsProp(spark, outDir,
        useTails && (committedNonEmptySecs.isEmpty || persistedTails.getOrElse(true)))
    reports
  }

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** The silver layer, served as a projection of the gold files (gold
    * = silver columns + feature columns over the identical row set —
    * same dedup, same ordering). Zero duplicate storage; see
    * `materializeSilver` on [[run]] for the physical-copy option.
    */
  def readSilver(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/gold")
      .select(TranscriptSchema.silver.fieldNames.map(col).toSeq :+ col("slice_id"): _*)

  /** Waits for the observed lineage metrics of a write to land on the
    * listener bus. A fresh instance per write attempt (the ts-inversion
    * retry re-observes under the same name).
    */
  private final class MetricsWaiter(name: String)
      extends org.apache.spark.sql.util.QueryExecutionListener {
    private val latch = new java.util.concurrent.CountDownLatch(1)
    @volatile private var row: Option[org.apache.spark.sql.Row] = None
    private def grab(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
      qe.observedMetrics.get(name).foreach { r =>
        row = Some(r); latch.countDown()
      }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = grab(qe)
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = grab(qe)
    /** Blocks until the metrics arrive (bounded; the write action has
      * already succeeded when this is called, so the only wait is the
      * async listener bus). Returns None on timeout — the caller falls
      * back to the legacy lineage aggregate over the written files
      * rather than failing a successfully-written slice.
      */
    def await(): Option[org.apache.spark.sql.Row] = {
      if (!latch.await(120, java.util.concurrent.TimeUnit.SECONDS)) {
        System.err.println(
          s"[backfill] observed metrics '$name' did not arrive within 120s; " +
            "falling back to the lineage aggregate over the written files")
        None
      } else row
    }
  }

  /** LATE-DATA QUEUE (SURVEY §2.10): a bronze row whose ts falls in an
    * already-committed slice is invisible to [[run]] (committed slices
    * are skipped on resume — the watermark semantics). `collectLate`
    * routes such rows to `<out>/_late/late_slice_start=<sec>` instead
    * of letting them vanish: it scans the bronze rows inside committed
    * slice ranges and keeps those whose (conv_id, turn_idx) appears
    * NOWHERE in silver — i.e. genuinely missing turns, not re-sends of
    * committed ones (those are watermark-dedup'd by design). One
    * shuffle: bronze-in-committed-ranges anti-join the narrow
    * (conv_id, turn_idx) silver projection. Returns the number of
    * late rows queued. Idempotent full-overwrite of `_late`.
    *
    * Contract note: queued rows are assumed to OBEY the transcript
    * contract (ts non-decreasing in turn_idx within a conversation) —
    * i.e. a late turn's ordinal is consistent with its timestamp
    * position among the committed turns. A corrupt row claiming a
    * far-future ordinal with a past timestamp reprocesses like any
    * other contract violation: the carried-turn dedup treats the
    * conversation's subsequent lower-ordinal rows as re-sends (the
    * same garbage-in behavior a single-shot run would exhibit under
    * its own dedup rules).
    */
  def collectLate(
      spark: SparkSession,
      bronze: DataFrame,
      outDir: String,
      firstStartSec: Long,
      sliceSecs: Long): Long = {
    val committedIds = Checkpoint.committedSlices(spark, outDir)
    if (committedIds.isEmpty) return 0L
    val latePath = s"$outDir/_late"
    val v = SilverBuilder.validate(bronze)
    val sliceStart = (floor((unix_timestamp(col("ts")) - firstStartSec) / sliceSecs)
      .cast("long") * sliceSecs + firstStartSec)
    val inCommitted = v
      .withColumn("late_slice_start", sliceStart)
      .filter(concat(lit("s"), col("late_slice_start")).isin(committedIds.toSeq: _*))
    // committed keys come from the gold files (silver is a projection
    // of gold — [[readSilver]]); guard the path: a table whose every
    // committed slice was empty has no gold dir at all
    val goldP = s"$outDir/gold"
    val silverKeys =
      if (Checkpoint.pathExists(spark, goldP))
        spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("conv_id",
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField("turn_idx",
            org.apache.spark.sql.types.IntegerType, nullable = true))))
          .parquet(goldP).select(col("conv_id"), col("turn_idx"))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("conv_id",
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField("turn_idx",
            org.apache.spark.sql.types.IntegerType, nullable = true))))
    val late = inCommitted.join(silverKeys, Seq("conv_id", "turn_idx"), "left_anti")
      .select(TranscriptSchema.silver.fieldNames.filterNot(_ == "dt").map(col) :+
        col("late_slice_start"): _*)
    val n = late.count()
    val p = new org.apache.hadoop.fs.Path(latePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (n > 0)
      late.write.mode(SaveMode.Overwrite).partitionBy("late_slice_start").parquet(latePath)
    else if (fs.exists(p)) { fs.delete(p, true); () } // stale queue fully drained
    n
  }

  /** Reprocess queued late rows: invalidate every slice at or after
    * the earliest late row's slice (features and carried state
    * downstream of it change), re-run the backfill on the caller's
    * full bronze (which contains the late rows), and clear the queue.
    * Result equals a single-shot run over the full input
    * (LateDataSpec property).
    */
  def reprocessLate(
      spark: SparkSession,
      bronze: DataFrame,
      outDir: String,
      firstStartSec: Long,
      sliceSecs: Long,
      nSlices: Int,
      sessionGapSecs: Long = TranscriptSchema.DefaultSessionGapSecs,
      skewHeavyThreshold: Option[Long] = None,
      rangeLayoutWrites: Boolean = false,
      compactStateEvery: Int = 16,
      segmentSecs: Long = 604800L,
      contextStrategy: String = "auto",
      materializeSilver: Boolean = false): Seq[SliceReport] = {
    val latePath = s"$outDir/_late"
    val runAll = () => run(spark, bronze, outDir, firstStartSec, sliceSecs, nSlices,
      sessionGapSecs = sessionGapSecs, skewHeavyThreshold = skewHeavyThreshold,
      rangeLayoutWrites = rangeLayoutWrites, compactStateEvery = compactStateEvery,
      segmentSecs = segmentSecs, contextStrategy = contextStrategy,
      materializeSilver = materializeSilver)
    if (!Checkpoint.pathExists(spark, latePath)) return runAll()
    // the partition-dir value reads back as the narrowest fitting
    // integral type — normalize to long
    val minRow = spark.read.parquet(latePath)
      .agg(min(col("late_slice_start").cast("long"))).head()
    if (minRow.isNullAt(0)) return runAll()
    val fromSec = minRow.getLong(0)
    println(s"[backfill] reprocessing late data: invalidating slices from s$fromSec")
    Checkpoint.invalidateFrom(spark, outDir, fromSec)
    val reports = runAll()
    // queue is consumed only after the re-run committed
    val p = new org.apache.hadoop.fs.Path(latePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
    reports
  }

  /** Empty DF with the silver schema (the light path's context input —
    * frame tails replace raw context rows there).
    */
  private[graft] def emptySilver(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(TranscriptSchema.silver.fields))

  /** True if the failure (anywhere in the cause chain) is the fused
    * sweep's ts-monotonicity precondition.
    */
  private[graft] def isTsInversion(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16)
      .exists(t => Option(t.getMessage).exists(_.contains("fused sweep precondition violated")))

  /** True if the failure is the fused sweep's per-conversation
    * capacity check (lazy skew detection).
    */
  private[graft] def isCapacity(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16)
      .exists(t => Option(t.getMessage).exists(_.contains("fused sweep capacity exceeded")))

  /** Conversations whose deduped slice rows have ts DECREASING in
    * turn_idx — the ones the fused sweep cannot stream. Only runs on
    * the anomaly path (after a precondition failure), so its extra
    * shuffle costs nothing in the contract-clean case. Inversions
    * against committed history are impossible by construction: slice
    * rows have ts >= slice start > every committed event's ts.
    */
  private[graft] def detectInvertedConvs(sliceBronze: DataFrame): Seq[String] = {
    val tsSec = unix_timestamp(col("ts"))
    SilverBuilder.dedup(sliceBronze)
      .withColumn("_p", lag(tsSec, 1).over(
        Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))))
      .filter(col("_p") > tsSec)
      .select(col("conv_id")).distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Heavy-conversation slice path: dedup by (conv, turn) key (a plain
    * map-side-combinable aggregate — massively parallel, no
    * per-conversation window), EXACT chunked range features
    * ([[graft.skew.ChunkedWindows]]), and the two-pass segmented
    * lag/gap/session ([[graft.skew.SegmentedSessions]]). No stage in
    * this path serializes a whole conversation on one task.
    */
  private[graft] def heavyGold(
      deltas: DataFrame,
      context: DataFrame,
      sliceBronze: DataFrame,
      start: Long,
      gapSecs: Long,
      segmentSecs: Long,
      segmentedSessions: Boolean = true,
      outPartitions: Option[Int] = None,
      // fused one-exchange segmented path (SegmentedSweep) vs the
      // legacy three-stage stack; env opt-out for A/B probes
      fusedSegmented: Boolean = !sys.env.get("SPARK_GRAFT_FUSED_HEAVY").contains("0"),
      // slice-scoped persist registry: intermediates cached here are
      // unpersisted by the caller right after the slice's write lands.
      // None (specs / single-shot) skips the persists entirely.
      persistRegistry: Option[scala.collection.mutable.Buffer[DataFrame]] = None): DataFrame = {
    import graft.gold.FusedSweep
    val spark = sliceBronze.sparkSession
    def scoped(df: DataFrame): DataFrame = persistRegistry match {
      case Some(reg) =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        reg += p
        p
      case None => df
    }
    // same horizon-free re-send drop as the fused light path: a bronze
    // turn at or below the carried last committed turn_idx is a
    // duplicate of committed data (heavy conversations are few — the
    // lastTurns side broadcasts)
    val lastTurns = Checkpoint.latestConvState(deltas)
      .select(col("conv_id"), col("st_last_turn_idx").as("_lt"))
    val bronzeNew = sliceBronze.join(broadcast(lastTurns), Seq("conv_id"), "left")
      .filter(col("_lt").isNull || col("turn_idx") > col("_lt")).drop("_lt")
    // committed context rows take precedence (_k = 1 < 2), then the
    // SilverBuilder winner order — identical to the fused sweep's.
    // Context may arrive gold-sourced (null text + text_len) or as raw
    // silver (specs, single-shot use) — normalize the frame length.
    val hasLen = context.columns.contains("text_len")
    val ctx = context.drop("dt")
    // fall through to length(text) when text_len is null (raw-silver
    // context in specs; pre-upgrade gold slices are rejected loudly at
    // run start, so a null-null pair cannot silently zero the lengths)
    val ctxLen =
      if (hasLen) coalesce(col("text_len"), length(col("text")).cast("long"), lit(0L))
      else coalesce(length(col("text")).cast("long"), lit(0L))
    val both = FusedSweep.contextRows(ctx.drop("text_len"))
      .unionByName(FusedSweep.bronzeRows(bronzeNew))
    // Dedup via row_number over an explicit hash repartition on the
    // exact grouping key — two measured pathologies in the former
    // min_by(struct(...)) aggregate:
    //  - a var-length struct buffer bars hash aggregation, and the
    //    partial SORT aggregate then ran concentrated on the mega's
    //    few time-clustered input splits (~6.5 s max task vs 0.05 s
    //    median, §2.5 input skew);
    //  - spread out, the aggregate was still ~200 us/row (9 s medians
    //    at 45k rows/task): every row built TWO structs copying the
    //    dominant text column, compared through interpreted struct
    //    ordering.
    // The window form sorts binary UnsafeRows (codegen prefix
    // comparators) and evaluates a streaming row_number — the same
    // machinery the light sweep's big sort uses at ~2 us/row. The
    // numbered repartition satisfies the window's distribution (its
    // own exchange is elided) and the scan tasks just forward bytes.
    // Winner semantics are IDENTICAL: row_number orders by the exact
    // tuple the min_by ordering struct held, and rows tying on the
    // full tuple are value-identical (every output field is in the
    // tuple), so the kept row is the same (SegmentedSweepSpec /
    // BackfillSpec bit-equality).
    val dedupParts = Math.max(spark.sparkContext.defaultParallelism,
      outPartitions.getOrElse(1))
    val wDedup = Window.partitionBy(col("conv_id"), col("turn_idx"))
      .orderBy(col("_k"), col("ts"), col("role"), coalesce(col("tool"), lit("")), col("text"))
    val silverH = scoped(both
      .repartition(dedupParts, col("conv_id"), col("turn_idx"))
      .withColumn("_rn", row_number().over(wDedup))
      .filter(col("_rn") === 1 && col("_k") === 2)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), col("ts")))

    val ctxF = scoped(ctx.withColumn("_fw_len", ctxLen).drop("text_len"))

    // FUSED segmented path (round-5, NEXT.md lead 1): frames + lag +
    // sessions in one full-width (conv, seg) exchange + one narrow
    // summary pass, replacing the three-stage chunked/two-pass stack
    // below. Only for contract-clean conversations — the ts-inverted
    // reroute keeps the turn-ordered single-window session stage.
    if (segmentedSessions && fusedSegmented) {
      val state = Checkpoint.latestConvState(deltas)
        .select(col("conv_id"), col("st_last_ts"), col("st_last_role"), col("st_sessions"))
      // the summary's winners derive from the CACHED dedup output, not
      // a third scan+aggregate over raw bronze: silverH is exactly the
      // deduped row set the sweep will emit as owners (one row per
      // (conv, turn), so the summary's min_by collapses trivially),
      // and the seed-count job materializes the cache before the big
      // write job's two consumers read it — no duplicate subtree, no
      // cache-build race. This also makes summary == owners BY
      // CONSTRUCTION where the former bronze-side winners could count
      // a context-superseded turn the owners never emit.
      val silverHNarrow = silverH.select(
        col("conv_id"), col("turn_idx"), col("ts"), col("role"), col("tool"))
      return graft.gold.SegmentedSweep.gold(
        silverH, ctxF, state, silverHNarrow,
        gapSecs, segmentSecs,
        // share the backfill's lookback constant explicitly (ADVICE r5):
        // a future widest-frame change must move the feeder replication
        // reach with it, not silently desync from a duplicated literal
        lookbackSecs = MaxLookbackSecs,
        numPartitions = outPartitions)
    }

    val silverF = silverH.withColumn("_fw_len",
      coalesce(length(col("text")).cast("long"), lit(0L)))
    val withContext = ctxF
      .select(silverF.columns.map(col): _*)
      .unionByName(silverF)
    // O(n) segment-salted sweep (FastWindows), NOT the declarative
    // ChunkedWindows twin — WindowExec rebuilds collect_set per row of
    // a sliding range frame, O(rows x frame), unrunnable on a
    // mega-conversation (the two are property-tested equal)
    val ranged = graft.gold.FastWindows
      .rangeFeaturesChunked(withContext, segmentSecs)
      .drop("_fw_len")
      .filter(col("ts") >= tsLit(withContext, start))
      .withColumn("dt", to_date(col("ts")))

    val state = Checkpoint.latestConvState(deltas)
      .select(col("conv_id"), col("st_last_ts"), col("st_last_role"), col("st_sessions"))
    val sessioned =
      if (segmentedSessions)
        graft.skew.SegmentedSessions.withStateSegmented(ranged, state, gapSecs, segmentSecs)
      else
        withState(ranged, state, gapSecs)
    // round-robin the heavy output across the session's full
    // parallelism before it unions into the slice write: the segment
    // stages leave O(span/segment) partitions, and a downstream write
    // inheriting that would serialize the mega's full-width rows on a
    // few tasks (measured: a ~7 s write straggler for 1M rows on 3
    // tasks). Numbered repartition so AQE leaves it alone; the
    // backfill passes its size-targeted sweep partition count so the
    // heavy branch's file count stays bounded too.
    val numParts = outPartitions.getOrElse(
      ranged.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    sessioned.withColumn("text_len", length(col("text")).cast("long"))
      .repartition(numParts)
  }

  /** Lookback context: the `[start - MaxLookback, start)` tail of the
    * already-written silver table. Slices are time ranges by
    * construction (`slice_id = s<startSec>`), so the read PRUNES at
    * the slice_id partition level to the <= ceil(lookback/sliceSecs)+1
    * directories that can overlap the window (PruningSpec asserts the
    * plan), plus pushable ts literals and a dt row predicate — instead
    * of round 1's unix_timestamp(ts)-wrapped full table scan. Over an
    * S-slice backfill this keeps total context IO O(S * lookback), not
    * O(S^2).
    */
  private[graft] def contextRead(
      spark: SparkSession, silverPath: String, id: String, start: Long,
      sliceSecs: Long, schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    if (Checkpoint.pathExists(spark, silverPath)) {
      // an explicit schema also covers dirs whose only slice write
      // FAILED mid-flight (zero readable files): inference would throw
      val reader = schema.map(spark.read.schema(_)).getOrElse(spark.read)
      val silverAll = reader.parquet(silverPath)
      val sliceStart = substring(col("slice_id"), 2, 18).cast("long")
      silverAll
        .filter(col("slice_id") =!= id &&
          sliceStart > start - MaxLookbackSecs - sliceSecs && sliceStart < start &&
          col("dt") >= dtLit(start - MaxLookbackSecs) && col("dt") <= dtLit(start) &&
          silverAll("ts") >= tsLit(silverAll, start - MaxLookbackSecs) &&
          silverAll("ts") < tsLit(silverAll, start))
        .drop("slice_id")
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      // the empty fallback mirrors the requested file schema (minus the
      // slice_id partition column) so first-slice plans resolve the
      // same columns (e.g. text_len) as later slices
      org.apache.spark.sql.types.StructType(
        schema.map(_.fields.filterNot(_.name == "slice_id"))
          .getOrElse(TranscriptSchema.silver.fields)))

  /** lag/gap/session over a slice via ONE window per conversation,
    * seeded by the previous slice's per-conversation state — exact
    * across slice boundaries. Production use: the ts-INVERTED
    * conversation reroute only (the turn-ordered single window is
    * correct under any turn/ts disagreement, where the segmented
    * two-pass would chain summaries across ts-based segments in the
    * wrong order); a mega-conversation serializes here, so the skew
    * path proper is [[graft.skew.SegmentedSessions]]. Also the
    * equality baseline in specs.
    */
  private[graft] def withState(ranged: DataFrame, state: DataFrame, gapSecs: Long): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val tsSec = unix_timestamp(col("ts"))
    ranged
      .join(state, Seq("conv_id"), "left")
      .withColumn("prev_role", coalesce(lag(col("role"), 1).over(w), col("st_last_role")))
      .withColumn("gap_secs",
        tsSec - coalesce(lag(tsSec, 1).over(w), unix_timestamp(col("st_last_ts"))))
      .withColumn("session_id",
        (coalesce(col("st_sessions"), lit(0)) +
          sum(when(col("gap_secs").isNull || col("gap_secs") > gapSecs, 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).cast("int"))
      .drop("st_last_ts", "st_last_turn_idx", "st_last_role", "st_sessions")
  }

}
