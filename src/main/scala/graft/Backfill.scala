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

  private val MaxLookbackSecs = 604800L // the widest feature frame (7d)

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

  /** Run the backfill for contiguous slices covering
    * [firstStartSec, firstStartSec + nSlices * sliceSecs). `bronze` is
    * the raw input (any layout); rows are routed to slices by ts.
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
      segmentSecs: Long = 604800L): Seq[SliceReport] = {

    val committed = Checkpoint.committedSlices(spark, outDir)
    val silverPath = s"$outDir/silver"
    val goldPath = s"$outDir/gold"
    val silverCols = TranscriptSchema.silver.fieldNames.toSeq

    // Resuming/extending with a different slice width would silently
    // mis-prune the lookback reads (slice dirs are time ranges of the
    // width they were WRITTEN with) — fail loudly instead.
    Checkpoint.readWatermarks(spark, outDir)
      .filter(col("status") === "committed")
      .select(unix_timestamp(col("slice_start")).as("s"), unix_timestamp(col("slice_end")).as("e"))
      .collect()
      .find(r => r.getLong(1) - r.getLong(0) != sliceSecs)
      .foreach { r =>
        throw new IllegalArgumentException(
          s"committed slice width ${r.getLong(1) - r.getLong(0)}s does not match " +
            s"sliceSecs=${sliceSecs}s; slice-granular pruning assumes uniform widths — " +
            "resume this table with its original slice width")
      }

    val reports = (0 until nSlices).map { i =>
      val start = firstStartSec + i * sliceSecs
      val end = start + sliceSecs
      val id = sliceId(start)
      val t0 = System.nanoTime()

      if (committed.contains(id)) {
        SliceReport(id, 0L, 0L, skipped = true)
      } else {
        // --- the current slice, half-open [start, end), validated ---
        val rawSlice = bronze.filter(
          bronze("ts") >= tsLit(bronze, start) && bronze("ts") < tsLit(bronze, end))
        val sliceBronze = SilverBuilder.validate(rawSlice)

        // emptiness probe on the RAW slice: validate()'s not-null
        // predicates include text, and a filter on text forces the scan
        // to decode the dominant column — the raw probe reads only the
        // pushed ts range + one narrow column
        if (phase(id, "isEmpty check")(rawSlice.select(lit(1)).isEmpty)) {
          // empty slice: zero-row watermark; the delta chain simply has
          // no entry for this slice
          Checkpoint.commitSlice(spark, outDir, id,
            new Timestamp(start * 1000L), new Timestamp(end * 1000L), None, 0L)
          SliceReport(id, 0L, (System.nanoTime() - t0) / 1000000L, skipped = false)
        } else {
          // --- carried per-conversation state: the delta chain of all
          // committed slices before this one (one parquet read; the
          // sweep resolves latest-per-conversation inline)
          val deltas = phase(id, "delta chain read")(Checkpoint.readConvStateDeltas(spark, outDir, start))

          // --- skew dispatch: conversations above the threshold take
          // the segmented (chunked-window + two-pass session) path.
          // Heavy ids are the skew TAIL — tiny by construction — so one
          // map-combined count + driver collect beats re-planning
          // broadcast joins into all six split branches. A conversation
          // is heavy if THIS slice brings > thr turns, or if its
          // carried state already shows > thr turns total (turn_idx is
          // the per-conversation ordinal) — no context rescan needed.
          // heavy-id counts on the RAW slice (same text-decode
          // avoidance as the emptiness probe; invalid rows are noise
          // well below any sane skew threshold)
          val heavyIds: Seq[String] = skewHeavyThreshold match {
            case Some(thr) => phase(id, "heavy ids")(
              rawSlice.groupBy(col("conv_id")).count()
                .filter(col("count") > thr).select(col("conv_id"))
                .unionByName(
                  deltas.filter(col("st_last_turn_idx") + 1 > thr).select(col("conv_id")))
                .distinct()
                .collect().map(_.getString(0)).toSeq)
            case None => Nil
          }

          // --- lookback frame context: COMPACT tails from the
          // checkpoint layer (one narrow array row per conv per slice
          // per 64k turns) instead of re-scanning + re-shuffling the
          // full-width 7-day silver tail every slice. Cross-slice dedup
          // rides the carried st_last_turn_idx (horizon-free — strictly
          // closer to the single-shot semantics than the round-2
          // lookback-window dedup). Raw silver context is read ONLY for
          // the routed (heavy / ts-inverted) conversations.
          val tails = phase(id, "tail read")(
            Checkpoint.readFrameTails(spark, outDir, start, sliceSecs, MaxLookbackSecs))

          def buildGold(heavy: Seq[String], inverted: Seq[String]): DataFrame = {
            val routedIds = (heavy ++ inverted).distinct
            if (routedIds.isEmpty)
              FusedSweep.gold(deltas, emptySilver(spark), sliceBronze, sessionGapSecs, Some(tails))
            else {
              val isRouted = col("conv_id").isin(routedIds: _*)
              // routed context comes from GOLD, narrow: the isin
              // predicate cannot prune row groups (conv ids are not
              // clustered), so a silver-based read would decode the
              // whole lookback INCLUDING text just to find a handful
              // of conversations; gold carries text_len, letting the
              // frame stage skip the dominant column entirely
              val tsType = bronze.schema("ts").dataType
              val goldFileSchema = org.apache.spark.sql.types.StructType(
                TranscriptSchema.gold.fields.map(f =>
                  if (f.name == "ts") f.copy(dataType = tsType) else f.copy(nullable = true)) ++ Seq(
                  org.apache.spark.sql.types.StructField("text_len",
                    org.apache.spark.sql.types.LongType, nullable = true),
                  org.apache.spark.sql.types.StructField("slice_id",
                    org.apache.spark.sql.types.StringType, nullable = true)))
              val ctxRaw = contextRead(spark, goldPath, id, start, sliceSecs,
                Some(goldFileSchema))
              // first slice: no gold yet — contextRead's empty fallback
              // has the silver schema, which lacks text_len
              val ctxLenCol =
                if (ctxRaw.columns.contains("text_len")) col("text_len")
                else lit(null).cast("long").as("text_len")
              val context = ctxRaw
                .select(col("conv_id"), col("turn_idx"), col("role"),
                  lit(null).cast("string").as("text"), col("tool"), col("ts"),
                  col("dt"), ctxLenCol)
                .filter(isRouted)
              val light = FusedSweep.gold(
                deltas.filter(!isRouted), emptySilver(spark),
                sliceBronze.filter(!isRouted), sessionGapSecs,
                Some(tails.filter(!isRouted)))
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
                    segmentedSessions = segmented)
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

          // ONE compute pass lands gold; silver (a column projection),
          // the state delta and lineage all derive from the WRITTEN
          // gold files — compressed, column-pruned, partition-pruned
          // reads instead of a full-width in-memory cache. Round-2
          // profiling showed the cache write + spill + four full-width
          // cache reads were pure DRAM-bandwidth burn (the non-scaling
          // resource on one host; on a real cluster, executor-local IO).
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

          // The fused sweep asserts ts non-decreasing in turn_idx per
          // conversation (the transcript contract). Real bronze can
          // violate it (clock skew); rather than aborting the backfill,
          // catch the violation, detect exactly the inverted
          // conversations, and re-run the slice with them routed to the
          // segmented heavy path — whose frame stage sorts by ts (value
          // -correct under any turn/ts disagreement) and whose session
          // stage is the declarative turn-ordered window. Zero cost on
          // the contract-clean path.
          phase(id, "gold compute+write")(
            try writeSlice(buildGold(heavyIds, Nil), goldPath)
            catch {
              case e: Throwable if isTsInversion(e) =>
                val inverted = phase(id, "inversion detect")(
                  detectInvertedConvs(sliceBronze))
                if (inverted.isEmpty) throw e
                println(s"[backfill] $id: rerouting ${inverted.size} ts-inverted " +
                  s"conversation(s) off the fused sweep: ${inverted.take(5).mkString(", ")}" +
                  (if (inverted.size > 5) ", ..." else ""))
                writeSlice(buildGold(heavyIds, inverted), goldPath)
            })

          if (failAfterGoldWriteOfSlice.contains(id))
            throw new RuntimeException(s"injected failure after gold write of $id (test hook)")

          val goldWritten = spark.read.parquet(goldPath)
            .filter(col("slice_id") === id)
          phase(id, "silver write")(writeSlice(goldWritten.select(silverCols.map(col): _*), silverPath))

          // --- fused slice meta for later slices: state delta + frame
          // tails, ONE aggregate + ONE write (only touched conversations)
          phase(id, "slice meta")(Checkpoint.writeConvStateDelta(outDir, start,
            Checkpoint.sliceMetaFromGold(goldWritten, heavyIds)))

          // --- lineage, then the committing watermark row (atomic last) ---
          val wallMs = (System.nanoTime() - t0) / 1000000L
          val (rows, hw) = phase(id, "lineage")(Checkpoint.appendLineage(outDir, goldWritten, id, wallMs))
          Checkpoint.commitSlice(spark, outDir, id,
            new Timestamp(start * 1000L), new Timestamp(end * 1000L), hw, rows)
          if (compactStateEvery > 0 && (i + 1) % compactStateEvery == 0)
            Checkpoint.compactConvState(spark, outDir, start)
          SliceReport(id, rows, wallMs, skipped = false)
        }
      }
    }
    reports
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
    val silverKeys = spark.read.parquet(s"$outDir/silver")
      .select(col("conv_id"), col("turn_idx"))
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
      segmentSecs: Long = 604800L): Seq[SliceReport] = {
    val latePath = s"$outDir/_late"
    val runAll = () => run(spark, bronze, outDir, firstStartSec, sliceSecs, nSlices,
      sessionGapSecs = sessionGapSecs, skewHeavyThreshold = skewHeavyThreshold,
      rangeLayoutWrites = rangeLayoutWrites, compactStateEvery = compactStateEvery,
      segmentSecs = segmentSecs)
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
      segmentedSessions: Boolean = true): DataFrame = {
    import graft.gold.FusedSweep
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
    val ctxLen =
      if (hasLen) coalesce(col("text_len"), lit(0L))
      else coalesce(length(col("text")).cast("long"), lit(0L))
    val both = FusedSweep.contextRows(ctx.drop("text_len"))
      .unionByName(FusedSweep.bronzeRows(bronzeNew))
    val silverH = both
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(min_by(
        struct(col("role"), col("text"), col("tool"), col("ts"), col("_k")),
        struct(col("_k"), col("ts"), col("role"), coalesce(col("tool"), lit("")), col("text"))).as("_w"))
      .select(col("conv_id"), col("turn_idx"), col("_w.role").as("role"),
        col("_w.text").as("text"), col("_w.tool").as("tool"), col("_w.ts").as("ts"),
        col("_w._k").as("_k"))
      .filter(col("_k") === 2).drop("_k")

    val ctxF = ctx.withColumn("_fw_len", ctxLen).drop("text_len")
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
    sessioned.withColumn("text_len", length(col("text")).cast("long"))
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
      org.apache.spark.sql.types.StructType(TranscriptSchema.silver.fields))

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
