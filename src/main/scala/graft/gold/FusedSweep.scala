package graft.gold

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftInternalAccess}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.schema.TranscriptSchema

/** The fused per-slice gold computation: ONE hash exchange on conv_id,
  * ONE sort, ONE InternalRow sweep producing the complete gold row —
  * dedup + cross-slice anti-join + the five trailing range features +
  * lag/gap + sessionization with carried state.
  *
  * Round 1 ran these as four separate stages (dedup window, context
  * anti-join, FastWindows repartition+sort+sweep, withState window),
  * i.e. 4+ shuffles and as many full passes per slice; the Amdahl
  * residue of that chain is what held N→4N scaling at 0.667
  * (BENCH/BASELINE.md). Here everything rides one exchange:
  *
  *  - state deltas enter the SAME shuffle as pseudo-rows (`_k = 0`)
  *    sorted before all data rows of their conversation — no separate
  *    state join;
  *  - lookback context rows (`_k = 1`) feed the sliding frames and the
  *    lag chain but are not emitted;
  *  - current-slice bronze rows (`_k = 2`) are deduplicated by
  *    adjacency (sort prefix is (conv_id, turn_idx); the winner order
  *    (_k, ts, role, tool, text) reproduces SilverBuilder.dedup with
  *    committed context rows taking precedence), then emitted with all
  *    gold columns.
  *
  * PRECONDITION (transcript contract): within a conversation, ts is
  * non-decreasing in turn_idx for the rows that survive dedup — true
  * of transcripts by construction (turn order IS time order). The
  * sweep validates this and throws if violated, in which case the
  * declarative path (SilverBuilder + FeatureWindows) applies.
  *
  * Semantics are bit-identical to the declarative pipeline
  * (FusedSweepSpec property-tests equality including injected
  * anomalies, ts ties and session boundaries; BackfillSpec asserts
  * sliced == single-shot).
  */
object FusedSweep {

  /** Input schema of the unioned sweep rows (column order is binding
    * for the InternalRow field indexes below).
    */
  private[graft] def inputColumns(df: DataFrame): Seq[Column] = Seq(
    col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"),
    col("_k"), col("_seq"), col("_sessions"))

  private val CONV = 0
  private val TURN = 1
  private val ROLE = 2
  private val TEXT = 3
  private val TOOL = 4
  private val TS = 5
  private val K = 6
  private val SEQ = 7
  private val SESSIONS = 8

  // the tail side-stream's own (narrow) schema
  private val T_CONV = 0
  private val T_SEQ = 1
  private val T_CHUNK = 2
  private val T_TS = 3
  private val T_LEN = 4
  private val T_TOOL = 5

  // the scalar-context side-stream's schema (one row per committed
  // lookback event, pre-narrowed: no text, ts already in epoch seconds)
  private val C_CONV = 0
  private val C_T = 1
  private val C_LEN = 2
  private val C_TOOL = 3

  /** State pseudo-rows from the delta chain (slice_start becomes the
    * `_seq` tiebreaker: the latest delta per conversation wins).
    */
  private[graft] def stateRows(deltas: DataFrame): DataFrame =
    deltas.select(
      col("conv_id"),
      col("st_last_turn_idx").as("turn_idx"),
      col("st_last_role").as("role"),
      lit(null).cast("string").as("text"),
      lit(null).cast("string").as("tool"),
      col("st_last_ts").as("ts"),
      lit(0).as("_k"),
      col("slice_start").cast("long").as("_seq"),
      col("st_sessions").as("_sessions"))

  private[graft] def contextRows(context: DataFrame): DataFrame =
    context.select(
      col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"),
      lit(1).as("_k"), lit(0L).as("_seq"), lit(null).cast("int").as("_sessions"))

  private[graft] def bronzeRows(bronze: DataFrame): DataFrame =
    bronze.select(
      col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"),
      lit(2).as("_k"), lit(0L).as("_seq"), lit(null).cast("int").as("_sessions"))

  /** The frame-tail SIDE-STREAM ([[graft.meta.Checkpoint.readFrameTails]]):
    * per (conv, chunk), the committed lookback events pre-aggregated
    * into ts-sorted (epoch_sec, text_len, tool) arrays. They seed the
    * sliding frames ONLY — the lag chain and session counter come from
    * the state rows, which always accompany them (every committed
    * slice that touched a conversation wrote its delta).
    *
    * Tails deliberately do NOT ride the big exchange: unioning them in
    * would widen every data row by three (null) array fields — measured
    * ~10-20% extra shuffle+sort bytes on the engine's hottest path.
    * Instead they shuffle separately (tiny: O(convs) narrow rows) with
    * the SAME HashPartitioning(conv_id, n), and the sweep merges the
    * two sorted streams per partition via zipPartitions — the two
    * shuffles route every conv_id to the same partition index because
    * both are explicit numbered repartitions on the same expression
    * (AQE does not touch REPARTITION_BY_NUM).
    */
  private[graft] def tailStream(tails: DataFrame): DataFrame =
    tails.select(
      col("conv_id"),
      col("slice_start").cast("long").as("_seq"),
      col("chunk"),
      col("tail_ts"), col("tail_len"), col("tail_tool"))

  private[graft] def emptyTails(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("conv_id", StringType, nullable = false),
        StructField("slice_start", LongType, nullable = false),
        StructField("chunk", IntegerType, nullable = false),
        StructField("tail_ts", ArrayType(LongType, containsNull = false)),
        StructField("tail_len", ArrayType(LongType, containsNull = false)),
        StructField("tail_tool", ArrayType(StringType, containsNull = true)))))

  /** The scalar-context SIDE-STREAM (rescan strategy,
    * [[graft.Backfill]] `contextStrategy = "rescan"`): one narrow row
    * per committed lookback event, read straight from the written gold
    * table (conv_id + ts + the persisted text_len + tool — parquet
    * column pruning keeps the dominant text column untouched). Like
    * the frame tails, these rows seed the sliding frames ONLY — the
    * lag chain / session counter / dedup horizon ride the state rows —
    * so they are kept OFF the big exchange: they shuffle separately
    * (4 narrow columns instead of widening every data row) with the
    * same explicit HashPartitioning(conv_id, n) and merge into the
    * sweep via zipPartitions, sorted by (conv_id, t).
    */
  private[graft] def ctxStreamRows(context: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.unix_timestamp
    context.select(
      col("conv_id"),
      unix_timestamp(col("ts")).as("t"),
      coalesce(col("text_len"), lit(0L)).as("len"),
      col("tool"))
  }

  private[graft] def emptyCtxStream(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("conv_id", StringType, nullable = false),
        StructField("t", LongType, nullable = false),
        StructField("len", LongType, nullable = false),
        StructField("tool", StringType, nullable = true))))

  /** The sweep's exchanged-and-sorted input stream: state pseudo-rows
    * first (turn forced to Int.MinValue), then context/bronze rows in
    * (turn, _k, _seq, ts, role, tool, text) order — the SilverBuilder
    * winner order, so dedup-by-adjacency keeps the right row. Extracted
    * so dev probes ([[graft.SweepProbe]]) can time the exchange+sort
    * component of the identical plan [[gold]] executes.
    */
  private[graft] def sortedInput(
      state: DataFrame,
      context: DataFrame,
      bronze: DataFrame,
      numParts: Int): DataFrame =
    stateRows(state)
      .unionByName(contextRows(context))
      .unionByName(bronzeRows(bronze))
      .repartition(numParts, col("conv_id"))
      .sortWithinPartitions(
        col("conv_id"),
        when(col("_k") === 0, lit(Int.MinValue)).otherwise(col("turn_idx")),
        col("_k"), col("_seq"),
        col("ts"), col("role"), coalesce(col("tool"), lit("")), col("text"))
      .select(inputColumns(null): _*)

  /** Gold output schema: silver columns + dt + the eight feature
    * columns, preserving the input's timestamp flavor (ntz/tz).
    */
  private[gold] def goldSchemaFor(tsType: DataType): StructType = goldSchema(tsType)

  private def goldSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = true),
    StructField("turn_idx", IntegerType, nullable = true),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", tsType, nullable = true),
    StructField("dt", DateType, nullable = true)) ++
    TranscriptSchema.goldFeatures.map(_.copy(nullable = true)) :+
    // the row's own text length, already computed by the sweep's frame
    // bookkeeping: persisting it lets every downstream derivation
    // (frame tails, lineage) read narrow columns only — decoding the
    // dominant text column again just to take length() measured ~1.5 s
    // per bench slice
    StructField("text_len", LongType, nullable = true))

  /** Run the fused sweep. `state` rows carry (conv_id, st_last_ts,
    * st_last_turn_idx, st_last_role, st_sessions, slice_start);
    * `context` is prior-slice silver inside the lookback; `bronze` is
    * the validated current slice. Emits gold rows for the slice only.
    */
  /** `capacityLimit`: optimistic skew detection — the sweep throws a
    * marked exception the moment one conversation's accepted slice
    * rows OR side-stream context entries exceed the limit (the same
    * two quantities the explicit dispatch counts). The caller catches
    * it, runs the explicit heavy-id detection, and re-runs with those
    * conversations routed — so the common all-light slice pays ZERO
    * detection jobs.
    */
  /** Default sweep-exchange over-partitioning multiple of
    * `spark.sql.shuffle.partitions` (see the rationale at the
    * numParts computation in [[gold]]).
    */
  val OverPartitionFactor: Int = 8

  /** `stateSink`: when set, each sweep task also emits the slice's
    * per-conversation state delta (and, in tails mode, the trimmed
    * frame-tail arrays) as a parquet side-file — see
    * [[graft.meta.StateSideSink]]. This replaces the separate
    * post-write slice-meta aggregate job for every conversation that
    * rides the sweep.
    */
  def gold(
      state: DataFrame,
      context: DataFrame,
      bronze: DataFrame,
      gapSecs: Long = TranscriptSchema.DefaultSessionGapSecs,
      tails: Option[DataFrame] = None,
      ctxStream: Option[DataFrame] = None,
      capacityLimit: Option[Long] = None,
      numPartitions: Option[Int] = None,
      stateSink: Option[graft.meta.StateSideSink] = None): DataFrame = {
    val spark = bronze.sparkSession
    val tsType = bronze.schema("ts").dataType
    // OverPartitionFactor x over-partitioning: a conversation is one
    // hash key, so the partition holding a mega carries the mega's rows
    // PLUS an average share — with partitions == cores that share is
    // 1/cores of the slice and the mega task straggles the stage
    // (measured at local[16]: max task 2x median). At 8x, the straggler
    // floor drops to the mega's own rows and the displaced average work
    // spreads over the extra waves (measured local[16] on 58.4M turns:
    // 91 s -> 67 s vs partitions == cores). Explicit numbered
    // repartition: AQE leaves REPARTITION_BY_NUM alone. Callers that
    // know the slice's data volume pass `numPartitions` instead, which
    // bounds output file count independently of core count
    // ([[graft.Backfill]] sizes it from the previous slice's bytes).
    val numParts = numPartitions.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions").toInt * OverPartitionFactor)
    val sorted = sortedInput(state, context, bronze, numParts)

    val tailSorted = tailStream(tails.getOrElse(emptyTails(spark)))
      .repartition(numParts, col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("_seq"), col("chunk"))

    val ctxSorted = ctxStream.getOrElse(emptyCtxStream(spark))
      .repartition(numParts, col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("t"))

    val outSchema = goldSchema(tsType)
    val gap = gapSecs
    val limit = capacityLimit.getOrElse(Long.MaxValue)

    val sink = stateSink
    val rdd = GraftInternalAccess.toInternalRdd(sorted.toDF())
      .zipPartitions(
        GraftInternalAccess.toInternalRdd(tailSorted.toDF()),
        GraftInternalAccess.toInternalRdd(ctxSorted.toDF())) {
        (data, tl, cx) =>
          val writer = sink.map { s =>
            val w = new graft.meta.StateSideWriter(s)
            // close on task completion: commits the parquet footer on
            // success; on failure leaves a partial the retry overwrites
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => w.close()))
            w
          }.orNull
          val chunkTurns = sink match {
            // rescan (state-only) needs no chunking: nothing buffers
            // per chunk, and one row per conversation matches the
            // legacy stateDeltaFromGold shape
            case Some(s) if s.collectTails => s.chunkTurns
            case _ => Int.MaxValue
          }
          new SweepIterator(data, tl, cx, gap, limit, writer, chunkTurns)
      }
    GraftInternalAccess.internalCreateDataFrame(spark, rdd, outSchema)
  }

  /** One buffered emit-eligible row of the current ts-second tie group:
    * the copied UnsafeRow plus its already-resolved lag/session values
    * (lag is row-order semantics, frames are group semantics).
    */
  private final class Pending(
      val row: InternalRow,
      val gapSecs: Long, val hasGap: Boolean,
      val prevRole: UTF8String,
      val sessionId: Int,
      val textLen: Long)

  /** The sweep itself. Input rows are sorted by
    * (conv, turn-with-state-first, _k, _seq, ts, role, tool, text).
    * Per conversation it maintains the three ring-buffer frames
    * ([[FrameQ]]), the lag chain, and the session counter; all rows of
    * one epoch-second enter the frames before any of them is emitted
    * (RANGE-frame tie semantics), so a tie group is buffered (copied)
    * until its last member has been seen.
    */
  private final class SweepIterator(
      in: Iterator[InternalRow], tails: Iterator[InternalRow],
      ctx: Iterator[InternalRow], gapSecs: Long,
      capacityLimit: Long = Long.MaxValue,
      writer: graft.meta.StateSideWriter = null,
      chunkTurns: Int = Int.MaxValue)
      extends Iterator[InternalRow] {

    // per-conversation accepted-row running state for the side-files:
    // the last accepted row's identity fields plus its session counter,
    // flushed per turn-chunk and at conversation end — exactly what the
    // legacy sliceMetaFromGold aggregate recomputed from the files
    private var accAny = false
    private var accTsUs = 0L
    private var accTurn = 0
    private var accRole: UTF8String = _
    private var accSession = 0
    private var accChunk = 0

    private def flushAcc(): Unit =
      if (accAny) {
        writer.flushChunk(curConv, accChunk, accTsUs, accTurn, accRole, accSession)
        accAny = false
      }

    // optimistic skew detection (see [[gold]])
    private var convDataRows = 0L
    private def checkCapacity(n: Long, what: String): Unit =
      if (n > capacityLimit)
        throw new IllegalStateException(
          s"fused sweep capacity exceeded: conversation $curConv has > $capacityLimit " +
            s"$what this slice — route it to the segmented heavy path")

    // single-row lookahead into the (conv-sorted) side-streams;
    // always a private copy (UnsafeRow buffers are reused by the
    // underlying iterators)
    private var tailLookahead: InternalRow = _
    private var ctxLookahead: InternalRow = _
    private var tailsDrained = false

    private def nextTail(): InternalRow =
      if (tailLookahead != null) { val t = tailLookahead; tailLookahead = null; t }
      else if (tails.hasNext) tails.next()
      else null

    private def nextCtx(): InternalRow =
      if (ctxLookahead != null) { val t = ctxLookahead; ctxLookahead = null; t }
      else if (ctx.hasNext) ctx.next()
      else null

    // Side-stream entries (frame tails + scalar context) feed the
    // frames STREAMING in the contract-clean common case: chunk arrays
    // are ts-sorted by construction and chunks arrive in (slice_start,
    // chunk) order, so entries are globally non-decreasing and go
    // straight into the ring buffers — O(1) extra memory no matter how
    // large the conversation's committed context is (ADVICE r4: the
    // unconditional buffer accumulated a mega's entire lookback in one
    // task's heap). Only a ts-INVERTED conversation's multi-chunk
    // tails concatenate out of order (chunk order follows turn_idx,
    // not ts); on the FIRST out-of-order entry the feed falls back to
    // buffer-and-sort, moving the already-fed prefix from the frames
    // (fully resident — no eviction happens during the drain) into the
    // buffer. Primitive growable arrays, NOT ArrayBuffer[Long]:
    // boxing doubles the sweep's allocation rate.
    private var sideCap = 1024
    private var sideTs = new Array[Long](sideCap)
    private var sideLen = new Array[Long](sideCap)
    private var sideTool = new Array[String](sideCap)
    private var sideN = 0
    private var sideSorted = true
    private var sideBuffering = false
    private var sideFed = 0L

    private def bufferEntry(t: Long, l: Long, tool: String): Unit = {
      if (sideN == sideCap) {
        val ncap = sideCap * 2
        sideTs = java.util.Arrays.copyOf(sideTs, ncap)
        sideLen = java.util.Arrays.copyOf(sideLen, ncap)
        sideTool = java.util.Arrays.copyOf(sideTool, ncap)
        sideCap = ncap
      }
      if (sideN > 0 && t < sideTs(sideN - 1)) sideSorted = false
      sideTs(sideN) = t; sideLen(sideN) = l; sideTool(sideN) = tool
      sideN += 1
    }

    private def clearSide(): Unit = {
      java.util.Arrays.fill(sideTool.asInstanceOf[Array[AnyRef]], 0, sideN, null)
      sideN = 0
      sideSorted = true
      sideBuffering = false
      sideFed = 0L
    }

    /** Route one side entry: streaming into the frames while ts stays
      * non-decreasing; buffered (for the drain-end sort) after the
      * first inversion.
      */
    private def feedEntry(t: Long, l: Long, tool: String): Unit = {
      if (sideBuffering) bufferEntry(t, l, tool)
      else if (hasPrevData && t < prevDataTsSec) {
        sideBuffering = true
        f1h.foreachEntry(bufferEntry) // every fed entry, in fed order
        f1h.clear(); f24h.clear(); f7d.clear()
        hasPrevData = false // feedSide re-seeds after the sort
        bufferEntry(t, l, tool)
      } else {
        sideFed += 1L
        checkCapacity(sideFed + sideN, "committed context events")
        f1h.add(t, l, tool); f24h.add(t, l, tool); f7d.add(t, l, tool)
        prevDataTsSec = t
        hasPrevData = true
      }
    }

    /** Apply every tail/context row of `conv` to the frames; called
      * once per conversation, after its state rows and before its
      * first data row. Rows of earlier conversations (state-only,
      * inactive this slice) are skipped; the first row of a later
      * conversation is pushed back. All streams sort conv_id with the
      * same binary UTF8String ordering, so a single forward merge
      * suffices.
      */
    private def drainTails(conv: UTF8String): Unit = {
      clearSide()
      var t = nextTail()
      while (t != null) {
        val cmp = t.getUTF8String(T_CONV).compareTo(conv)
        if (cmp > 0) { tailLookahead = t.copy(); t = null }
        else { if (cmp == 0) feedTail(t); t = nextTail() }
      }
      var c = nextCtx()
      while (c != null) {
        val cmp = c.getUTF8String(C_CONV).compareTo(conv)
        if (cmp > 0) { ctxLookahead = c.copy(); c = null }
        else {
          if (cmp == 0) {
            if (!sawState)
              throw new IllegalStateException(
                "fused sweep: scalar context without carried state for conversation " +
                  s"$curConv — context seeds frames only; pass the state delta chain")
            feedEntry(c.getLong(C_T), c.getLong(C_LEN),
              if (c.isNullAt(C_TOOL)) null else c.getUTF8String(C_TOOL).toString)
          }
          c = nextCtx()
        }
      }
      if (sideBuffering) feedSide()
    }

    /** Feed the buffered side entries to the frames in ts order
      * (inverted-conversation fallback only; the clean path streamed
      * them already).
      */
    private def feedSide(): Unit = {
      if (sideN == 0) return
      val n = sideN
      checkCapacity(n.toLong, "committed context events")
      var order: Array[Int] = null
      if (!sideSorted) {
        // ts-inverted conversations only: restore value order so the
        // frames see a valid timeline (stable for equal ts)
        order = Array.range(0, n).sortBy(sideTs(_))
      }
      var i = 0
      while (i < n) {
        val j = if (order == null) i else order(i)
        val t = sideTs(j)
        if (hasPrevData && t < prevDataTsSec)
          throw new IllegalStateException(
            "fused sweep precondition violated: ts decreases within conversation " +
              s"$curConv in side-stream context ($t < $prevDataTsSec)")
        f1h.add(t, sideLen(j), sideTool(j))
        f24h.add(t, sideLen(j), sideTool(j))
        f7d.add(t, sideLen(j), sideTool(j))
        prevDataTsSec = t
        hasPrevData = true
        i += 1
      }
      clearSide()
    }

    private val f1h = new FrameQ(3600L, trackDistinct = false)
    private val f24h = new FrameQ(86400L)
    private val f7d = new FrameQ(604800L, trackDistinct = false)

    private var curConv: UTF8String = _
    private var sawState = false
    private var sessions = 0
    private var hasPrev = false       // lag chain seeded (state/context/slice)
    private var prevTsSec = 0L
    private var prevRole: UTF8String = _
    private var hasPrevData = false   // last DATA row's second (monotonicity check)
    private var prevDataTsSec = 0L
    private var lastTurn = 0
    private var hasLastTurn = false
    // highest committed turn_idx from the state rows: the cross-slice
    // dedup horizon. Committed slices hold a turn-prefix (ts is
    // non-decreasing in turn and slices partition by ts), so a bronze
    // row with turn_idx <= stateTurn is a re-send of committed data —
    // dropped without needing the committed rows themselves in the
    // lookback (this is what lets frame tails replace raw context).
    private var stateTurn = Int.MinValue

    // current emit group (same conv, same epoch second, _k == 2 rows)
    private val group = mutable.ArrayBuffer[Pending]()
    private var groupPos = 0
    private var groupTsSec = Long.MinValue
    private var groupOpen = false

    // single-row pushback (the row that terminated the previous group;
    // always a private copy)
    private var lookahead: InternalRow = _

    private def resetConv(conv: UTF8String): Unit = {
      curConv = conv
      convDataRows = 0L
      accAny = false
      accRole = null
      sawState = false
      sessions = 0
      hasPrev = false
      prevRole = null
      hasPrevData = false
      hasLastTurn = false
      stateTurn = Int.MinValue
      tailsDrained = false
      groupTsSec = Long.MinValue
      groupOpen = false
      f1h.clear(); f24h.clear(); f7d.clear()
    }

    private def tsSecOf(r: InternalRow): Long = Math.floorDiv(r.getLong(TS), 1000000L)

    private def nextRow(): InternalRow =
      if (lookahead != null) { val t = lookahead; lookahead = null; t }
      else if (in.hasNext) in.next()
      else null

    /** Process one data row (k == 1 context or k == 2 slice): frames,
      * lag chain, session counter, group buffering.
      */
    private def processData(r: InternalRow, k: Int): Unit = {
      val t = tsSecOf(r)
      if (hasPrevData && t < prevDataTsSec)
        throw new IllegalStateException(
          "fused sweep precondition violated: ts decreases within conversation " +
            s"$curConv at turn ${r.getInt(TURN)} ($t < $prevDataTsSec); " +
            "use the declarative SilverBuilder/FeatureWindows path")
      if (t != groupTsSec) {
        groupTsSec = t
        f1h.evictBefore(t - f1h.spanSecs)
        f24h.evictBefore(t - f24h.spanSecs)
        f7d.evictBefore(t - f7d.spanSecs)
      }
      val textLen = if (r.isNullAt(TEXT)) 0L else r.getUTF8String(TEXT).numChars().toLong
      val tool = if (r.isNullAt(TOOL)) null else r.getUTF8String(TOOL).toString
      f1h.add(t, textLen, tool); f24h.add(t, textLen, tool); f7d.add(t, textLen, tool)

      val g = if (hasPrev) t - prevTsSec else -1L
      val isBreak = !hasPrev || g > gapSecs
      if (k == 2) {
        if (isBreak) sessions += 1
        group += new Pending(r.copy(), g, hasPrev, prevRole, sessions, textLen)
        groupOpen = true
      } else if (!sawState && isBreak) {
        // no carried state = full history present (single-shot use):
        // context rows count their own session breaks so slice rows
        // continue the correct numbering
        sessions += 1
      }
      prevTsSec = t
      prevRole = r.getUTF8String(ROLE).copy()
      hasPrev = true
      prevDataTsSec = t
      hasPrevData = true
      if (k == 2 && writer != null) {
        val turn = r.getInt(TURN)
        val chunk = Math.floorDiv(turn, chunkTurns)
        if (accAny && chunk != accChunk) flushAcc()
        accChunk = chunk
        accAny = true
        accTsUs = r.getLong(TS)
        accTurn = turn
        accRole = prevRole
        accSession = sessions
        writer.addEntry(t, textLen, if (r.isNullAt(TOOL)) null else r.getUTF8String(TOOL))
      }
    }

    /** Feed one frame-tail row's (ts, len, tool) entries. The lag
      * chain and the session counter are NOT touched — the state rows
      * carry them (st_last_ts/role/sessions equal the last committed
      * event's, so the values the old raw-context path would have
      * left behind).
      */
    private def feedTail(r: InternalRow): Unit = {
      if (!sawState)
        throw new IllegalStateException(
          "fused sweep: frame-tail context without carried state for conversation " +
            s"$curConv — tails seed frames only; pass the state delta chain")
      val tsArr = r.getArray(T_TS)
      val lenArr = r.getArray(T_LEN)
      val toolArr = r.getArray(T_TOOL)
      var i = 0
      val n = tsArr.numElements()
      while (i < n) {
        feedEntry(tsArr.getLong(i), lenArr.getLong(i),
          if (toolArr.isNullAt(i)) null else toolArr.getUTF8String(i).toString)
        i += 1
      }
    }

    /** Fill `group` with the next emit group. A group is complete when
      * a row of a different conversation or a later second appears (it
      * is pushed back), or at EOF. Returns false only at EOF with
      * nothing to emit.
      */
    private def loadGroup(): Boolean = {
      group.clear(); groupPos = 0; groupOpen = false
      var r = nextRow()
      while (r != null) {
        val conv = r.getUTF8String(CONV)
        val newConv = curConv == null || !conv.equals(curConv)
        if (newConv && groupOpen) { lookahead = r.copy(); return true }
        if (newConv) {
          if (writer != null) flushAcc() // previous conversation's final chunk
          resetConv(conv.copy())
        }
        val k = r.getInt(K)
        if (k == 0) {
          // state pseudo-row: seed lag chain + session counter (latest
          // delta wins — rows arrive in slice_start order)
          sessions = if (r.isNullAt(SESSIONS)) 0 else r.getInt(SESSIONS)
          prevTsSec = tsSecOf(r)
          prevRole = r.getUTF8String(ROLE).copy()
          hasPrev = true
          sawState = true
          if (r.getInt(TURN) > stateTurn) stateTurn = r.getInt(TURN)
        } else {
          if (!tailsDrained) { drainTails(curConv); tailsDrained = true }
          val turn = r.getInt(TURN)
          if (k == 2 && turn <= stateTurn) {
            // re-send of a committed turn (possibly beyond the frame
            // lookback): dropped — the committed row already emitted
            // in its own slice, exactly the single-shot winner
          } else if (hasLastTurn && turn == lastTurn) {
            // duplicate of an already-accepted (conv, turn): dropped —
            // sort order makes the SilverBuilder winner arrive first
          } else {
            val t = tsSecOf(r)
            if (groupOpen && t != groupTsSec) { lookahead = r.copy(); return true }
            lastTurn = turn; hasLastTurn = true
            if (k == 2) { convDataRows += 1L; checkCapacity(convDataRows, "accepted rows") }
            processData(r, k)
          }
        }
        r = nextRow()
      }
      if (writer != null) flushAcc() // EOF: last conversation's final chunk
      groupOpen
    }

    override def hasNext: Boolean = groupPos < group.length || loadGroup()

    override def next(): InternalRow = {
      if (groupPos >= group.length && !loadGroup())
        throw new NoSuchElementException("empty sweep iterator")
      val p = group(groupPos); groupPos += 1
      emit(p)
    }

    // the emitted row object is REUSED across next() calls — standard
    // operator contract (the immediate consumer is an unsafe
    // projection that serializes each row before anything buffers it);
    // a fresh 16-slot array + GenericInternalRow per output row was
    // two allocations per row on the engine's hottest loop
    private val outArr = new Array[Any](16)
    private val outRow = new GenericInternalRow(outArr)

    private def emit(p: Pending): InternalRow = {
      val r = p.row
      val out = outArr
      out(0) = r.getUTF8String(CONV)
      out(1) = r.getInt(TURN)
      out(2) = r.getUTF8String(ROLE)
      out(3) = if (r.isNullAt(TEXT)) null else r.getUTF8String(TEXT)
      out(4) = if (r.isNullAt(TOOL)) null else r.getUTF8String(TOOL)
      out(5) = r.getLong(TS)
      out(6) = Math.floorDiv(r.getLong(TS), 86400000000L).toInt
      out(7) = f1h.cnt
      out(8) = f1h.toolCalls
      out(9) = f1h.sumLen
      out(10) = f24h.distinctCnt
      out(11) = f7d.sumLen.toDouble / f7d.cnt
      out(12) = p.prevRole
      out(13) = if (p.hasGap) p.gapSecs else null
      out(14) = p.sessionId
      out(15) = p.textLen
      outRow
    }
  }
}
