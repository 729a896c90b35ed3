package graft.meta

import java.io.{BufferedWriter, ObjectInputStream, ObjectOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.spark.TaskContext

/** Per-task state side-files: the fused sweep emits each slice's
  * conversation-state delta (and, under the tails context strategy,
  * the trimmed frame-tail arrays) as a side product of the gold-write
  * tasks themselves, instead of a separate post-write aggregate job
  * over the written files.
  *
  * Why: the state-delta aggregate was a ~2-3.5 s/slice FIXED job at 16
  * cores (scan + shuffle + write scheduling) — pure Amdahl residue
  * that caps N->4N scaling. The sweep already streams every
  * conversation's rows in sorted order and knows, at conversation end,
  * exactly what the aggregate recomputed: the last accepted row's
  * (ts, turn_idx, role, session) and the accepted events inside the
  * lookback of slice end. Emitting them inline costs O(1) per row.
  *
  * Files are JSON-lines gzip, one per sweep task, with DETERMINISTIC
  * names (`part-<partitionId>.json.gz`): a task retry overwrites its
  * own file with identical content (the sweep input partition is a
  * deterministic sort of a hash partition). The driver pre-clears the
  * slice's delta dir before each write attempt, so files from a
  * failed attempt with different routing/partitioning never survive.
  * Like the v2 output committer the data write uses in bench mode,
  * this assumes no task SPECULATION (two attempts racing one path) —
  * speculation is off by default and incompatible with v2 commits
  * anyway. Readers ([[Checkpoint.readConvStateDeltas]] /
  * [[Checkpoint.readFrameTails]]) dispatch per slice dir between this
  * JSON format and the parquet dirs older engines (and the heavy-path
  * aggregate) write.
  *
  * Timestamps are written as epoch MICROS (`st_last_ts_us`) — exact
  * under both timestamp flavors and immune to timezone formatting.
  */
final case class StateSideSink(
    dir: String,
    /** events with epoch-second ts below this can never fall in a
      * future slice's widest frame — not collected (same trim rule as
      * [[Checkpoint.sliceMetaFromGold]]) */
    minKeepSec: Long,
    /** collect tail arrays (tails strategy) or state-only (rescan) */
    collectTails: Boolean,
    chunkTurns: Int,
    conf: SerializableHadoopConf)

/** Minimal serializable Hadoop Configuration carrier (the stock class
  * is not Serializable; Configuration implements Writable).
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object StateSideWriter {
  /** JSON string escape (same rules as the driver-written watermark
    * files).
    */
  def jstr(s: String): String =
    if (s == null) "null"
    else {
      val b = new java.lang.StringBuilder(s.length + 2)
      b.append('"')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') b.append("\\\"")
        else if (c == '\\') b.append("\\\\")
        else if (c < ' ') b.append(f"\\u${c.toInt}%04x")
        else b.append(c)
        i += 1
      }
      b.append('"')
      b.toString
    }
}

/** One sweep task's side-file writer. Opened lazily on the first state
  * row (empty partitions create no file); closed by a task-completion
  * listener (flushes the gzip trailer on success, leaves an
  * overwrite-on-retry partial on failure).
  */
final class StateSideWriter(sink: StateSideSink) {
  private var out: BufferedWriter = _
  // tail-entry buffer of the CURRENT chunk (bounded by chunkTurns)
  private var cap = 256
  private var ts = new Array[Long](cap)
  private var len = new Array[Long](cap)
  private var tool = new Array[String](cap)
  private var n = 0

  def addEntry(t: Long, l: Long, tl: String): Unit =
    if (sink.collectTails && t >= sink.minKeepSec) {
      if (n == cap) {
        val nc = cap * 2
        ts = java.util.Arrays.copyOf(ts, nc)
        len = java.util.Arrays.copyOf(len, nc)
        tool = java.util.Arrays.copyOf(tool, nc)
        cap = nc
      }
      ts(n) = t; len(n) = l; tool(n) = tl
      n += 1
    }

  /** Write one (conv, chunk) row: the chunk's running state plus its
    * buffered live entries (omitted when none — the JSON reader
    * surfaces them as null, matching the aggregate's `when(size > 0)`
    * null). Entries were accepted in turn order with non-decreasing
    * ts, i.e. already in the aggregate's sort_array order.
    */
  def flushChunk(convId: String, chunk: Int, lastTsUs: Long, lastTurn: Int,
      lastRole: String, sessions: Int): Unit = {
    ensureOpen()
    val b = new java.lang.StringBuilder(64 + 24 * n)
    b.append("{\"conv_id\": ").append(StateSideWriter.jstr(convId))
      .append(", \"chunk\": ").append(chunk)
      .append(", \"st_last_ts_us\": ").append(lastTsUs)
      .append(", \"st_last_turn_idx\": ").append(lastTurn)
      .append(", \"st_last_role\": ").append(StateSideWriter.jstr(lastRole))
      .append(", \"st_sessions\": ").append(sessions)
    if (n > 0) {
      b.append(", \"tail_ts\": [")
      var i = 0
      while (i < n) { if (i > 0) b.append(','); b.append(ts(i)); i += 1 }
      b.append("], \"tail_len\": [")
      i = 0
      while (i < n) { if (i > 0) b.append(','); b.append(len(i)); i += 1 }
      b.append("], \"tail_tool\": [")
      i = 0
      while (i < n) {
        if (i > 0) b.append(',')
        b.append(StateSideWriter.jstr(tool(i)))
        i += 1
      }
      b.append(']')
    }
    b.append("}\n")
    out.write(b.toString)
    java.util.Arrays.fill(tool.asInstanceOf[Array[AnyRef]], 0, n, null)
    n = 0
  }

  private def ensureOpen(): Unit =
    if (out == null) {
      val pid = TaskContext.getPartitionId()
      val p = new org.apache.hadoop.fs.Path(f"${sink.dir}%s/part-$pid%05d.json.gz")
      val fs = p.getFileSystem(sink.conf.value)
      out = new BufferedWriter(new OutputStreamWriter(
        new GZIPOutputStream(fs.create(p, true)),
        java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
    }

  def close(): Unit =
    if (out != null) { out.close(); out = null }
}
