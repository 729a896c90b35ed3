package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.gold.FeatureWindows
import graft.schema.TranscriptSchema
import graft.silver.SilverBuilder

/** Golden feature fixture (SURVEY.md §5.2.1, FIXTURES.md §2): a 20-turn
  * transcript mirroring the reference's only correctness fixture — 20
  * events, 11 entities, ~30 min span, one entity with 6 events
  * (sample_data/bronze_sample_transactions.json:1-20) — processed as
  * one batch. Expected gold vectors come from an in-test brute-force
  * O(n^2) oracle; assertions are exact for counts and 1e-9 allclose for
  * avg, at every (conv_id, turn_idx, ts), plus exact text equality
  * under stable ordering.
  */
class GoldenFixtureSpec extends AnyFunSuite {
  import TranscriptSchema.Turn

  private val base = 1704067200L // 2024-01-01T00:00:00Z

  /** 20 turns, 11 conversations; conv_00001 holds turns at the sample
    * fixture's row positions (1,2,5,9,14,19 -> 30s/100s cadence).
    */
  private val turns: Seq[Turn] = {
    val conv1Rows = Seq(0, 1, 4, 8, 13, 18)
    (0 until 20).map { i =>
      val (conv, turnIdx) =
        if (conv1Rows.contains(i)) ("conv_00001", conv1Rows.indexOf(i))
        else (f"conv_${(i % 10) + 2}%05d", i / 10)
      val ts = base + i * 30L + (i / 5) * 100L
      Turn(
        conv_id = conv,
        turn_idx = turnIdx,
        role = Seq("user", "assistant", "tool")(i % 3),
        text = s"turn $i text " + ("x" * (i % 7)),
        tool = if (i % 3 == 2) Some(s"tool_${i % 4}") else None,
        ts = new Timestamp(ts * 1000L))
    }
  }

  private lazy val gold: Array[Row] = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    FeatureWindows.gold(SilverBuilder.build(turns.toDF()))
      .orderBy("conv_id", "turn_idx").collect()
  }

  private def bf(conv: String, ts: Timestamp, frameSecs: Long): Seq[Turn] =
    turns.filter(t => t.conv_id == conv &&
      t.ts.getTime / 1000 >= ts.getTime / 1000 - frameSecs &&
      t.ts.getTime / 1000 <= ts.getTime / 1000)

  test("golden: every feature vector matches the brute-force oracle") {
    assert(gold.length == 20)
    gold.foreach { r =>
      val conv = r.getAs[String]("conv_id")
      val ts = r.getAs[Timestamp]("ts")
      val key = s"($conv, ${r.getAs[Int]("turn_idx")})"
      assert(r.getAs[Long]("turns_cnt_1h") == bf(conv, ts, 3600).size, s"turns_cnt_1h $key")
      assert(r.getAs[Long]("tool_calls_1h") == bf(conv, ts, 3600).count(_.tool.isDefined), s"tool_calls_1h $key")
      assert(r.getAs[Long]("chars_sum_1h") == bf(conv, ts, 3600).map(_.text.length.toLong).sum, s"chars_sum_1h $key")
      assert(r.getAs[Int]("tool_distinct_24h") == bf(conv, ts, 86400).flatMap(_.tool).distinct.size, s"tool_distinct_24h $key")
      val exp7d = { val xs = bf(conv, ts, 604800).map(_.text.length.toDouble); xs.sum / xs.size }
      assert(math.abs(r.getAs[Double]("avg_chars_7d") - exp7d) < 1e-9, s"avg_chars_7d $key")
    }
  }

  test("golden: per-turn text equality under stable ordering") {
    val got = gold.map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"), r.getAs[String]("text")))
    val exp = turns.sortBy(t => (t.conv_id, t.turn_idx)).map(t => (t.conv_id, t.turn_idx, t.text))
    assert(got.toSeq == exp)
  }

  test("golden: lag/gap/session match a sequential replay") {
    turns.groupBy(_.conv_id).foreach { case (conv, ts0) =>
      val seq0 = ts0.sortBy(_.turn_idx)
      var session = 0
      var prev: Option[Turn] = None
      seq0.foreach { t =>
        val gap = prev.map(p => t.ts.getTime / 1000 - p.ts.getTime / 1000)
        if (gap.isEmpty || gap.get > 1800) session += 1
        val r = gold.find(r => r.getAs[String]("conv_id") == conv && r.getAs[Int]("turn_idx") == t.turn_idx).get
        assert(Option(r.getAs[String]("prev_role")) == prev.map(_.role), s"prev_role ($conv,${t.turn_idx})")
        assert(Option(r.getAs[Any]("gap_secs")).map(_.asInstanceOf[Long]) == gap, s"gap_secs ($conv,${t.turn_idx})")
        assert(r.getAs[Int]("session_id") == session, s"session_id ($conv,${t.turn_idx})")
        prev = Some(t)
      }
    }
  }
}
