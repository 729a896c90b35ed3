package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the core-aware (relative) skew-dispatch threshold —
  * min(absolute crossover, max(floor, alpha x sliceRows/sweepParts)).
  * The end-to-end correctness of routed-vs-light computation is pinned
  * by BackfillSpec's mega test and SegmentedSweepSpec's bit-equality;
  * this spec pins the DECISION rule itself.
  */
class SkewDispatchSpec extends AnyFunSuite {

  private def eff(abs: Option[Long], rows: Option[Long], parts: Int) =
    Backfill.effectiveSkewThreshold(abs, rows, parts)

  test("relative bound binds below the absolute crossover at bench-like shapes") {
    // 1.2M-row slice over 12 sweep partitions, alpha=2 -> 200k:
    // the planted ~700k-row-per-slice mega routes heavy even though it
    // is far under the absolute 10^7 crossover
    val (thr, upfront) = eff(Some(10000000L), Some(1200000L), 12)
    assert(thr.contains(200000L) && upfront)
  }

  test("scales with partition count: 1000-core shapes route 10M-row conversations") {
    // 1B-row slice over 8192 partitions -> avg ~122k, threshold ~244k
    val (thr, upfront) = eff(Some(10000000L), Some(1000000000L), 8192)
    assert(upfront && thr.exists(t => t < 300000L))
  }

  test("floor keeps tiny slices on the light sweep (spec-scale data never routes)") {
    val (thr, upfront) = eff(Some(10000000L), Some(1000L), 4)
    assert(thr.contains(100000L))
    assert(upfront) // relative still binds vs the absolute 10^7 ...
    // ... but no spec-scale conversation reaches 100k rows, so routing
    // behavior of small fixtures is unchanged
  }

  test("explicit small absolute thresholds (specs) keep lazy semantics") {
    // a spec passing skewHeavyThreshold=300 keeps threshold 300 and the
    // lazy protocol: min(300, max(100000, ...)) = 300, relative not binding
    val (thr, upfront) = eff(Some(300L), Some(5000L), 4)
    assert(thr.contains(300L) && !upfront)
  }

  test("no estimate or no absolute threshold -> unchanged legacy behavior") {
    assert(eff(Some(10000000L), None, 12) == (Some(10000000L), false))
    assert(eff(None, Some(1200000L), 12) == (None, false))
  }
}
