package graft

import org.scalatest.funsuite.AnyFunSuite

class BackfillCliSpec extends AnyFunSuite {

  test("parses the full documented argument set") {
    val a = BackfillCli.parse(Seq(
      "--bronze", "/data/bronze", "--out", "/data/medallion",
      "--start", "2024-01-01T00:00:00Z", "--slice-secs", "86400", "--slices", "30",
      "--format", "json", "--session-gap-secs", "900",
      "--skew-threshold", "500000", "--segment-secs", "43200",
      "--compact-every", "8", "--range-layout"))
    assert(a.bronze == "/data/bronze" && a.out == "/data/medallion")
    assert(a.startSec == 1704067200L && a.sliceSecs == 86400L && a.nSlices == 30)
    assert(a.format == "json" && a.sessionGapSecs == 900L)
    assert(a.skewThreshold.contains(500000L) && a.segmentSecs == 43200L)
    assert(a.compactEvery == 8 && a.rangeLayout)
  }

  test("epoch-seconds start, defaults, and skew-path opt-out") {
    val a = BackfillCli.parse(Seq(
      "--bronze", "b", "--out", "o", "--start", "1704067200",
      "--slices", "4", "--skew-threshold", "0"))
    assert(a.startSec == 1704067200L)
    assert(a.sliceSecs == 86400L && a.format == "parquet")
    assert(a.skewThreshold.isEmpty)
  }

  test("missing required args and unknown flags are rejected") {
    assertThrows[IllegalArgumentException](
      BackfillCli.parse(Seq("--bronze", "b", "--out", "o", "--slices", "4")))
    assertThrows[IllegalArgumentException](
      BackfillCli.parse(Seq("--bronze", "b", "--frobnicate")))
  }
}
