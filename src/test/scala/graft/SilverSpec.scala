package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.silver.SilverBuilder

class SilverSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val bronze = TranscriptGen.transcripts(
    spark, nConvs = 50, avgTurns = 15, injectAnomalies = true).cache()

  test("dedup keeps exactly one row per (conv_id, turn_idx)") {
    val silver = SilverBuilder.build(bronze)
    val dups = silver.groupBy("conv_id", "turn_idx").count().filter(col("count") > 1)
    assert(dups.count() == 0)
  }

  test("dedup is deterministic under any partition layout (D4 fix)") {
    val s1 = SilverBuilder.build(bronze)
    val s2 = SilverBuilder.build(bronze.repartition(13, col("text")))
    val s3 = SilverBuilder.build(bronze.repartition(1))
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    assert(s1.exceptAll(s3).count() == 0 && s3.exceptAll(s1).count() == 0)
  }

  test("dedup keeps the deterministic minimum (ts, role, tool, text) row") {
    // injected dupes have ts+1s and ' duplicated-later-variant' text —
    // the original must always win
    val silver = SilverBuilder.build(bronze)
    assert(silver.filter(col("text").contains("duplicated-later-variant")).count() == 0)
  }

  test("validation drops null conv_id rows, silver is idempotent") {
    assert(bronze.filter(col("conv_id").isNull).count() > 0)
    val silver = SilverBuilder.build(bronze)
    assert(silver.filter(col("conv_id").isNull).count() == 0)
    val twice = SilverBuilder.build(silver.drop("dt"))
    assert(silver.exceptAll(twice).count() == 0 && twice.exceptAll(silver).count() == 0)
  }

  test("dt is the UTC date of ts (D2 fix)") {
    val bad = SilverBuilder.build(bronze)
      .filter(col("dt") =!= to_date(col("ts")))
    assert(bad.count() == 0)
  }
}
