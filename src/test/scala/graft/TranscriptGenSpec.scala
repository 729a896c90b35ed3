package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen

class TranscriptGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("generation is deterministic across runs and partitionings") {
    val a = TranscriptGen.transcripts(spark, nConvs = 25, avgTurns = 10)
    val b = TranscriptGen.transcripts(spark, nConvs = 25, avgTurns = 10).repartition(7)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("ts is strictly monotone per conversation after turn 0; schema matches the contract") {
    val t = TranscriptGen.transcripts(spark, nConvs = 25, avgTurns = 10)
    assert(t.schema.fieldNames.toSeq ==
      Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val bad = t.withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull && col("ts") <= col("prev"))
    assert(bad.count() == 0)
  }

  test("conv ids stay distinct past the 8-digit index boundary (lpad truncation regression)") {
    // lpad truncates inputs wider than the pad width; with the old
    // 7-wide pad, conv_idx 10,000,000+ collided with earlier ids and
    // merged conversations (ts inversions inside one conv_id)
    val ids = spark.range(9999998L, 10000002L).toDF("conv_idx")
      .select(concat(lit("conv_"), lpad(col("conv_idx").cast("string"), 9, "0")).as("conv_id"))
    assert(ids.distinct().count() == 4)
    val t = TranscriptGen.transcripts(spark, nConvs = 12, avgTurns = 3)
    assert(t.select(length(col("conv_id"))).distinct().count() == 1)
  }

  test("mega conversations and session breaks are planted") {
    val t = TranscriptGen.transcripts(spark, nConvs = 10, avgTurns = 10, megaConvs = 1, megaTurns = 300)
    val sizes = t.groupBy("conv_id").count()
    assert(sizes.filter(col("count") === 300).count() == 1)
    // some inter-turn gaps exceed the 1800 s session threshold
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val gaps = t.withColumn("gap", unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
    assert(gaps.filter(col("gap") > 1800).count() > 0)
  }
}
