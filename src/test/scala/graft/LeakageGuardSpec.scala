package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.guard.LeakageGuard

class LeakageGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val t = TranscriptGen.transcripts(spark, nConvs = 3, avgTurns = 5)

  private val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))

  test("trailing frames and lag pass") {
    val df = t
      .withColumn("c", count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("r", sum(length(col("text"))).over(
        Window.partitionBy(col("conv_id")).orderBy(unix_timestamp(col("ts"))).rangeBetween(-3600, 0)))
      .withColumn("p", lag(col("role"), 1).over(w))
    assert(LeakageGuard.violations(df).isEmpty)
    LeakageGuard.validate(df)
  }

  test("lead is rejected") {
    val df = t.withColumn("next_role", lead(col("role"), 1).over(w))
    val v = LeakageGuard.violations(df)
    assert(v.nonEmpty && v.exists(_.contains("next_role")))
    assertThrows[IllegalStateException](LeakageGuard.validate(df))
  }

  test("following frame upper bound is rejected") {
    val df = t.withColumn("fut",
      sum(length(col("text"))).over(w.rowsBetween(Window.currentRow, 3)))
    assert(LeakageGuard.violations(df).nonEmpty)
    val df2 = t.withColumn("fut2",
      sum(length(col("text"))).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    assert(LeakageGuard.violations(df2).nonEmpty)
  }

  test("label columns are exempt") {
    val df = t.withColumn("label_next_role", lead(col("role"), 1).over(w))
    assert(LeakageGuard.violations(df, labelCols = Set("label_next_role")).isEmpty)
  }
}
