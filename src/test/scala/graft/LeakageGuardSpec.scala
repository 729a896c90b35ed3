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

  test("a future-reading FEATURE is flagged even when a label also reads it") {
    // round-1 false negative: `nxt` fed the label, so the old fixpoint
    // exempted it — but nxt is also in the output as a feature
    val df = t
      .withColumn("nxt", lead(col("role"), 1).over(w))
      .withColumn("label_y", (col("nxt") === "tool").cast("int"))
    val v = LeakageGuard.violations(df, labelCols = Set("label_y"))
    assert(v.nonEmpty && v.exists(_.contains("nxt")), v.mkString("; "))
  }

  test("a label-only intermediate (dropped from output) stays exempt") {
    val df = t
      .withColumn("nxt", lead(col("role"), 1).over(w))
      .withColumn("label_y", (col("nxt") === "tool").cast("int"))
      .drop("nxt")
    assert(LeakageGuard.violations(df, labelCols = Set("label_y")).isEmpty)
  }

  test("filtering rows by the label does not un-exempt it") {
    val df = t
      .withColumn("label_next_role", lead(col("role"), 1).over(w))
      .filter(col("label_next_role").isNotNull)
    assert(LeakageGuard.violations(df, labelCols = Set("label_next_role")).isEmpty)
  }

  test("double-negated frame bound -(-5) FOLLOWING is rejected") {
    val df = t.withColumn("fut3", expr(
      "sum(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx " +
        "RANGE BETWEEN CURRENT ROW AND -(-5) FOLLOWING)"))
    assert(LeakageGuard.violations(df).nonEmpty)
  }
}
