package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TranscriptSource

class TranscriptSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("gzipped NDJSON bronze reads with the explicit schema, recursively (S1, D8 fix)") {
    val root = Files.createTempDirectory("bronze_json").toString
    // the reference's 5-deep ingest layout:
    // bronze/streaming/.../ingest_dt=YYYY/MM/DD/HH/mm/*.json.gz
    val deep = Paths.get(root, "ingest_dt=2024", "01", "02", "03", "04")
    Files.createDirectories(deep)
    val lines = Seq(
      """{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi there","tool":null,"ts":"2024-01-02T03:04:05.000Z"}""",
      """{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"hello","tool":null,"ts":"2024-01-02T03:04:35.000Z"}""",
      """{"conv_id":"c2","turn_idx":0,"role":"tool","text":"result","tool":"search","ts":"2024-01-02T03:05:00.000Z"}""",
      """{"conv_id":null,"turn_idx":0,"role":"user","text":"orphan","tool":null,"ts":"2024-01-02T03:06:00.000Z"}""")
    val gz = new GZIPOutputStream(Files.newOutputStream(deep.resolve("part-0.json.gz")))
    gz.write(lines.mkString("\n").getBytes("UTF-8")); gz.close()

    val got = TranscriptSource.readJson(spark, root)
    assert(got.schema == graft.schema.TranscriptSchema.bronze)
    assert(got.count() == 4)
    assert(got.filter(col("tool") === "search").count() == 1)
    // explicit schema: ts parsed as timestamp, not inferred string
    val silver = graft.silver.SilverBuilder.build(got)
    assert(silver.count() == 3) // null conv_id row dropped
    assert(silver.filter(col("dt") === lit("2024-01-02").cast("date")).count() == 3)
  }
}
