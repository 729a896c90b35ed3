package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("token/char counts and ratios") {
    val df = Seq((1L, "The quick brown fox, it jumps!")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(df).head()
    assert(r.getAs[Int]("token_cnt") == 6)
    assert(r.getAs[Int]("char_cnt") == 30)
    // 'the' and 'it' are stopwords -> 2/6
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.333333) < 1e-6)
    // ',' and '!' -> 2/30
    assert(math.abs(r.getAs[Double]("punct_ratio") - 0.066667) < 1e-6)
  }

  test("language heuristic picks the language with most stopword hits; CJK forces zh") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist das"),
      (3L, "le chat et la maison les des"),
      (4L, "你好 世界")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "zh"))
  }

  test("fingerprint: stable under whitespace layout, sensitive to word order") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha  beta   gamma"),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df).select("doc_id", "fingerprint")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < 2147483647L))
  }
}
