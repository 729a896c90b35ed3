package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, n-gram-heuristic language ID, and
  * document fingerprinting. All are pure Catalyst expressions (no UDFs)
  * so they stay inside whole-stage codegen and scale linearly with a
  * parquet scan — at 100 TB these run as a single narrow map stage with
  * full column pruning.
  */
object TextAnalysis {

  /** Whitespace tokenization (lowercased, trimmed). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Stopword lists per language for the n-gram language heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "que"))

  private def hits(toks: Column, lang: String): Column =
    size(filter(toks, t => array_contains(array(stopwords(lang).map(lit): _*), t)))

  /** token_cnt, char_cnt, avg_word_len, stopword_ratio, punct_ratio,
    * quality_score — deterministic quality features (the
    * length/punct/stopword-ratio family).
    */
  def textStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs
      .withColumn("token_cnt", size(t))
      .withColumn("char_cnt", length(col(textCol)))
      .withColumn("avg_word_len",
        round(length(regexp_replace(col(textCol), "\\s", "")).cast("double") /
          greatest(col("token_cnt"), lit(1)), 6))
      .withColumn("stopword_ratio",
        round(hits(t, "en").cast("double") / greatest(col("token_cnt"), lit(1)), 6))
      .withColumn("punct_ratio",
        round(length(regexp_replace(col(textCol), "[^.,;:!?]", "")).cast("double") /
          greatest(col("char_cnt"), lit(1)), 6))
      .withColumn("quality_score",
        round(least(col("token_cnt").cast("double"), lit(200d)) / 200d * 0.5 +
          col("stopword_ratio") * 0.3 + (lit(1d) - col("punct_ratio")) * 0.2, 6))
  }

  /** N-gram/stopword-heuristic language ID. CJK codepoints force zh;
    * otherwise the language with the most stopword hits wins, with a
    * fixed en>de>fr>es tie order. Deterministic and SQL-expressible (so
    * the DuckDB oracle can replay it exactly).
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs
      .withColumn("_en", hits(t, "en"))
      .withColumn("_de", hits(t, "de"))
      .withColumn("_fr", hits(t, "fr"))
      .withColumn("_es", hits(t, "es"))
      .withColumn("lang_pred",
        when(col(textCol).rlike("[\\u4e00-\\u9fff]"), "zh")
          .when(col("_en") >= col("_de") && col("_en") >= col("_fr") && col("_en") >= col("_es"), "en")
          .when(col("_de") >= col("_fr") && col("_de") >= col("_es"), "de")
          .when(col("_fr") >= col("_es"), "fr")
          .otherwise("es"))
      .drop("_en", "_de", "_fr", "_es")
  }

  /** 32-bit token hash shared with the DuckDB oracle: the first 8 hex
    * digits of md5(token), reduced mod 2^31-1. md5 is the one 64-bit+
    * hash both engines compute identically over UTF-8 bytes (xxhash64
    * has no DuckDB twin), which is what makes q13/q15 oracle-checkable.
    */
  private[graft] def tokenHash32(w: Column): Column =
    pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(2147483647L))

  /** Rolling polynomial document fingerprint over tokens, kept in
    * [0, 2^31) with modular arithmetic at every step so it is safe
    * under ANSI mode (Spark 4 default) — no silent or throwing
    * overflow. Content-defined: word-order sensitive, whitespace-layout
    * insensitive. Token hash is md5-derived ([[tokenHash32]]) so DuckDB
    * can replay the exact value.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fingerprint",
      aggregate(tokens(col(textCol)), lit(0L),
        (acc, w) => pmod(acc * 31L + tokenHash32(w), lit(2147483647L))))
}
