package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Training-data-pipeline operators registered with the driver contract:
  * dedup family, similarity search, and text analysis over the
  * `documents` / `embeddings` test tables. SQL-expressible ops carry a
  * DuckDB oracle; MinHash/SimHash/LSH are approximate-by-design and are
  * instead property-tested against their exact counterparts
  * (DedupSpec / SimilaritySpec).
  */
object TrainingDataQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q9_dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir)).select(col("doc_id"), col("canonical_id"), col("is_dup"))),

    "q10_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), threshold = 0.8)),

    "q11_text_stats" -> ((s, dir) =>
      TextAnalysis.textStats(docs(s, dir)).select(
        col("doc_id"), col("token_cnt"), col("char_cnt"), col("avg_word_len"),
        col("stopword_ratio"), col("punct_ratio"), col("quality_score"))),

    "q12_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir)).select(col("doc_id"), col("lang"), col("lang_pred"))),

    "q13_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir)).select(col("doc_id"), col("fingerprint"))),

    "q14_minhash_dedup" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), threshold = 0.8)),

    "q15_simhash_dedup" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), maxHamming = 7, chunks = 8)),

    "q16_embed_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), threshold = 0.45)),

    "q17_ann_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 20), e, k = 5)
    }),

    "q18_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e.filter(col("vec_id") < 20), e, k = 5, dim = 64)
    })
  )

  /** DuckDB shingle CTE mirroring Dedup.shingles (distinct word
    * trigrams of lower(trim(text)); whole doc when < 3 words).
    */
  private val shinglesCte: String =
    """WITH toks AS (
      |  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS arr
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(arr) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(arr) - 1),
      |        i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]))
      |    ELSE [array_to_string(arr, ' ')] END AS s
      |  FROM toks
      |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q9_dedup_exact" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY lower(trim(text))) AS canonical_id,
        |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY lower(trim(text))) AS INT) AS is_dup
        |FROM documents""".stripMargin,

    "q10_ngram_jaccard" ->
      s"""$shinglesCte, inv AS (
         |  SELECT doc_id, unnest(s) AS g, len(s) AS cnt FROM sh
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.cnt AS cnt_a, b.cnt AS cnt_b,
         |         count(*) AS inter
         |  FROM inv a JOIN inv b USING (g)
         |  WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT id_a, id_b,
         |  round(inter * 1.0 / (cnt_a + cnt_b - inter), 6) AS jaccard
         |FROM pairs
         |WHERE round(inter * 1.0 / (cnt_a + cnt_b - inter), 6) >= 0.8""".stripMargin,

    "q11_text_stats" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS token_cnt,
        |    length(text) AS char_cnt,
        |    string_split_regex(lower(trim(text)), '\s+') AS arr
        |  FROM documents
        |), ratios AS (
        |  SELECT doc_id, CAST(token_cnt AS INT) AS token_cnt, CAST(char_cnt AS INT) AS char_cnt,
        |    round(length(regexp_replace(text, '\s', '', 'g')) * 1.0 / greatest(token_cnt, 1), 6) AS avg_word_len,
        |    round(len(list_filter(arr, x -> list_contains(['the','and','of','to','a','in','is','it'], x))) * 1.0
        |      / greatest(token_cnt, 1), 6) AS stopword_ratio,
        |    round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / greatest(char_cnt, 1), 6) AS punct_ratio
        |  FROM base
        |)
        |SELECT doc_id, token_cnt, char_cnt, avg_word_len, stopword_ratio, punct_ratio,
        |  round(least(CAST(token_cnt AS DOUBLE), 200) / 200 * 0.5
        |    + stopword_ratio * 0.3 + (1 - punct_ratio) * 0.2, 6) AS quality_score
        |FROM ratios""".stripMargin,

    "q12_lang_id" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text,
        |    string_split_regex(lower(trim(text)), '\s+') AS arr
        |  FROM documents
        |), hits AS (
        |  SELECT doc_id, lang, text,
        |    len(list_filter(arr, x -> list_contains(['the','and','of','to','a','in','is','it'], x))) AS h_en,
        |    len(list_filter(arr, x -> list_contains(['der','die','und','ist','das','nicht','ein'], x))) AS h_de,
        |    len(list_filter(arr, x -> list_contains(['le','la','et','les','des','un','est'], x))) AS h_fr,
        |    len(list_filter(arr, x -> list_contains(['el','los','las','es','una','por','que'], x))) AS h_es
        |  FROM base
        |)
        |SELECT doc_id, lang,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
        |       WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
        |       WHEN h_fr >= h_es THEN 'fr'
        |       ELSE 'es' END AS lang_pred
        |FROM hits""".stripMargin,

    "q16_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a, e b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.45""".stripMargin,

    "q17_ann_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20
        |), scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(q.qv, c.v), 6) AS score
        |  FROM q, e c WHERE c.vec_id <> q.query_id
        |)
        |SELECT query_id, neighbor_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) <= 5""".stripMargin
  )
}
