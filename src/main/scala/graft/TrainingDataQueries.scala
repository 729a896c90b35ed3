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
      // blocked-exact primary (no cartesian / whole-table broadcast in
      // the plan — SimilaritySpec asserts); nearDupPairs stays the
      // broadcast brute-force spec oracle
      Similarity.nearDupPairsBlocked(emb(s, dir), threshold = 0.45)),

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

  /** DuckDB fold of 8 hex digits to a BIGINT in [0, 2^32) — the oracle
    * twin of Spark's `conv(substring(md5(w), a, 8), 16, 10)`.
    */
  private def hexFold(hexExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($hexExpr, ''), " +
      s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), (a, b) -> a*16 + b)"

  /** q15 oracle: replays the md5-halves simhash bit by bit. Per doc,
    * bit b is set iff 2 * |tokens with bit b of the token hash| >
    * |tokens|; hamming over all unordered pairs; keep <= maxHamming.
    * The Spark side's chunk banding is exact for maxHamming < chunks
    * (pigeonhole), so the two agree row-for-row.
    */
  private def simhashOracleSql(maxHamming: Int): String = {
    val bitCols = (0 until 64).map { b =>
      val (arr, sh) = if (b < 32) ("h1", b) else ("h2", b - 32)
      s"CASE WHEN 2 * len(list_filter($arr, h -> ((h >> $sh) & 1) = 1)) > len($arr) THEN 1 ELSE 0 END AS b$b"
    }.mkString(",\n    ")
    val hamSum = (0 until 64).map(b => s"(CASE WHEN a.b$b <> b.b$b THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS arr FROM documents
       |), hs AS (
       |  SELECT doc_id,
       |    list_transform(arr, w -> ${hexFold("substr(md5(w), 1, 8)")}) AS h1,
       |    list_transform(arr, w -> ${hexFold("substr(md5(w), 9, 8)")}) AS h2
       |  FROM toks
       |), bits AS (
       |  SELECT doc_id,
       |    $bitCols
       |  FROM hs
       |), ham AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    $hamSum AS hamming
       |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM ham WHERE hamming <= $maxHamming""".stripMargin
  }

  /** q18 oracle: replays the random-hyperplane LSH with the IDENTICAL
    * plane constants inlined as literals (same seed/layout as
    * [[Similarity.lshTopK]]); projections are written as explicit
    * left-associated sums so the fp evaluation order matches Spark's
    * aggregate fold bit-for-bit.
    */
  private def lshOracleSql(tables: Int, bits: Int, dim: Int, seed: Long, k: Int): String = {
    val planes = Similarity.hyperplanes(tables, bits, dim, seed)
    def projSql(t: Int, b: Int): String =
      (0 until dim).map(i => s"v[${i + 1}]*(${planes(t)(b)(i)})").mkString(" + ")
    def bucketSql(t: Int): String =
      (0 until bits).map { b =>
        val w = 1L << (bits - 1 - b)
        s"(CASE WHEN ${projSql(t, b)} >= 0 THEN $w ELSE 0 END)"
      }.mkString(" + ")
    val bk = (0 until tables).map { t =>
      s"SELECT vec_id, $t AS tbl, ${bucketSql(t)} AS bucket FROM e"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), bk AS (
       |  $bk
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
       |), scored AS (
       |  SELECT query_id, neighbor_id,
       |    round(list_cosine_similarity(a.v, b.v), 6) AS score
       |  FROM cand JOIN e a ON a.vec_id = cand.query_id
       |            JOIN e b ON b.vec_id = cand.neighbor_id
       |)
       |SELECT query_id, neighbor_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) <= $k""".stripMargin
  }

  /** Exact n-gram Jaccard pairs at t=0.8 — shared by q10 (prefix-filter
    * path) and q14 (MinHash LSH + exact-verify path), which agree on
    * this corpus (see q14 note below).
    */
  private val jaccardOracleSql: String =
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
       |WHERE round(inter * 1.0 / (cnt_a + cnt_b - inter), 6) >= 0.8""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q9_dedup_exact" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY lower(trim(text))) AS canonical_id,
        |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY lower(trim(text))) AS INT) AS is_dup
        |FROM documents""".stripMargin,

    "q10_ngram_jaccard" -> jaccardOracleSql,

    // the LSH+verify path is EXACT at (k=32, bands=16, t=0.8) on this
    // corpus — a qualifying pair misses all bands with
    // p = (1 - j^2)^16 <= 8e-8 and DedupSpec asserts set equality —
    // so q14 shares q10's exact-Jaccard oracle verbatim
    "q14_minhash_dedup" -> jaccardOracleSql,

    "q13_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS arr FROM documents
        |)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(arr, w ->
        |    HEXFOLD8 % 2147483647
        |  )), (acc, h) -> (acc*31 + h) % 2147483647) AS fingerprint
        |FROM toks""".stripMargin
        .replace("HEXFOLD8", hexFold("substr(md5(w), 1, 8)")),

    "q15_simhash_dedup" -> simhashOracleSql(maxHamming = 7),

    "q18_ann_lsh" -> lshOracleSql(tables = 8, bits = 8, dim = 64, seed = 42L, k = 5),

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
