package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-deduplication operators for training-data pipelines:
  * exact, n-gram Jaccard (exact pairwise), MinHash+LSH (scale path),
  * and SimHash. Embedding-cosine near-dup lives in
  * [[graft.ann.Similarity]].
  *
  * Scale notes (100 TB):
  *  - exact dedup = one hash-partitioned window by normalized text —
  *    a single shuffle, map-side combinable if rewritten as groupBy.
  *  - exact Jaccard is quadratic in bucket size and exists as the
  *    oracle/verify stage; MinHash LSH is the discovery path: shuffles
  *    are bounded by (bands x docs), and candidate verification only
  *    touches colliding pairs.
  *  - banding means a near-dup pair is missed only if ALL bands differ
  *    — recall tunable via (k, bands) without ever materializing the
  *    pairwise matrix.
  */
object Dedup {

  private def norm(text: Column): Column = lower(trim(text))

  /** Exact dedup: canonical doc = min id among byte-identical
    * (normalized) texts.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(norm(col(textCol)))
    docs
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("canonical_id")).cast("int"))
  }

  /** Distinct word n-gram shingles of the normalized text. Documents
    * shorter than n words shingle to the whole document.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(norm(text), "\\s+")
    val full = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, (i + j + 1).cast("int"))): _*))
    array_distinct(when(size(toks) >= n, full).otherwise(array(concat_ws(" ", toks))))
  }

  /** Exact n-gram Jaccard similarity pairs (a < b) with
    * jaccard >= threshold, via PREFIX-FILTERED candidate generation
    * (the All-Pairs / PPJoin argument): order shingles by ascending
    * global document frequency (ties by hash) and index only each
    * document's first `|d| - ceil(t*|d|) + 1` shingles. Exactness: if
    * jaccard(A,B) >= t then |A∩B| >= ceil(t*|A|), so the
    * smallest-order element of A∩B sits within the first
    * |A| - |A∩B| + 1 <= prefix(A) shingles of A (and likewise of B) —
    * every qualifying pair collides inside both prefixes. Candidates
    * are then verified with exact Jaccard over the full hashed shingle
    * sets.
    *
    * Scale: df-ascending ordering pushes stop-shingles ("the and of")
    * out of the prefixes, so one hot shingle no longer creates a
    * |bucket|^2 candidate explosion — the round-1 q10 skew killer.
    * Join keys are 8-byte shingle hashes (a 64-bit cross-doc collision
    * is ~n^2/2^64), halving shuffle bytes vs strings.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      transform(shingles(col(textCol), n), s => xxhash64(s)).as("sh"))
      .withColumn("sh_cnt", size(col("sh")))
    val inv = sh.select(col("id"), col("sh_cnt"), explode(col("sh")).as("s"))
    val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // prefix length with a downward-biased ceil: an fp wobble in
    // t*cnt may only LENGTHEN the prefix (still exact, never lossy)
    val prefix = inv.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("rn") <=
        col("sh_cnt") - ceil(lit(threshold) * col("sh_cnt") - lit(1e-9)).cast("int") + 1)
      .select(col("id"), col("s"))
    val candidates = prefix.select(col("id").as("id_a"), col("s"))
      .join(prefix.select(col("id").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sh_cnt").as("cnt_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sh_cnt").as("cnt_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("cnt_a") + col("cnt_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Mersenne prime 2^31 - 1: the minhash universe. Each shingle is
    * first collapsed to one base hash x in [0, p); permutation i is the
    * affine family h_i(x) = (a_i * x + b_i) mod p with fixed odd
    * coefficients (standard Carter-Wegman minhash). All arithmetic is
    * bounded in [0, 2^62] — ANSI-safe, no overflow.
    */
  private val P = 2147483647L
  private def affineCoeffs(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(20240816L)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (P - 1) + 1, math.abs(rnd.nextLong()) % P))
  }

  /** MinHash signatures per document: explode each doc to one row per
    * shingle base-hash, then ONE hash-aggregate with k min() columns.
    * This is the 100 TB shape: map-side combine shrinks the shuffle to
    * one signature row per document, and no expression recomputes the
    * shingle set k times (the naive nested-higher-order form compiles
    * k inlined copies of the shingling and runs ~100x slower).
    */
  def minhashSignatures(
      docs: DataFrame,
      k: Int = 32,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val inv = docs.select(col(idCol).as("id"),
      explode(transform(shingles(col(textCol), n), s => pmod(xxhash64(s), lit(P)))).as("x"))
    val mins = affineCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("x") * a + b, lit(P))).as(s"m$i")
    }
    inv.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: signatures are cut into `bands`
    * bands; documents colliding in ANY band become candidates;
    * candidates are verified with exact Jaccard over the hashed shingle
    * sets. Output schema matches [[ngramJaccardPairs]] (id_a < id_b,
    * jaccard) — at high recall settings the two agree, which is what
    * DedupSpec asserts. A true near-dup pair is missed only if all
    * `bands` bands differ: P(miss) = (1 - j^(k/bands))^bands.
    */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      k: Int = 32,
      bands: Int = 16,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sig = minhashSignatures(docs, k, n, idCol, textCol)
    val bandArr = array((0 until bands).map { bnd =>
      xxhash64(lit(bnd) +: (0 until rows).map(r => col(s"m${bnd * rows + r}")): _*)
    }: _*)
    val banded = sig.select(col("id"), posexplode(bandArr))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val candidates = banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact verification of candidates only, over hashed shingle sets
    // (ids join back — texts never ride the shuffle)
    val shSets = docs.select(col(idCol).as("id"),
      array_distinct(transform(shingles(col(textCol), n), s => pmod(xxhash64(s), lit(P)))).as("sh"))
    candidates
      .join(shSets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shSets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Per-token 64-bit hash as two 32-bit halves derived from md5 (the
    * hash both Spark and DuckDB compute identically over UTF-8, so the
    * q15 oracle can replay simhash exactly): h1 = first 8 hex digits,
    * h2 = next 8. Bit b of the token hash is bit b of h1 for b < 32,
    * bit b-32 of h2 otherwise.
    */
  private[graft] def tokenHashHalves(text: Column): (Column, Column) = {
    val toks = split(norm(text), "\\s+")
    (transform(toks, w => conv(substring(md5(w), 1, 8), 16, 10).cast("long")),
      transform(toks, w => conv(substring(md5(w), 9, 8), 16, 10).cast("long")))
  }

  /** 64-bit SimHash from precomputed token-hash halves: bit b is set
    * iff the sum over tokens of (+1 if bit b of the token hash else -1)
    * is positive — i.e. 2 * |{tokens with bit b}| > |tokens|. One
    * size(filter(...)) scan per bit over the (already hashed) long
    * array; shift amounts are static literals.
    */
  private[graft] def simhashFromHalves(h1: Column, h2: Column): Column =
    (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      val (arr, sh) = if (b < 32) (h1, b) else (h2, b - 32)
      val setCnt = size(filter(arr, h => shiftright(h, sh).bitwiseAND(lit(1L)) === 1L))
      acc + when(setCnt * 2 > size(arr), lit(1L << b)).otherwise(lit(0L))
    }

  /** 64-bit SimHash of a text column (md5-derived token bits). */
  def simhash(text: Column): Column = {
    val (h1, h2) = tokenHashHalves(text)
    simhashFromHalves(h1, h2)
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming,
    * discovered by banding the 64-bit hash into `chunks` equal chunks
    * (pigeonhole: distance <= chunks-1 guarantees a shared chunk) and
    * verified with bit_count(xor).
    */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      chunks: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val width = 64 / chunks
    // hash halves materialized in their own projection so the 64
    // bit-vote expressions scan precomputed long arrays instead of
    // re-hashing every token 64 times
    val (h1, h2) = tokenHashHalves(col(textCol))
    val sh = docs.select(col(idCol).as("id"), h1.as("_h1"), h2.as("_h2"))
      .select(col("id"), simhashFromHalves(col("_h1"), col("_h2")).as("sim"))
    val chunkArr = array((0 until chunks).map { c =>
      shiftright(col("sim"), c * width).bitwiseAND(lit((1L << width) - 1L))
    }: _*)
    val banded = sh.select(col("id"), col("sim"), posexplode(chunkArr))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = banded.select(col("chunk"), col("chunk_val"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("chunk"), col("chunk_val"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
