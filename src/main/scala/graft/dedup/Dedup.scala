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
    * jaccard >= threshold. Pairs are discovered through an inverted
    * shingle index (explode + self-join), so only documents sharing at
    * least one shingle are compared — still the exact result, since
    * jaccard > 0 requires a shared shingle.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("sh_cnt", size(col("sh")))
    // join on the 8-byte shingle hash, not the string — same result
    // (shingles are distinct per doc; a 64-bit cross-doc collision is
    // ~n^2/2^64), half the shuffle bytes
    val inv = sh.select(col("id"), col("sh_cnt"),
      explode(transform(col("sh"), s => xxhash64(s))).as("s"))
    val a = inv.select(col("id").as("id_a"), col("sh_cnt").as("cnt_a"), col("s"))
    val b = inv.select(col("id").as("id_b"), col("sh_cnt").as("cnt_b"), col("s"))
    a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("cnt_a"), col("cnt_b"))
      .agg(count(lit(1)).as("inter"))
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

  /** 64-bit SimHash over tokens: bit b is set iff the sum over tokens
    * of (+1 if bit b of xxhash64(token) else -1) is positive.
    */
  def simhash(text: Column, bits: Int = 64): Column = {
    val toks = split(norm(text), "\\s+")
    // one aggregate pass per bit, statically unrolled (shift amounts
    // must be literals); each pass is a codegen'd scan of the token array
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      val vote = aggregate(toks, lit(0L),
        (s, w) => s + (shiftright(xxhash64(w), b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      acc + when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
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
    val sh = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sim"))
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
