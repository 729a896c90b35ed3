package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  // every DataFrame this module persists, so sessions cycling many
  // corpora can release exactly these entries without nuking unrelated
  // cache entries via spark.catalog.clearCache()
  private val cached = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private def registerCache(df: DataFrame): DataFrame = {
    cached.add(df); df
  }

  /** Unpersist every intermediate this module cached (shingle sets,
    * prefix indexes). Call after the final action on a returned
    * DataFrame; results already materialized stay valid, but
    * re-computing an un-materialized result after release re-runs the
    * shingling.
    */
  def releaseCaches(): Unit = {
    var df = cached.poll()
    while (df != null) { df.unpersist(); df = cached.poll() }
  }

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

  /** Hashed shingle sets per document: (id, sh: array<long>, sh_cnt).
    *
    * Token-tuple hashing, staged across three projections: split the
    * text ONCE, hash every token ONCE, then hash each shingle as the
    * xxhash64 of its n token hashes. The naive alternative — hashing
    * the string shingles produced by [[shingles]] — re-splits the text
    * inside every lambda element (Catalyst performs no common-
    * subexpression elimination inside interpreted higher-order-function
    * lambdas: each `element_at(split(text), i)` re-evaluates the
    * split), costing O(tokens · n) splits per document plus an
    * optimizer-inferred `size(shingleExpr) > 0` filter that shingles
    * every document a second time — measured 40x slower end-to-end.
    * Distinctness of tuple hashes matches string-shingle distinctness
    * modulo ~2^-64 collisions (tokens contain no whitespace, so the
    * n-token tuple determines the joined string and vice versa).
    * Documents shorter than n tokens hash the whole token-hash array
    * (the whole-document fallback of [[shingles]]).
    *
    * The result is persisted at MEMORY_AND_DISK. This is load-bearing,
    * not a convenience: (1) every consumer references the sets 2-4
    * times (inverted index, prefix self-join, two verify join-backs) —
    * uncached, Catalyst re-evaluates the shingling per consumer; and
    * (2) worse, `InferFiltersFromGenerate` + join-key null inference
    * insert an `isnotnull(sh) AND size(sh) > 0` filter that predicate
    * pushdown then relocates BELOW these projections, substituting the
    * full alias chain — the pushed filter re-inlines the token-hash
    * transform inside the shingle lambda, turning O(tokens) per doc
    * into O(tokens^2) (measured 15-25x the whole-query cost). The
    * cache boundary stops both: pushed filters evaluate against the
    * materialized `sh` column. Spark ML's MinHashLSH does the same.
    * Long-lived sessions cycling many corpora reclaim with
    * [[releaseCaches]] (exactly this module's entries) or
    * `spark.catalog.clearCache()` (everything) — identical inputs
    * share one entry (CacheManager dedups by logical plan).
    */
  private[graft] def hashedShingleSets(
      docs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    registerCache(hashedShingleSetsLazy(docs, n, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK))

  /** [[hashedShingleSets]] without the persist — for single-shot
    * consumers that provide their own materialization boundary.
    */
  private[graft] def hashedShingleSetsLazy(
      docs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"), split(norm(col(textCol)), "\\s+").as("_toks"))
      .select(col("id"),
        transform(col("_toks"), w => xxhash64(w)).as("_th"),
        size(col("_toks")).as("_tc"))
      .select(col("id"),
        array_distinct(
          when(col("_tc") >= n,
            transform(sequence(lit(0), col("_tc") - n),
              i => xxhash64((0 until n).map(j => element_at(col("_th"), (i + j + 1).cast("int"))): _*)))
          .otherwise(array(xxhash64(col("_th"))))).as("sh"))
      .withColumn("sh_cnt", size(col("sh")))

  /** Exact n-gram Jaccard similarity pairs (a < b) with
    * jaccard >= threshold, via PREFIX-FILTERED candidate generation
    * (the All-Pairs / PPJoin argument): order shingles by ascending
    * global document frequency (ties by hash) and index only each
    * document's first `|d| - ceil(t*|d|) + 1` shingles. Exactness: if
    * jaccard(A,B) >= t then |A∩B| >= ceil(t*|A|), so the
    * smallest-order element of A∩B sits within the first
    * |A| - |A∩B| + 1 <= prefix(A) shingles of A (and likewise of B) —
    * every qualifying pair collides inside both prefixes. A length
    * filter (jaccard >= t forces t·max(|A|,|B|) <= min(|A|,|B|))
    * prunes candidates before the distinct. Survivors are verified
    * with exact Jaccard over the full hashed shingle sets.
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
    val sets = hashedShingleSets(docs, n, idCol, textCol)
    val inv = sets.select(col("id"), col("sh_cnt"), explode(col("sh")).as("s"))
    val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // prefix length with a downward-biased ceil: an fp wobble in
    // t*cnt may only LENGTHEN the prefix (still exact, never lossy)
    val prefix = inv.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("rn") <=
        col("sh_cnt") - ceil(lit(threshold) * col("sh_cnt") - lit(1e-9)).cast("int") + 1)
      .select(col("id"), col("s"), col("sh_cnt"))
      // both sides of the self-join read this — one join+window pass
      .persist(StorageLevel.MEMORY_AND_DISK)
    registerCache(prefix)
    val candidates = prefix.select(col("id").as("id_a"), col("s"), col("sh_cnt").as("ca"))
      .join(prefix.select(col("id").as("id_b"), col("s"), col("sh_cnt").as("cb")), Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        // length filter, epsilon-relaxed so fp wobble never drops a
        // true pair: only pairs with min >= t*max can reach the threshold
        col("ca") >= lit(threshold) * col("cb") - lit(1e-9) &&
        col("cb") >= lit(threshold) * col("ca") - lit(1e-9))
      .select(col("id_a"), col("id_b")).distinct()
    candidates
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sh_cnt").as("cnt_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sh_cnt").as("cnt_b")), Seq("id_b"))
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
    val inv = hashedShingleSets(docs, n, idCol, textCol)
      .select(col("id"), explode(col("sh")).as("h"))
      .select(col("id"), pmod(col("h"), lit(P)).as("x"))
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
    // exact verification of candidates only, over the full 64-bit
    // hashed shingle sets (ids join back — texts never ride the shuffle)
    val shSets = hashedShingleSets(docs, n, idCol, textCol)
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
  /** Per-document 64-bit SimHash as a DataFrame (id, sim), computed
    * the whole-stage-codegen way: explode tokens, derive the two
    * md5-half longs per token row (md5/substring/conv are codegen'd —
    * no interpreted lambda anywhere), then ONE map-side-combinable
    * aggregate with 64 `sum(bit)` columns + a token count. Bit b of
    * the simhash is set iff 2 * sum_b > n — identical votes to
    * [[simhashFromHalves]], which stays as the Column-API twin, but
    * ~3x faster: the interpreted form scans the token array 64 times
    * per document through a non-codegen higher-order filter.
    */
  private[graft] def simhashByDoc(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val inv = docs
      .select(col(idCol).as("id"), explode(split(norm(col(textCol)), "\\s+")).as("w"))
      .select(col("id"),
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("w")), 9, 8), 16, 10).cast("long").as("h2"))
    val bitSums = (0 until 64).map { b =>
      val (h, sh) = if (b < 32) (col("h1"), b) else (col("h2"), b - 32)
      sum(shiftright(h, sh).bitwiseAND(lit(1L))).as(s"c$b")
    }
    val votes = inv.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val sim = (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(s"c$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))
    }
    votes.select(col("id"), sim.as("sim"))
  }

  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      chunks: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val width = 64 / chunks
    val sh = simhashByDoc(docs, idCol, textCol)
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
