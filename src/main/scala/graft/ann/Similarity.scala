package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path. Dot
  * products are pure Catalyst higher-order functions (zip_with +
  * aggregate) — codegen-friendly, no UDF.
  *
  * Scale: brute force is O(|Q| x |C| x d) with the query side
  * broadcast — right for small query batches against a large corpus
  * (each corpus partition streams once). The LSH path shrinks the
  * candidate set per query to one bucket chain per table; recall is
  * tuned by (tables, bits) — property-tested in SimilaritySpec on
  * clustered data.
  */
object Similarity {

  /** Cosine similarity of two array<float|double> columns, computed in
    * double.
    */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    val da = d(a); val db = d(b)
    val dot = aggregate(zip_with(da, db, (x, y) => x * y), lit(0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(da, lit(0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(db, lit(0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Per-row precomputation for pairwise scoring: the double-cast
    * vector and its norm are hoisted out of the O(n^2) pair loop —
    * bitwise-identical results to [[cosine]] (same expressions, same
    * evaluation order), ~3x less work per pair.
    */
  private def withVecNorm(df: org.apache.spark.sql.DataFrame, vecCol: String,
      vd: String, norm: String): org.apache.spark.sql.DataFrame = {
    val d = transform(col(vecCol), x => x.cast("double"))
    df.withColumn(vd, d)
      .withColumn(norm, sqrt(aggregate(col(vd), lit(0d), (acc, v) => acc + v * v)))
  }

  /** dot(a, b) / (na * nb) over precomputed columns. */
  private def pairCos(vda: Column, vdb: Column, na: Column, nb: Column): Column =
    aggregate(zip_with(vda, vdb, (x, y) => x * y), lit(0d), (acc, v) => acc + v) / (na * nb)

  /** Exact top-k cosine neighbors for each query vector. `queries` and
    * `corpus` both need (idCol, vecCol); self-matches (same id) are
    * excluded. Query side is broadcast: corpus never shuffles.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = withVecNorm(queries.select(col(idCol).as("query_id"), col(vecCol).as("_q0")),
      "_q0", "_qv", "_qn").drop("_q0")
    // spread the streamed corpus over all cores: a small corpus file
    // scans as one partition, which would serialize |Q| x |C| scoring
    val c = withVecNorm(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_c0")),
      "_c0", "_cv", "_cn").drop("_c0")
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(pairCos(col("_qv"), col("_cv"), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold),
    * exact brute force — the oracle/verify formulation.
    */
  def nearDupPairs(
      embeddings: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = withVecNorm(embeddings.select(col(idCol).as("id_a"), col(vecCol).as("_a0")),
      "_a0", "_va", "_na").drop("_a0")
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
    val b = withVecNorm(embeddings.select(col(idCol).as("id_b"), col(vecCol).as("_b0")),
      "_b0", "_vb", "_nb").drop("_b0")
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(pairCos(col("_va"), col("_vb"), col("_na"), col("_nb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes: `tables` tables of `bits`
    * planes each, dimension `dim`, derived from a fixed seed (no
    * wall-clock, reproducible across runs). Package-visible so the
    * q18 DuckDB oracle can inline the identical constants.
    */
  private[graft] def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Exact near-duplicate pairs via BLOCKED pairwise scoring — the
    * distributed all-pairs scheme: each vector is hashed to one of
    * `blocks` blocks; every unordered block pair (i, j), i <= j,
    * becomes one join key; the left side replicates each vector to
    * tasks {(own, j) | j >= own}, the right side to
    * {(i, own) | i <= own}. The equi-join on the task key co-locates
    * exactly the rows of blocks i and j, so the plan is a plain
    * shuffled hash/sort-merge join — NO CartesianProduct, NO
    * BroadcastNestedLoopJoin, NO whole-table broadcast — and the
    * O(n^2/2) cosine work spreads evenly over blocks*(blocks+1)/2
    * tasks that scale out horizontally. Replication factor is
    * ~blocks/2 per side (tune `blocks` ~ sqrt(2 * desired tasks)).
    *
    * Near-dup at a WEAK cosine threshold (like q16's 0.45) is
    * inherently all-pairs — no LSH family prunes reliably there; for
    * dup-detection thresholds (>= ~0.8) prefer [[lshTopK]]-style
    * bucketing. Output is bit-identical to [[nearDupPairs]].
    *
    * `blocks = 0` (default) auto-tunes from the session's default
    * parallelism: B ~ sqrt(2 * cores) makes B(B+1)/2 ~ cores scoring
    * tasks at the minimum ~B/2 replication that still keeps every
    * core busy. Larger inputs warrant more blocks (per-task pair
    * count is (n/B)^2); callers with a known row count can pass it.
    */
  def nearDupPairsBlocked(
      embeddings: DataFrame,
      threshold: Double,
      blocks: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val b =
      if (blocks > 0) blocks
      else math.max(2, math.ceil(math.sqrt(
        2.0 * embeddings.sparkSession.sparkContext.defaultParallelism)).toInt)
    nearDupPairsBlockedAt(embeddings, threshold, b, idCol, vecCol)
  }

  private def nearDupPairsBlockedAt(
      embeddings: DataFrame,
      threshold: Double,
      blocks: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    val base = withVecNorm(
      embeddings.select(col(idCol).as("_id"), col(vecCol).as("_v0")), "_v0", "_v", "_n")
      .drop("_v0")
      .withColumn("_blk", pmod(xxhash64(col("_id")), lit(blocks)).cast("int"))
    // The pair EXPLOSION happens inside the scoring join, invisible to
    // AQE: the join's shuffle inputs are only n*B/2 vector rows, so
    // adaptive coalescing would funnel all B(B+1)/2 scoring tasks into
    // one or two post-shuffle partitions and serialize the O(n^2)
    // cosine work (measured: 14 s -> 1 s at 2k vectors x 32 cores).
    // An explicit numbered repartition by the task key pins the
    // partitioning — AQE does not coalesce user-specified repartitions
    // — and both sides arriving HashPartitioning(_task, N) means the
    // join itself adds no further shuffle. 2x oversubscription spreads
    // hash-collided task keys.
    val numParts = blocks * (blocks + 1)
    val left = base
      .withColumn("_task", explode(transform(
        sequence(col("_blk"), lit(blocks - 1)), j => col("_blk") * blocks + j)))
      .select(col("_task"), col("_id").as("id_a"), col("_v").as("_va"), col("_n").as("_na"))
      .repartition(numParts, col("_task"))
    val right = base
      .withColumn("_task", explode(transform(
        sequence(lit(0), col("_blk")), i => i * blocks + col("_blk"))))
      .select(col("_task"), col("_id").as("id_b"), col("_v").as("_vb"), col("_n").as("_nb"))
      .repartition(numParts, col("_task"))
    // off-diagonal task (i, j), i < j: blocks are disjoint, every
    // unordered pair appears exactly once (its block-i member only on
    // the left) — keep all, normalize id order afterwards. Diagonal
    // task (i, i): both sides hold block i, dedup with id_a < id_b.
    // pairCos is symmetric bit-for-bit (IEEE multiply commutes, fold
    // order is positional), so cosine needs no operand swap.
    val onDiagonal = col("_task") % blocks === floor(col("_task") / blocks).cast("int")
    left.join(right, Seq("_task"))
      .filter(!onDiagonal || col("id_a") < col("id_b"))
      .withColumn("cos", round(pairCos(col("_va"), col("_vb"), col("_na"), col("_nb")), 6))
      .filter(col("cos") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("cos"))
  }

  /** LSH-bucketed approximate top-k: sign-of-projection bucket key per
    * table; candidates = corpus vectors sharing a bucket with the query
    * in ANY table; exact cosine rank within candidates. One shuffle on
    * (table, bucket) instead of a cross join — the 100 TB path.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      dim: Int,
      tables: Int = 8,
      bits: Int = 8,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(tables, bits, dim, seed)

    def bucketKeys(vec: Column): Column = array((0 until tables).map { t =>
      (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
        val plane = planes(t)(b)
        val proj = aggregate(
          zip_with(vec, array(plane.map(lit): _*), (x, p) => x.cast("double") * p),
          lit(0d), (s, v) => s + v)
        shiftleft(acc, 1) + when(proj >= 0d, 1L).otherwise(0L)
      }
    }: _*)

    def withBuckets(df: DataFrame, id: String, v: String) = df
      .select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(bucketKeys(col(vecCol))))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")

    val qb = withBuckets(queries, "query_id", "_qv")
    // corpus-side bucket keys cost tables*bits projections per vector;
    // spread them — a single-file corpus otherwise scans as one task
    val cb = withBuckets(
      corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism),
      "neighbor_id", "_cv")
    val candidates = qb.join(cb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("_qv"), col("neighbor_id"), col("_cv"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    candidates
      .withColumn("score", round(cosine(col("_qv"), col("_cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }
}
