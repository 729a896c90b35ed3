package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Clustered synthetic vectors: 10 deterministic centroids, 30 points
    * each with small perturbations — the regime where LSH buckets mean
    * something.
    */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7L)
    val dim = 16
    val centroids = Array.fill(10, dim)(rnd.nextGaussian() * 5)
    val rows = for {
      c <- 0 until 10
      i <- 0 until 30
    } yield (c.toLong * 100 + i, centroids(c).map(v => (v + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    rows.toDF("vec_id", "embedding").cache()
  }

  test("cosine is 1 for identical, -1 for opposite vectors") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f), Seq(-1f, -2f, -3f)))
      .toDF("a", "b", "neg")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("neg")).as("opp")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }

  test("brute-force top-k: k rows per query, ranked by descending cosine") {
    val q = clustered.filter(col("vec_id") % 100 === 0)
    val got = Similarity.bruteForceTopK(q, clustered, k = 5).cache()
    assert(got.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    // rank 1 neighbor of a cluster point is a same-cluster point
    val top1 = got.filter(col("rank") === 1)
      .filter((col("neighbor_id") / 100).cast("int") === (col("query_id") / 100).cast("int"))
    assert(top1.count() == q.count())
  }

  test("LSH top-k recall@5 >= 0.9 vs brute force on clustered data") {
    val q = clustered.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(q, clustered, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, clustered, 5, dim = 16, tables = 8, bits = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("near-dup pairs are symmetric-free (a < b) and above threshold") {
    val pairs = Similarity.nearDupPairs(clustered, threshold = 0.99)
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
    assert(pairs.filter(col("cos") < 0.99).count() == 0)
    assert(pairs.count() > 0) // same-cluster points are near-dups
  }

  test("blocked near-dup equals brute force bit-for-bit, several block counts") {
    val exact = Similarity.nearDupPairs(clustered, threshold = 0.99)
      .as[(Long, Long, Double)].collect().toSet
    for (blocks <- Seq(1, 3, 16)) {
      val got = Similarity.nearDupPairsBlocked(clustered, threshold = 0.99, blocks = blocks)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == exact, s"blocks=$blocks: ${got.size} vs ${exact.size}")
    }
  }

  test("blocked near-dup plans no cartesian product / nested-loop broadcast") {
    val plan = Similarity.nearDupPairsBlocked(clustered, threshold = 0.99, blocks = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
