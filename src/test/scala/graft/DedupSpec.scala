package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("exact dedup marks byte-identical texts") {
    val base = Seq((1L, "a b c"), (2L, "a b c"), (3L, "A B C "), (4L, "different"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(base).select("doc_id", "canonical_id", "is_dup")
      .as[(Long, Long, Int)].collect().toSet
    // normalization lowercases + trims: 1,2,3 all collapse to doc 1
    assert(got == Set((1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 1), (4L, 4L, 0)))
  }

  test("minhash LSH pairs == exact n-gram jaccard pairs at 0.8 on the documents table") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.8).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, 0.8).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // verification makes LSH precise; 16 bands x 2 rows at j>=0.8 gives
    // P(miss) = (1-j^2)^16 < 2e-8 — equality expected here
    assert(lsh == exact)
  }

  test("simhash near-dups cover the jaccard near-dups and respect the hamming bound") {
    val near = Dedup.ngramJaccardPairs(docs, 0.9).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairs(docs, maxHamming = 7, chunks = 8)
    val simPairs = sim.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sim.filter(col("hamming") > 7).count() == 0)
    val covered = near.intersect(simPairs).size.toDouble / math.max(near.size, 1)
    assert(covered >= 0.9, s"simhash recall of 0.9-jaccard pairs = $covered")
  }

  test("shingles: short docs fall back to whole-document shingle") {
    val got = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text")).as("s")).as[Seq[String]].head()
    assert(got == Seq("one two"))
  }
}
