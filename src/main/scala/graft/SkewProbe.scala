package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-evidence micro-bench (dev forensics, run on demand):
  *
  * 1. `q10 skew demo` — the PPJoin prefix filter vs a naive
  *    shared-shingle join on a corpus with ONE hot shingle (every
  *    document opens with the same stop phrase). The naive inverted
  *    index explodes that bucket into |corpus|^2 candidate pairs; the
  *    df-ascending prefix filter pushes the hot shingle out of every
  *    document's prefix, so it never generates a candidate.
  *
  * 2. `heavy-path crossover` — one planted dense conversation of K
  *    turns inside a single backfill slice, run (a) on the plain fused
  *    sweep (skew dispatch off) and (b) routed to the segmented heavy
  *    path (threshold 1). Locates the K where routing starts to pay,
  *    which calibrates the default skewHeavyThreshold (Bench.scala).
  *
  * Results are recorded in docs/NEXT.md / BENCH/BASELINE.md.
  * Usage: sbt "runMain graft.SkewProbe [q10|heavy|all]"
  */
object SkewProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** N docs, each opening with the same 4-word phrase (one hot shingle
    * bucket of size N) followed by mostly-unique filler.
    */
  private def hotCorpus(spark: SparkSession, n: Int): DataFrame = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    val wordArr = array(words.map(lit): _*)
    spark.range(n).toDF("doc_id")
      .select(col("doc_id"),
        concat(lit("the quick brown fox "),
          concat_ws(" ", transform(sequence(lit(0), lit(11)),
            i => element_at(wordArr,
              (pmod(xxhash64(col("doc_id"), i), lit(words.size)) + 1).cast("int")))))
          .as("text"))
  }

  /** Naive all-shared-shingle candidate join + exact verify — the
    * formulation without the prefix filter. Exact, but candidate count
    * is sum over shingles of bucket^2.
    */
  private def naiveJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = graft.dedup.Dedup.hashedShingleSets(docs, 3, "doc_id", "text")
    val inv = sets.select(col("id"), explode(col("sh")).as("s"))
    val cand = inv.select(col("id").as("id_a"), col("s"))
      .join(inv.select(col("id").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sh_cnt").as("cnt_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sh_cnt").as("cnt_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("cnt_a") + col("cnt_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b")
  }

  private def q10Demo(spark: SparkSession, n: Int): Unit = {
    // untimed warmup at a tiny corpus: JIT + codegen compilation must
    // not land on whichever variant runs first
    val warm = hotCorpus(spark, 300).cache()
    graft.dedup.Dedup.ngramJaccardPairs(warm, 0.6, 3, "doc_id", "text").count()
    naiveJaccardPairs(warm, 0.6).count()
    graft.dedup.Dedup.releaseCaches()
    warm.unpersist()

    val docs = hotCorpus(spark, n).cache()
    docs.count()
    val (prefRows, prefSecs) = time(
      graft.dedup.Dedup.ngramJaccardPairs(docs, 0.6, 3, "doc_id", "text").count())
    graft.dedup.Dedup.releaseCaches()
    val (naiveRows, naiveSecs) = time(naiveJaccardPairs(docs, 0.6).count())
    graft.dedup.Dedup.releaseCaches()
    println(f"[skew] q10 hot-shingle corpus n=$n: prefix-filtered $prefSecs%.2f s " +
      f"($prefRows pairs), naive all-shingle $naiveSecs%.2f s ($naiveRows pairs), " +
      f"speedup ${naiveSecs / prefSecs}%.1fx")
    docs.unpersist()
  }

  private def heavyCrossover(spark: SparkSession, megaTurns: Int): Unit = {
    val work = Bench.newWorkDir("skewprobe")
    val bronze = graft.gen.TranscriptGen.transcripts(spark, nConvs = 20000,
      avgTurns = 30, megaConvs = 1, megaTurns = megaTurns)
    bronze.repartitionByRange(64, col("ts")).write.mode("overwrite").parquet(s"$work/bronze")
    val in = spark.read.parquet(s"$work/bronze")
    // one slice wide enough to hold the whole dense conversation
    // (~1.5 s/turn average tick)
    val sliceSecs = math.max(10L * 86400, megaTurns * 2L)
    // 2x-lookback segments: reach = 2 (bounded replication) while
    // parallelism = span / 1.2Ms grows with the conversation
    val segSecs = sys.env.get("SPARK_GRAFT_SEGMENT_SECS").map(_.toLong)
      .getOrElse(2L * 604800L)
    def runOne(tag: String, thr: Option[Long]): Double = {
      val out = Bench.newWorkDir(s"skewprobe_$tag")
      // upfront detection: the probe calibrates the pure PATH cost
      // (plain sweep vs segmented), not the lazy first-encounter retry
      val (_, secs) = time(Backfill.run(spark, in, out, 1704067200L, sliceSecs, 1,
        skewHeavyThreshold = thr, segmentSecs = segSecs, skewDetection = "upfront"))
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
      secs
    }
    runOne("warm", None) // warmup
    val plain = runOne("plain", None)
    // threshold selecting ONLY the planted mega (base conversations
    // bring <= ~90 turns): the probe isolates the heavy path's cost
    // for the conversation it exists for
    val routed = runOne("routed", Some(megaTurns / 2L))
    println(f"[skew] heavy crossover megaTurns=$megaTurns: plain sweep $plain%.2f s, " +
      f"segmented heavy path $routed%.2f s")
    val p = new org.apache.hadoop.fs.Path(work)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "q10" || mode == "all")
      q10Demo(spark, sys.env.getOrElse("SPARK_GRAFT_Q10_DOCS", "5000").toInt)
    if (mode == "heavy" || mode == "all")
      sys.env.getOrElse("SPARK_GRAFT_HEAVY_TURNS", "1000000,4000000")
        .split(",").map(_.trim.toInt).foreach(heavyCrossover(spark, _))
    spark.stop()
  }
}
