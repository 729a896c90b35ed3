package graft

import org.apache.spark.sql.functions._

/** Dev profiling harness: times each phase of one backfill slice. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); a
    }
    val work = java.nio.file.Files.createTempDirectory("graft_prof").toString
    val bronzeDir = sys.env.getOrElse("SPARK_GRAFT_BRONZE_DIR", s"$work/bronze")
    val turns = if (sys.env.contains("SPARK_GRAFT_BRONZE_DIR") && graft.meta.Checkpoint.pathExists(spark, bronzeDir + "/_SUCCESS")) spark.read.parquet(bronzeDir).count() else t("gen+write bronze")(Bench.writeBronze(spark, bronzeDir, sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "300000").toLong))
    println(s"[profile] turns=$turns")
    val bronze = spark.read.parquet(bronzeDir)
    import graft.silver.SilverBuilder
    val start = 1704067200L; val end = start + 8L * 86400
    val sliceBronze = bronze.filter(unix_timestamp(col("ts")) >= start && unix_timestamp(col("ts")) < end)
    val silver = SilverBuilder.build(sliceBronze).withColumn("slice_id", lit("s0")).cache()
    t("silver count (dedup)")(silver.count())
    t("silver write")(silver.write.mode("overwrite").partitionBy("dt", "slice_id").parquet(s"$work/silver"))
    val sliceSilver = spark.read.parquet(s"$work/silver").filter(col("slice_id") === "s0").drop("slice_id")
    val ranged = graft.gold.FastWindows.rangeFeaturesAuto(sliceSilver, 50000L)
      .filter(unix_timestamp(col("ts")) >= start)
    val state = graft.meta.Checkpoint.readConvState(spark, work, None)
    val gold = Backfill.withState(ranged, state, 1800L).cache()
    t("gold compute+write")(gold.withColumn("slice_id", lit("s0"))
      .write.mode("overwrite").partitionBy("dt", "slice_id").parquet(s"$work/gold"))
    t("state")(graft.meta.Checkpoint.writeConvState(work, "s0", Backfill.nextState(gold, state)))
    t("lineage")(graft.meta.Checkpoint.appendLineage(work, gold, "s0", 1000L))
    t("gold count")(gold.count())
    // variants to localize FastWindows cost
    val s2 = sliceSilver.cache(); s2.count()
    t("fastwindows only (count)")(graft.gold.FastWindows.rangeFeatures(s2).count())
    t("declarative windows (count)")(graft.gold.FeatureWindows.rangeFeatures(s2).count())
    t("fast auto (count)")(graft.gold.FastWindows.rangeFeaturesAuto(s2, 50000L).count())
    spark.stop()
  }
}
