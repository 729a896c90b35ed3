package graft

/** Supplementary benchmark main (NOT part of the frozen driver
  * contract — see [[Bench]] for that): per-query noop-sink isolation
  * (guide §1.4 — times the computation, not the sink, and computes
  * every column of every row instead of letting count() prune) plus
  * `.explain("formatted")` plan dumps for the optimization evidence in
  * plans/r06/.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [plansDir] [q1,q2,...]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_WARM_DIR
  * (same semantics as Bench), SPARK_GRAFT_REPS (default 3).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val plansDir = args.headOption.filter(_.nonEmpty)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG_LEVEL", "WARN"))

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // same untimed JIT/codegen warmup protocol as Bench
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != "none") {
      queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }

    plansDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    queries.foreach { case (name, fn) =>
      plansDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$d/$name.txt"),
          plan.getBytes("UTF-8"))
      }
      val times = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"benchextra: $name (noop sink)")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[benchextra] $name: ${e.getMessage}") }
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        spark.catalog.clearCache()
        t
      }
      results(name) = times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"noop_min_of_$reps","queries":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
