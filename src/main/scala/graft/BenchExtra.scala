package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4): per-query wall time
  * via the noop sink, REPEATED `reps` times in one JVM, reporting min and
  * median per query — the min is the least ambient-noise-polluted estimate
  * on this shared box (BENCH/BASELINE.md documents rep-wide host stalls).
  * Bench.scala itself is frozen (single-pass, registry order); this main is
  * the extra instrumentation the round's evidence cites.
  *
  * Usage: runMain graft.BenchExtra [reps] [comma,separated,query,names]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_BENCH_OUT as Bench.
  *
  * Caveat vs Bench: session-memoized intermediates (SessionCache) are built
  * by the FIRST query that needs them, so rep-1 times of producer queries
  * include index builds and later reps do not — exactly like Bench's
  * registry-order attribution, but the min over reps reports the warm cost.
  * Producer attribution stays visible in the rep1 column.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same warmup as Bench: JIT + parquet-reader one-time costs.
    try spark.range(100000).selectExpr("sum(id) s", "count(*) c")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val qs = SparkEntry.registry.filter(q => only.isEmpty || only(q.name))
    try qs.headOption.foreach(
      _.run(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }

    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (r <- 1 to reps; q <- qs) {
      spark.sparkContext.setJobDescription(s"bench-extra rep$r: ${q.name}")
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench-extra] ${q.name} rep$r failed: ${e.getClass.getSimpleName}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      times(q.name) = times.getOrElse(q.name, Vector.empty) :+ dt
    }
    spark.sparkContext.setJobDescription(null)
    def med(v: Vector[Double]): Double = {
      val s = v.sorted; s(s.length / 2)
    }
    val body = times.map { case (k, v) =>
      f""""$k":{"min":${v.min}%.3f,"med":${med(v)}%.3f,"rep1":${v.head}%.3f}"""
    }.mkString("{", ",", "}")
    val totalMin = times.values.map(_.min).sum
    val line =
      f"""{"metric":"bench_extra_total_min","value":$totalMin%.3f,"unit":"sec","reps":$reps,"queries":$body,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("GRAFT_BENCH_OUT", "/tmp/bench_extra.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
