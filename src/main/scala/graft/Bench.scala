package graft
import org.apache.spark.sql.SparkSession

/** Driver-run bench: one JSON line. Two sections:
  *   1. per-query wall time of every SparkEntry query on SPARK_GRAFT_SF_DIR
  *      (the relational/text/vector operator surface);
  *   2. the BASELINE.json headline metric — frontier-pop→fetch→extract
  *      URLs/sec at two parallelism levels (local[8] vs local[32] standing
  *      in for N vs 4N executors; no real cluster in this sandbox) over the
  *      same synthetic corpus snapshot, plus the scaling efficiency
  *      thr(32) / (4 × thr(8)). Protocol details in BASELINE.md / CrawlBench.
  * Disable section 2 with GRAFT_BENCH_CRAWL=0; size it with
  * GRAFT_BENCH_CRAWL_URLS / _ROUNDS / _REPS.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen path once so the first timed query doesn't
    // absorb the session's JIT cost.
    try spark.range(100000).selectExpr("sum(id) s", "count(*) c")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // ...and the PARQUET path: the registry's first query otherwise books
    // the session's one-time costs (cold page cache on the data files,
    // first parquet-reader codegen, Hadoop conf init) onto its own time —
    // r3's recorded scan_parquet read 3.2 s cold vs ~0.6 s steady-state.
    // One untimed pass of the first registry query absorbs all of it.
    try SparkEntry.registry.headOption.foreach(
      _.run(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }
    // Per-query outcome is recorded honestly: a failed query must never
    // read as a (suspiciously fast) passing one. Failures keep their wall
    // time in `queries` but are listed in `errors` and excluded from
    // nothing — the reader decides.
    // Registry (insertion) order, not Map order: shared memoized
    // intermediates (the brute-force ANN baseline, the LSH hash relation,
    // the IVF index) are built by the FIRST query that needs them, and the
    // registry lists producers before their audits — so per-query times
    // attribute index builds to the index query, deterministically.
    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      // noop sink evaluates EVERY column of the query (a count() would let
      // Catalyst prune the operator under test down to a bare scan).
      val err =
        try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      (q.name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    spark.stop()

    // Headline-metric section. Preference order:
    //  1. GRAFT_BENCH_CRAWL=1 → run the two-level protocol LIVE here at the
    //     SAME levels and size as the official protocol (N=1 → 4N=4 cores,
    //     3·10^5 URLs, ~24 KB pages — see BASELINE.md), so running the
    //     shipped verification path reproduces the shipped number. Override
    //     with GRAFT_BENCH_CRAWL_{N,URLS,ROUNDS,REPS} for quick checks.
    //  2. otherwise echo the committed official protocol result
    //     (BENCH/BASELINE.json, produced by `runMain graft.CrawlBench`),
    //     tagged "source":"stored" so no parser mistakes it for a
    //     measurement taken in this run.
    val crawlJson =
      if (sys.env.get("GRAFT_BENCH_CRAWL").contains("1")) {
        val nLo = sys.env.getOrElse("GRAFT_BENCH_CRAWL_N", "1").toInt
        val nUrls = sys.env.getOrElse("GRAFT_BENCH_CRAWL_URLS", "300000").toLong
        val rounds = sys.env.getOrElse("GRAFT_BENCH_CRAWL_ROUNDS", "4").toInt
        val reps = sys.env.getOrElse("GRAFT_BENCH_CRAWL_REPS", "3").toInt
        try {
          val lo = CrawlBench.runLevel(nLo, nUrls, rounds, reps)
          val hi = CrawlBench.runLevel(4 * nLo, nUrls, rounds, reps)
          val eff = hi.urlsPerSec / (4.0 * lo.urlsPerSec)
          f""","crawl":{"source":"live","n_cores":$nLo,"n4_cores":${4 * nLo},""" +
            f""""urls_per_sec_n":${lo.urlsPerSec}%.1f,"urls_per_sec_4n":${hi.urlsPerSec}%.1f,""" +
            f""""scaling_efficiency":$eff%.3f,"nUrls":$nUrls,"rounds":$rounds,"reps":$reps,""" +
            """"caveat":"both levels in ONE JVM; the official number runs one JVM per level"}"""
        } catch {
          case e: Throwable => s""","crawl":{"source":"live","error":"${e.getClass.getSimpleName}"}"""
        }
      } else {
        val official = Seq("BENCH/BASELINE.json", "/root/repo/BENCH/BASELINE.json")
          .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.exists(_))
          .getOrElse(java.nio.file.Paths.get("BENCH/BASELINE.json"))
        if (java.nio.file.Files.exists(official)) {
          val body = java.nio.file.Files.readString(official).trim
            .stripPrefix("{").stripSuffix("}")
          s""","crawl":{"source":"stored","stored_from":"BENCH/BASELINE.json (runMain graft.CrawlBench, one JVM per level; protocol in BASELINE.md — NOT measured in this run)",$body}"""
        } else ""
      }

    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"$crawlJson}"""
    println(line)
    // stdout travels through sbt's log manager, which truncates lines at
    // ~2.5 KB — the per-query section of a 78-query registry does not fit.
    // Mirror the untruncated line to a file (BENCH_rN.json consumers that
    // read stdout still get the total + leading queries).
    val out = sys.env.getOrElse("GRAFT_BENCH_OUT", "BENCH/last_bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
  }
}
