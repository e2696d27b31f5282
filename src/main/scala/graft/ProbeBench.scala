package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.crawl.Seen
import graft.expr.FilterExprs

/** Microbench for the big-shard probe regime (the 10^10 path): the
  * shuffle-hash JOIN probe (the joined `bits` binary is memcpy'd per
  * candidate row by join/filter codegen — measured, and not fixable by an
  * expression-level cache since codegen materializes referenced columns
  * before any expression runs) vs Seen.probePartitioned (union +
  * co-shuffle on shardId + sorted streaming pass; shard bytes materialize
  * once per task per shard). Prints one JSON line. Run:
  *
  *   sbt "runMain graft.ProbeBench"
  */
object ProbeBench {

  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nShards = 32
    val keysPerShard = 1 << 17 // ~157 KB bloom shard at 1% fpp
    val nCandidates = 2_000_000L

    val seen = spark.range(0, nShards.toLong * keysPerShard).select(col("id").as("urlHash"))
    val shards = Seen.buildBloomShards(seen, nShards, keysPerShard).persist()
    shards.count()
    val candidates = spark.range(nCandidates)
      .select((col("id") * 7L).as("urlHash"))
      .withColumn("shardId", Seen.shardFor(col("urlHash"), nShards))
      .persist()
    candidates.count()

    def run(df: DataFrame): Unit =
      df.filter(col("maybe_seen")).select(col("urlHash"))
        .write.mode("overwrite").format("noop").save()

    val joinProbe = candidates.join(shards.hint("shuffle_hash"), Seq("shardId"), "left")
      .withColumn("maybe_seen",
        coalesce(FilterExprs.bloom_might_contain(col("bits"), col("urlHash")), lit(false)))
    val streamProbe = Seen.probePartitioned(
      candidates.drop("shardId"), shards, None, nShards)

    run(joinProbe); run(streamProbe) // JIT + shuffle-file warm-up
    val tJoin = (1 to 3).map(_ => timeIt(run(joinProbe))).min
    val tStream = (1 to 3).map(_ => timeIt(run(streamProbe))).min

    println(f"""{"bench":"shard_probe","cpus":$cpus,"n_shards":$nShards,"shard_keys":$keysPerShard,"candidates":$nCandidates,"join_per_row_sec":$tJoin%.3f,"partitioned_stream_sec":$tStream%.3f,"speedup":${tJoin / tStream}%.2f}""")
    spark.stop()
  }
}
