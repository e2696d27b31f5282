package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.FilterAggregators
import graft.expr.FilterExprs

/** The URL-seen set (SURVEY.md §2.4 J3/J5, §2.5 A5/A6, §4.10): a sharded
  * Bloom prefilter in front of an exact urlHash table.
  *
  * Dedup-before-shuffle: candidates are probed against broadcast Bloom
  * shards MAP-SIDE (inside codegen, before any exchange). Rows the Bloom
  * rejects are DEFINITELY new and skip the expensive exact check entirely;
  * only the "maybe seen" remainder (≈ seen ∩ candidates, plus fpp noise)
  * shuffles into the exact anti-join. At 10^10 frontier scale this is the
  * difference between shuffling every candidate and shuffling only the
  * revisit fraction.
  *
  * Tables:
  *   seenExact:  (urlHash: long)            — the ground truth
  *   bloomShards:(shardId: int, bits: binary, numKeys: long)
  */
object Seen {

  def shardFor(urlHash: org.apache.spark.sql.Column, nShards: Int) =
    pmod(urlHash, lit(nShards.toLong)).cast("int")

  /** Build (or rebuild) Bloom shards from an exact-seen hash table.
    * One grouped aggregation; each shard is built independently. */
  def buildBloomShards(seenExact: DataFrame, nShards: Int,
                       expectedPerShard: Long, fpp: Double = 0.01): DataFrame =
    seenExact
      .withColumn("shardId", shardFor(col("urlHash"), nShards))
      .groupBy("shardId")
      .agg(
        FilterAggregators.bloom_agg(expectedPerShard, fpp)(col("urlHash")).as("bits"),
        count(lit(1)).as("numKeys"))

  /** Candidates → the definitely-new subset, using bloom-then-exact.
    * `candidates` must carry `urlHash`; all its columns survive.
    *
    * Probe-side strategy (`broadcastProbe`):
    *  - `true` (default, sandbox/small-shard scale): broadcast the whole
    *    shard table — zero shuffle on the candidate side, probe is
    *    map-side inside codegen.
    *  - `false` (the 10^10 path, §4.10): at full scale the shard table is
    *    ~12 GB of bits — broadcasting it to every executor is the OOM.
    *    Instead, shuffle-hash-join on shardId: each shard's bits travel
    *    ONCE to the reducer holding its candidates (the per-reducer build
    *    map holds only that reducer's shards), and the probe + drop(bits)
    *    fuse into the join stage, so the bits are never materialized per
    *    candidate row. Parallelism = nShards, which at that scale is
    *    ~10^3 shards of 10^7–10^8 keys — comfortably wide. */
  def filterNew(candidates: DataFrame, seenExact: DataFrame,
                bloomShards: DataFrame, nShards: Int,
                broadcastProbe: Boolean = true): DataFrame = {
    val withShard = candidates.withColumn("shardId", shardFor(col("urlHash"), nShards))
    val joined =
      if (broadcastProbe) withShard.join(broadcast(bloomShards), Seq("shardId"), "left")
      else withShard.join(bloomShards.hint("shuffle_hash"), Seq("shardId"), "left")
    val probed = joined
      .withColumn("maybe_seen",
        coalesce(FilterExprs.bloom_might_contain(col("bits"), col("urlHash")), lit(false)))
      .drop("bits", "numKeys", "shardId")

    val definitelyNew = probed.filter(!col("maybe_seen")).drop("maybe_seen")
    // Only the maybe-seen remainder pays the shuffle of the exact anti join.
    val confirmedNew = probed.filter(col("maybe_seen")).drop("maybe_seen")
      .join(seenExact.select("urlHash"), Seq("urlHash"), "left_anti")

    definitelyNew.unionByName(confirmedNew)
  }
}
