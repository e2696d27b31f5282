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
    * `candidates` must carry `urlHash`; all its columns survive. */
  def filterNew(candidates: DataFrame, seenExact: DataFrame,
                bloomShards: DataFrame, nShards: Int): DataFrame = {
    val probed = candidates
      .withColumn("shardId", shardFor(col("urlHash"), nShards))
      .join(broadcast(bloomShards), Seq("shardId"), "left")
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
