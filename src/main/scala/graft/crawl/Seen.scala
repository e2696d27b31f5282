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

  /** Cuckoo shards over the DELETABLE seen-subset (failed/expired fetches
    * that may be retired for retry). Same sharded groupBy shape as the
    * bloom build — every shard is an independent reducer; no single global
    * aggregate anywhere in the cuckoo path. */
  def buildCuckooShards(hashes: DataFrame, nShards: Int,
                        expectedPerShard: Long): DataFrame =
    buildCuckooShardsWithBuckets(hashes, nShards,
      graft.filters.GraftCuckooFilter.bucketsFor(expectedPerShard))

  /** Explicit-geometry build — delta shards must match the STANDING
    * shard's bucket count for merge, which can exceed the configured
    * default after an overflow rebuild (CrawlRound's sizing guard). */
  def buildCuckooShardsWithBuckets(hashes: DataFrame, nShards: Int,
                                   numBuckets: Int): DataFrame =
    hashes
      .withColumn("shardId", shardFor(col("urlHash"), nShards))
      .groupBy("shardId")
      .agg(
        FilterAggregators.cuckoo_agg_buckets(numBuckets)(col("urlHash")).as("bits"),
        count(lit(1)).as("numKeys"))

  /** Retire a batch of hashes from the cuckoo shards (the delete path —
    * what the Bloom side can never do). Deletes are grouped per shard and
    * applied in ONE deserialize/serialize round-trip per shard row.
    * Callers must only retire hashes that were actually inserted (the
    * standard cuckoo delete contract); the crawl guarantees this by
    * anti-joining the exact failed table first. */
  def retireFromCuckoo(cuckooShards: DataFrame, retireHashes: DataFrame,
                       nShards: Int): DataFrame = {
    val dels = retireHashes
      .withColumn("shardId", shardFor(col("urlHash"), nShards))
      .groupBy("shardId")
      .agg(collect_list("urlHash").as("dels"), count(lit(1)).as("nDels"))
    cuckooShards.join(dels, Seq("shardId"), "left")
      .select(
        col("shardId"),
        when(col("dels").isNull, col("bits"))
          .otherwise(FilterExprs.cuckoo_delete_all(col("bits"), col("dels"))).as("bits"),
        (col("numKeys") - coalesce(col("nDels"), lit(0L))).as("numKeys"))
  }

  /** Collect a (shardId, bits, …) shard table into a dense array indexed
    * by shardId (missing shards stay null = empty), ready to broadcast for
    * the zero-copy probe expressions. Driver-side size = the full shard
    * table — only for the broadcast-probe regime. Callers on a hot path
    * can run this inside a Future CONCURRENTLY with other driver actions
    * (it is an independent Spark job) and hand the array to
    * [[probeWithArrays]]. */
  def collectShardArray(shards: DataFrame, nShards: Int): Array[Array[Byte]] = {
    val arr = new Array[Array[Byte]](nShards)
    shards.select("shardId", "bits").collect()
      .foreach(r => arr(r.getInt(0)) = r.getAs[Array[Byte]](1))
    arr
  }

  /** Add `maybe_seen` from pre-collected shard arrays (zero-copy probe
    * expressions — see graft.expr.ShardedProbe). An all-empty cuckoo array
    * (no standing failures) contributes nothing — its probe term and
    * broadcast are skipped entirely. */
  def probeWithArrays(candidates: DataFrame, bloomArr: Array[Array[Byte]],
                      cuckooArr: Option[Array[Array[Byte]]],
                      nShards: Int): DataFrame = {
    val sc = candidates.sparkSession.sparkContext
    val sid = shardFor(col("urlHash"), nShards)
    val bloomHit = graft.expr.ShardedProbe.bloom_shards_probe(
      sc.broadcast(bloomArr), sid, col("urlHash"))
    val hit = cuckooArr.filter(_.exists(_ != null)) match {
      case Some(arr) =>
        bloomHit || graft.expr.ShardedProbe.cuckoo_shards_probe(
          sc.broadcast(arr), sid, col("urlHash"))
      case None => bloomHit
    }
    candidates.withColumn("maybe_seen", hit)
  }

  /** The bloom-then-exact dedup from PRE-COLLECTED shard arrays — the
    * crawl-round hot path, where the shard collects run concurrently with
    * the expansion count (independent jobs; per-round serial driver time is
    * the Amdahl fraction that caps scaling efficiency). */
  def filterNewWithArrays(candidates: DataFrame, seenExact: DataFrame,
                          bloomArr: Array[Array[Byte]],
                          cuckooArr: Option[Array[Array[Byte]]],
                          failedHashes: Option[DataFrame],
                          nShards: Int): DataFrame = {
    val probed = probeWithArrays(candidates, bloomArr, cuckooArr, nShards)
    val definitelyNew = probed.filter(!col("maybe_seen")).drop("maybe_seen")
    val exact = failedHashes match {
      case Some(f) => seenExact.select("urlHash").unionByName(f.select("urlHash"))
      case None => seenExact.select("urlHash")
    }
    val confirmedNew = probed.filter(col("maybe_seen")).drop("maybe_seen")
      .join(exact, Seq("urlHash"), "left_anti")
    definitelyNew.unionByName(confirmedNew)
  }

  /** Candidates → the definitely-new subset, using bloom-then-exact.
    * `candidates` must carry `urlHash`; all its columns survive.
    *
    * Probe-side strategy (`broadcastProbe`):
    *  - `true` (default, sandbox/small-shard scale): the shard table is
    *    collected and broadcast as a plain array, and the probe is a
    *    custom expression that reads the shared bytes ZERO-COPY inside
    *    codegen (see graft.expr.ShardedProbe). A broadcast JOIN would be
    *    map-side too, but its per-row `bits` column read copies the whole
    *    shard per candidate row (~40 GB/round of memcpy at bench scale) —
    *    pure memory bandwidth, the one resource a single box cannot scale.
    *  - `false` (the 10^10 path, §4.10): at full scale the shard table is
    *    ~12 GB of bits — collecting/broadcasting it is the OOM. Instead,
    *    shuffle-hash-join on shardId: each shard's bits travel ONCE to the
    *    reducer holding its candidates. The join output still pays the
    *    per-row binary read there; the full fix at that scale is a
    *    partition-local shard cache keyed by shardId (the candidate side
    *    is shuffled BY shardId, so each reducer touches exactly one shard
    *    — one deserialize per task, amortized), left as the documented
    *    cluster-tier refinement. */
  def filterNew(candidates: DataFrame, seenExact: DataFrame,
                bloomShards: DataFrame, nShards: Int,
                broadcastProbe: Boolean = true,
                failedHashes: Option[DataFrame] = None,
                cuckooShards: Option[DataFrame] = None): DataFrame = {
    val probed =
      if (broadcastProbe)
        probeWithArrays(candidates, collectShardArray(bloomShards, nShards),
          cuckooShards.map(collectShardArray(_, nShards)), nShards)
      else {
        def probeJoin(cands: DataFrame, shards: DataFrame) =
          cands.join(shards.hint("shuffle_hash"), Seq("shardId"), "left")
        val withShard = candidates.withColumn("shardId", shardFor(col("urlHash"), nShards))
        val bloomProbed = probeJoin(withShard, bloomShards)
          .withColumn("maybe_seen",
            coalesce(FilterExprs.bloom_might_contain(col("bits"), col("urlHash")), lit(false)))
          .drop("bits", "numKeys")
        cuckooShards match {
          case Some(ck) =>
            probeJoin(bloomProbed,
              ck.withColumnRenamed("bits", "cbits").withColumnRenamed("numKeys", "cn"))
              .withColumn("maybe_seen", col("maybe_seen") ||
                coalesce(FilterExprs.cuckoo_contains(col("cbits"), col("urlHash")), lit(false)))
              .drop("cbits", "cn", "shardId")
          case None => bloomProbed.drop("shardId")
        }
      }

    val definitelyNew = probed.filter(!col("maybe_seen")).drop("maybe_seen")
    // Only the maybe-seen remainder pays the shuffle of the exact anti join
    // — against BOTH ground-truth tables (permanent seen + deletable
    // failed), so filter false positives never drop a genuinely new url.
    val exact = failedHashes match {
      case Some(f) => seenExact.select("urlHash").unionByName(f.select("urlHash"))
      case None => seenExact.select("urlHash")
    }
    val confirmedNew = probed.filter(col("maybe_seen")).drop("maybe_seen")
      .join(exact, Seq("urlHash"), "left_anti")

    definitelyNew.unionByName(confirmedNew)
  }
}
