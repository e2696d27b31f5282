package graft.queries

import org.apache.spark.sql.functions._
import graft.crawl.Seen
import graft.expr.FilterExprs
import graft.tables.Tables._

/** Registry entries for the approximate-membership layer (A5/A6/J5).
  * Bloom/cuckoo bit patterns are engine-specific (no DuckDB equivalent) —
  * these queries reduce the filters to DETERMINISTIC COUNTS so the driver's
  * rows-only check still pins behavior run-over-run. The no-false-negative
  * guarantees live in the property tests. */
object SeenOps {

  private val N_SHARDS = 8

  /** Build bloom shards over the orders keys, probe with customer keys:
    * every true member must hit; non-member hits are fpp noise (counted,
    * deterministic given the fixed hash functions). */
  private val bloomSeen = Q.noOracle("bloom_seen_filter") { (s, d) =>
    val seen = orders(s, d).select(xxhash64(col("o_orderkey").cast("string")).as("urlHash"))
    val bc = s.sparkContext.broadcast(
      Seen.collectShardArray(Seen.buildBloomShards(seen, N_SHARDS, 20000, 0.01), N_SHARDS))
    val probes = lineitem(s, d)
      .select(xxhash64(col("l_orderkey").cast("string")).as("urlHash")).distinct()
    probes
      .withColumn("might", graft.expr.ShardedProbe.bloom_shards_probe(bc,
        Seen.shardFor(col("urlHash"), N_SHARDS), col("urlHash")))
      .agg(
        count(lit(1)).as("n_probed"),
        sum(when(col("might"), 1L).otherwise(0L)).as("n_might_contain"))
  }

  /** Dedup-before-shuffle end to end: candidates = lineitem orderkeys,
    * seen = orders with orderkey < 5000. Output: how many candidates
    * survive (exact, deterministic — bloom fpp only moves work between the
    * fast and slow paths, never the answer). */
  private val bloomDedup = Q(
    "bloom_dedup_pipeline",
    """SELECT count(*) AS n_new FROM (
      |  SELECT DISTINCT l_orderkey FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey < 5000))""".stripMargin) { (s, d) =>
    val seen = orders(s, d).filter(col("o_orderkey") < 5000)
      .select(xxhash64(col("o_orderkey").cast("string")).as("urlHash"))
    val shards = Seen.buildBloomShards(seen, N_SHARDS, 20000, 0.01)
    val candidates = lineitem(s, d)
      .select(col("l_orderkey"), xxhash64(col("l_orderkey").cast("string")).as("urlHash"))
      .dropDuplicates("urlHash")
    Seen.filterNew(candidates, seen, shards, N_SHARDS)
      .agg(count(lit(1)).as("n_new"))
  }

  /** Cuckoo build + probe, SHARDED exactly like the bloom path: a grouped
    * aggregation builds one shard per reducer (never a single global
    * aggregate), probes broadcast-join on shardId. n_hits must equal
    * n_probed (no false negatives). */
  private val cuckooSeen = Q.noOracle("cuckoo_seen_filter") { (s, d) =>
    val keys = orders(s, d)
      .select(xxhash64(col("o_orderkey").cast("string")).as("urlHash"))
    val bc = s.sparkContext.broadcast(
      Seen.collectShardArray(Seen.buildCuckooShards(keys, N_SHARDS, 40000), N_SHARDS))
    keys
      .withColumn("hit", graft.expr.ShardedProbe.cuckoo_shards_probe(bc,
        Seen.shardFor(col("urlHash"), N_SHARDS), col("urlHash")))
      .agg(
        count(lit(1)).as("n_probed"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
  }

  /** The retire pipeline end to end: build sharded cuckoo over all order
    * keys, DELETE every key ≡ 0 (mod 10) via the grouped per-shard delete,
    * re-probe everything. Retained keys must all still hit (cuckoo deletes
    * never disturb other entries); retired keys may only linger as
    * fingerprint-collision noise (deterministic, counted). */
  private val cuckooRetire = Q.noOracle("cuckoo_retire_pipeline") { (s, d) =>
    val keyed = orders(s, d)
      .select(col("o_orderkey"), xxhash64(col("o_orderkey").cast("string")).as("urlHash"))
    val shards = Seen.buildCuckooShards(keyed.select("urlHash"), N_SHARDS, 40000)
    val retired = keyed.filter(col("o_orderkey") % 10 === 0).select("urlHash")
    val bc = s.sparkContext.broadcast(Seen.collectShardArray(
      Seen.retireFromCuckoo(shards, retired, N_SHARDS), N_SHARDS))
    keyed
      .withColumn("wasRetired", col("o_orderkey") % 10 === 0)
      .withColumn("hit", graft.expr.ShardedProbe.cuckoo_shards_probe(bc,
        Seen.shardFor(col("urlHash"), N_SHARDS), col("urlHash")))
      .agg(
        sum(when(!col("wasRetired"), 1L).otherwise(0L)).as("n_retained"),
        sum(when(!col("wasRetired") && col("hit"), 1L).otherwise(0L)).as("n_retained_hit"),
        sum(when(col("wasRetired"), 1L).otherwise(0L)).as("n_retired"),
        sum(when(col("wasRetired") && col("hit"), 1L).otherwise(0L)).as("n_retired_ghost"))
  }

  val all: Seq[Q] = Seq(bloomSeen, bloomDedup, cuckooSeen, cuckooRetire)
}
