package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.expr.BloomOrExpr.bloom_or
import graft.expr.Extractors
import graft.fetch.Fetcher

/** One crawl round (SURVEY.md §3.2) — a typed Dataset job:
  *
  *   frontier ──pop (W1, skew-safe)──► popped
  *   popped ──fetch (S7)──► fetched pages
  *   pages ──extract (X1/X2 Catalyst exprs)──► extracted
  *   pages ──explode links → canonicalize → hash (E1/P1/P2)──► candidates
  *   candidates ──map-side dedup → robots → bloom prefilter → exact anti
  *                (E2/S5/J5/J3: dedup-before-shuffle)──► enqueued
  *   frontier' = remaining ∪ enqueued;  seen' = seen ∪ popped;
  *   shards'  = shards ⊕ bloom(popped)  (incremental OR-merge)
  *
  * Exchanges: (1) pop windows [host,salt → host], (2) fetch join on url,
  * (3) candidate groupBy urlHash, (4) exact anti join for the maybe-seen
  * remainder only. Everything between is whole-stage codegen.
  */
object CrawlRound {

  case class State(frontier: DataFrame, seenExact: DataFrame, bloomShards: DataFrame)

  /** `cached`: intermediates persisted inside run(); the caller MUST
    * materialize (checkpoint/write) `state` and `pages` first, then call
    * `unpersistCached()` — releasing them earlier re-runs the round's
    * windows and fetch on every downstream use. */
  case class Output(
      pages: DataFrame,
      popped: DataFrame,
      state: State,
      lineage: RoundLineage,
      cached: Seq[DataFrame]) {
    def unpersistCached(): Unit = cached.foreach(_.unpersist())
  }

  private val verbose = sys.env.get("GRAFT_CRAWL_VERBOSE").contains("1")
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (verbose) System.err.println(f"[round] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def run(spark: SparkSession, state: State, robots: DataFrame,
          budgets: DataFrame, defaultBudget: Int, fetcher: Fetcher,
          round: Int, cfg: CrawlConfig): Output = {

    val (popped0, remaining0) = Frontier.pop(
      state.frontier, budgets, defaultBudget, cfg.saltBuckets)
    val popped = popped0.persist(StorageLevel.MEMORY_AND_DISK)
    // remaining is consumed twice (enqueue anti-join path + next frontier);
    // without a persist each use re-runs both pop windows over the full
    // frontier — the largest table in the round.
    val remaining = remaining0.persist(StorageLevel.MEMORY_AND_DISK)

    // One job yields both counters: the fetch join is 1:1 per popped url
    // (corpus urls are unique), so fetched rows = popped rows. Counting
    // popped separately would be a second full pass.
    val fetched = fetcher.fetch(popped).persist(StorageLevel.MEMORY_AND_DISK)
    val (nPopped, nFetched) = timed("fetch") {
      val r = fetched.agg(
        count(lit(1)), count_if(col("status") === 200)).head()
      (r.getLong(0), r.getLong(1))
    }

    // X1/X2 — the extraction expressions; `html` never survives this select
    // (column pruning: the widest column dies as early as possible).
    val pages = fetched
      .filter(col("status") === 200)
      .withColumn("itemText", Extractors.extract_10k(col("text")))
      .withColumn("metrics", Extractors.extract_metrics(col("text")))
      .select("url", "urlHash", "host", "depth", "round", "popRank",
        "status", "fetchTs", "lang", "itemText", "metrics")

    // Seen-set update FIRST (a stale bloom would let just-popped urls back
    // in as "definitely new" — the bloom must stay a superset of seen).
    val seenExact2 = state.seenExact
      .unionByName(popped.select("urlHash"))
    val deltaShards = Seen.buildBloomShards(
      popped.select("urlHash"), cfg.nShards, cfg.expectedKeysPerShard, cfg.bloomFpp)
    val bloomShards2 = state.bloomShards
      .withColumnRenamed("bits", "bitsOld").withColumnRenamed("numKeys", "nOld")
      .join(deltaShards, Seq("shardId"), "full_outer")
      .select(
        col("shardId"),
        coalesce(bloom_or(col("bitsOld"), col("bits")), col("bitsOld"), col("bits")).as("bits"),
        (coalesce(col("nOld"), lit(0L)) + coalesce(col("numKeys"), lit(0L))).as("numKeys"))

    // Frontier expansion with dedup-before-shuffle.
    val rawCandidates = Frontier.expand(fetched, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val nRaw = timed("expand")(rawCandidates.count())
    val allowed = Robots.filterAllowed(rawCandidates, robots)
    // Anti vs the CHECKPOINTED input frontier, not `remaining`: frontier =
    // remaining ∪ popped and popped ⊆ seenExact2 (already excluded by
    // filterNew), so the result is identical — but the input frontier needs
    // no recomputation.
    val newEntries = Seen.filterNew(allowed, seenExact2, bloomShards2,
      cfg.nShards, cfg.broadcastBloomProbe)
      .join(state.frontier.select("urlHash"), Seq("urlHash"), "left_anti")
      .withColumn("round", lit(round + 1))
      .select("url", "urlHash", "host", "priority", "depth", "round")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEnqueued = timed("dedup")(newEntries.count())

    val frontier2 = remaining.unionByName(newEntries)

    val lineage = RoundLineage(
      round = round, partitionId = -1,
      popped = nPopped, fetched = nFetched,
      extracted = nFetched, // every 200 page yields an extraction (spec'd noMatch="" otherwise)
      rawCandidates = nRaw, enqueued = nEnqueued,
      dedupDropped = nRaw - nEnqueued)

    rawCandidates.unpersist()
    Output(pages, popped, State(frontier2, seenExact2, bloomShards2), lineage,
      cached = Seq(popped, remaining, fetched, newEntries))
  }
}
