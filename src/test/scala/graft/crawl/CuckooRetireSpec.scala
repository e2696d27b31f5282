package graft.crawl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.expr.FilterExprs
import graft.fetch.CorpusFetcher

/** The deletable seen-subset, exercised through the CRAWL PIPELINE (not
  * just the filter object): failed fetches land in failed+cuckoo instead of
  * the permanent seen set, block re-enqueue while present, and
  * Crawler.retryFailed retires them — per-shard grouped cuckoo deletes —
  * back into the frontier, after which a healed fetcher crawls them
  * successfully. */
class CuckooRetireSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val N_URLS = 600L
  private val N_HOSTS = 30
  private val cfg = CrawlConfig(nShards = 8, expectedKeysPerShard = 4096)

  import graft.fixtures.SyntheticCorpus
  private def fullCorpus = {
    import spark.implicits._
    SyntheticCorpus.pages(spark, N_URLS, nHosts = N_HOSTS).toDF()
  }
  /** A corpus with holes: every page whose urlHash ≡ 0 (mod 5) is missing —
    * the CorpusFetcher returns 404 for it (a deterministic outage). */
  private def holeyFetcher = new CorpusFetcher(() =>
    fullCorpus.filter(pmod(xxhash64(col("url")), lit(5L)) =!= 0))
  private def healedFetcher = new CorpusFetcher(() => fullCorpus)

  private def robots = {
    import spark.implicits._
    (0 until N_HOSTS).map(h => RobotsRules(s"h$h.example", Seq(), Seq("/private/"), 0L)).toDF()
  }
  private def noBudgets = {
    import spark.implicits._
    Seq.empty[(String, Int)].toDF("host", "budget")
  }
  private def seeds = (0 until 12).map(k =>
    SyntheticCorpus.canonicalUrl(k.toLong * 53 % N_URLS, 42L, N_HOSTS))

  private def crawlRounds(state0: CrawlRound.State, from: Int, n: Int,
                          fetcher: graft.fetch.Fetcher): CrawlRound.State = {
    var st = state0
    for (r <- from until from + n) {
      val out = CrawlRound.run(spark, st, robots, noBudgets, 8, fetcher, r, cfg)
      st = Crawler.checkpointState(out.state, Some(st))
      out.unpersistCached()
    }
    st
  }

  private lazy val crawled = crawlRounds(
    Crawler.emptyState(spark,
      Robots.filterAllowed(Frontier.fromSeeds(spark, seeds), robots).localCheckpoint(true)),
    0, 3, holeyFetcher)

  test("failed fetches land in the deletable subset, not the permanent one") {
    val nFailed = crawled.failed.count()
    assert(nFailed > 0, "fixture produced no failures — vacuous")
    // disjoint subsets
    assert(crawled.failed.join(crawled.seenExact, Seq("urlHash")).count() == 0)
    // cuckoo shard counters track the exact table
    val ckKeys = crawled.cuckooShards.agg(sum("numKeys")).head().getLong(0)
    assert(ckKeys == nFailed)
    // no false negatives: every failed hash hits its cuckoo shard
    val misses = crawled.failed
      .withColumn("shardId", Seen.shardFor(col("urlHash"), cfg.nShards))
      .join(broadcast(crawled.cuckooShards), Seq("shardId"))
      .filter(!FilterExprs.cuckoo_contains(col("bits"), col("urlHash")))
      .count()
    assert(misses == 0)
  }

  test("failed urls are blocked from re-enqueue while un-retired") {
    assert(crawled.frontier.join(crawled.failed, Seq("urlHash")).count() == 0)
  }

  test("the sharded cuckoo build is a grouped aggregate, not a global one") {
    val plan = Seen.buildCuckooShards(
      crawled.failed.select("urlHash"), cfg.nShards, 4096)
      .queryExecution.executedPlan.toString
    assert(plan.contains("keys=[shardId"), s"no grouped aggregate in:\n$plan")
  }

  test("retryFailed retires via per-shard deletes and the retry crawls clean") {
    val nFailed = crawled.failed.count()
    val retried = Crawler.retryFailed(crawled, nextRound = 3, cfg)
    val retriedCk = Crawler.checkpointState(retried)

    // exact table emptied, cuckoo counters back to zero, frontier regains them
    assert(retriedCk.failed.count() == 0)
    assert(retriedCk.cuckooShards.agg(sum("numKeys")).head().getLong(0) == 0L)
    val retryInFrontier = retriedCk.frontier
      .join(crawled.failed.select("urlHash"), Seq("urlHash")).count()
    assert(retryInFrontier == nFailed)

    // crawl on with the healed fetcher: previously-failed urls now succeed
    val after = crawlRounds(retriedCk, 3, 2, healedFetcher)
    val nowSeen = after.seenExact
      .join(crawled.failed.select("urlHash"), Seq("urlHash")).count()
    assert(nowSeen > 0, "no retired url was re-crawled successfully")
    // and nothing got double-counted: permanent ∪ failed stays disjoint
    assert(after.failed.join(after.seenExact, Seq("urlHash")).count() == 0)
  }

  test("chunked retire: multi-pass (tiny chunks) equals the single-pass result") {
    import spark.implicits._
    val keys = (0L until 500L).map(i => i * 2654435761L)
    val hashes = keys.toDF("urlHash")
    val shards = Seen.buildCuckooShards(hashes, 8, 1024)
    val retire = keys.filter(_ % 3 == 0).toDF("urlHash")
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("shardId").collect()
        .map(r => (r.getInt(0), r.getAs[Array[Byte]](1).toSeq, r.getLong(2))).toSeq
    val onePass = dump(Seen.retireFromCuckoo(shards, retire, 8)) // default chunk ≫ batch
    val multiPass = dump(Seen.retireFromCuckoo(shards, retire, 8, chunkSize = 7))
    assert(onePass == multiPass, "chunking must not change the retired shards")
    // and retired keys no longer probe as contained (mod fp collisions)
    val bits = multiPass.map { case (sid, b, _) => sid -> b.toArray }.toMap
    val ghosts = keys.filter(_ % 3 == 0).count { k =>
      val sid = java.lang.Math.floorMod(k, 8L).toInt
      graft.filters.GraftCuckooFilter.containsSerialized(bits(sid), k)
    }
    assert(ghosts <= keys.length / 100, s"too many post-retire ghosts: $ghosts")
  }

  test("partial retire: only the retried predicate leaves the subset") {
    val pred = pmod(col("urlHash"), lit(2L)) === 0
    val toRetry = crawled.failed.filter(pred).count()
    assume(toRetry > 0)
    val retried = Crawler.retryFailed(crawled, nextRound = 3, cfg, pred)
    assert(retried.failed.count() == crawled.failed.count() - toRetry)
    // survivors still hit their (post-delete) cuckoo shards — deletes never
    // disturb other entries
    val misses = retried.failed
      .withColumn("shardId", Seen.shardFor(col("urlHash"), cfg.nShards))
      .join(broadcast(retried.cuckooShards), Seq("shardId"))
      .filter(!FilterExprs.cuckoo_contains(col("bits"), col("urlHash")))
      .count()
    assert(misses == 0)
  }
}
