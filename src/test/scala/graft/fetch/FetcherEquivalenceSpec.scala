package graft.fetch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.crawl.{CrawlConfig, Crawler, Frontier, Robots}
import graft.fixtures.SyntheticCorpus

/** Pins the contract that makes bench results meaningful: the generative
  * fetcher (synthetic page SERVICE, cost ∝ pages fetched — the stand-in
  * for network HTTP) serves byte-for-byte the same pages as the
  * corpus-table fetcher (store-backed lookup) for the same popped slice,
  * and a full crawl is fetcher-independent. */
class FetcherEquivalenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val N = 500L
  private val HOSTS = 50

  private def corpusFetcher = new CorpusFetcher(
    () => SyntheticCorpus.pages(spark, N, 42L, HOSTS).toDF())
  private def genFetcher = new GenerativeFetcher(N, 42L, HOSTS, fanout = 4)

  private def popSlice = {
    val seeds = (0 until 40).map(k => SyntheticCorpus.canonicalUrl(k.toLong * 7 % N, 42L, HOSTS))
    val (popped, _) = Frontier.pop(Frontier.fromSeeds(spark, seeds),
      Seq.empty[(String, Int)].toDF("host", "budget"), 5, 4)
    popped
  }

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select(col("url"), col("status"), col("fetchTs"),
      coalesce(xxhash64(col("html")), lit(-1L)).as("html_h"),
      coalesce(xxhash64(col("text")), lit(-1L)).as("text_h"), col("lang"))
      .collect().map(_.toString).sorted.toSeq

  test("generative fetcher ≡ corpus fetcher on the same popped slice") {
    val a = key(corpusFetcher.fetch(popSlice))
    val b = key(genFetcher.fetch(popSlice))
    assert(a.nonEmpty && a == b)
  }

  test("unknown urls are 404 in both fetchers") {
    val stray = Frontier.fromSeeds(spark, Seq("https://nowhere.example/filings/999999/10-K.htm"))
      .withColumn("popRank", lit(1))
    assert(corpusFetcher.fetch(stray).filter(col("status") === 404).count() == 1)
    assert(genFetcher.fetch(stray).filter(col("status") === 404).count() == 1)
  }

  test("a full crawl is fetcher-independent (ordering + seen set)") {
    val seeds = (0 until 10).map(k => SyntheticCorpus.canonicalUrl(k.toLong * 13 % N, 42L, HOSTS))
    val robots = Seq.empty[graft.crawl.RobotsRules].toDF()
    val budgets = Seq.empty[(String, Int)].toDF("host", "budget")
    val cfg = CrawlConfig(nShards = 4, expectedKeysPerShard = 4096)
    val a = Crawler.run(spark, seeds, corpusFetcher, robots, budgets, 4, 3, cfg)
    val b = Crawler.run(spark, seeds, genFetcher, robots, budgets, 4, 3, cfg)
    assert(Crawler.popSequence(a.popLog) == Crawler.popSequence(b.popLog))
    assert(Crawler.seenDump(a.state) == Crawler.seenDump(b.state))
    assert(Crawler.popSequence(a.popLog).nonEmpty)
  }
}
