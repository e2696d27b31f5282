package graft.store

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.crawl.{CrawlFixture, Robots}
import graft.fetch.CorpusFetcher
import graft.fixtures.SyntheticCorpus

/** Change-rate recrawl (`DurableCrawler.refreshAdaptive`): pages observed
  * to CHANGE between fetches re-enqueue when their estimated change
  * interval has elapsed; never-changed pages do not. The due set is
  * re-derived independently on the driver from the collected fetch
  * history and must match the distributed policy exactly. */
class AdaptiveRefreshSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // phase 'A': the stock corpus; phase 'B': HALF the urls (even xxhash)
  // get a different revenue figure inside ITEM 7, so their extracted
  // itemText changes while urls, links, and the other half stay identical.
  @volatile private var phase: Char = 'A'
  private def corpus: DataFrame = {
    import spark.implicits._
    val base = SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
    if (phase == 'A') base
    else base.withColumn("text",
      when(pmod(xxhash64(col("url")), lit(2)) === 0,
        regexp_replace(col("text"), "revenue of \\$[0-9]+", "revenue of \\$999999"))
        .otherwise(col("text")))
  }
  private def fetcher = new CorpusFetcher(() => corpus)
  private def robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
  private def budgetsAndDefault = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
  private def seeds = Files.readAllLines(
    java.nio.file.Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt")).asScala.toSeq

  test("refreshAdaptive re-enqueues exactly the due changed urls") {
    val (budgets, default) = budgetsAndDefault
    val root = Files.createTempDirectory("crawlAd").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    phase = 'A'
    d.init(seeds, robots)
    d.runRounds(1, fetcher, robots, budgets, default) // rounds 0..1
    assert(d.refresh(maxFetchRound = 1, priority = 9.0) > 0)
    phase = 'B'
    d.runRounds(2, fetcher, robots, budgets, default) // refetch wave

    val last = d.lastCompleteRound.get
    // independent driver-side derivation of the due set from raw history
    val hist = d.allPages().get
      .select(col("urlHash"), col("fetchRound"), xxhash64(col("itemText")).as("h"),
        col("url"), col("host"), col("depth"))
      .collect().groupBy(_.getLong(0))
    val waiting = d.currentState().frontier.select("urlHash")
      .collect().map(_.getLong(0)).toSet
    val now = last + 1
    val expected = hist.collect { case (uh, rows) =>
      val fr = rows.map(_.getInt(1))
      val nContent = rows.map(_.getLong(2)).distinct.length
      val (first, lastF) = (fr.min, fr.max)
      if (nContent > 1 && (now - lastF).toLong * (nContent - 1) >= (lastF - first).toLong
          && !waiting.contains(uh)) Some(uh) else None
    }.flatten.toSet
    assert(expected.nonEmpty, "fixture must contain due changed urls")
    // sanity: the fixture also has never-changed urls, which must be excluded
    assert(hist.exists { case (_, rows) => rows.map(_.getLong(2)).distinct.length == 1 })

    val n = d.refreshAdaptive(priority = 8.0)
    assert(n == expected.size)
    d.close()
    val d2 = new DurableCrawler(spark, root, CrawlFixture.cfg)
    val enq = d2.currentState().frontier.filter(col("priority") === 8.0)
      .select("urlHash").collect().map(_.getLong(0)).toSet
    assert(enq == expected)
    assert(d2.refreshAdaptive(priority = 8.0) == 0L,
      "idempotent: due urls already waiting never double-enqueue")

    // the due urls actually refetch (priority 8 outranks base priorities)
    d2.runRounds(3, fetcher, robots, budgets, default)
    val thrice = d2.allPages().get.filter(col("fetchRound") === 3)
      .select("urlHash").collect().map(_.getLong(0)).toSet
    assert(thrice.subsetOf(expected ++ waiting))
    assert((thrice intersect expected).nonEmpty)
    d2.close()
  }

  test("refreshAdaptive with no changed content is a no-op") {
    val (budgets, default) = budgetsAndDefault
    val root = Files.createTempDirectory("crawlAd0").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    phase = 'A'
    d.init(seeds, robots)
    d.runRounds(1, fetcher, robots, budgets, default)
    d.refresh(maxFetchRound = 1, priority = 9.0)
    d.runRounds(2, fetcher, robots, budgets, default) // same content refetch
    val fvBefore = d.frontier.currentVersion
    assert(d.refreshAdaptive(priority = 8.0) == 0L,
      "identical refetched content must never look stale")
    assert(d.frontier.currentVersion == fvBefore)
    d.close()
  }
}
