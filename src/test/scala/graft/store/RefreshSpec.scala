package graft.store

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.crawl.{CrawlFixture, CrawlRound, Crawler, Robots}
import graft.fetch.CorpusFetcher
import graft.fixtures.SyntheticCorpus

/** Recrawl/freshness refresh (`Crawler.refresh` / `DurableCrawler.refresh`):
  * stale pages re-enqueue, re-fetch in deterministic order, and land as a
  * SECOND page row per url — the feed for the as-of/latest join (J6). */
class RefreshSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def fetcher = new CorpusFetcher(() => {
    import spark.implicits._
    SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
  })
  private def robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
  private def budgetsAndDefault = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
  private def seeds = Files.readAllLines(
    java.nio.file.Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt")).asScala.toSeq

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  test("durable refresh re-enqueues exactly the stale non-waiting urls and re-fetches them") {
    val (budgets, default) = budgetsAndDefault
    val root = Files.createTempDirectory("crawlRf").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(1, fetcher, robots, budgets, default) // rounds 0..1

    val pagesBefore = d.allPages().get
    val st = d.currentState()
    // expected stale set: latest fetch ≤ 0, not already waiting in frontier
    val expected = pagesBefore.groupBy("urlHash")
      .agg(max("fetchRound").as("lf")).filter(col("lf") <= 0)
      .join(st.frontier.select("urlHash"), Seq("urlHash"), "left_anti")
      .select("urlHash").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "fixture must have stale round-0 pages")

    val n = d.refresh(maxFetchRound = 0, priority = 9.0)
    assert(n == expected.size)

    // the rewritten entry is live: a FRESH handle resumes with the
    // refreshed frontier and the next round re-fetches the stale urls
    d.close()
    val d2 = new DurableCrawler(spark, root, CrawlFixture.cfg)
    val frontierNow = d2.currentState().frontier
    val enqueued = frontierNow.filter(col("priority") === 9.0)
      .select("urlHash").collect().map(_.getLong(0)).toSet
    assert(enqueued == expected)
    assert(frontierNow.groupBy("urlHash").count().filter(col("count") > 1).count() == 0,
      "refresh must not double-enqueue a waiting url")
    assert(d2.refresh(maxFetchRound = 0, priority = 9.0) == 0L,
      "refresh is idempotent: already-waiting urls do not re-enqueue")

    d2.runRounds(2, fetcher, robots, budgets, default)
    val twice = d2.allPages().get.groupBy("urlHash")
      .agg(countDistinct("fetchRound").as("nf")).filter(col("nf") >= 2)
      .select("urlHash").collect().map(_.getLong(0)).toSet
    assert(expected.subsetOf(twice),
      "every refreshed url must have a second page row with a new fetchRound")
    // J6 consumption: latest-per-url picks the refetched row
    val latest = d2.allPages().get.groupBy("urlHash").agg(max("fetchRound").as("lf"))
    assert(latest.filter(col("urlHash").isin(expected.toSeq.map(Long.box): _*))
      .filter(col("lf") =!= 2).count() == 0)
    d2.close()
  }

  test("in-memory refresh produces the identical re-fetch as the durable path") {
    val (budgets, default) = budgetsAndDefault

    // durable: 0..1, refresh(≤0), round 2
    val root = Files.createTempDirectory("crawlRfP").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(1, fetcher, robots, budgets, default)
    d.refresh(maxFetchRound = 0, priority = 9.0)
    d.runRounds(2, fetcher, robots, budgets, default)

    // in-memory: same schedule driven manually (CrawlRound + Crawler.refresh)
    val seedsDf = Robots.filterAllowed(
      graft.crawl.Frontier.fromSeeds(spark, seeds), robots).localCheckpoint(true)
    var state = Crawler.emptyState(spark, seedsDf)
    var pages: Option[DataFrame] = None
    for (r <- 0 to 1) {
      val out = CrawlRound.run(spark, state, robots, budgets, default, fetcher, r, CrawlFixture.cfg)
      out.lineage // force counters before unpersist
      val pg = out.pages.localCheckpoint(true)
      state = Crawler.checkpointState(out.state, Some(state))
      out.unpersistCached()
      pages = Some(pages.map(_.unionByName(pg)).getOrElse(pg))
    }
    state = Crawler.refresh(state, pages.get, maxFetchRound = 0, nextRound = 2, priority = 9.0)
    val out2 = CrawlRound.run(spark, state, robots, budgets, default, fetcher, 2, CrawlFixture.cfg)
    out2.lineage
    val pg2 = out2.pages.localCheckpoint(true)
    state = Crawler.checkpointState(out2.state, Some(state))
    out2.unpersistCached()
    val memPages = pages.get.unionByName(pg2)

    // identical corpus (page rows) and identical final seen set
    val dPages = d.allPages().get
    assert(sortedRows(dPages.drop("metrics")) == sortedRows(memPages.drop("metrics")))
    assert(sortedRows(d.currentState().seenExact) == sortedRows(state.seenExact))
    d.close()
  }

  test("refresh with nothing stale is a no-op (no entry rewrite)") {
    val (budgets, default) = budgetsAndDefault
    val root = Files.createTempDirectory("crawlRf0").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(1, fetcher, robots, budgets, default)
    val fvBefore = d.frontier.currentVersion
    assert(d.refresh(maxFetchRound = -1, priority = 9.0) == 0L)
    assert(d.frontier.currentVersion == fvBefore)
    d.close()
  }
}
