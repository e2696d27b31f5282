package graft.crawl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fetch.CorpusFetcher
import graft.fixtures.SyntheticCorpus

/** Frontier compaction (cfg.frontierCap): discovery ≫ cap must bound the
  * ACTIVE frontier at the cap, spill the overflow, re-admit it
  * highest-priority-first as the crawl drains — and never lose a URL or
  * break determinism. */
class FrontierCapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val CAP = 120L
  private def cappedCfg = CrawlFixture.cfg.copy(frontierCap = Some(CAP))

  private def runCapped(rounds: Int, cfg: CrawlConfig): Crawler.Result = {
    val corpus = () => {
      import spark.implicits._
      SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
    }
    val robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
    val (budgets, default) = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
    val seeds = Files.readAllLines(Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt")).asScala.toSeq
    Crawler.run(spark, seeds, new CorpusFetcher(corpus), robots, budgets,
      default, rounds, cfg)
  }

  private lazy val capped = runCapped(CrawlFixture.ROUNDS, cappedCfg)
  private lazy val uncapped = CrawlFixture.runCrawl(spark)

  test("active frontier stays <= cap after every round, and eviction actually fires") {
    assert(capped.state.frontier.count() <= CAP)
    assert(capped.state.frontierSize <= CAP)
    assert(capped.lineages.map(_.evicted).sum > 0,
      "fixture must actually overflow the cap, or this spec is vacuous")
    // the uncapped frontier genuinely exceeds the cap — discovery >> cap
    assert(uncapped.state.frontier.count() > CAP)
  }

  test("tracked sizes equal the real table sizes (arithmetic maintenance is exact)") {
    assert(capped.state.frontierSize == capped.state.frontier.count())
    assert(capped.state.spilledSize ==
      capped.state.spilled.map(_.count()).getOrElse(0L))
  }

  test("conservation: no URL is lost or duplicated across active/spill/popped") {
    // every discovered url is in exactly one of: active frontier, spill,
    // seen (popped ok), failed
    val all = capped.state.frontier.select("urlHash")
      .unionByName(capped.state.spilled.get.select("urlHash"))
      .unionByName(capped.state.seenExact.select("urlHash"))
      .unionByName(capped.state.failed.select("urlHash"))
    assert(all.count() == all.distinct().count(), "a url appears in two state tables")
    // lineage arithmetic: evicted - readmitted == spill size
    val ev = capped.lineages.map(_.evicted).sum
    val ad = capped.lineages.map(_.readmitted).sum
    assert(ev - ad == capped.state.spilledSize)
  }

  test("after a compaction round, the active frontier is the exact top-cap slice") {
    // Union-compaction semantics: a compaction re-splits active ∪ spill at
    // the cap, so right after one, even the worst active entry outranks
    // the best spilled one under (priority DESC, urlHash ASC).
    val last = capped.lineages.last
    assert(last.evicted + last.readmitted > 0,
      "fixture must compact in its final round for this invariant check")
    val activeFloor = capped.state.frontier
      .agg(max(struct(col("priority") * -1, col("urlHash")))).head.getStruct(0)
    val spillTop = capped.state.spilled.get
      .agg(min(struct(col("priority") * -1, col("urlHash")))).head.getStruct(0)
    val aKey = (activeFloor.getDouble(0), activeFloor.getLong(1))
    val sKey = (spillTop.getDouble(0), spillTop.getLong(1))
    assert(Ordering.Tuple2[Double, Long].lt(aKey, sKey),
      s"active floor $aKey must outrank spill top $sKey")
  }

  test("capped crawl is partition-count independent (determinism gate)") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val res13 = runCapped(CrawlFixture.ROUNDS, cappedCfg)
      assert(Crawler.popSequence(res13.popLog) == Crawler.popSequence(capped.popLog))
      assert(Crawler.seenDump(res13.state) == Crawler.seenDump(capped.state))
      val spill = capped.state.spilled.get.select("urlHash")
        .collect().map(_.getLong(0)).sorted.toSeq
      val spill13 = res13.state.spilled.get.select("urlHash")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(spill == spill13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("eventual completeness: run to exhaustion, seen set equals the uncapped crawl's") {
    // A small dedicated corpus (300 urls / 20 hosts, cap 60) so the capped
    // crawl reaches exhaustion in bounded rounds: re-admission must drain
    // the spill completely and lose nothing.
    val (nUrls, nHosts, cap) = (300L, 20, 60L)
    def runSmall(cfg: CrawlConfig): Crawler.Result = {
      val corpus = () => {
        import spark.implicits._
        SyntheticCorpus.pages(spark, nUrls, nHosts = nHosts).toDF()
      }
      val robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
      val (budgets, default) = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
      val seeds = (0 until 10).map(k =>
        SyntheticCorpus.canonicalUrl(k.toLong * 31 % nUrls, 42L, nHosts))
      Crawler.run(spark, seeds, new CorpusFetcher(corpus), robots, budgets,
        default, 40, cfg)
    }
    val cappedFull = runSmall(CrawlFixture.cfg.copy(frontierCap = Some(cap)))
    val uncappedFull = runSmall(CrawlFixture.cfg)
    assert(cappedFull.lineages.map(_.evicted).sum > 0, "small fixture must spill")
    assert(cappedFull.state.spilled.map(_.count()).getOrElse(0L) == 0L,
      "spill must fully drain by exhaustion")
    assert(Crawler.seenDump(cappedFull.state) == Crawler.seenDump(uncappedFull.state),
      "eviction + re-admission must never lose a URL")
  }

  test("removing the cap folds the spill back into the frontier — nothing stranded") {
    // capped run spills; continuing the SAME state uncapped must re-admit
    // every spilled url (a passed-through spill would never pop again)
    val spilled0 = capped.state.spilled.get.select("urlHash")
      .collect().map(_.getLong(0)).toSet
    assume(spilled0.nonEmpty)
    val corpus = () => {
      import spark.implicits._
      SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
    }
    val robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
    val (budgets, default) = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
    val out = CrawlRound.run(spark, capped.state, robots, budgets, default,
      new graft.fetch.CorpusFetcher(corpus), CrawlFixture.ROUNDS, CrawlFixture.cfg) // cap = None
    assert(out.state.spilled.isEmpty, "uncapped round must absorb the spill")
    assert(out.lineage.readmitted == spilled0.size)
    val frontierHashes = out.state.frontier.select("urlHash")
      .collect().map(_.getLong(0)).toSet
    val popped = out.popped.select("urlHash").collect().map(_.getLong(0)).toSet
    val seen = out.state.seenExact.select("urlHash").collect().map(_.getLong(0)).toSet ++
      out.state.failed.select("urlHash").collect().map(_.getLong(0)).toSet
    assert(spilled0.forall(h => frontierHashes(h) || popped(h) || seen(h)),
      "every spilled url must be back in play")
    out.unpersistCached()
  }

  test("splitTopByPriority is an exact deterministic top-n at any partitioning") {
    import spark.implicits._
    // unique urlHash (odd multiplier, no mod) — ties in priority are
    // broken by hash, so the expected order is total
    val rows = (0L until 5000L)
      .map(i => (s"u$i", i * 2654435761L, s"h${i % 7}",
        (i % 997).toDouble / 997.0, 1, 0))
    val df = rows.toDF("url", "urlHash", "host", "priority", "depth", "round")
    val expected = rows.sortBy(r => (-r._4, r._2)).take(1234)
      .map(_._2).sorted
    for (parts <- Seq(1, 7)) {
      val (top, rest, nRest) = Frontier.splitTopByPriority(df.repartition(parts), 1234L)
      assert(top.count() == 1234 && nRest == 5000 - 1234)
      assert(top.select("urlHash").collect().map(_.getLong(0)).sorted.toSeq == expected.toSeq)
      assert(rest.count() == 5000 - 1234)
    }
  }
}
