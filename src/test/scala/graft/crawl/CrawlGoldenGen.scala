package graft.crawl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.TestSpark
import graft.fetch.CorpusFetcher
import graft.fixtures.SyntheticCorpus

/** Shared crawl-test wiring: the FIXTURES.md §3 synthetic web graph —
  * 2000-page seed-42 corpus, 20 seeds, mega-host throttled to budget 2,
  * /private/ robots-disallowed everywhere. */
object CrawlFixture {
  val N_URLS = 2000L
  val N_HOSTS = 100
  val ROUNDS = 5
  val cfg: CrawlConfig = CrawlConfig(nShards = 8, expectedKeysPerShard = 8192)

  val fixturesDir = "src/test/resources/fixtures"
  val goldenDir = "src/test/resources/golden/crawl"

  def seedUrls: Seq[String] =
    (0 until 20).map(k => SyntheticCorpus.canonicalUrl(k.toLong * 97 % N_URLS, 42L, N_HOSTS))

  def writeFixtures(): Unit = {
    Files.createDirectories(Paths.get(fixturesDir))
    Files.write(Paths.get(s"$fixturesDir/seeds.txt"), seedUrls.asJava)
    Files.writeString(Paths.get(s"$fixturesDir/budgets.json"),
      """{"default": 5, "h0.example": 2}""")
    val robots = (0 until N_HOSTS).map { h =>
      s"""{"host": "h$h.example", "allow": [], "disallow": ["/private/"], "crawlDelayMs": 100}"""
    }.mkString("[\n", ",\n", "\n]")
    Files.writeString(Paths.get(s"$fixturesDir/robots.json"), robots)
  }

  def runCrawl(spark: org.apache.spark.sql.SparkSession,
               cfgOverride: CrawlConfig = cfg): Crawler.Result = {
    val corpus = () => {
      import spark.implicits._
      SyntheticCorpus.pages(spark, N_URLS, nHosts = N_HOSTS).toDF()
    }
    val robots = Robots.load(spark, s"$fixturesDir/robots.json")
    val (budgets, default) = Robots.loadBudgets(spark, s"$fixturesDir/budgets.json")
    val seeds = Files.readAllLines(Paths.get(s"$fixturesDir/seeds.txt")).asScala.toSeq
    Crawler.run(spark, seeds, new CorpusFetcher(corpus), robots, budgets,
      default, ROUNDS, cfgOverride)
  }
}

/** Writes the committed fixtures and the crawl-ordering / seen-set goldens
  * (run once, commit; regenerate ONLY on a deliberate contract change). */
object CrawlGoldenGen {
  def main(args: Array[String]): Unit = {
    CrawlFixture.writeFixtures()
    val spark = TestSpark.spark
    val res = CrawlFixture.runCrawl(spark)
    Files.createDirectories(Paths.get(CrawlFixture.goldenDir))
    Files.write(Paths.get(s"${CrawlFixture.goldenDir}/pop_order.txt"),
      Crawler.popSequence(res.popLog).asJava)
    Files.write(Paths.get(s"${CrawlFixture.goldenDir}/seen_set.txt"),
      Crawler.seenDump(res.state).map(_.toString).asJava)
    println(s"pop entries: ${res.popLog.count()}, seen: ${res.state.seenExact.count()}")
    res.lineages.foreach(l => println(s"round ${l.round}: $l"))
    spark.stop()
  }
}
