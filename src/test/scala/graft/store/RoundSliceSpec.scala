package graft.store

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.crawl.{CrawlFixture, Robots}
import graft.fetch.CorpusFetcher
import graft.fixtures.SyntheticCorpus

/** Round-sliced corpus reads (DurableCrawler.pagesInRounds): the round log
  * prunes whole versions, and the manifest-stats prune (readPruned on
  * fetchRound) keeps out-of-slice FILES from ever reaching a scan — the
  * Iceberg-metadata-prune analog on the crawl's own read path. */
class RoundSliceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val crawler = {
    val fetcher = new CorpusFetcher(() => {
      import spark.implicits._
      SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
    })
    val robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
    val (budgets, default) = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
    val seeds = Files.readAllLines(
      java.nio.file.Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt")).asScala.toSeq
    val root = Files.createTempDirectory("crawlSlice").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(2, fetcher, robots, budgets, default)
    d
  }

  test("pagesInRounds slices exactly: each slice holds its rounds' pages only") {
    val all = crawler.allPages().get
    val slice1 = crawler.pagesInRounds(1, 1).get
    assert(slice1.select("fetchRound").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(slice1.count() ==
      all.filter(org.apache.spark.sql.functions.col("fetchRound") === 1).count())
    val whole = crawler.pagesInRounds(0, 99).get
    assert(whole.count() == all.count())
  }

  test("out-of-slice page files never reach a scan (manifest-stats prune)") {
    // every file of round 2's version carries fetchRound == 2 in its
    // footer stats — a [0,1] slice must prune ALL of them
    val v2 = crawler.pagesVersionAt(2)
    assert(crawler.pages.readPruned("fetchRound", 0, 1, v2).rdd.getNumPartitions <= 1)
    val plan = crawler.pages.readPruned("fetchRound", 0, 1, v2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains(".parquet"), s"a pruned-out file still reached the scan:\n$plan")
    // and an intersecting slice reads the version's files normally
    assert(crawler.pages.readPruned("fetchRound", 2, 2, v2).count() > 0)
  }

  test("a pre-fetchRound pages version (old-build store) still reads via allPages and pagesInRounds") {
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.selectExpr(df.columns.sorted.toSeq: _*).collect().map(_.toString).sorted.toSeq
    val expectAll = rows(crawler.allPages().get)
    val expectR0 = rows(crawler.pagesInRounds(0, 0).get)

    // Simulate round 0 having been committed by a build that predates the
    // fetchRound column: commit a column-less copy as a new pages version
    // and point round-0.json's pagesV at it (the round log is the only
    // reference — data-file immutability is preserved).
    val v0 = crawler.pagesVersionAt(0)
    val legacy = crawler.pages.read(v0).drop("fetchRound")
    val legacyV = crawler.pages.commit(legacy)
    val p = java.nio.file.Paths.get(crawler.root, "roundlog", "round-0.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.readTree(Files.readString(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    n.put("pagesV", legacyV)
    Files.writeString(p, n.toString)

    // allPages: the legacy version unions with new-format rounds (no
    // AnalysisException), fetchRound coalesced from the round-log round.
    val all2 = crawler.allPages().get
    assert(rows(all2) == expectAll)
    // pagesInRounds: whole-version selection for the legacy round — exact.
    val r0 = crawler.pagesInRounds(0, 0).get
    assert(rows(r0) == expectR0)
    assert(r0.select("fetchRound").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    // a slice excluding round 0 must not read the legacy version at all
    assert(crawler.pagesInRounds(1, 2).get.filter(col("fetchRound") === 0).count() == 0)
  }
}
