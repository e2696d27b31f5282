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

/** Pages compaction (`DurableCrawler.compactPages`): merging a window of
  * per-round page versions into one shared version must be invisible to
  * every read path (corpus, round slices, link graph, refresh feeds) —
  * including after a crash at any repoint prefix — and must let gc drop
  * the replaced versions. */
class CompactionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def fetcher = new CorpusFetcher(() => {
    import spark.implicits._
    SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
  })
  private def robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
  private def budgetsAndDefault = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
  private def seeds = Files.readAllLines(
    java.nio.file.Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt")).asScala.toSeq

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  private def freshStore(tag: String): DurableCrawler = {
    val (budgets, default) = budgetsAndDefault
    val d = new DurableCrawler(spark,
      Files.createTempDirectory(tag).toString, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(2, fetcher, robots, budgets, default) // rounds 0..2
    d
  }

  test("compaction is invisible to corpus, slice, and link-graph reads") {
    val d = freshStore("crawlCp")
    val last = d.lastCompleteRound.get
    val before = canon(d.allPages().get)
    val sliceBefore = canon(d.pagesInRounds(1, 1).get)
    val edgesBefore = canon(d.linkEdges().get)
    val oldVs = (0 to last).map(d.pagesVersionAt).distinct
    assert(oldVs.size == last + 1, "pre-compaction: one version per round")

    val vC = d.compactPages(0, last)
    assert((0 to last).map(d.pagesVersionAt).distinct == Seq(vC),
      "every window entry must repoint at the merged version")
    assert(canon(d.allPages().get) == before)
    assert(canon(d.pagesInRounds(1, 1).get) == sliceBefore)
    assert(canon(d.linkEdges().get) == edgesBefore)
    assert(d.compactPages(0, last) == vC, "single-version window is a no-op")
    d.close()

    // a fresh handle sees the same corpus, and gc drops the replaced versions
    val d2 = new DurableCrawler(spark, d.root, CrawlFixture.cfg)
    assert(canon(d2.allPages().get) == before)
    val removed = d2.gc(keepLastRounds = last + 1)("pages")
    assert(oldVs.forall(removed.contains),
      s"gc must remove the replaced versions $oldVs, removed $removed")
    assert(canon(d2.allPages().get) == before, "reads intact after gc")
    d2.close()
  }

  test("a crash mid-repoint leaves every read exact; re-run completes") {
    val d = freshStore("crawlCpK")
    val last = d.lastCompleteRound.get
    val before = canon(d.allPages().get)
    val edgesBefore = canon(d.linkEdges().get)
    intercept[RuntimeException] {
      d.compactPages(0, last, failAfterRepoints = 1)
    }
    // half-repointed: round 0 reads from the merged version, rounds 1..2
    // from their old versions — no loss, no duplication
    assert(d.pagesVersionAt(0) != d.pagesVersionAt(1) &&
      (1 to last).map(d.pagesVersionAt).distinct.size == last,
      "exactly round 0 repointed (to the merged version) before the injected kill")
    assert(canon(d.allPages().get) == before)
    assert(canon(d.linkEdges().get) == edgesBefore)
    assert(canon(d.pagesInRounds(0, 1).get) ==
      canon(d.allPages().get.filter(col("fetchRound") <= 1)))

    val vC2 = d.compactPages(0, last) // resume: completes the window
    assert((0 to last).map(d.pagesVersionAt).distinct == Seq(vC2))
    assert(canon(d.allPages().get) == before)
    // the refresh feed reads through allPages — still exact post-crash+resume
    assert(d.refresh(maxFetchRound = last, priority = 9.0) > 0)
    d.close()
  }
}
