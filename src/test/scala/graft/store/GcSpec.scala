package graft.store

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.crawl.{CrawlFixture, Robots}
import graft.fetch.CorpusFetcher
import graft.fixtures.SyntheticCorpus

/** Snapshot GC (DurableCrawler.gc / SnapshotTable.expire): history outside
  * the retention window is deleted from disk, everything a kept round
  * references survives (including reused failure-side versions), and the
  * store keeps crawling and resuming exactly as before. */
class GcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def fetcher = new CorpusFetcher(() => {
    import spark.implicits._
    SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
  })
  private def robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")

  private def dataDirs(root: String, table: String): Set[String] = {
    val d = Paths.get(root, table, "data")
    if (!Files.exists(d)) Set.empty
    else Files.list(d).iterator().asScala.map(_.getFileName.toString).toSet
  }

  test("gc keeps the retention window, deletes older versions, store keeps working") {
    val (budgets, default) = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
    val seeds = Files.readAllLines(Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt"))
      .asScala.toSeq
    val root = Files.createTempDirectory("crawlGc").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(3, fetcher, robots, budgets, default)
    val allBefore = d.allPages().get.count()
    val frontierDirsBefore = dataDirs(root, "frontier")
    assert(frontierDirsBefore.size >= 5) // init + rounds 0..3

    val removed = d.gc(keepLastRounds = 2)
    assert(removed("frontier").nonEmpty && removed("seen").nonEmpty,
      s"gc removed nothing: $removed")
    assert(dataDirs(root, "frontier").size < frontierDirsBefore.size)
    assert(d.oldestRetainedRound.contains(2) && d.lastCompleteRound.contains(3))

    // reads within the window work; expired history is actually gone
    assert(d.allPages().get.count() ==
      d.pagesInRounds(0, 99).get.count()) // clamped to the retained floor
    assert(d.lineageAt(3).count() > 0)
    intercept[Exception] { d.lineageAt(0).count() }

    // gc is idempotent
    assert(d.gc(keepLastRounds = 2).values.forall(_.isEmpty))

    // a FRESH process over the gc'd store resumes and keeps crawling
    d.close()
    val d2 = new DurableCrawler(spark, root, CrawlFixture.cfg)
    assert(d2.lastCompleteRound.contains(3))
    val lineages = d2.runRounds(4, fetcher, robots, budgets, default)
    assert(lineages.nonEmpty && d2.lastCompleteRound.contains(4))
    assert(d2.allPages().get.count() > allBefore - d2.pagesInRounds(0, 1).map(_.count()).getOrElse(0L))
  }

  test("gc never expires a version a kept round still references (reuse-aware floor)") {
    // failure-free rounds REUSE the failed/cuckoo versions committed at
    // init (commitOrReuse): after gc those old versions must survive,
    // because kept entries reference them
    val (budgets, default) = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
    val seeds = Files.readAllLines(Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt"))
      .asScala.toSeq
    val root = Files.createTempDirectory("crawlGcReuse").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(2, fetcher, robots, budgets, default)
    d.gc(keepLastRounds = 1)
    // the failed table's only version (v0, from init) is still referenced
    assert(removedSafe(d).failed.count() == 0) // readable ⇒ not expired
    val st = d.currentState()
    assert(st.seenExact.count() > 0)
  }

  private def removedSafe(d: DurableCrawler) = d.currentState()
}
