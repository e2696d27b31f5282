package graft.crawl

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fetch.CorpusFetcher
import graft.fixtures.SyntheticCorpus
import graft.store.DurableCrawler

/** Web-graph analytics over the persisted fetch log: LinkGraph.pageRank
  * against a hand-computed power iteration, edge derivation from the
  * write-once store, and the rank→frontier-priority feedback loop. */
class LinkGraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def fetcher = new CorpusFetcher(() =>
    SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF())
  private def robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
  private def budgetsAndDefault = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
  private def seeds = Files.readAllLines(
    java.nio.file.Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt")).asScala.toSeq

  test("pageRank matches the hand-computed power iteration (with a dangling node)") {
    // 1→2, 1→3, 2→3, 4→3; node 3 is DANGLING. Two iterations at d=0.85,
    // worked by hand: r' = 0.15/4 + 0.85·(Σ r/od + r₃/4).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 3L)).toDF("src", "dst")
    val pr = LinkGraph.pageRank(spark, edges, iters = 2, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Map(
      1L -> 0.1696484375, 2L -> 0.2081640625,
      3L -> 0.4525390625, 4L -> 0.1696484375)
    expected.foreach { case (id, v) =>
      assert(math.abs(pr(id) - v) < 1e-9, s"node $id: ${pr(id)} vs $v") }
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, "mass must be conserved")
  }

  test("store-derived edges cover every deep fetch; pageRank conserves mass") {
    val (budgets, default) = budgetsAndDefault
    val root = Files.createTempDirectory("crawlLg").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(1, fetcher, robots, budgets, default)

    val edges = d.linkEdges().get.persist()
    try {
      assert(edges.count() > 0)
      // every page fetched at depth ≥ 1 entered via an extracted link, so
      // its urlHash must appear as some edge's dst (keyspace parity of the
      // edge chain with candidate shaping)
      val deep = d.allPages().get.filter(col("depth") >= 1).select("urlHash").distinct()
      val uncovered = deep.join(edges.select(col("dst").as("urlHash")), Seq("urlHash"), "left_anti")
      assert(uncovered.count() == 0)

      val pr = d.pageRank(iters = 3).get
      val agg = pr.agg(sum("pr"), min("pr"), count(lit(1))).head()
      assert(math.abs(agg.getDouble(0) - 1.0) < 1e-6, s"mass ${agg.getDouble(0)}")
      assert(agg.getDouble(1) > 0.0)
      assert(agg.getLong(2) ==
        edges.select(col("src").as("id")).union(edges.select(col("dst").as("id")))
          .distinct().count())
    } finally { edges.unpersist(); d.close() }
  }

  test("reprioritizeByRank rewrites frontier priorities to graph ranks, resume-visible") {
    val (budgets, default) = budgetsAndDefault
    val root = Files.createTempDirectory("crawlLgR").toString
    val d = new DurableCrawler(spark, root, CrawlFixture.cfg)
    d.init(seeds, robots)
    d.runRounds(1, fetcher, robots, budgets, default)
    val ranks = d.pageRank(iters = 3).get
      .withColumnRenamed("id", "urlHash").withColumnRenamed("pr", "expPr")
    val frontierBefore = d.currentState().frontier.persist()
    val nWaiting = frontierBefore.count()
    assert(nWaiting > 0, "fixture must leave waiting frontier entries")

    val n = d.reprioritizeByRank(iters = 3)
    d.close()
    val d2 = new DurableCrawler(spark, root, CrawlFixture.cfg)
    val after = d2.currentState().frontier
    assert(after.count() == nWaiting, "reprioritize must not add or drop entries")
    // every entry's new priority == its rank (0.0 when the url has none)
    val mism = after.join(ranks, Seq("urlHash"), "left")
      .filter(abs(col("priority") - coalesce(col("expPr"), lit(0.0))) > 1e-12)
    assert(mism.count() == 0)
    assert(n == after.join(ranks, Seq("urlHash"), "left_semi").count())
    assert(n > 0, "some waiting urls must be ranked in this fixture")
    // the crawl continues normally on the new priorities
    val lin = d2.runRounds(2, fetcher, robots, budgets, default)
    assert(lin.nonEmpty && lin.head.popped > 0)
    frontierBefore.unpersist()
    d2.close()
  }
}
