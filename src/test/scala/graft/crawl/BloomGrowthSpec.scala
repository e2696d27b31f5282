package graft.crawl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fetch.CorpusFetcher
import graft.filters.GraftBloomFilter
import graft.fixtures.SyntheticCorpus

/** The bloom growth guard: a crawl whose seen set outgrows the standing
  * shard geometry must REBUILD the shards at doubled capacity — an
  * unguarded OR-merge saturates the filter (fpp → 1) and the prefilter
  * silently stops rerouting work (a performance failure correctness
  * tests cannot see, so this spec measures the fpp directly). */
class BloomGrowthSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // 32 expected keys per shard × 4 shards = 128-key capacity; the crawl
  // sees ~1500+ urls → multiple doubling rebuilds must fire
  private val cfg = CrawlFixture.cfg.copy(nShards = 4, expectedKeysPerShard = 32)

  private lazy val result: Crawler.Result = {
    val corpus = () => {
      import spark.implicits._
      SyntheticCorpus.pages(spark, CrawlFixture.N_URLS, nHosts = CrawlFixture.N_HOSTS).toDF()
    }
    val robots = Robots.load(spark, s"${CrawlFixture.fixturesDir}/robots.json")
    val (budgets, default) = Robots.loadBudgets(spark, s"${CrawlFixture.fixturesDir}/budgets.json")
    val seeds = Files.readAllLines(Paths.get(s"${CrawlFixture.fixturesDir}/seeds.txt"))
      .asScala.toSeq
    Crawler.run(spark, seeds, new CorpusFetcher(corpus), robots, budgets,
      default, CrawlFixture.ROUNDS, cfg)
  }

  test("outgrown shards rebuild at doubled geometry (arithmetic trigger, no extra jobs)") {
    val st = result.state
    assert(st.seenSize == st.seenExact.count(), "seenSize arithmetic must stay exact")
    assert(st.seenSize > 4 * 32, "fixture must actually outgrow the configured capacity")
    assert(st.bloomKeysPerShard > 32,
      s"guard never fired: standing capacity still ${st.bloomKeysPerShard}")
    assert(st.bloomKeysPerShard >= st.seenSize / 4 * 85 / 100,
      "final capacity must cover the final seen load at the trigger margin")
    // serialized shards actually grew past the configured geometry
    val cfgLen = GraftBloomFilter.create(32, cfg.bloomFpp).serialize().length
    val lens = Seen.collectShardArray(st.bloomShards, 4).filter(_ != null).map(_.length)
    assert(lens.nonEmpty && lens.forall(_ > cfgLen),
      s"shard bytes ${lens.toSeq} must exceed the static-geometry $cfgLen")
  }

  test("measured fpp stays near the configured target after growth") {
    val st = result.state
    val shards = Seen.collectShardArray(st.bloomShards, 4)
    val seen = Crawler.seenDump(st).toSet
    val rnd = new scala.util.Random(123)
    val absent = Iterator.continually(rnd.nextLong()).filterNot(seen).take(20000).toSeq
    val fp = absent.count { h =>
      val sid = java.lang.Math.floorMod(h, 4L).toInt
      shards(sid) != null && GraftBloomFilter.mightContainSerialized(shards(sid), h)
    }
    val rate = fp.toDouble / absent.size
    // static 32-key geometry under this load would saturate (rate ~1);
    // the guard keeps ≥ 2× headroom, so the rate stays near cfg.bloomFpp
    assert(rate < 0.05, f"false-positive rate $rate%.4f — filter saturated, guard failed")
  }

  test("no false negatives ever: every seen hash hits its shard") {
    val st = result.state
    val shards = Seen.collectShardArray(st.bloomShards, 4)
    // bloom covers the PERMANENT subset only (failures live in the cuckoo)
    val okSeen = st.seenExact.collect().map(_.getLong(0))
    assert(okSeen.forall { h =>
      val sid = java.lang.Math.floorMod(h, 4L).toInt
      shards(sid) != null && GraftBloomFilter.mightContainSerialized(shards(sid), h)
    })
  }

  test("growth does not change crawl results: seen set matches the golden run") {
    val golden = CrawlFixture.runCrawl(spark) // default cfg, no rebuilds
    assert(Crawler.seenDump(result.state) == Crawler.seenDump(golden.state))
    assert(Crawler.popSequence(result.popLog) == Crawler.popSequence(golden.popLog))
  }
}
