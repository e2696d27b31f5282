package graft.crawl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The 10^10 probe-regime parity gate: a full crawl with
  * `broadcastBloomProbe = false` (the co-partitioned streaming probe —
  * `Seen.probePartitioned`, the regime for seen-sets whose bloom shards
  * outgrow broadcast) must be byte-identical to the broadcast regime on
  * every crawl artifact: pop ordering, seen set, extracted pages. The
  * two regimes share the dedup SEMANTICS (bloom prefilter → exact
  * anti-join) and differ only in the physical probe plan, so any
  * divergence is a bug in the partitioned path, not an allowed
  * approximation. PlanShapeSpec pins op-level parity; this pins the
  * END-TO-END crawl, the missing ladder-level evidence named by the
  * round-4 verdict. */
class ProbeRegimeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val partitioned =
    CrawlFixture.runCrawl(spark, CrawlFixture.cfg.copy(broadcastBloomProbe = false))

  private def pageRows(df: DataFrame): Seq[String] =
    df.selectExpr("urlHash", "fetchRound", "status", "md5(itemText)",
        "sort_array(map_entries(metrics))")
      .collect().map(_.toString).sorted.toSeq

  test("partitioned-probe crawl reproduces the committed pop-order golden") {
    val golden = Files.readAllLines(
      Paths.get(s"${CrawlFixture.goldenDir}/pop_order.txt")).asScala.toSeq
    assert(Crawler.popSequence(partitioned.popLog) == golden)
  }

  test("partitioned-probe crawl reproduces the committed seen-set golden") {
    val golden = Files.readAllLines(
      Paths.get(s"${CrawlFixture.goldenDir}/seen_set.txt")).asScala.map(_.toLong).toSeq
    assert(Crawler.seenDump(partitioned.state) == golden)
  }

  test("partitioned-probe pages are byte-identical to the broadcast regime's") {
    val broadcast = CrawlFixture.runCrawl(spark)
    assert(pageRows(partitioned.pages) == pageRows(broadcast.pages))
  }
}
