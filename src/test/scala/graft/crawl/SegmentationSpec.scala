package graft.crawl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.fixtures.SyntheticCorpus

/** The north-star downstream, end to end (BASELINE.json: "the
  * company-segmentation downstream (grouped aggregation of extracted 10-K
  * metrics) runs as plain DataFrame groupBy over the extracted-text
  * table"): crawl the fixture graph, then aggregate the X2-extracted
  * metrics per host and compare against an oracle computed directly from
  * the corpus generator with plain Scala — no Spark, no regex engine
  * shared with the implementation beyond the pinned spec. */
class SegmentationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("crawled-pages segmentation matches the pure-Scala oracle") {
    val res = CrawlFixture.runCrawl(spark)

    // Engine side: plain DataFrame groupBy over the extracted-text table.
    val seg = res.pages
      .select(col("url"), col("host"),
        element_at(col("metrics"), "revenue").as("revenue"),
        element_at(col("metrics"), "net_income").as("net_income"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_filings"),
        sum("revenue").cast("long").as("total_revenue"),
        sum("net_income").cast("long").as("total_income"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    // Oracle side: recompute from the popped url list + the corpus
    // generator's body template, parsing the numbers with plain string ops.
    val popped = res.popLog.select("url").collect().map(_.getString(0))
    val Idx = """^https://[^/]+/(?:private/)?filings/([0-9]+)/10-K\.htm$""".r
    val oracle = popped.groupBy(u => new java.net.URI(u).getHost).map {
      case (host, urls) =>
        val (rev, inc) = urls.map { u =>
          val Idx(i) = u: @unchecked
          val body = SyntheticCorpus.bodyFor(i.toLong, 42L)
          def grab(after: String): Long = {
            val s = body.indexOf(after) + after.length
            body.substring(s, body.indexOf(" million", s)).toLong
          }
          (grab("revenue of $"), grab("net income of $"))
        }.foldLeft((0L, 0L)) { case ((a, b), (x, y)) => (a + x, b + y) }
        host -> ((urls.length.toLong, rev, inc))
    }

    assert(seg.keySet == oracle.keySet)
    for ((host, exp) <- oracle) assert(seg(host) == exp, s"host $host")
    assert(seg.nonEmpty && seg.values.map(_._1).sum == popped.length)
  }
}
