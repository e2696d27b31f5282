package graft.fetch

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** HttpFetcher plumbing without a network: the client pool is lazy per
  * partition, so an empty popped slice exercises schema + plan shape
  * without opening a socket (the sandbox has no egress). */
class HttpFetcherSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("empty popped slice yields the fetched schema, no network touched") {
    import spark.implicits._
    val popped = spark.emptyDataset[PoppedEntry].toDF()
    val out = new HttpFetcher().fetch(popped)
    assert(out.columns.toSeq == Seq("url", "urlHash", "host", "priority",
      "depth", "round", "popRank", "status", "fetchTs", "html", "text", "lang"))
    assert(out.count() == 0)
  }

  test("unresolvable url becomes a 1:1 status-599 row, never a dropped row") {
    import spark.implicits._
    // A guaranteed-invalid scheme short-circuits in URI building — no
    // connection attempt, but the row must still come back (the trait's
    // 1:1 contract under failure).
    val popped = Seq(
      PoppedEntry("not a url at all", 1L, "h", 0.5, 0, 0, 1)).toDS().toDF()
    val rows = new HttpFetcher(timeoutMs = 10).fetch(popped).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Int]("status") == 599)
  }
}
