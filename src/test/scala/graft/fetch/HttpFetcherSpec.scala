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

  test("charset derives from Content-Type, UTF-8 fallback on absent/garbage") {
    import java.nio.charset.StandardCharsets._
    assert(HttpFetcher.charsetOf(null) == UTF_8)
    assert(HttpFetcher.charsetOf("text/html") == UTF_8)
    assert(HttpFetcher.charsetOf("text/html; charset=ISO-8859-1") == ISO_8859_1)
    assert(HttpFetcher.charsetOf("text/html;charset=\"utf-16\"") == UTF_16)
    assert(HttpFetcher.charsetOf("text/html; charset=no-such-charset") == UTF_8)
    assert(HttpFetcher.charsetOf("text/html; boundary=x; charset=US-ASCII") == US_ASCII)
  }
}
