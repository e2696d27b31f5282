package graft.fetch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7 — the fetch stage as a pluggable interface. Input: the popped
  * frontier slice (url, urlHash, host, priority, depth, round). Output:
  * the input columns plus (status:int, fetchTs:timestamp, html:binary).
  *
  * CONTRACT — strictly 1:1: exactly one output row per popped row, misses
  * and errors included (report them as status ≠ 200, never by dropping the
  * row; duplicate-url corpora must be deduped inside the fetcher).
  * CrawlRound derives the `popped` lineage counter from the fetched row
  * count (one job instead of two) and uses popped == 0 as loop
  * termination, so a row-dropping fetcher would mis-count lineage and can
  * end a crawl with a non-empty frontier. CrawlSpec asserts the 1:1
  * property against the round's actual popped slice.
  *
  * The sandbox has no network (SURVEY.md §0), so the default impl resolves
  * URLs against a Common-Crawl-style page table; real HTTP is another
  * implementation of this trait, never a hard dependency of the engine.
  */
trait Fetcher extends Serializable {
  def fetch(popped: DataFrame): DataFrame
}

/** Resolves fetches against a page table in the input_hint shape
  * (url, warc_ts, html, text, lang). Misses are status 404 with null html.
  * fetchTs := warc_ts — a pure function of the data, which keeps whole runs
  * byte-deterministic (a wall-clock fetchTs would break resume-exactness
  * golden tests).
  *
  * Plan shape (the scale-critical decision): the popped slice is bounded by
  * the politeness budgets (Σ per-host budget per round) and is orders of
  * magnitude smaller than the page store, so the store is STREAMED and the
  * popped set is BROADCAST — `corpus ⋈ broadcast(popped)` — exactly the
  * semi-join-pushdown shape. A `popped ⋈ corpus` shuffle join would push
  * the entire multi-TB page store (html bytes included) through the
  * exchange every round and be disk-bound at any core count. The 404 path
  * is a separate left-anti against a column-pruned scan (url only), so the
  * wide columns are read exactly once. If a round ever pops more than fits
  * in a broadcast (~10^7+ entries), swap the hint for a bucketed join on a
  * url-bucketed store — one line here, no pipeline change. */
class CorpusFetcher(corpus: () => DataFrame) extends Fetcher {
  override def fetch(popped: DataFrame): DataFrame = {
    val hits = corpus()
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .join(broadcast(popped), Seq("url"), "inner")
      .withColumn("status", lit(200))
      .withColumn("fetchTs", col("warc_ts"))
      .drop("warc_ts")
    // Misses: anti join against the url column ONLY (parquet prunes the
    // scan to ~the key width; no html/text bytes are touched).
    val misses = popped
      .join(corpus().select("url"), Seq("url"), "left_anti")
      .withColumn("status", lit(404))
      .withColumn("fetchTs", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))
      .withColumn("text", lit(null).cast("string"))
      .withColumn("lang", lit(null).cast("string"))
    hits.unionByName(misses.select(hits.columns.map(col).toSeq: _*))
  }
}

/** The popped-slice row shape handed to fetchers (frontier columns +
  * popRank from the pop window). */
case class PoppedEntry(url: String, urlHash: Long, host: String,
                       priority: Double, depth: Int, round: Int, popRank: Int)

/** A fetched page: popped columns + fetch outcome. */
case class FetchedPage(url: String, urlHash: Long, host: String,
                       priority: Double, depth: Int, round: Int, popRank: Int,
                       status: Int, fetchTs: java.sql.Timestamp,
                       html: Array[Byte], text: String, lang: String)

/** Deterministic synthetic page SERVICE: "fetches" by recomputing the page
  * from the url itself (the corpus generator's pure per-index function) —
  * the sandbox stand-in for network HTTP whose cost is, like real fetch,
  * ∝ pages fetched and embarrassingly parallel (no scan of a page store,
  * no shuffle, no broadcast). Serves byte-for-byte the same pages as the
  * corpus table written by `SyntheticCorpus.pages` with the same
  * parameters — pinned by FetcherEquivalenceSpec — so golden results are
  * fetcher-independent. URLs outside the synthetic space are 404. */
class GenerativeFetcher(nUrls: Long, seed: Long, nHosts: Int, fanout: Int,
                        fillScale: Int = 1) extends Fetcher {
  import graft.fixtures.SyntheticCorpus

  private val Idx = """^https://[^/]+/(?:private/)?filings/([0-9]+)/10-K\.htm$""".r

  override def fetch(popped: DataFrame): DataFrame = {
    val spark = popped.sparkSession
    import spark.implicits._
    val (n, s, h, f, fs) = (nUrls, seed, nHosts, fanout, fillScale)
    popped.as[PoppedEntry].map { e =>
      val page = e.url match {
        case Idx(iStr) =>
          val i = iStr.toLong
          if (i < n && SyntheticCorpus.canonicalUrl(i, s, h) == e.url)
            Some(SyntheticCorpus.pageFor(i, s, n, h, f, fs))
          else None
        case _ => None
      }
      page match {
        case Some(p) => FetchedPage(e.url, e.urlHash, e.host, e.priority,
          e.depth, e.round, e.popRank, 200, p.warc_ts, p.html, p.text, p.lang)
        case None => FetchedPage(e.url, e.urlHash, e.host, e.priority,
          e.depth, e.round, e.popRank, 404, null, null, null, null)
      }
    }.toDF()
  }
}

/** Real-HTTP fetcher: mapPartitions + a bounded java.net.http client pool
  * per partition. Honors the 1:1 trait contract — every popped row yields
  * exactly one output row; network errors and timeouts become status 599
  * (never dropped rows). The client and executor are built LAZILY on the
  * first element, so empty partitions (and the no-egress schema test) never
  * open sockets. `fetchTs` is wall-clock here — a real-HTTP crawl is
  * inherently non-reproducible, so the byte-determinism golden tests only
  * ever run against the corpus/generative fetchers.
  *
  * Output semantics match the other fetchers' schema contract: `html` is
  * the raw body bytes, `text` is the HTML-STRIPPED body (same strip chain
  * the corpus fetchers use — the extraction stage consumes `text` and
  * expects tags gone), `lang` is null (language-ID is the pipeline's
  * text_lang_id stage, not the fetcher's). The body is decoded with the
  * charset the Content-Type header declares, UTF-8 as fallback.
  *
  * Scale shape: fetch cost is per-popped-row and embarrassingly parallel
  * (no scan, no shuffle, no broadcast); `concurrencyPerPartition` bounds
  * in-flight requests per task so executors-per-host politeness composes
  * with the frontier's per-host budgets rather than multiplying them. NOT
  * exercisable in this sandbox (no egress): covered by a schema/laziness
  * test plus unit tests of the charset/strip helpers. */
class HttpFetcher(timeoutMs: Int = 10000, concurrencyPerPartition: Int = 8,
                  userAgent: String = "graft-crawler/1.0") extends Fetcher {
  import scala.util.control.NonFatal

  override def fetch(popped: DataFrame): DataFrame = {
    val spark = popped.sparkSession
    import spark.implicits._
    val (tmo, conc, ua) = (timeoutMs, concurrencyPerPartition, userAgent)
    popped.as[PoppedEntry].mapPartitions { it =>
      // Lazy: nothing network-shaped is constructed for an empty partition.
      lazy val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(tmo))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()
      it.grouped(conc).flatMap { batch =>
        val futures = batch.map { e =>
          val req =
            try {
              val r = java.net.http.HttpRequest.newBuilder(java.net.URI.create(e.url))
                .timeout(java.time.Duration.ofMillis(tmo))
                .header("User-Agent", ua).GET().build()
              Some(client.sendAsync(r,
                java.net.http.HttpResponse.BodyHandlers.ofByteArray()))
            } catch { case NonFatal(_) => None }
          (e, req)
        }
        futures.map { case (e, fOpt) =>
          val now = new java.sql.Timestamp(System.currentTimeMillis())
          fOpt.flatMap { f =>
            try {
              val resp = f.get(tmo.toLong, java.util.concurrent.TimeUnit.MILLISECONDS)
              val body = resp.body()
              val cs = HttpFetcher.charsetOf(
                resp.headers().firstValue("content-type").orElse(null))
              Some(FetchedPage(e.url, e.urlHash, e.host, e.priority, e.depth,
                e.round, e.popRank, resp.statusCode(), now, body,
                graft.fixtures.SyntheticCorpus.stripHtml(new String(body, cs)),
                null))
            } catch {
              case ie: InterruptedException =>
                // never swallow a task kill as a fetch failure
                Thread.currentThread().interrupt(); throw ie
              case NonFatal(_) => None
            }
          }.getOrElse(FetchedPage(e.url, e.urlHash, e.host, e.priority, e.depth,
            e.round, e.popRank, 599, now, null, null, null))
        }
      }
    }.toDF()
  }
}

object HttpFetcher {
  /** Charset declared by a Content-Type header value, UTF-8 fallback
    * (unknown/illegal charset names also fall back — a bad header must not
    * fail the fetch). */
  def charsetOf(contentType: String): java.nio.charset.Charset = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    if (contentType == null) utf8
    else contentType.split(';').map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("charset=") =>
        p.substring("charset=".length).trim.stripPrefix("\"").stripSuffix("\"")
    } match {
      case Some(name) =>
        try java.nio.charset.Charset.forName(name)
        catch { case scala.util.control.NonFatal(_) => utf8 }
      case None => utf8
    }
  }
}
