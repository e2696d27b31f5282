package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page — EXACTLY the input_hint shape
  * (BASELINE.json: url:string, warc_ts:timestamp, html:binary, text:string,
  * lang:string). */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** S6 — deterministic synthetic web corpus (FIXTURES.md §2). Every field is
  * a pure function of (row index, seed): identical across partition counts,
  * executors, and runs — the foundation of the crawl-ordering and
  * byte-identical-extraction golden tests.
  *
  * Deliberate skew: ~15% of all pages live on the single mega-host
  * `h0.example` (exercises the host-salt split path, SURVEY.md §4.4).
  * ~2% of URLs sit under `/private/` (robots-disallowed in the fixtures).
  * ~10% of URL occurrences carry canonicalization noise that P1 must
  * collapse back to the canonical form.
  */
object SyntheticCorpus {

  final val EPOCH_2024 = 1704067200L // 2024-01-01T00:00:00Z, seconds

  /** splitmix64 — stateless, so any (i, stream) pair hashes independently. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)

  private val VOCAB: Array[String] = Array(
    "the", "a", "of", "and", "company", "fiscal", "results", "operations",
    "segment", "revenue", "growth", "market", "products", "services",
    "customers", "increase", "decrease", "compared", "prior", "year",
    "quarter", "expenses", "operating", "margin", "cash", "flow",
    "investments", "risk", "factors", "forward", "looking", "statements",
    "regulatory", "competition", "international", "technology", "demand",
    "supply", "costs", "materials")

  def hostFor(i: Long, seed: Long, nHosts: Int): String = {
    val h = mix2(seed, i * 31 + 1)
    if (java.lang.Long.remainderUnsigned(h, 100) < 15) "h0.example"
    else s"h${1 + java.lang.Long.remainderUnsigned(mix(h), (nHosts - 1).max(1))}.example"
  }

  def pathFor(i: Long, seed: Long): String = {
    val priv = java.lang.Long.remainderUnsigned(mix2(seed, i * 17 + 5), 50) == 0
    if (priv) s"/private/filings/$i/10-K.htm" else s"/filings/$i/10-K.htm"
  }

  /** The canonical URL of page i — what P1 must produce from any noisy form. */
  def canonicalUrl(i: Long, seed: Long, nHosts: Int): String =
    s"https://${hostFor(i, seed, nHosts)}${pathFor(i, seed)}"

  /** A possibly-noisy spelling of page i's URL; `saltStream` varies the
    * noise per occurrence (the same target appears differently from
    * different sources). Every variant canonicalizes to canonicalUrl(i). */
  def noisyUrl(i: Long, seed: Long, nHosts: Int, saltStream: Long): String = {
    val host = hostFor(i, seed, nHosts)
    val path = pathFor(i, seed)
    val n = mix2(seed ^ 0x5eed, i * 131 + saltStream)
    if (java.lang.Long.remainderUnsigned(n, 10) != 0) s"https://$host$path"
    else java.lang.Long.remainderUnsigned(mix(n), 5) match {
      case 0 => s"https://${host.toUpperCase(java.util.Locale.ROOT)}$path"
      case 1 => s"https://$host:443$path"
      case 2 => s"https://$host/./${path.substring(1)}"
      case 3 => s"https://$host$path#section-7"
      case _ => s"https://$host/${path.substring(1).replaceFirst("/", "//")}"
    }
  }

  def langFor(i: Long, seed: Long): String =
    java.lang.Long.remainderUnsigned(mix2(seed ^ 0x1a9, i), 20) match {
      case x if x < 14 => "en"
      case 14 | 15     => "es"
      case 16 | 17     => "de"
      case 18          => "zh"
      case _           => "fr"
    }

  def warcTsFor(i: Long, seed: Long): Timestamp =
    new Timestamp((EPOCH_2024 +
      java.lang.Long.remainderUnsigned(mix2(seed ^ 0x7157, i), 365L * 24 * 3600)) * 1000L)

  /** Out-link targets of page i (hash-chosen, may include self-loops —
    * dedup handles them). */
  def linkTargets(i: Long, seed: Long, nUrls: Long, fanout: Int): Seq[Long] =
    (0 until fanout).map { k =>
      java.lang.Long.remainderUnsigned(mix2(seed ^ 0x11fca, i * 1009 + k), nUrls)
    }

  /** The 10-K-shaped body: extraction (X1/X2) has byte-stable, non-trivial
    * targets in every page. `fillScale` multiplies the filler volume
    * (default 1 = the golden-file corpus); the bench raises it so pages
    * carry realistic web-page weight (~10 KB+) and per-URL work dominates
    * fixed stage latency. */
  def bodyFor(i: Long, seed: Long, fillScale: Int = 1): String = {
    val h = mix2(seed ^ 0xb0d7, i)
    val v1 = java.lang.Long.remainderUnsigned(h, 90000) + 100
    val v2 = java.lang.Long.remainderUnsigned(mix(h), 20000) + 10
    val year = 2000 + java.lang.Long.remainderUnsigned(mix(h ^ 3), 25)
    val nFill = (3 + java.lang.Long.remainderUnsigned(mix(h ^ 9), 6)).toInt * fillScale
    val filler = new StringBuilder
    var k = 0
    while (k < nFill) {
      val len = (6 + java.lang.Long.remainderUnsigned(mix2(h, k * 7 + 1), 7)).toInt
      var w = 0
      while (w < len) {
        filler.append(VOCAB(
          java.lang.Long.remainderUnsigned(mix2(h ^ k, w * 13 + 3), VOCAB.length).toInt))
        filler.append(if (w == len - 1) ". " else " ")
        w += 1
      }
      k += 1
    }
    s"ITEM 7. MANAGEMENT'S DISCUSSION AND ANALYSIS. We reported revenue of " +
      s"$$$v1 million and net income of $$$v2 million for fiscal $year. " +
      filler.toString.trim +
      " ITEM 7A. QUANTITATIVE AND QUALITATIVE DISCLOSURES ABOUT MARKET RISK."
  }

  /** P6's exact strip chain (tags → space, collapse spaces, trim) — `text`
    * is DEFINED as the strip of `html`, so the pair is consistent by
    * construction.
    *
    * Single-pass hand-rolled scan, byte-equivalent to
    * `replaceAll("<[^>]*>", " ").replaceAll(" +", " ").trim` (pinned
    * against the regex chain in SyntheticCorpusSpec): the regex form cost
    * ~300 µs per 24 KB page — 3× the page GENERATION itself, and ~40% of
    * the bench's dominant fetch stage (it runs per fetched page in both
    * synthetic fetchers and HttpFetcher). Semantics replicated exactly:
    * a '<' with no closing '>' stays literal; only 0x20 runs collapse
    * (tabs/newlines break runs, as " +" does); trailing trim is Java's. */
  def stripHtml(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(n)
    var lastSpace = false
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < n && html.charAt(j) != '>') j += 1
        if (j < n) { // whole tag → one space, joining any adjacent run
          if (!lastSpace) { sb.append(' '); lastSpace = true }
          i = j + 1
        } else { // unmatched '<' is literal, like the regex
          sb.append('<'); lastSpace = false; i += 1
        }
      } else if (c == ' ') {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
        i += 1
      } else {
        // bulk-copy the run up to the next special char (per-char appends
        // were the remaining cost: ~24k bound-checked calls per page)
        var j = i + 1
        while (j < n && { val d = html.charAt(j); d != '<' && d != ' ' }) j += 1
        sb.append(html, i, j)
        lastSpace = false
        i = j
      }
    }
    sb.toString.trim
  }

  def htmlFor(i: Long, seed: Long, nUrls: Long, nHosts: Int, fanout: Int,
              fillScale: Int = 1): String = {
    val body = bodyFor(i, seed, fillScale)
    val anchors = linkTargets(i, seed, nUrls, fanout).zipWithIndex.map { case (j, k) =>
      s"""<a href="${noisyUrl(j, seed, nHosts, i * 37 + k)}">filing $j</a>"""
    }.mkString(" ")
    s"<html><head><title>Filing $i</title></head><body><h1>FORM 10-K</h1>" +
      s"<p>$body</p> $anchors</body></html>"
  }

  def pageFor(i: Long, seed: Long, nUrls: Long, nHosts: Int, fanout: Int,
              fillScale: Int = 1): Page = {
    val html = htmlFor(i, seed, nUrls, nHosts, fanout, fillScale)
    Page(
      url = canonicalUrl(i, seed, nHosts),
      warc_ts = warcTsFor(i, seed),
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = stripHtml(html),
      lang = langFor(i, seed))
  }

  /** The distributed corpus: pure per-index generation over spark.range —
    * any scale, deterministic, partition-count independent. */
  def pages(spark: SparkSession, nUrls: Long, seed: Long = 42L,
            nHosts: Int = 100, fanout: Int = 4,
            numPartitions: Option[Int] = None, fillScale: Int = 1): Dataset[Page] = {
    import spark.implicits._
    val parts = numPartitions.getOrElse(spark.sparkContext.defaultParallelism)
    spark.range(0L, nUrls, 1L, parts)
      .map(i => pageFor(i, seed, nUrls, nHosts, fanout, fillScale))
  }
}
