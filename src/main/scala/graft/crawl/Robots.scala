package graft.crawl

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 — robots.txt rules and per-host politeness budgets as broadcast
  * dimension tables. Rules are host-keyed prefix lists; in batch rounds the
  * politeness enforcement is the per-round budget (crawlDelayMs is carried
  * as data — a streaming scheduler would enforce it as a delay, a batch
  * scheduler as fetches-per-round). */
object Robots {

  /** robots.json: [{"host": "...", "allow": [...], "disallow": [...],
    * "crawlDelayMs": 100}, ...] (one JSON array or JSON-lines). */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("multiLine", "true").json(path)
      .select(
        col("host").cast("string"),
        coalesce(col("allow"), array()).cast("array<string>").as("allow"),
        coalesce(col("disallow"), array()).cast("array<string>").as("disallow"),
        coalesce(col("crawlDelayMs"), lit(0L)).cast("long").as("crawlDelayMs"))
  }

  /** budgets.json: {"default": 5, "h0.example": 2, ...} → (host, budget)
    * rows; the "default" key becomes the fallback budget. */
  def loadBudgets(spark: SparkSession, path: String): (DataFrame, Int) = {
    import spark.implicits._
    val node = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    var default = 5
    val rows = Seq.newBuilder[(String, Int)]
    node.fields().forEachRemaining { e =>
      if (e.getKey == "default") default = e.getValue.asInt()
      else rows += e.getKey -> e.getValue.asInt()
    }
    (rows.result().toDF("host", "budget"), default)
  }

  /** Per-host budgets DERIVED from robots crawl-delay: a batch round
    * models a wall-clock window of `roundWindowMs`, so a host asking for
    * `crawlDelayMs` between fetches may be fetched at most
    * ⌊window / delay⌋ times per round (min 1 — a delay never blacklists).
    * Explicit budget rows (from loadBudgets) take precedence via the
    * caller's unionByName + dedup-first semantics in mergedBudgets. Hosts
    * with no crawl delay fall through to the default budget. */
  def budgetsFromCrawlDelay(robots: DataFrame, roundWindowMs: Long): DataFrame =
    robots.filter(col("crawlDelayMs") > 0)
      .select(col("host"),
        greatest(lit(1L), lit(roundWindowMs) / col("crawlDelayMs"))
          .cast("int").as("budget"))

  /** Explicit budgets override delay-derived ones; the rest union in. */
  def mergedBudgets(explicit: DataFrame, robots: DataFrame,
                    roundWindowMs: Long): DataFrame = {
    val derived = budgetsFromCrawlDelay(robots, roundWindowMs)
      .join(explicit.select("host"), Seq("host"), "left_anti")
    explicit.unionByName(derived)
  }

  /** REAL robots.txt parsing — (host, body) rows → the same rules schema
    * `load` produces from JSON, plus the host's `Sitemap:` urls. Standard
    * semantics, scoped to the `*` agent group: a group is one or more
    * consecutive `User-agent:` lines followed by its rules; rules from
    * every group naming `*` apply; `Crawl-delay` is seconds (fractions
    * allowed) → crawlDelayMs; `Sitemap:` is global per the spec (collected
    * regardless of group). Comments (`#`) and blank lines are stripped;
    * directive names are case-insensitive; empty `Disallow:` (= allow all)
    * contributes no prefix.
    *
    * Shape: a per-row pure parse (typed Dataset map, no shuffle) — robots
    * bodies are KB-scale config text parsed once per host per refresh, not
    * a hot path; the result is the same broadcast dimension as `load`. */
  def parseRobotsTxt(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("host").cast("string"), col("body").cast("string"))
      .as[(String, String)]
      .map { case (host, body) =>
        val (al, dis, delay, maps) = parseRobotsBody(body)
        (host, al, dis, delay, maps)
      }
      .toDF("host", "allow", "disallow", "crawlDelayMs", "sitemaps")
  }

  /** Bootstrap the rules table FROM THE CRAWL ITSELF: fetch
    * `https://<host>/robots.txt` for every (distinct) host through the
    * same pluggable Fetcher the crawl uses, parse the 200s with
    * [[parseRobotsTxt]]. Hosts whose robots.txt is missing (status ≠ 200)
    * get no rules row — `filterAllowed`'s left join already treats
    * rule-less hosts as unrestricted, the standard semantics. The fetch
    * is one bounded wave (one url per host), so the result is the same
    * small broadcast dimension as the file loaders. */
  def fetchRules(hosts: DataFrame, fetcher: graft.fetch.Fetcher): DataFrame = {
    val robotsUrl = concat(lit("https://"), col("host"), lit("/robots.txt"))
    val popped = hosts.select(col("host")).distinct()
      .select(robotsUrl.as("url"), xxhash64(robotsUrl).as("urlHash"),
        col("host"), lit(0.0).as("priority"), lit(0).as("depth"),
        lit(0).as("round"))
    parseRobotsTxt(
      fetcher.fetch(popped).filter(col("status") === 200)
        .select(col("host"), col("text").as("body")))
  }

  /** The pure per-host parse behind [[parseRobotsTxt]]. */
  private[crawl] def parseRobotsBody(
      body: String): (Seq[String], Seq[String], Long, Seq[String]) = {
    val allow = Seq.newBuilder[String]
    val disallow = Seq.newBuilder[String]
    val sitemaps = Seq.newBuilder[String]
    var delayMs = 0L
    var agents: List[String] = Nil   // agent lines of the OPEN group header
    var starGroup = false            // current group applies to *
    var inHeader = true              // still collecting User-agent lines
    for (raw <- Option(body).getOrElse("").linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split(":", 2) match {
        case Array(k, v) =>
          val key = k.trim.toLowerCase
          val value = v.trim
          key match {
            case "user-agent" =>
              if (!inHeader) { agents = Nil; starGroup = false; inHeader = true }
              agents ::= value
              starGroup = starGroup || value == "*"
            case "sitemap" =>
              if (value.nonEmpty) sitemaps += value // global directive
            case _ =>
              inHeader = false
              if (starGroup) key match {
                case "allow"    => if (value.nonEmpty) allow += value
                case "disallow" => if (value.nonEmpty) disallow += value
                case "crawl-delay" =>
                  delayMs = math.max(delayMs,
                    try math.round(value.toDouble * 1000) catch { case _: NumberFormatException => 0L })
                case _ => () // unknown directive: ignored per spec
              }
          }
        case _ => () // not a directive line
      }
    }
    (allow.result(), disallow.result(), delayMs, sitemaps.result())
  }

  /** Keep only rows whose URL path is allowed by the host's rules:
    * disallowed iff some disallow prefix matches and no allow prefix
    * rescues it. Hosts with no rules are allowed. The join is an explicit
    * broadcast — robots is always a small dimension. */
  def filterAllowed(df: DataFrame, robots: DataFrame): DataFrame = {
    val path = regexp_extract(col("url"), "^[a-z]+://[^/]+(/.*)?$", 1)
    df.join(broadcast(robots.select("host", "allow", "disallow")), Seq("host"), "left")
      .withColumn("__path", path)
      .withColumn("__denied",
        coalesce(exists(col("disallow"), d => col("__path").startsWith(d)), lit(false)) &&
          !coalesce(exists(col("allow"), a => col("__path").startsWith(a)), lit(false)))
      .filter(!col("__denied"))
      .drop("allow", "disallow", "__path", "__denied")
  }
}
