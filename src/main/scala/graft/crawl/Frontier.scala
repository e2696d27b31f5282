package graft.crawl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.CanonicalizeUrl.canonicalize_url

/** The partitioned priority frontier (SURVEY.md §2.6 W1, §2.7, §4.4).
  *
  * Ordering contract: every ordering flows from DATA — (priority DESC,
  * urlHash ASC) is a total order because urlHash is unique per frontier
  * entry — never from partition/task order. This is what makes the popped
  * sequence identical at local[1] and local[32] (the crawl-ordering parity
  * gate). */
object Frontier {

  /** Deterministic base priority of a url — a pure function of its hash. */
  def basePriority(urlHash: Column): Column =
    pmod(urlHash, lit(1000L)).cast("double") / lit(1000.0)

  /** S4 — seed ingestion: canonicalize, hash, host, depth 0, round 0. */
  def fromSeeds(spark: SparkSession, rawUrls: Seq[String]): DataFrame = {
    import spark.implicits._
    val df = rawUrls.toDF("rawUrl")
      .select(canonicalize_url(col("rawUrl")).as("url"))
      .withColumn("urlHash", xxhash64(col("url")))
      .withColumn("host", parse_url(col("url"), lit("HOST")))
      .withColumn("priority", basePriority(col("urlHash")))
      .withColumn("depth", lit(0))
      .withColumn("round", lit(0))
    dedupEntries(df)
  }

  /** Canonical representative per urlHash, with DETERMINISTIC aggregates
    * only (min/max — never first()): best priority, shallowest depth. */
  def dedupEntries(entries: DataFrame): DataFrame =
    entries.groupBy("urlHash").agg(
      min("url").as("url"),
      min("host").as("host"),
      max("priority").as("priority"),
      min("depth").as("depth"),
      min("round").as("round"))
      .select("url", "urlHash", "host", "priority", "depth", "round")

  /** W1 — the frontier pop: per host, take the top-`budget` entries by
    * (priority DESC, urlHash ASC), under domain skew.
    *
    * Two-phase skew defuse (§4.4): phase 1 ranks within (host, salt) — the
    * shuffle is spread over `saltBuckets` partitions per host, so a
    * mega-host (15% of the frontier) cannot pin one reducer. Phase 2 ranks
    * the ≤ saltBuckets·budget phase-1 survivors per host — a tiny window.
    * Identical result to a single per-host window, provably: the global
    * per-host top-B is contained in the union of per-salt top-Bs.
    *
    * @return (popped with popRank column, remaining frontier) */
  def pop(frontier: DataFrame, budgets: DataFrame, defaultBudget: Int,
          saltBuckets: Int): (DataFrame, DataFrame) = {
    val cols = frontier.columns.map(col).toSeq
    val withBudget = frontier
      .join(broadcast(budgets), Seq("host"), "left")
      .withColumn("__budget", coalesce(col("budget"), lit(defaultBudget)))
      .drop("budget")
      .withColumn("__salt", pmod(col("urlHash"), lit(saltBuckets.toLong)))

    val w1 = Window.partitionBy("host", "__salt")
      .orderBy(col("priority").desc, col("urlHash").asc)
    val s1 = withBudget.withColumn("__rn1", row_number().over(w1))
    val keep1 = s1.filter(col("__rn1") <= col("__budget"))
    val rest1 = s1.filter(col("__rn1") > col("__budget"))

    val w2 = Window.partitionBy("host")
      .orderBy(col("priority").desc, col("urlHash").asc)
    val s2 = keep1.withColumn("__rn2", row_number().over(w2))
    val popped = s2.filter(col("__rn2") <= col("__budget"))
      .select(cols :+ col("__rn2").as("popRank"): _*)
    val remaining = rest1.select(cols: _*)
      .unionByName(s2.filter(col("__rn2") > col("__budget")).select(cols: _*))
    (popped, remaining)
  }

  private val HREF_PATTERN = """href="([^"]+)""""

  /** E1/E2 — link extraction + candidate shaping: hrefs out of fetched
    * html, canonicalized, hashed, deduped map-side by the partial
    * aggregation of the groupBy (dedup-before-shuffle layer 1). Children
    * inherit priority basePriority/2^depth. */
  def expand(fetched: DataFrame, cfg: CrawlConfig): DataFrame = {
    val links = fetched
      .filter(col("status") === 200 && col("depth") < cfg.maxDepth)
      .withColumn("__html_str", decode(col("html"), "UTF-8"))
      .select(
        explode(expr(s"""regexp_extract_all(__html_str, '$HREF_PATTERN', 1)"""))
          .as("rawUrl"),
        col("depth").as("parentDepth"))
      .select(canonicalize_url(col("rawUrl")).as("url"), col("parentDepth"))
      .filter(col("url").startsWith("http"))
      .withColumn("urlHash", xxhash64(col("url")))
      .withColumn("host", parse_url(col("url"), lit("HOST")))
      .withColumn("depth", col("parentDepth") + 1)
      .withColumn("priority",
        if (cfg.priorityHalving) basePriority(col("urlHash")) / pow(lit(2.0), col("depth"))
        else basePriority(col("urlHash")))
      .withColumn("round", lit(0)) // caller stamps the real round
      .select("url", "urlHash", "host", "priority", "depth", "round")
    dedupEntries(links)
  }
}
