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

  /** Exact global top-`n` split by (priority DESC, urlHash ASC) — the
    * frontier-compaction kernel. A global rank window would funnel the
    * whole table through one reducer; instead:
    *
    *  1. ONE narrow aggregate histograms the monotone 16-bit
    *     priority_bucket (≤ 2^16 rows to the driver);
    *  2. whole buckets strictly above the threshold bucket are kept by a
    *     map-side filter (no shuffle, no sort);
    *  3. only the BOUNDARY bucket — one quantization cell — is exactly
    *     ranked, via a range-partitioned sort + zipWithIndex (the
    *     scale-shaped exact top-k: sorted partitions + per-partition
    *     offsets, never a single-reducer window). Ordering is total
    *     (urlHash unique), so the split is deterministic at any partition
    *     count.
    *
    * @return (top, rest, nRest) where top holds exactly min(n, |df|) rows.
    *         Requires columns (priority, urlHash); all columns survive. */
  def splitTopByPriority(df: DataFrame, n: Long): (DataFrame, DataFrame, Long) = {
    import graft.expr.PriorityBucket.priority_bucket
    val spark = df.sparkSession
    val bucket = priority_bucket(col("priority"))
    val hist = df.groupBy(bucket.as("__b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    val total = hist.map(_._2).sum
    if (total <= n) return (df, df.limit(0), 0L)
    // walk buckets high→low until the cumulative count crosses n
    var cum = 0L; var bi = 0
    while (bi < hist.length && cum + hist(bi)._2 <= n) { cum += hist(bi)._2; bi += 1 }
    val bBoundary = hist(bi)._1
    val countB = hist(bi)._2
    val need = n - cum
    val keepWhole = df.filter(bucket > lit(bBoundary))
    val below = df.filter(bucket < lit(bBoundary))
    val boundary = df.filter(bucket === lit(bBoundary))
    if (need == 0L) return (keepWhole, below.unionByName(boundary), total - n)
    if (countB <= BOUNDARY_COLLECT_CAP) {
      // One quantization cell, small enough for its 16-byte KEYS to visit
      // the driver: pick the exact need-th key and split by a map-side
      // struct-comparison filter — no sort, no extra shuffle.
      val keys = boundary.select(col("priority"), col("urlHash")).collect()
        .map(r => (-r.getDouble(0), r.getLong(1))).sorted
      val (np, h) = keys(need.toInt - 1)
      val keyCol = struct((col("priority") * -1).as("a"), col("urlHash").as("b"))
      val thr = struct(lit(np).as("a"), lit(h).as("b"))
      (keepWhole.unionByName(boundary.filter(keyCol <= thr)),
        below.unionByName(boundary.filter(keyCol > thr)), total - n)
    } else {
      // Degenerate cell (a priority flood): range-partitioned sort +
      // zipWithIndex — sorted partitions + per-partition offsets, still
      // never a single-reducer window. Persisted: BOTH outputs (top into
      // the frontier, rest into the spill) read it, and each is
      // materialized separately downstream (checkpoint + commit) — the
      // expensive global sort must not run once per consumer.
      val schema = df.schema
      val indexed = boundary.orderBy(col("priority").desc, col("urlHash").asc)
        .rdd.zipWithIndex()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bTop = spark.createDataFrame(
        indexed.filter(_._2 < need).map(_._1), schema)
      val bRest = spark.createDataFrame(
        indexed.filter(_._2 >= need).map(_._1), schema)
      (keepWhole.unionByName(bTop), below.unionByName(bRest), total - n)
    }
  }

  /** Boundary cells up to this size split via a driver key-select (two
    * narrow columns); larger cells use the distributed sort path. */
  private val BOUNDARY_COLLECT_CAP = 2000000L

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
