package graft.fetch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7 — the fetch stage as a pluggable interface. Input: the popped
  * frontier slice (url, urlHash, host, priority, depth, round). Output:
  * the input columns plus (status:int, fetchTs:timestamp, html:binary).
  *
  * The sandbox has no network (SURVEY.md §0), so the default impl resolves
  * URLs against a Common-Crawl-style page table; real HTTP is another
  * implementation of this trait, never a hard dependency of the engine.
  */
trait Fetcher extends Serializable {
  def fetch(popped: DataFrame): DataFrame
}

/** Resolves fetches by equi-joining the popped slice against a page table
  * in the input_hint shape (url, warc_ts, html, text, lang). Misses are
  * status 404 with empty html. fetchTs := warc_ts — a pure function of the
  * data, which keeps whole runs byte-deterministic (a wall-clock fetchTs
  * would break resume-exactness golden tests).
  *
  * Scale: this is a plain equi-shuffle on url — at 10^10 pages it's the
  * same join Spark would run for any fact⋈fact; AQE handles skewed hosts
  * because the join key is the full url, not the host. */
class CorpusFetcher(corpus: () => DataFrame) extends Fetcher {
  override def fetch(popped: DataFrame): DataFrame =
    popped.join(
      corpus().select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang")),
      Seq("url"), "left")
      .withColumn("status", when(col("html").isNotNull, 200).otherwise(404))
      .withColumn("fetchTs", col("warc_ts"))
      .drop("warc_ts")
}

/** Real-HTTP fetcher skeleton (mapPartitions + bounded thread pool per
  * partition, java.net.http). NOT runnable in this sandbox (no egress) and
  * deliberately not referenced by the pipeline — it documents where the
  * cluster implementation plugs in. */
class HttpFetcherStub(timeoutMs: Int = 10000, threadsPerPartition: Int = 8) extends Fetcher {
  override def fetch(popped: DataFrame): DataFrame =
    throw new UnsupportedOperationException(
      "HTTP fetching requires network egress; use CorpusFetcher in this environment")
}
