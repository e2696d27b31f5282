package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.CanonicalizeUrl.canonicalize_url

/** Web-graph analytics over the crawl's persisted fetch log.
  *
  * The write-once pages commit already stores each round's extracted
  * `links` column (the FULL fetch output is the committed version —
  * DurableCrawler scaladoc), so the web graph needs no extra sink: edges
  * derive lazily from the committed scans, and PageRank — the canonical
  * crawl-priority signal (Page et al. 1999) — runs as a read-side job
  * whose result can be fed straight back into the frontier
  * (`DurableCrawler.reprioritizeByRank`).
  *
  * Scale shape: edges are narrow (long, long); each power iteration is
  * ONE equi-shuffle of the edge list against the (id, rank) vector plus
  * ONE hash re-aggregation on dst — the Pregel/GraphX plan. Node count
  * and dangling mass enter each iteration as 1-row broadcast aggregates,
  * never driver collects. At 10^11 edges the edge list would persist
  * bucketed by src so the per-iteration join is storage-partitioned; here
  * it is block-store persisted for the few iterations it is reused.
  */
object LinkGraph {

  /** (src, dst) urlHash edges from fetch-log rows. dst goes through the
    * SAME canonicalize → scheme-filter → xxhash64 chain as candidate
    * shaping (Frontier.shapeCandidates), so the graph's node keyspace is
    * exactly the crawl's url keyspace: a page fetched at depth ≥ 1 always
    * appears as some edge's dst. Rows whose `links` is null (non-200,
    * max-depth) vanish in the explode. */
  def edges(fetchLog: DataFrame): DataFrame =
    fetchLog
      .select(col("urlHash").as("src"), explode(col("links")).as("rawUrl"))
      .select(col("src"), canonicalize_url(col("rawUrl")).as("url"))
      .filter(col("url").startsWith("http"))
      .select(col("src"), xxhash64(col("url")).as("dst"))

  /** PageRank by power iteration with full dangling-mass redistribution:
    * r' = (1−d)/N + d·(Σ_in r/outdeg + danglingMass/N). Mass is conserved
    * exactly (Σ r = 1 every iteration), so Σ pr ≈ 1 is a free invariant
    * check. Returns (id, pr), eagerly materialized (localCheckpoint) so
    * the iteration's persisted intermediates can be released before
    * returning. */
  def pageRank(spark: SparkSession, edgesRaw: DataFrame,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = edgesRaw.select(col("src"), col("dst")).persist()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().persist()
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("od"))
    // out-degree joined ONCE — every iteration reuses the weighted edges
    val edgesW = edges.join(outDeg, "src").persist()
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))
    val dangling = nodes.join(
      outDeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti").persist()
    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("id"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to iters) {
      val contribs = edgesW
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("r") / col("od")).as("s"))
      val dm = dangling.join(ranks, "id")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dm"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(nDf)).crossJoin(broadcast(dm))
        .select(col("id"),
          (lit(1.0 - damping) / col("n")
            + lit(damping) * (coalesce(col("s"), lit(0.0)) + col("dm") / col("n"))).as("r"))
    }
    val out = ranks.select(col("id"), col("r").as("pr")).localCheckpoint(true)
    edgesW.unpersist(); dangling.unpersist(); nodes.unpersist(); edges.unpersist()
    out
  }
}
