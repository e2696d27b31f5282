package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap ingestion (sitemaps.org protocol) — the crawl's second seed
  * source beside the seed list: `<urlset>` files enumerate page urls,
  * `<sitemapindex>` files enumerate more sitemap files (one level of
  * indirection per the spec). Everything here is declarative codegen
  * (`regexp_extract_all` + explode) — no UDF, no driver-side XML walk —
  * so a million-host sitemap sweep is one narrow distributed pass.
  */
object Sitemaps {

  /** (url, xml) rows → (srcUrl, kind, loc): every `<loc>` with the root
    * kind of the file it came from ("urlset" page locs, "sitemapindex"
    * child-sitemap locs; "unknown" otherwise). Surrounding whitespace in
    * the loc text is trimmed; CDATA is not required by the protocol and
    * not handled. */
  def locs(df: DataFrame): DataFrame =
    df.select(
        col("url").as("srcUrl"),
        when(col("xml").contains("<sitemapindex"), "sitemapindex")
          .when(col("xml").contains("<urlset"), "urlset")
          .otherwise("unknown").as("kind"),
        explode(expr(
          """regexp_extract_all(xml, '<loc>\\s*([^<]*?)\\s*</loc>', 1)""")).as("loc"))
      .filter(col("loc") =!= "")

  /** Page urls seeded by a batch of sitemap files: urlset locs directly,
    * plus (when `children` supplies the fetched (url, xml) of the child
    * sitemaps an index referenced) the childrens' urlset locs. Output is
    * distinct (url) rows ready for `Frontier.fromSeeds`-style shaping /
    * `Robots.filterAllowed`. */
  def seedUrls(sitemapXml: DataFrame, children: Option[DataFrame] = None): DataFrame = {
    val direct = locs(sitemapXml).filter(col("kind") === "urlset").select(col("loc").as("url"))
    val fromChildren = children.map(ch => seedUrls(ch, None))
    fromChildren.fold(direct)(direct.unionByName(_)).distinct()
  }

  /** Child-sitemap urls an index batch references — the urls a driver
    * loop (or next fetch round) should retrieve and pass back as
    * `children`. */
  def childSitemapUrls(sitemapXml: DataFrame): DataFrame =
    locs(sitemapXml).filter(col("kind") === "sitemapindex")
      .select(col("loc").as("url")).distinct()
}
