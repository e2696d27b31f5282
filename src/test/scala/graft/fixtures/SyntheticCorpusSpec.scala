package graft.fixtures

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SyntheticCorpusSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("schema is exactly the input_hint shape") {
    val df = SyntheticCorpus.pages(spark, 10).toDF()
    assert(df.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    val types = df.schema.fields.map(_.dataType.typeName).toSeq
    assert(types == Seq("string", "timestamp", "binary", "string", "string"))
  }

  test("generation is partition-count independent") {
    val a = SyntheticCorpus.pages(spark, 300, numPartitions = Some(1))
      .collect().map(p => (p.url, p.text, p.lang, p.warc_ts.getTime)).sortBy(_._1)
    val b = SyntheticCorpus.pages(spark, 300, numPartitions = Some(7))
      .collect().map(p => (p.url, p.text, p.lang, p.warc_ts.getTime)).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("mega-host takes ~15% of pages; ~2% of URLs are /private/") {
    val n = 5000L
    val df = SyntheticCorpus.pages(spark, n).toDF()
    val mega = df.filter(col("url").startsWith("https://h0.example/")).count()
    assert(mega > n * 0.10 && mega < n * 0.20, s"mega-host share $mega/$n")
    val priv = df.filter(col("url").contains("/private/")).count()
    assert(priv > n * 0.005 && priv < n * 0.05, s"private share $priv/$n")
  }

  test("text is the exact P6 strip of html") {
    SyntheticCorpus.pages(spark, 50).collect().foreach { p =>
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      assert(SyntheticCorpus.stripHtml(html) == p.text)
    }
  }

  test("hand-rolled stripHtml is byte-equivalent to the regex chain") {
    def regexStrip(h: String): String =
      h.replaceAll("<[^>]*>", " ").replaceAll(" +", " ").trim
    // generated pages (with fill, like the bench corpus)...
    (0L until 200L).foreach { i =>
      val h = SyntheticCorpus.htmlFor(i, 42L, 1000L, 20, 4, fillScale = 7)
      assert(SyntheticCorpus.stripHtml(h) == regexStrip(h), s"page $i diverged")
    }
    // ...and adversarial shapes: unmatched '<', nested '<' inside a tag,
    // tag runs, non-space whitespace breaking runs, empty tags, edges
    val evil = Seq(
      "", "<", ">", "<>", "a<b", "a<b>c", "<a<b>c", "a  b", " a  <p>  b ",
      "x<p></p>y", "tab\there  two", "nl\n  mix <i> </i> end<", "< >", "<<x>>",
      "a ><b", "   ", "<x>", "ab", " \n <t> \n ")
    evil.foreach { h =>
      assert(SyntheticCorpus.stripHtml(h) == regexStrip(h), s"'$h' diverged")
    }
  }

  test("every page body contains extractable ITEM 7 span and links") {
    SyntheticCorpus.pages(spark, 50).collect().foreach { p =>
      assert(p.text.contains("ITEM 7."))
      assert(p.text.contains("ITEM 7A."))
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      assert("""href="([^"]+)"""".r.findAllIn(html).size == 4)
    }
  }
}
