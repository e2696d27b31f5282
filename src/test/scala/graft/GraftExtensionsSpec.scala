package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions registration: every custom expression is callable
  * from PLAIN SQL and returns exactly what the Column API returns (same
  * Expression classes, codegen included).
  *
  * `withExtensions` only takes effect when the builder CREATES a session,
  * and the shared test context already has one — so this spec registers
  * `GraftExtensions.functions` (the exact list the extension injects; the
  * extension class itself is a thin foreach over it, smoke-tested below)
  * into a fresh `newSession()`'s function registry, the same
  * (id, info, builder) triples traveling the same registry API. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val sql: SparkSession = {
    val s = TestSpark.spark.newSession()
    GraftExtensions.functions.foreach { case (id, inf, builder) =>
      s.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    s
  }

  test("extension class wires every function into a SparkSessionExtensions hook") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
    assert(GraftExtensions.functions.map(_._1.funcName).toSet == Set(
      "canonicalize_url", "extract_10k", "extract_metrics", "simhash64",
      "priority_bucket", "bloom_might_contain", "cuckoo_contains",
      "vec_dot", "word_shingles64"))
  }

  test("canonicalize_url / extract / simhash callable from SQL, equal to Column API") {
    val url = "HTTPS://Example.COM:443/a/../b/?utm_source=x&q=1#frag"
    val viaSql = sql.sql(s"SELECT canonicalize_url('$url') AS u").head.getString(0)
    val viaCol = sql.range(1)
      .select(graft.expr.CanonicalizeUrl.canonicalize_url(
        org.apache.spark.sql.functions.lit(url)).as("u")).head.getString(0)
    assert(viaSql == viaCol)
    assert(sql.sql(
      "SELECT extract_10k('Item 7. Management Discussion x Item 8.')")
      .head.getString(0) != null)
    assert(sql.sql("SELECT simhash64('hello world')").head.getLong(0) ==
      sql.sql("SELECT simhash64('hello world')").head.getLong(0))
  }

  test("word_shingles64 takes an optional literal width; vec_dot matches kernel") {
    val r3 = sql.sql("SELECT word_shingles64('a b c d')").head.getSeq[Long](0)
    val r2 = sql.sql("SELECT word_shingles64('a b c d', 2)").head.getSeq[Long](0)
    assert(r3.length == 2 && r2.length == 3) // 4 tokens → 2 trigrams, 3 bigrams
    val d = sql.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head.getDouble(0)
    assert(d == 11.0)
    // non-literal width must be rejected with a clear message
    val err = intercept[Exception] {
      sql.sql("SELECT word_shingles64('a b c', CAST(id AS INT) + 2) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal") || err.getMessage.contains("INT"))
  }

  test("bloom probe from SQL over a built shard") {
    import sql.implicits._
    val seen = (0L until 1000L).toDF("urlHash")
    graft.crawl.Seen.buildBloomShards(seen, 1, 2048).createOrReplaceTempView("shards")
    val hits = sql.sql(
      "SELECT count(*) FROM range(0, 1000) r JOIN shards ON bloom_might_contain(shards.bits, r.id)")
      .head.getLong(0)
    assert(hits == 1000L, "no false negatives via SQL probe")
  }
}
