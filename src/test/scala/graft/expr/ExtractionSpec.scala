package graft.expr

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.fixtures.SyntheticCorpus

/** The byte-identical extraction contract (BASELINE.json input_hint,
  * SURVEY.md §2.3/§5.3): the ExtractFilingText Catalyst expression must
  * produce, for every corpus row, byte-for-byte the output of the
  * independent pure-Scala oracle — and must match the committed golden
  * binaries (regenerate with `sbt "Test/runMain graft.expr.GoldenGen"`
  * ONLY when the pinned spec legitimately changes). */
class ExtractionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val N = 200

  test("expression output is byte-identical to the oracle on corpus rows") {
    val pages = SyntheticCorpus.pages(spark, N, numPartitions = Some(4))
    val got = pages.toDF()
      .select(col("url"),
        Extractors.extract_10k(col("text")).as("item7"),
        col("text"))
      .collect()
    assert(got.length == N)
    got.foreach { r =>
      val expect = ExtractionOracle.extract(r.getString(2))
      val actual = r.getString(1)
      assert(actual.getBytes("UTF-8").sameElements(expect.getBytes("UTF-8")),
        s"byte mismatch for ${r.getString(0)}")
      assert(actual.nonEmpty, s"empty extraction for ${r.getString(0)}")
    }
  }

  test("metric map matches the oracle") {
    val pages = SyntheticCorpus.pages(spark, N, numPartitions = Some(4))
    val got = pages.toDF()
      .select(col("text"), Extractors.extract_metrics(col("text")).as("m"))
      .collect()
    got.foreach { r =>
      val expect = ExtractionOracle.metrics(r.getString(0))
      val actual = r.getMap[String, Double](1).toMap
      assert(actual == expect)
    }
  }

  test("extraction matches committed golden binaries (50 fixed pages)") {
    val dir = Paths.get("src/test/resources/golden/extraction")
    assume(Files.exists(dir), "goldens not generated yet")
    val byId = SyntheticCorpus.pages(spark, 1000, numPartitions = Some(4))
      .toDF().select(col("url"),
        Extractors.extract_10k(col("text")).as("item7"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (0 until 50).foreach { i =>
      val url = SyntheticCorpus.canonicalUrl(i.toLong, 42L, 100)
      val golden = Files.readAllBytes(dir.resolve(s"doc_$i.bin"))
      assert(byId(url).getBytes("UTF-8").sameElements(golden),
        s"golden mismatch for page $i ($url)")
    }
  }

  test("no match returns the pinned noMatch value (empty string)") {
    val out = Seq("no filing markers here").toDF("text")
      .select(Extractors.extract_10k(col("text"))).collect()
    assert(out.head.getString(0) == "")
  }
}

/** Writes the golden binaries FROM THE ORACLE (not the engine — the test
  * above is a genuine cross-implementation check). */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/golden/extraction")
    Files.createDirectories(dir)
    (0 until 50).foreach { i =>
      val text = SyntheticCorpus.pageFor(i.toLong, 42L, 1000L, 100, 4).text
      Files.write(dir.resolve(s"doc_$i.bin"),
        ExtractionOracle.extract(text).getBytes("UTF-8"))
    }
    println(s"wrote 50 goldens to $dir")
  }
}
