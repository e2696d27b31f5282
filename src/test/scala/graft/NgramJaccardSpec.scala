package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filter candidate generation must be EXACT (no false negatives):
  * the registered dedup_ngram_jaccard result is compared against a
  * brute-force all-pairs computation with the same threshold, on two
  * fixture scales. The driver's DuckDB oracle re-checks sf0.01. */
class NgramJaccardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def bruteForce(d: String) = {
    val toks = split(col("text"), " ")
    val sh3 = filter(
      transform(sequence(lit(1), greatest(size(toks) - 2, lit(1))),
        i => when(size(toks) >= 3,
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2)))),
      s => s.isNotNull)
    val sh = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), array_distinct(sh3).as("grams"))
      .filter(size(col("grams")) > 0)
    val inter = size(array_intersect(col("grams_a"), col("grams_b"))).cast("double")
    sh.select(col("doc_id").as("id_a"), col("grams").as("grams_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("grams").as("grams_b")),
        col("id_a") < col("id_b"))
      .withColumn("jaccard",
        inter / (size(col("grams_a")) + size(col("grams_b")) - inter))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  private val registered =
    SparkEntry.registry.find(_.name == "dedup_ngram_jaccard").get

  for (d <- Seq(TestSpark.sf0001, "/root/testdata/sf0.01")) {
    test(s"prefix-filter pairs == brute-force pairs on $d") {
      val got = registered.run(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = bruteForce(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, "fixture has no near-dup pairs — vacuous check")
    }
  }
}
