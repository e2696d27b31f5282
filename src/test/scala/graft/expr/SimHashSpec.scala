package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The native SimHash64 expression must be bit-identical to the
  * higher-order-function formulation it replaced (same xxhash64 seed-42
  * token hashes, same strict-majority rule). */
class SimHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val hofSimhash = expr(
    """aggregate(sequence(0, 63), 0L, (acc, i) -> acc |
      |  if(size(filter(transform(split(text, ' '), w -> xxhash64(w)),
      |          h -> (shiftright(h, i) & 1L) = 1L)) * 2
      |       > size(split(text, ' ')),
      |     shiftleft(1L, i), 0L))""".stripMargin)

  test("expression equals HOF formulation on real documents") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val diff = docs
      .select(SimHash64.simhash64(col("text")).as("a"), hofSimhash.as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0)
  }

  test("edge cases: empty string, single token, consecutive spaces") {
    val rows = Seq("", "word", "a  b", " lead", "trail ").toDF("text")
      .select(col("text"), SimHash64.simhash64(col("text")).as("a"), hofSimhash.as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"mismatch on '${r.getString(0)}'"))
  }

  test("similar documents have small hamming distance") {
    val a = SimHash64.simhash(org.apache.spark.unsafe.types.UTF8String.fromString(
      "the quick brown fox jumps over the lazy dog again and again today"))
    val b = SimHash64.simhash(org.apache.spark.unsafe.types.UTF8String.fromString(
      "the quick brown fox jumps over the lazy dog again and again tomorrow"))
    val c = SimHash64.simhash(org.apache.spark.unsafe.types.UTF8String.fromString(
      "completely unrelated words about spark shuffles and parquet readers"))
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }
}
