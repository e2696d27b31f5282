package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** word_shingles64 must be bit-identical to the composable built-in chain
  * it replaces: sorted-distinct xxhash64 of the 3-word shingles produced by
  * split/transform/concat_ws — including the split(" ", -1) edge semantics
  * (empty tokens from space runs, short texts). */
class ShinglesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def builtinReference(textCol: org.apache.spark.sql.Column) = {
    val toks = split(textCol, " ")
    val sh = filter(
      transform(sequence(lit(1), greatest(size(toks) - 2, lit(1))),
        i => when(size(toks) >= 3,
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2)))),
      s => s.isNotNull)
    sort_array(array_distinct(transform(sh, g => xxhash64(g))))
  }

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c", "a b", "a", "",
    "repeat repeat repeat repeat repeat",
    "double  space and   triple   runs here",
    " leading and trailing ",
    "unicode: héllo wörld ünïcode test tokens",
    "x y z x y z x y z")

  test("word_shingles64 == sorted distinct xxhash64 of built-in shingles") {
    val df = cases.toDF("text").select(
      Shingles.word_shingles64(col("text")).as("fast"),
      builtinReference(col("text")).as("ref"),
      col("text"))
    for (r <- df.collect()) {
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"<${r.getString(2)}>")
    }
  }

  test("word_shingles64 matches on the documents fixture end to end") {
    val df = spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
      .select(
        Shingles.word_shingles64(col("text")).as("fast"),
        builtinReference(col("text")).as("ref"),
        col("doc_id"))
    for (r <- df.collect())
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"doc ${r.getLong(2)}")
  }

  test("width-n edge: n=1 hashes every token, n > tokens yields empty") {
    val one = Seq("a b a").toDF("text")
      .select(Shingles.word_shingles64(col("text"), 1).as("h"))
      .collect().head.getSeq[Long](0)
    assert(one.length == 2) // a, b deduped
    val none = Seq("a b").toDF("text")
      .select(Shingles.word_shingles64(col("text"), 5).as("h"))
      .collect().head.getSeq[Long](0)
    assert(none.isEmpty)
  }
}
