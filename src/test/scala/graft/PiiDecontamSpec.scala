package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the two scrub ops the DuckDB oracle can only check
  * for cross-engine parity, not for POLICY:
  *  - `text_pii_redact`: after redaction NO pattern of any PII class
  *    still matches anywhere (parity alone would pass if both engines
  *    missed the same occurrence).
  *  - `decontaminate`: flagged docs ≡ a brute-force array_intersect
  *    overlap against the eval slice (independent of the join/broadcast
  *    pipeline under test).
  */
class PiiDecontamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("text_pii_redact: every row redacts, no residual PII survives") {
    val out = SparkEntry.queries("text_pii_redact")(spark, sfDir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      // every row had all three classes injected and counted
      assert(out.filter(col("n_email") < 1 || col("n_phone") < 1 || col("n_ip") < 1)
        .count() == 0)
      // nothing PII-shaped survives in the redacted text
      val residual = out.filter(
        col("redacted").rlike("""[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""") ||
        col("redacted").rlike("""\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""") ||
        col("redacted").rlike("""\b\d{3}-\d{4}\b"""))
      assert(residual.count() == 0)
      // sentinels present exactly as often as the counts claim
      val bad = out.filter(
        size(split(col("redacted"), "<EMAIL>", -1)) - 1 =!= col("n_email") ||
        size(split(col("redacted"), "<IP>", -1)) - 1 =!= col("n_ip") ||
        size(split(col("redacted"), "<PHONE>", -1)) - 1 =!= col("n_phone"))
      assert(bad.count() == 0)
    } finally out.unpersist()
  }

  test("decontaminate: flagged set matches brute-force gram intersection") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val n = 8
    val grams = when(size(split(col("text"), " ")) >= n,
        transform(sequence(lit(1), size(split(col("text"), " ")) - (n - 1)),
          i => concat_ws(" ", slice(split(col("text"), " "), i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val withG = docs.select(col("doc_id"), array_distinct(grams).as("gs"))
    val evalGrams = withG.filter(col("doc_id") % 20 === 0)
      .select(explode(col("gs")).as("g")).distinct()
      .collect().map(_.getString(0)).toSet
    val evB = spark.sparkContext.broadcast(evalGrams)
    import spark.implicits._
    val expected = withG.filter(col("doc_id") % 20 =!= 0)
      .as[(Long, Seq[String])]
      .map { case (id, gs) => (id, gs.count(evB.value.contains).toLong) }
      .filter(_._2 > 0)
      .collect().toMap
    val got = SparkEntry.queries("decontaminate")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // the fixture must actually exercise the op at this sf
    assert(expected.nonEmpty || sfDir.endsWith("sf0.001"),
      "no contamination found — fixture too small to exercise the op")
  }
}
