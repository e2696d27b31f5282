package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.VectorOps

/** The LSH ANN path must be measurably useful, not just shuffle-shaped:
  * recall@5 against the brute-force baseline is pinned at sf0.01 (500
  * near-uniform random vectors — the adversarial case for LSH; see the
  * parameterization note in VectorOps). A recall regression from a
  * parameter or plane-generation change fails here, not in production. */
class AnnRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf001 = "/root/testdata/sf0.01"

  test("LSH top-5 is non-vacuous: every query returns a full top-5 at sf0.01") {
    val rows = VectorOps.lshTopk(spark, sf001).collect()
    val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.keySet == (0L until 8L).toSet, s"queries seen: ${perQuery.keySet}")
    assert(perQuery.values.forall(_ == 5), s"rows per query: $perQuery")
  }

  test("LSH: mean recall@5 vs brute force >= 0.6 at sf0.01") {
    val recalls = VectorOps.recallAt5(VectorOps.lshTopk(spark, sf001), spark, sf001)
      .collect().map(r => r.getDouble(1))
    val mean = recalls.sum / recalls.length
    assert(recalls.length == 8)
    assert(mean >= 0.6, f"mean recall@5 = $mean%.3f (per-query: ${recalls.mkString(", ")})")
  }

  test("IVF: mean recall@5 vs brute force >= 0.7 at sf0.01") {
    val recalls = VectorOps.recallAt5(VectorOps.ivfTopk(spark, sf001), spark, sf001)
      .collect().map(r => r.getDouble(1))
    val mean = recalls.sum / recalls.length
    assert(recalls.length == 8)
    assert(mean >= 0.7, f"mean recall@5 = $mean%.3f (per-query: ${recalls.mkString(", ")})")
  }

  test("IVF inverted lists cover every vector exactly once at sf0.01") {
    val lsh = VectorOps.ivfTopk(spark, sf001)
    val perQuery = lsh.collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.keySet == (0L until 8L).toSet && perQuery.values.forall(_ == 5))
  }

  test("non-default LSH/IVF parameterizations keep their floors (library surface)") {
    import graft.queries.{IvfParams, LshParams}
    // 8 tables × 6 bits: coarser buckets → more candidates → recall must
    // not drop below the default floor
    val lsh = VectorOps.recallAt5(
      VectorOps.lshTopk(spark, sf001, 5, LshParams(nTables = 8, bits = 6)),
      spark, sf001).collect().map(_.getDouble(1))
    assert(lsh.length == 8 && lsh.sum / lsh.length >= 0.6,
      f"lsh 8x6 mean recall@5 = ${lsh.sum / lsh.length}%.3f")
    // 8 lists, probe 4: half the corpus probed → floor must hold
    val ivf = VectorOps.recallAt5(
      VectorOps.ivfTopk(spark, sf001, 5, IvfParams(k = 8, nprobe = 4)),
      spark, sf001).collect().map(_.getDouble(1))
    assert(ivf.length == 8 && ivf.sum / ivf.length >= 0.7,
      f"ivf k=8/nprobe=4 mean recall@5 = ${ivf.sum / ivf.length}%.3f")
    intercept[IllegalArgumentException] { IvfParams(k = 4, nprobe = 8) }
  }

  test("dedup_embed_cosine is non-vacuous at sf0.01") {
    val q = SparkEntry.registry.find(_.name == "dedup_embed_cosine").get
    val n = q.run(spark, sf001).count()
    assert(n > 0, "near-dup candidate generation found no pairs — vacuous check")
  }
}
