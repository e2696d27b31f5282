package graft

import org.scalatest.funsuite.AnyFunSuite

/** Precision/recall floors for the approximate near-dup pipelines, pinned
  * against exact ground truth — the same rigor the ANN path gets from
  * AnnRecallSpec. A banding-math or hash-family regression (wrong band
  * slicing, broken minhash fold, capped buckets eating true pairs) fails
  * here, not in production. */
class NearDupAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def auditRow(name: String, dir: String): Map[String, Any] = {
    val row = SparkEntry.registry.find(_.name == name).get.run(spark, dir).head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("non-default parameterizations keep their floors (the params are a real library surface)") {
    import graft.queries.{MinHashParams, SimHashParams, TextOps}
    val dir = "/root/testdata/sf0.001"
    // K=24 in 6 bands (same 4 rows/band S-curve as the default, longer
    // signature) — recall/precision floors must hold without recompiling
    val m = TextOps.minhashAudit(spark, dir, MinHashParams(k = 24, bands = 6)).head()
    val mm = m.schema.fieldNames.zip(m.toSeq).toMap
    info(s"minhash k=24/bands=6: $mm")
    assert(mm("n_true").asInstanceOf[Long] > 0)
    assert(mm("recall").asInstanceOf[Double] >= 0.6, s"audit: $mm")
    assert(mm("precision").asInstanceOf[Double] >= 0.8, s"audit: $mm")
    // 8×8-bit simhash banding is still pigeonhole-complete for hamming ≤ 3
    // (8 bands > 3) — exactness must survive the band-geometry change
    val h = TextOps.simhashAudit(spark, dir, SimHashParams(bands = 8)).head()
    val hm = h.schema.fieldNames.zip(h.toSeq).toMap
    info(s"simhash bands=8: $hm")
    assert(hm("n_true").asInstanceOf[Long] > 0)
    assert(hm("recall").asInstanceOf[Double] == 1.0, s"audit: $hm")
    assert(hm("precision").asInstanceOf[Double] == 1.0, s"audit: $hm")
    // illegal parameterizations fail fast at construction
    intercept[IllegalArgumentException] { MinHashParams(k = 16, bands = 5) }
    intercept[IllegalArgumentException] { SimHashParams(bands = 4, maxHamming = 4) }
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"minhash audit floors at $dir") {
      val m = auditRow("dedup_minhash_audit", dir)
      val (nTrue, recall, precision) =
        (m("n_true").asInstanceOf[Long], m("recall").asInstanceOf[Double],
          m("precision").asInstanceOf[Double])
      info(s"minhash $dir: $m")
      assert(nTrue > 0, "no true near-dup pairs — audit is vacuous")
      assert(recall >= 0.6, s"minhash recall $recall below floor (audit: $m)")
      assert(precision >= 0.8, s"minhash precision $precision below floor (audit: $m)")
      // The audit measures the PRE-presentation pair set (minhashPairs
      // scope note); it equals dedup_minhash's actual output only while
      // reported pairs fit inside the query's LIMIT 1000 — pin that the
      // fixture stays in that regime, so the audited numbers describe
      // exactly what the query reports here.
      assert(m("n_reported").asInstanceOf[Long] <= 1000L,
        s"fixture outgrew dedup_minhash's LIMIT — audit no longer describes the query output: $m")
    }

    test(s"embed audit: planted near-dups recalled, exact recheck precise at $dir") {
      val m = auditRow("dedup_embed_audit", dir)
      info(s"embed $dir: $m")
      assert(m("n_planted").asInstanceOf[Long] > 0)
      // theory for 8 tables x 8 sign bits at cos >= 0.99: >= 0.93
      assert(m("planted_recall").asInstanceOf[Double] >= 0.9,
        s"planted twins must collide in some table (audit: $m)")
      // every reported pair is exactly recosined: precision is 1.0 by
      // construction and must measure so
      assert(m("band_precision").asInstanceOf[Double] == 1.0, s"audit: $m")
      // the adversarial random band is reported, not hidden: non-vacuous
      assert(m("n_band_true").asInstanceOf[Long] > 0)
      assert(m("band_recall").asInstanceOf[Double] > 0.05, s"audit: $m")
    }

    test(s"simhash audit: banding is pigeonhole-complete at $dir") {
      val m = auditRow("dedup_simhash_audit", dir)
      info(s"simhash $dir: $m")
      assert(m("n_true").asInstanceOf[Long] > 0, "no hamming<=3 pairs — vacuous")
      // 4x16-bit banding provably catches every hamming<=3 pair; only the
      // mega-bucket cap may drop members, and it must not at these scales
      assert(m("recall").asInstanceOf[Double] == 1.0, s"audit: $m")
      assert(m("precision").asInstanceOf[Double] == 1.0, s"audit: $m")
    }
  }
}
