package graft.filters

import org.scalatest.funsuite.AnyFunSuite

class BloomFilterSpec extends AnyFunSuite {
  private def keys(seed: Long, n: Int): Array[Long] =
    Array.tabulate(n)(i => GraftBloomFilter.mix(seed * 1000003L + i))

  test("no false negatives (10k keys)") {
    val f = GraftBloomFilter.create(10000, 0.01)
    val ks = keys(1, 10000)
    ks.foreach(f.put)
    assert(ks.forall(f.mightContain))
  }

  test("fpp within 3x of target on non-members") {
    val f = GraftBloomFilter.create(10000, 0.01)
    keys(1, 10000).foreach(f.put)
    val fp = keys(99, 20000).count(f.mightContain)
    assert(fp < 20000 * 0.03, s"false-positive count $fp")
  }

  test("serialize round-trip and zero-copy probe agree") {
    val f = GraftBloomFilter.create(1000, 0.01)
    val ks = keys(7, 1000)
    ks.foreach(f.put)
    val bytes = f.serialize()
    val g = GraftBloomFilter.deserialize(bytes)
    val probes = ks ++ keys(55, 2000)
    probes.foreach { k =>
      assert(g.mightContain(k) == f.mightContain(k))
      assert(GraftBloomFilter.mightContainSerialized(bytes, k) == f.mightContain(k))
    }
  }

  test("merge is the union") {
    val a = GraftBloomFilter.create(2000, 0.01)
    val b = GraftBloomFilter.create(2000, 0.01)
    val ka = keys(1, 1000); val kb = keys(2, 1000)
    ka.foreach(a.put); kb.foreach(b.put)
    a.merge(b)
    assert((ka ++ kb).forall(a.mightContain))
  }

  test("sizing: 1% fpp ≈ 9.6 bits/key") {
    val f = GraftBloomFilter.create(1000000, 0.01)
    assert(f.numBits > 9000000L && f.numBits < 10500000L)
    assert(f.numHashes >= 6 && f.numHashes <= 8)
  }
}

class CuckooFilterSpec extends AnyFunSuite {
  private def keys(seed: Long, n: Int): Array[Long] =
    Array.tabulate(n)(i => GraftBloomFilter.mix(seed * 7777L + i))

  test("insert then contains — no false negatives") {
    val f = GraftCuckooFilter.create(10000)
    val ks = keys(3, 10000)
    assert(ks.forall(f.insert))
    assert(ks.forall(f.contains))
  }

  test("delete removes membership; others survive") {
    val f = GraftCuckooFilter.create(10000)
    val ks = keys(4, 5000)
    ks.foreach(f.insert)
    val (dead, alive) = ks.partition(k => k % 2 == 0)
    dead.foreach(k => assert(f.delete(k)))
    assert(alive.forall(f.contains))
    // fingerprint collisions make a few deleted keys still "contain" —
    // bound it at the fingerprint fpp level
    val ghost = dead.count(f.contains)
    assert(ghost < dead.length * 0.01, s"ghosts after delete: $ghost")
  }

  test("false positives bounded (16-bit fingerprints)") {
    val f = GraftCuckooFilter.create(10000)
    keys(5, 10000).foreach(f.insert)
    val fp = keys(77, 50000).count(f.contains)
    assert(fp < 50000 * 0.005, s"false positives: $fp")
  }

  test("serialize round-trip and zero-copy probe agree") {
    val f = GraftCuckooFilter.create(2000)
    val ks = keys(6, 2000)
    ks.foreach(f.insert)
    val bytes = f.serialize()
    val g = GraftCuckooFilter.deserialize(bytes)
    (ks ++ keys(88, 3000)).foreach { k =>
      assert(g.contains(k) == f.contains(k))
      assert(GraftCuckooFilter.containsSerialized(bytes, k) == f.contains(k))
    }
  }

  test("merge runs the eviction cascade: repeated merges fill to ~85% load") {
    // 64 buckets = 256 slots; 4 successive 54-key deltas merge in → 84%
    // final load. Without kick/relocation (round-2 behavior) this crashes
    // well below nominal load on the first full bucket pair.
    val target = GraftCuckooFilter.createBuckets(64)
    val total = scala.collection.mutable.ArrayBuffer[Long]()
    for (d <- 0 until 4) {
      val delta = GraftCuckooFilter.createBuckets(target.numBuckets)
      val ks = keys(100 + d, 54)
      ks.foreach(k => assert(delta.insert(k)))
      target.merge(delta)
      total ++= ks
    }
    assert(total.forall(target.contains), "merge lost a key")
    assert(target.numEntries == total.length)
  }

  test("merge overflow is the typed CuckooMergeOverflow, not a bare require") {
    val target = GraftCuckooFilter.createBuckets(8) // 32 slots
    val k1 = keys(200, 30)
    k1.foreach(target.insert)
    val delta = GraftCuckooFilter.createBuckets(8)
    keys(300, 30).foreach(delta.insert)
    intercept[CuckooMergeOverflow] { target.merge(delta) }
  }

  test("geometry round-trips through the serialized length") {
    for (expected <- Seq(1L, 100L, 5000L, 1000000L)) {
      val f = GraftCuckooFilter.create(expected)
      assert(GraftCuckooFilter.bucketsOfSerializedLength(f.serialize().length)
        == f.numBuckets)
      assert(GraftCuckooFilter.capacityFor(expected) == f.numBuckets.toLong * GraftCuckooFilter.SLOTS)
    }
  }
}

class SeenPipelineSpec extends AnyFunSuite {
  import org.apache.spark.sql.functions._
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("filterNew = exact anti-join semantics, bloom only reroutes work") {
    val seenKeys = (0L until 3000L).map(i => GraftBloomFilter.mix(i))
    val candKeys = (1500L until 6000L).map(i => GraftBloomFilter.mix(i))
    val seen = seenKeys.toDF("urlHash")
    val cands = candKeys.toDF("urlHash")
    val shards = graft.crawl.Seen.buildBloomShards(seen, 4, 2000, 0.01)
    val out = graft.crawl.Seen.filterNew(cands, seen, shards, 4)
      .collect().map(_.getLong(0)).toSet
    val expected = candKeys.toSet -- seenKeys.toSet
    assert(out == expected)
  }
}
