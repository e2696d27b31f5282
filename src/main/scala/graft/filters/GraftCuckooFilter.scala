package graft.filters

/** Cuckoo filter — the deletable-membership fallback of the URL-seen set
  * (SURVEY.md §2.5 A6): retired/expired URLs can be REMOVED, which a Bloom
  * filter cannot do. 4-way buckets, 16-bit fingerprints (fpp ≈ 2·4/2^16 ≈
  * 0.012%), partial-key cuckoo hashing: i2 = i1 XOR hash(fp), so either
  * bucket is derivable from the other plus the fingerprint.
  *
  * Serialized layout: [int MAGIC][int numBuckets][long count][shorts…].
  * numBuckets is a power of two (index masking). Deterministic: insert
  * order affects slot placement but never membership answers.
  */
final class GraftCuckooFilter private (
    val numBuckets: Int,
    private val table: Array[Short],
    private var count: Long) extends Serializable {

  import GraftCuckooFilter._

  private val mask = numBuckets - 1
  def numEntries: Long = count

  private def fingerprint(key: Long): Short = {
    val f = (GraftBloomFilter.mix(key ^ 0xf1b2c3L) & 0xFFFFL).toShort
    if (f == 0) 1.toShort else f
  }
  private def bucket1(key: Long): Int =
    (GraftBloomFilter.mix(key).toInt) & mask
  private def altBucket(b: Int, fp: Short): Int =
    (b ^ GraftBloomFilter.mix(fp.toLong & 0xFFFFL).toInt) & mask

  private def slotInsert(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SLOTS) {
      if (table(b * SLOTS + s) == 0) { table(b * SLOTS + s) = fp; return true }
      s += 1
    }
    false
  }

  /** @return false only if the filter is effectively full (500 evictions). */
  def insert(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucket1(key)
    if (slotInsert(b1, fp)) { count += 1; return true }
    val b2 = altBucket(b1, fp)
    if (slotInsert(b2, fp)) { count += 1; return true }
    // evict: deterministic victim choice from the key+attempt hash
    var curFp = fp
    var curB = if ((GraftBloomFilter.mix(key ^ 0xe1) & 1L) == 0L) b1 else b2
    var n = 0
    while (n < MAX_KICKS) {
      val victim = (GraftBloomFilter.mix(key + n).toInt & 0x7fffffff) % SLOTS
      val idx = curB * SLOTS + victim
      val evicted = table(idx)
      table(idx) = curFp
      curFp = evicted
      curB = altBucket(curB, curFp)
      if (slotInsert(curB, curFp)) { count += 1; return true }
      n += 1
    }
    false
  }

  def contains(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucket1(key)
    val b2 = altBucket(b1, fp)
    var s = 0
    while (s < SLOTS) {
      if (table(b1 * SLOTS + s) == fp || table(b2 * SLOTS + s) == fp) return true
      s += 1
    }
    false
  }

  /** Remove ONE copy of the key's fingerprint. Only delete keys that were
    * inserted (standard cuckoo-filter contract). */
  def delete(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucket1(key)
    val b2 = altBucket(b1, fp)
    var s = 0
    while (s < SLOTS) {
      if (table(b1 * SLOTS + s) == fp) { table(b1 * SLOTS + s) = 0; count -= 1; return true }
      if (table(b2 * SLOTS + s) == fp) { table(b2 * SLOTS + s) = 0; count -= 1; return true }
      s += 1
    }
    false
  }

  /** Insert a bare fingerprint whose primary candidate bucket is `b0` —
    * the merge path, where the original key is gone. Runs the SAME
    * eviction cascade as [[insert]] (victim choice deterministic from the
    * fingerprint instead of the key), so a merge reaches the same ~95%
    * load a direct build does instead of failing at the first full
    * bucket pair. Placement-deterministic; membership-equivalent either
    * way (b0 and altBucket(b0,fp) are an involution pair). */
  private def insertFp(fp0: Short, b0: Int): Boolean = {
    if (slotInsert(b0, fp0)) { count += 1; return true }
    val bAlt = altBucket(b0, fp0)
    if (slotInsert(bAlt, fp0)) { count += 1; return true }
    var curFp = fp0
    var curB = if ((GraftBloomFilter.mix(fp0.toLong ^ 0xe1) & 1L) == 0L) b0 else bAlt
    var n = 0
    while (n < MAX_KICKS) {
      val victim = (GraftBloomFilter.mix(fp0.toLong + n).toInt & 0x7fffffff) % SLOTS
      val idx = curB * SLOTS + victim
      val evicted = table(idx)
      table(idx) = curFp
      curFp = evicted
      curB = altBucket(curB, curFp)
      if (slotInsert(curB, curFp)) { count += 1; return true }
      n += 1
    }
    false
  }

  /** Merge by re-inserting the other's fingerprints WITH the full eviction
    * cascade. Throws [[CuckooMergeOverflow]] (not a bare require-crash)
    * when a fingerprint cannot be placed after MAX_KICKS — callers
    * (CrawlRound) size proactively from the tracked per-shard key counts
    * and rebuild from the exact failed table with larger geometry before
    * this can fire; the exception is the backstop, with enough context to
    * diagnose a sizing bug. */
  def merge(other: GraftCuckooFilter): GraftCuckooFilter = {
    require(other.numBuckets == numBuckets, "incompatible cuckoo shards")
    var b = 0
    while (b < other.numBuckets) {
      var s = 0
      while (s < SLOTS) {
        val fp = other.table(b * SLOTS + s)
        if (fp != 0 && !insertFp(fp, b))
          throw new CuckooMergeOverflow(
            f"cuckoo merge overflow: $count keys in ${numBuckets * SLOTS} slots " +
              f"(load ${count.toDouble / (numBuckets * SLOTS)}%.2f) — " +
              "rebuild the shard from the exact table with larger geometry")
        s += 1
      }
      b += 1
    }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HEADER + table.length * 2)
    bb.putInt(MAGIC).putInt(numBuckets).putLong(count)
    table.foreach(bb.putShort)
    bb.array()
  }
}

/** Merge could not place a fingerprint even after the full eviction
  * cascade — the shard must be rebuilt from its exact table with larger
  * geometry (CrawlRound does this proactively from tracked key counts;
  * seeing this exception means the sizing guard has a bug). */
final class CuckooMergeOverflow(msg: String) extends RuntimeException(msg)

object GraftCuckooFilter {
  final val MAGIC = 0x47434631 // "GCF1"
  final val SLOTS = 4
  final val MAX_KICKS = 500
  private final val HEADER = 4 + 4 + 8

  /** Bucket count (power of two) that [[create]] picks for `expectedKeys`. */
  def bucketsFor(expectedKeys: Long): Int = {
    val needed = math.max(1L, math.ceil(expectedKeys / (SLOTS * 0.95)).toLong)
    java.lang.Long.highestOneBit(needed * 2 - 1).toInt.max(1)
  }

  /** Slot capacity of the geometry [[create]] picks for `expectedKeys`. */
  def capacityFor(expectedKeys: Long): Long = bucketsFor(expectedKeys).toLong * SLOTS

  /** Sized for ~95% max load: buckets = nextPow2(expected / (SLOTS·0.95)). */
  def create(expectedKeys: Long): GraftCuckooFilter = createBuckets(bucketsFor(expectedKeys))

  /** Explicit geometry — delta shards must match the standing shard's
    * bucket count for merge, even after a rebuild enlarged it. */
  def createBuckets(numBuckets: Int): GraftCuckooFilter = {
    require(Integer.bitCount(numBuckets) == 1, "numBuckets must be a power of two")
    new GraftCuckooFilter(numBuckets, new Array[Short](numBuckets * SLOTS), 0L)
  }

  /** Recover the bucket count from a serialized shard's byte length — how
    * CrawlRound learns the standing geometry without deserializing (the
    * length is visible to `length(bits)` in a column scan). */
  def bucketsOfSerializedLength(len: Int): Int = (len - HEADER) / (2 * SLOTS)

  /** Zero-copy membership probe against the serialized form (read path —
    * mirrors the instance `contains`, bit for bit). */
  def containsSerialized(bytes: Array[Byte], key: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.getInt() != MAGIC) return false
    val buckets = bb.getInt(); bb.getLong()
    val mask = buckets - 1
    var fp = (GraftBloomFilter.mix(key ^ 0xf1b2c3L) & 0xFFFFL).toShort
    if (fp == 0) fp = 1
    val b1 = GraftBloomFilter.mix(key).toInt & mask
    val b2 = (b1 ^ GraftBloomFilter.mix(fp.toLong & 0xFFFFL).toInt) & mask
    var s = 0
    while (s < SLOTS) {
      if (bb.getShort(HEADER + (b1 * SLOTS + s) * 2) == fp ||
          bb.getShort(HEADER + (b2 * SLOTS + s) * 2) == fp) return true
      s += 1
    }
    false
  }

  /** Serialized-form merge (the shard OR-combine of the incremental
    * seen-set update — a handful of shard rows per round). */
  def mergeSerialized(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    deserialize(a).merge(deserialize(b)).serialize()

  /** Delete every key in `keys` from the serialized shard (the retire
    * path). Runs once per shard row with that shard's retired keys
    * grouped into one array — one deserialize/serialize per shard, not
    * per key. Deleting a never-inserted key is a no-op (the per-key
    * delete contract is enforced upstream: retire joins against the
    * exact failed table first). */
  def deleteAllSerialized(bytes: Array[Byte],
                          keys: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val f = deserialize(bytes)
    var i = 0
    while (i < keys.numElements()) { f.delete(keys.getLong(i)); i += 1 }
    f.serialize()
  }

  def deserialize(bytes: Array[Byte]): GraftCuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == MAGIC, "not a GraftCuckooFilter")
    val buckets = bb.getInt(); val count = bb.getLong()
    val table = new Array[Short](buckets * SLOTS)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort(); i += 1 }
    new GraftCuckooFilter(buckets, table, count)
  }
}
