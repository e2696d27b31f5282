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

  /** Merge by re-inserting the other's fingerprints (needs headroom). */
  def merge(other: GraftCuckooFilter): GraftCuckooFilter = {
    require(other.numBuckets == numBuckets, "incompatible cuckoo shards")
    var b = 0
    while (b < other.numBuckets) {
      var s = 0
      while (s < SLOTS) {
        val fp = other.table(b * SLOTS + s)
        if (fp != 0) {
          if (!slotInsert(b, fp)) {
            val alt = altBucket(b, fp)
            require(slotInsert(alt, fp), "cuckoo merge overflow — size shards larger")
          }
          count += 1
        }
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

object GraftCuckooFilter {
  final val MAGIC = 0x47434631 // "GCF1"
  final val SLOTS = 4
  final val MAX_KICKS = 500
  private final val HEADER = 4 + 4 + 8

  /** Sized for ~95% max load: buckets = nextPow2(expected / (SLOTS·0.95)). */
  def create(expectedKeys: Long): GraftCuckooFilter = {
    val needed = math.max(1L, math.ceil(expectedKeys / (SLOTS * 0.95)).toLong)
    val buckets = java.lang.Long.highestOneBit(needed * 2 - 1).toInt.max(1)
    new GraftCuckooFilter(buckets, new Array[Short](buckets * SLOTS), 0L)
  }

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
