package graft.filters

/** A 64-bit-key Bloom filter with a self-describing byte serialization —
  * the per-shard building block of the URL-seen set (SURVEY.md §2.4 J5 /
  * §2.5 A5 / §4.10).
  *
  * Scale math (documented, config-driven): 10^10 keys at 1% fpp needs
  * ~12 GB of bits TOTAL, which is why the seen set is SHARDED by
  * `floorMod(urlHash, nShards)` — each shard covers ~10^7–10^8 keys
  * (15–150 MB), is built independently by a grouped aggregation, and only
  * the shards a partition needs are ever loaded. This class is one shard.
  *
  * Hashing: double hashing (Kirsch–Mitzenmacher) over two splitmix64
  * streams of the key — index_i = (h1 + i·h2) mod m. Pure function of the
  * key: deterministic across JVMs/executors.
  *
  * Serialized layout: [int MAGIC][long numBits][int numHashes]
  * [long numInserted][bits…] — `mightContainSerialized` probes the byte
  * array directly (no deserialization on the read path: the broadcast
  * prefilter probes billions of candidates).
  */
final class GraftBloomFilter private (
    val numBits: Long,
    val numHashes: Int,
    private val words: Array[Long],
    private var inserted: Long) extends Serializable {

  import GraftBloomFilter._

  def numInserted: Long = inserted

  def put(key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ GOLDEN) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      words((idx >>> 6).toInt) |= (1L << (idx & 63))
      i += 1
    }
    inserted += 1
  }

  def mightContain(key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ GOLDEN) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      if ((words((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise OR — shards built on different partitions merge losslessly. */
  def merge(other: GraftBloomFilter): GraftBloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"incompatible bloom shards: ($numBits,$numHashes) vs (${other.numBits},${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    inserted += other.inserted
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HEADER + words.length * 8)
    bb.putInt(MAGIC).putLong(numBits).putInt(numHashes).putLong(inserted)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object GraftBloomFilter {
  final val MAGIC = 0x47424631 // "GBF1"
  final val GOLDEN = 0x9e3779b97f4a7c15L
  private final val HEADER = 4 + 8 + 4 + 8

  def mix(x0: Long): Long = {
    var z = x0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** m = -n·ln(p)/ln2², k = m/n·ln2 (clamped to [1,16]). */
  def create(expectedKeys: Long, fpp: Double): GraftBloomFilter = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2)
    val m0 = math.ceil(-expectedKeys * math.log(fpp) / (ln2 * ln2)).toLong
    val m = ((m0 + 63) / 64) * 64 // whole words
    val k = math.max(1, math.min(16, math.round(m.toDouble / expectedKeys * ln2).toInt))
    new GraftBloomFilter(m, k, new Array[Long]((m / 64).toInt), 0L)
  }

  def deserialize(bytes: Array[Byte]): GraftBloomFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == MAGIC, "not a GraftBloomFilter")
    val m = bb.getLong(); val k = bb.getInt(); val n = bb.getLong()
    val words = new Array[Long]((m / 64).toInt)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    new GraftBloomFilter(m, k, words, n)
  }

  /** Zero-copy probe against the serialized form (the broadcast read path). */
  def mightContainSerialized(bytes: Array[Byte], key: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt()
    if (magic != MAGIC) return false
    val m = bb.getLong(); val k = bb.getInt(); bb.getLong() // skip count
    val h1 = mix(key)
    val h2 = mix(key ^ GOLDEN) | 1L
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      val word = bb.getLong(HEADER + (idx >>> 6).toInt * 8)
      if ((word & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
