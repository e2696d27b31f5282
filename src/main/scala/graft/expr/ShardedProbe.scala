package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.filters.{GraftBloomFilter, GraftCuckooFilter}

/** Shard-table probes that keep the filter BYTES OFF the row stream.
  *
  * The join-shaped probe (`candidates ⋈ broadcast(shards)` then
  * `bloom_might_contain(bits, key)`) is semantically map-side, but the
  * joined `bits` column is a BINARY value read per row — and
  * `UnsafeRow.getBinary` COPIES it, so every candidate row pays a
  * shard-sized memcpy: at 32 shards × ~157 KB and ~260 k candidates per
  * crawl round that is ~40 GB of copying, pure memory bandwidth (the one
  * resource that does NOT scale with cores on a single box). Measured as
  * the majority of the dedup stage at local[1].
  *
  * These expressions instead hold the whole shard table as a driver
  * broadcast (`Array[Array[Byte]]` indexed by shardId — torrent-shipped
  * once per executor), evaluate `shardId` per row (cheap int), and probe
  * the shared byte arrays zero-copy inside whole-stage codegen. A missing
  * shard (null slot) probes as false — an absent shard holds no keys. */
case class BloomShardsProbeExpr(shards: Broadcast[Array[Array[Byte]]],
                                left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_shards_probe"

  override def nullSafeEval(sid: Any, key: Any): Any = {
    val arr = shards.value
    val i = sid.asInstanceOf[Int]
    val bits = if (i >= 0 && i < arr.length) arr(i) else null
    bits != null && GraftBloomFilter.mightContainSerialized(bits, key.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomShardsBc", shards,
      classOf[Broadcast[Array[Array[Byte]]]].getName)
    // freshName per Spark codegen convention: under CSE/codegen splitting two
    // probes can share a scope, so fixed identifiers would collide.
    val arr = ctx.freshName("shardArr")
    val bits = ctx.freshName("shardBits")
    nullSafeCodeGen(ctx, ev, (sid, key) =>
      s"""
         |byte[][] $arr = (byte[][]) $ref.value();
         |byte[] $bits = ($sid >= 0 && $sid < $arr.length) ? $arr[$sid] : null;
         |${ev.value} = $bits != null &&
         |  graft.filters.GraftBloomFilter.mightContainSerialized($bits, $key);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomShardsProbeExpr =
    copy(left = newLeft, right = newRight)
}

/** Same zero-copy probe against cuckoo shards (the deletable subset). */
case class CuckooShardsProbeExpr(shards: Broadcast[Array[Array[Byte]]],
                                 left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cuckoo_shards_probe"

  override def nullSafeEval(sid: Any, key: Any): Any = {
    val arr = shards.value
    val i = sid.asInstanceOf[Int]
    val bits = if (i >= 0 && i < arr.length) arr(i) else null
    bits != null && GraftCuckooFilter.containsSerialized(bits, key.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cuckooShardsBc", shards,
      classOf[Broadcast[Array[Array[Byte]]]].getName)
    val arr = ctx.freshName("shardArr")
    val bits = ctx.freshName("shardBits")
    nullSafeCodeGen(ctx, ev, (sid, key) =>
      s"""
         |byte[][] $arr = (byte[][]) $ref.value();
         |byte[] $bits = ($sid >= 0 && $sid < $arr.length) ? $arr[$sid] : null;
         |${ev.value} = $bits != null &&
         |  graft.filters.GraftCuckooFilter.containsSerialized($bits, $key);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CuckooShardsProbeExpr =
    copy(left = newLeft, right = newRight)
}

object ShardedProbe {
  def bloom_shards_probe(bc: Broadcast[Array[Array[Byte]]],
                         shardId: Column, key: Column): Column =
    Bridge.column(BloomShardsProbeExpr(bc,
      Bridge.expression(shardId), Bridge.expression(key)))

  def cuckoo_shards_probe(bc: Broadcast[Array[Array[Byte]]],
                          shardId: Column, key: Column): Column =
    Bridge.column(CuckooShardsProbeExpr(bc,
      Bridge.expression(shardId), Bridge.expression(key)))
}
