package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.filters.{GraftBloomFilter, GraftCuckooFilter}

/** J5 — `bloom_might_contain(bits, urlHash)`: probes the serialized shard
  * bytes directly (zero-copy header parse), so the dedup prefilter runs
  * inside whole-stage codegen BEFORE the shuffle — the dedup-before-shuffle
  * requirement. Spark 4 has an internal BloomFilterMightContain tied to its
  * own sketch format; this one reads ours (SURVEY.md §2.4 J5). */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bits: Any, key: Any): Any =
    GraftBloomFilter.mightContainSerialized(
      bits.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.filters.GraftBloomFilter.mightContainSerialized($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(left = newLeft, right = newRight)
}

/** Same probe against a serialized cuckoo shard. */
case class CuckooContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cuckoo_contains"

  override def nullSafeEval(bits: Any, key: Any): Any =
    GraftCuckooFilter.containsSerialized(
      bits.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.filters.GraftCuckooFilter.containsSerialized($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CuckooContainsExpr =
    copy(left = newLeft, right = newRight)
}

/** `cuckoo_merge(a, b)` — union of two serialized cuckoo shards (same
  * geometry); the deletable-subset twin of bloom_or. Shard-row cardinality
  * only, never per-url. */
case class CuckooMergeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cuckoo_merge"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftCuckooFilter.mergeSerialized(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.filters.GraftCuckooFilter.mergeSerialized($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CuckooMergeExpr =
    copy(left = newLeft, right = newRight)
}

/** `cuckoo_delete_all(bits, keys)` — remove an array of keys from a
  * serialized cuckoo shard: THE operation a Bloom filter cannot do, and the
  * reason the deletable seen-subset is cuckoo-backed. One eval per shard
  * row (keys pre-grouped by shard), so the deserialize/serialize round-trip
  * amortizes over the whole retire batch. */
case class CuckooDeleteAllExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cuckoo_delete_all"

  override def nullSafeEval(bits: Any, keys: Any): Any =
    GraftCuckooFilter.deleteAllSerialized(bits.asInstanceOf[Array[Byte]],
      keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.filters.GraftCuckooFilter.deleteAllSerialized($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CuckooDeleteAllExpr =
    copy(left = newLeft, right = newRight)
}

object FilterExprs {
  def bloom_might_contain(bits: Column, key: Column): Column =
    Bridge.column(BloomMightContainExpr(Bridge.expression(bits), Bridge.expression(key)))
  def cuckoo_contains(bits: Column, key: Column): Column =
    Bridge.column(CuckooContainsExpr(Bridge.expression(bits), Bridge.expression(key)))
  def cuckoo_merge(a: Column, b: Column): Column =
    Bridge.column(CuckooMergeExpr(Bridge.expression(a), Bridge.expression(b)))
  def cuckoo_delete_all(bits: Column, keys: Column): Column =
    Bridge.column(CuckooDeleteAllExpr(Bridge.expression(bits), Bridge.expression(keys)))
}
