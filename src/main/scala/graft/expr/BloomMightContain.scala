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

object FilterExprs {
  def bloom_might_contain(bits: Column, key: Column): Column =
    Bridge.column(BloomMightContainExpr(Bridge.expression(bits), Bridge.expression(key)))
  def cuckoo_contains(bits: Column, key: Column): Column =
    Bridge.column(CuckooContainsExpr(Bridge.expression(bits), Bridge.expression(key)))
}
