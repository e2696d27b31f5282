package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}
import graft.filters.GraftBloomFilter

/** `bloom_or(a, b)` — union of two serialized Bloom shards (same geometry).
  * Used for the incremental seen-set update: this round's delta shards OR
  * into the standing shards instead of rebuilding from the full history —
  * O(round keys), not O(all keys). Runs on a handful of shard rows per
  * round, never in a per-url hot path. */
case class BloomOrExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_or"

  override def nullSafeEval(a: Any, b: Any): Any =
    BloomOrExpr.or(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.BloomOrExpr.or($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomOrExpr =
    copy(left = newLeft, right = newRight)
}

object BloomOrExpr {
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    GraftBloomFilter.deserialize(a).merge(GraftBloomFilter.deserialize(b)).serialize()

  def bloom_or(a: Column, b: Column): Column =
    Bridge.column(BloomOrExpr(Bridge.expression(a), Bridge.expression(b)))
}
