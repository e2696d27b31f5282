package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `priority_bucket(p)` — a monotone 16-bit quantization of a non-negative
  * double: the top 16 bits of the IEEE-754 pattern (sign+exponent+4
  * mantissa bits). For doubles ≥ 0 the raw bit pattern is order-isomorphic
  * to the value, so bucket(a) ≤ bucket(b) ⟺ quantized order holds — which
  * lets the frontier eviction pick a priority floor from a ≤ 2^16-row
  * histogram instead of a global sort (Frontier.splitTopByPriority).
  * Non-positive priorities all land in bucket -1 (lowest). */
case class PriorityBucketExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "priority_bucket"

  override def nullSafeEval(p: Any): Any =
    PriorityBucket.bucket(p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.expr.PriorityBucket.bucket($p)")

  override protected def withNewChildInternal(newChild: Expression): PriorityBucketExpr =
    copy(child = newChild)
}

object PriorityBucket {
  def bucket(p: Double): Int =
    if (p > 0.0) (java.lang.Double.doubleToRawLongBits(p) >>> 48).toInt else -1

  def priority_bucket(p: Column): Column =
    Bridge.column(PriorityBucketExpr(Bridge.expression(p)))
}
