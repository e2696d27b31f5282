package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** `priority_bucket(p)` — a monotone 16-bit quantization of a non-negative
  * double: the top 16 bits of the IEEE-754 pattern (sign+exponent+4
  * mantissa bits). For doubles ≥ 0 the raw bit pattern is order-isomorphic
  * to the value, so bucket(a) ≤ bucket(b) ⟺ quantized order holds — which
  * lets the frontier eviction pick a priority floor from a ≤ 2^16-row
  * histogram instead of a global sort (Frontier.splitTopByPriority).
  * Non-positive priorities all land in bucket -1 (lowest).
  *
  * ImplicitCastInputTypes: plain-SQL callers can pass any numeric — an
  * analysis-time cast to double keeps interpreted eval and codegen on the
  * same path (an unchecked INT child ClassCastExceptions in eval but
  * "works" under codegen via Java widening — inconsistent and silent). */
case class PriorityBucketExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
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

  /** The level-th 16-bit digit of the (priority DESC, urlHash ASC) radix
    * key — see RadixDigit16Expr. Static so codegen calls it directly. */
  def radixDigit(p: Double, urlHash: Long, level: Int): Int = {
    val v =
      if (level < 4) {
        val bits = java.lang.Double.doubleToRawLongBits(p + 0.0) // -0.0 → 0.0
        // bits ^ ((bits>>63)|MIN): positives flip the sign bit (above all
        // negatives), negatives flip every bit (magnitude order reversed) —
        // UNSIGNED asc ⟺ p asc; complement reverses it to p DESC.
        ~(bits ^ ((bits >> 63) | Long.MinValue))
      } else urlHash ^ Long.MinValue // unsigned asc ⟺ signed asc
    ((v >>> (48 - 16 * (level & 3))) & 0xffffL).toInt
  }

  def radix_digit16(p: Column, urlHash: Column, level: Int): Column =
    Bridge.column(RadixDigit16Expr(Bridge.expression(p), Bridge.expression(urlHash), level))
}

/** `radix_digit16(priority, urlHash, level)` — the level-th 16-bit digit
  * (level 0..7) of the 128-bit composite sort key whose UNSIGNED-ascending
  * order is exactly (priority DESC, urlHash ASC):
  *
  *   levels 0–3: digits of v1 = ~sortable(priority), where sortable(p) is
  *     the IEEE-754 total-order map (sign-magnitude → unsigned-comparable),
  *     so v1's unsigned order is priority DESC over ALL doubles — not just
  *     positives;
  *   levels 4–7: digits of v2 = urlHash ^ MIN_LONG (signed ASC as
  *     unsigned).
  *
  * This is what lets Frontier.splitTopByPriority radix-SELECT the exact
  * top-n boundary key with ≤ 2^16-row histograms per level and no global
  * sort, even under a priority flood (millions of rows in one priority
  * quantization cell — the hash digits always split, hashes being unique).
  * -0.0 is normalized to 0.0 so the digit order agrees with SQL double
  * comparison (which treats them equal) — the final split filter compares
  * doubles, and the two orders must never disagree on a boundary. */
case class RadixDigit16Expr(left: Expression, right: Expression, level: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(level >= 0 && level < 8, s"level must be in [0,8), got $level")
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "radix_digit16"

  override def nullSafeEval(p: Any, h: Any): Any =
    PriorityBucket.radixDigit(p.asInstanceOf[Double], h.asInstanceOf[Long], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, h) => s"graft.expr.PriorityBucket.radixDigit($p, $h, $level)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RadixDigit16Expr =
    copy(left = newLeft, right = newRight)
}
