package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a space-tokenized document in one pass — the native
  * replacement for the 64-iteration higher-order-function formulation
  * (bit-identical to it: same Spark xxhash64 token hashes with seed 42,
  * same strict-majority rule `2·ones > n`).
  *
  * Single pass over tokens with a 64-int counter array: O(tokens) instead
  * of O(64·tokens) — this is the hot per-row op of the SimHash dedup path.
  */
object SimHash64 {
  def simhash(u: UTF8String): Long = {
    // Split must match Spark's split(text, ' ') exactly: regex split with
    // limit -1 (keeps empty tokens from consecutive/trailing separators).
    val tokens = u.toString.split(" ", -1)
    val counts = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(tokens(t)), StringType, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1
        i += 1
      }
      t += 1
    }
    val n = tokens.length
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) * 2 > n) out |= (1L << i)
      i += 1
    }
    out
  }

  def simhash64(c: Column): Column = Bridge.column(SimHash64Expr(Bridge.expression(c)))
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash64.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
