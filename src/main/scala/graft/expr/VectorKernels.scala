package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen vector kernels for the embedding path (the round-2 VERDICT's
  * remaining hot-path interpreted HOFs). The SQL higher-order forms —
  * `aggregate(sequence(...), (a, i) -> a + plane[i] * CAST(emb[i] AS
  * DOUBLE))` nested per bit per table — are INTERPRETED per element and
  * re-enter the lambda evaluator DIM·TABLES·BITS times per row. These
  * kernels run the identical arithmetic (same left-to-right double folds,
  * same strict `> 0` sign test, bit-for-bit equal results) as tight JIT'd
  * loops called from whole-stage codegen. */
object VectorKernels {

  /** Σ aᵢ·bᵢ over float vectors, left-to-right in double — the exact fold
    * order of the composable form, so results are bitwise identical. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Per-table LSH bucket ids: bucket[t] packs sign(emb · plane_{t·bits+j})
    * into bit j. `planes` is the flattened [table·bits][dim] hyperplane
    * matrix. */
  def lshBuckets(planes: Array[Double], dim: Int, nTables: Int, bits: Int,
                 emb: ArrayData): ArrayData = {
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += planes(base + i) * emb.getFloat(i).toDouble; i += 1 }
        if (s > 0.0) acc |= 1L << j
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  /** sims(emb, centroid_j) for all j; `cents` is the flattened [k][dim]
    * centroid matrix. */
  def centroidSims(cents: Array[Double], dim: Int, k: Int, emb: ArrayData): ArrayData = {
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0.0
      var i = 0
      while (i < dim) { s += cents(base + i) * emb.getFloat(i).toDouble; i += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** `vec_dot(a, b)` — float-vector dot product in double.
  *
  * ImplicitCastInputTypes: the kernel reads floats via `ArrayData.getFloat`,
  * which on an array<double> column would silently read 4 bytes of each
  * 8-byte slot (garbage numbers, no error) — plain-SQL callers with double
  * arrays must be coerced at analysis time, never at eval time. */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorKernels.dotFF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** `lsh_buckets(emb)` with the hyperplane matrix baked in at plan time. */
case class LshBucketsExpr(child: Expression, planes: Array[Double],
                          dim: Int, nTables: Int, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(emb: Any): Any =
    VectorKernels.lshBuckets(planes, dim, nTables, bits, emb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, e =>
      s"graft.expr.VectorKernels.lshBuckets($ref, $dim, $nTables, $bits, $e)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

/** `centroid_sims(emb)` with the centroid matrix baked in at plan time. */
case class CentroidSimsExpr(child: Expression, cents: Array[Double],
                            dim: Int, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_sims"

  override def nullSafeEval(emb: Any): Any =
    VectorKernels.centroidSims(cents, dim, k, emb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "double[]")
    defineCodeGen(ctx, ev, e =>
      s"graft.expr.VectorKernels.centroidSims($ref, $dim, $k, $e)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidSimsExpr =
    copy(child = newChild)
}

object VectorExprs {
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDotExpr(Bridge.expression(a), Bridge.expression(b)))

  def lsh_buckets(emb: Column, planes: Array[Double], dim: Int,
                  nTables: Int, bits: Int): Column =
    Bridge.column(LshBucketsExpr(Bridge.expression(emb), planes, dim, nTables, bits))

  def centroid_sims(emb: Column, cents: Array[Double], dim: Int, k: Int): Column =
    Bridge.column(CentroidSimsExpr(Bridge.expression(emb), cents, dim, k))
}
