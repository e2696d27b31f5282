package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingle hasher. The composable built-in form —
  * `transform(sequence(1, size(toks)-2), i -> concat_ws(' ',
  * element_at(toks, i), …))` — is interpreted (higher-order functions never
  * codegen) and re-evaluates the `split(text)` child for EVERY element_at
  * of every position: O(tokens² · n) string work per document, measured at
  * ~13 s for 5 000 sf0.1 documents. This expression tokenizes once, hashes
  * each n-gram with the SAME xxHash64/seed-42 the built-in `xxhash64`
  * applies to the equivalent string (bit parity pinned by ShinglesSpec),
  * dedupes, and returns the sorted hash set: O(tokens · n) per document
  * inside whole-stage codegen. */
object Shingles {

  /** Sorted distinct xxhash64(seed 42) of the n-word shingles of `text`,
    * tokenized by single spaces (split(" ", -1) semantics — empty tokens
    * from runs of spaces are kept, matching the built-in `split`). Fewer
    * than n tokens → empty array. */
  def shingles64(u: UTF8String, n: Int): ArrayData = {
    val toks = u.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hashes(i) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // In-place dedupe of the sorted run.
    var w = 0
    i = 0
    while (i < hashes.length) {
      if (w == 0 || hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  /** Sorted distinct n-word shingles as STRINGS — for cross-engine
    * signature parity (the md5 minhash oracle), where the hash must be one
    * both engines compute on the same string bytes. */
  def shinglesStr(u: UTF8String, n: Int): ArrayData = {
    val toks = u.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def word_shingles64(text: Column, n: Int = 3): Column =
    Bridge.column(WordShingles64(Bridge.expression(text), n))

  def word_shingles(text: Column, n: Int = 3): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    Shingles.shinglesStr(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Shingles.shinglesStr($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

case class WordShingles64(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles64"

  override def nullSafeEval(input: Any): Any =
    Shingles.shingles64(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Shingles.shingles64($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles64 =
    copy(child = newChild)
}
