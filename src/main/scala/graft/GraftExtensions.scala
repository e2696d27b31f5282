package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expr._

/** Registers the engine's custom Catalyst expressions as SQL functions via
  * the sanctioned `SparkSessionExtensions` hook, so `spark.sql("SELECT
  * canonicalize_url(u) ...")` works in plain SQL exactly like the Column
  * API (same Expression classes — codegen included, no wrapper layer).
  *
  * Activate per session:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * or cluster-wide (spark-submit):
  *   --conf spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  private def one(name: String, usage: String, build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), { args: Seq[Expression] =>
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      build(args.head)
    })

  private def two(name: String, usage: String, build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), { args: Seq[Expression] =>
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      build(args(0), args(1))
    })

  /** `name(text[, n])` with a literal-int second argument (expression
    * parameters that must be plan-time constants, e.g. shingle width). */
  private def withLitInt(name: String, usage: String, default: Int,
                         build: (Expression, Int) => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), { args: Seq[Expression] =>
      args match {
        case Seq(c) => build(c, default)
        case Seq(c, Literal(n: Int, IntegerType)) => build(c, n)
        case Seq(_, other) => throw new IllegalArgumentException(
          s"$name: second argument must be an INT literal, got $other")
        case _ => throw new IllegalArgumentException(
          s"$name expects 1 or 2 arguments, got ${args.length}")
      }
    })

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    one("canonicalize_url",
      "canonicalize_url(url) - scheme/host lowercase, default ports, dot-segments, tracking params, fragments",
      CanonicalizeUrl),
    one("extract_10k",
      "extract_10k(text) - the reference-parity 10-K item extraction",
      ExtractFilingText),
    one("extract_metrics",
      "extract_metrics(text) - labeled numeric metrics as a map<string,double>",
      ExtractMetrics),
    one("simhash64",
      "simhash64(text) - 64-bit SimHash over word features",
      SimHash64Expr),
    one("priority_bucket",
      "priority_bucket(p) - monotone 16-bit quantization of a non-negative double",
      PriorityBucketExpr),
    two("bloom_might_contain",
      "bloom_might_contain(bits, key) - zero-copy probe of a serialized graft bloom shard",
      BloomMightContainExpr),
    two("cuckoo_contains",
      "cuckoo_contains(bits, key) - zero-copy probe of a serialized graft cuckoo shard",
      CuckooContainsExpr),
    two("vec_dot",
      "vec_dot(a, b) - float-vector dot product, left-to-right double fold",
      VecDotExpr),
    withLitInt("word_shingles64",
      "word_shingles64(text[, n]) - sorted distinct xxhash64 of n-word shingles", 3,
      WordShingles64))
}
