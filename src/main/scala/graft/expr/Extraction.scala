package graft.expr

import java.util.regex.Pattern

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The pinned extraction spec (src/main/resources/extraction-spec.json) —
  * the single source of truth for the byte-identical-extraction contract
  * (SURVEY.md §2.3, BASELINE.json input_hint). Both the engine expression
  * here and the pure-Scala oracle in the test tree load THIS file; the
  * golden-file test asserts byte equality between them. */
object ExtractionSpec {
  final case class Metric(name: String, pattern: Pattern, group: Int)

  private val root = {
    val in = getClass.getResourceAsStream("/extraction-spec.json")
    require(in != null, "extraction-spec.json missing from resources")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  private def compile(p: String, flags: Int): Pattern = Pattern.compile(p, flags)

  val sectionPattern: Pattern = {
    val sec = root.get("section")
    var flags = 0
    sec.get("flags").forEach { f =>
      if (f.asText() == "DOTALL") flags |= Pattern.DOTALL
      if (f.asText() == "CASE_INSENSITIVE") flags |= Pattern.CASE_INSENSITIVE
    }
    compile(sec.get("pattern").asText(), flags)
  }
  val sectionGroup: Int = root.get("section").get("group").asInt()
  val sectionNoMatch: String = root.get("section").get("noMatch").asText()

  /** Fast path when the section pattern is exactly `LIT1(.*?)LIT2` with
    * DOTALL and group 1: the first regex match is then BY CONSTRUCTION
    * `indexOf(LIT1)` / `indexOf(LIT2, afterLIT1)` — if LIT2 never occurs
    * after the first LIT1 it occurs after no later LIT1 either, so regex
    * backtracking cannot produce a match the scan misses. indexOf avoids
    * the O(text·LIT2) lazy-dotall probe per character. Byte-equality with
    * the pure-regex oracle is enforced by the extraction golden tests. */
  val sectionLiterals: Option[(String, String)] = {
    val raw = root.get("section").get("pattern").asText()
    val flagsOk = {
      var names = List.empty[String]
      root.get("section").get("flags").forEach(f => names ::= f.asText())
      names == List("DOTALL")
    }
    if (flagsOk && sectionGroup == 1) Extraction.literalPair(raw) else None
  }

  val metrics: Seq[Metric] = {
    val b = Seq.newBuilder[Metric]
    root.get("metrics").forEach { m =>
      b += Metric(m.get("name").asText(),
        compile(m.get("pattern").asText(), 0), m.get("group").asInt())
    }
    b.result()
  }
}

/** Static evaluation helpers — also the codegen targets, so the expressions
  * below stay inside WholeStageCodegen. */
object Extraction {
  /** `LIT1(.*?)LIT2` → the two unescaped literals, or None if either side
    * contains regex syntax the scan can't reproduce. Exposed for direct
    * testing (the loaded spec exercises only one pattern). */
  private[expr] def literalPair(raw: String): Option[(String, String)] = {
    val parts = raw.split(java.util.regex.Pattern.quote("(.*?)"), -1)
    def unescapeLiteral(s: String): Option[String] = {
      val b = new StringBuilder; var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            // Only metachar escapes (\., \$, …) denote the literal char.
            // Alphanumeric escapes are regex CLASSES/ANCHORS (\d \w \s \b
            // \Q \1 …) — treating them as literals would silently activate
            // the indexOf fast path with wrong semantics → regex path.
            val c = s.charAt(i + 1)
            if (Character.isLetterOrDigit(c)) return None
            b.append(c); i += 2
          case c if ".[](){}*+?|^$\\".indexOf(c) >= 0 => return None
          case c => b.append(c); i += 1
        }
      }
      Some(b.result())
    }
    if (parts.length == 2)
      for (a <- unescapeLiteral(parts(0)); b <- unescapeLiteral(parts(1)))
        yield (a, b)
    else None
  }

  /** First match of the section pattern; no match → pinned noMatch value
    * (empty string — identical to regexp_extract semantics in Spark AND
    * DuckDB, which the oracle SQL relies on). */
  def extractItem(text: String): String =
    ExtractionSpec.sectionLiterals match {
      case Some((lit1, lit2)) =>
        val s = text.indexOf(lit1)
        if (s < 0) ExtractionSpec.sectionNoMatch
        else {
          val from = s + lit1.length
          val e = text.indexOf(lit2, from)
          if (e < 0) ExtractionSpec.sectionNoMatch else text.substring(from, e)
        }
      case None =>
        val m = ExtractionSpec.sectionPattern.matcher(text)
        if (m.find()) {
          val g = m.group(ExtractionSpec.sectionGroup)
          if (g == null) ExtractionSpec.sectionNoMatch else g
        } else ExtractionSpec.sectionNoMatch
    }

  def extractItemUTF8(u: UTF8String): UTF8String =
    UTF8String.fromString(extractItem(u.toString))

  /** All metric patterns applied to the text; unmatched metrics are absent
    * from the map. Values parsed as java.lang.Double.parseDouble (locale-free). */
  def extractMetricsMap(u: UTF8String): ArrayBasedMapData = {
    val text = u.toString
    val keys = new scala.collection.mutable.ArrayBuffer[UTF8String](4)
    val vals = new scala.collection.mutable.ArrayBuffer[Any](4)
    ExtractionSpec.metrics.foreach { mt =>
      val m = mt.pattern.matcher(text)
      if (m.find()) {
        val g = m.group(mt.group)
        if (g != null) {
          keys += UTF8String.fromString(mt.name)
          vals += java.lang.Double.parseDouble(g)
        }
      }
    }
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray[Any]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray[Any]))
  }
}

/** X1 — `extract_10k(text)`: the 10-K section extraction as a native
  * Catalyst expression (mandated by BASELINE.json north_star: "extraction
  * … as a Catalyst expression"). */
case class ExtractFilingText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_filing_text"

  override def nullSafeEval(input: Any): Any =
    Extraction.extractItemUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Extraction.extractItemUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractFilingText =
    copy(child = newChild)
}

/** X2 — `extract_metrics(text)`: metric name → value map from the pinned
  * metric patterns. */
case class ExtractMetrics(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MapType(StringType, DoubleType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_metrics"

  override def nullSafeEval(input: Any): Any =
    Extraction.extractMetricsMap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Extraction.extractMetricsMap($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractMetrics =
    copy(child = newChild)
}

object Extractors {
  def extract_10k(c: Column): Column = Bridge.column(ExtractFilingText(Bridge.expression(c)))
  def extract_metrics(c: Column): Column = Bridge.column(ExtractMetrics(Bridge.expression(c)))
}
