package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization (SURVEY.md §2.2 P1) — the pinned spec:
  *
  *  1. trim surrounding whitespace; no "://" → returned trimmed (not a URL)
  *  2. scheme and host lowercased
  *  3. default ports stripped (http:80, https:443)
  *  4. path dot-segments resolved (RFC 3986 §5.2.4) and duplicate slashes
  *     collapsed; empty path → "/"
  *  5. fragment stripped
  *  6. query kept in original order, duplicate keys dropped (first wins),
  *     empty query ("?" alone) stripped
  *
  * Idempotent by construction (property-tested). This is the dedup key for
  * the URL-seen set, so it must be a pure total function of the input —
  * no IO, no locale, no time.
  */
object UrlCanonicalizer {

  def canonicalize(raw: String): String = {
    val s = raw.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return s
    val scheme = s.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)

    var rest = s.substring(schemeEnd + 3)
    // fragment first (never part of the key)
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)

    val qIdx = rest.indexOf('?')
    val query = if (qIdx >= 0) rest.substring(qIdx + 1) else ""
    val hostPath = if (qIdx >= 0) rest.substring(0, qIdx) else rest

    val slash = hostPath.indexOf('/')
    var hostPort = if (slash >= 0) hostPath.substring(0, slash) else hostPath
    val path = if (slash >= 0) hostPath.substring(slash) else ""

    hostPort = hostPort.toLowerCase(java.util.Locale.ROOT)
    hostPort = (scheme, hostPort) match {
      case ("http", h) if h.endsWith(":80")   => h.dropRight(3)
      case ("https", h) if h.endsWith(":443") => h.dropRight(4)
      case (_, h)                             => h
    }

    val normPath = if (path.isEmpty) "/" else removeDotSegments(collapseSlashes(path))
    val normQuery = dedupQuery(query)

    val b = new java.lang.StringBuilder(s.length)
    b.append(scheme).append("://").append(hostPort).append(normPath)
    if (normQuery.nonEmpty) b.append('?').append(normQuery)
    b.toString
  }

  private def collapseSlashes(p: String): String = {
    val b = new java.lang.StringBuilder(p.length)
    var prevSlash = false
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c != '/' || !prevSlash) b.append(c)
      prevSlash = c == '/'
      i += 1
    }
    b.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. Input always starts with '/'. */
  private def removeDotSegments(p: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val segs = p.split("/", -1)
    val endsWithSlash =
      p.endsWith("/") || p.endsWith("/.") || p.endsWith("/..")
    segs.foreach {
      case "" | "." => // skip
      case ".."     => if (out.nonEmpty) out.remove(out.length - 1)
      case seg      => out += seg
    }
    val base = out.mkString("/", "/", "")
    if (out.isEmpty) "/"
    else if (endsWithSlash) base + "/"
    else base
  }

  /** First occurrence of each key wins; original order preserved. */
  private def dedupQuery(q: String): String = {
    if (q.isEmpty) return ""
    val seen = new java.util.HashSet[String]()
    val b = new java.lang.StringBuilder(q.length)
    q.split("&", -1).foreach { param =>
      if (param.nonEmpty) {
        val key = { val e = param.indexOf('='); if (e >= 0) param.substring(0, e) else param }
        if (seen.add(key)) {
          if (b.length > 0) b.append('&')
          b.append(param)
        }
      }
    }
    b.toString
  }

  /** Codegen entry point (keeps whole-stage codegen alive: the generated
    * code calls this static method on UTF8String directly). */
  def canonicalizeUTF8(u: UTF8String): UTF8String =
    UTF8String.fromString(canonicalize(u.toString))
}

/** `canonicalize_url(url)` as a Catalyst expression with codegen (no UDF —
  * stays inside WholeStageCodegen, null-intolerant so filters above it can
  * still be pushed past). */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "canonicalize_url"

  override def nullSafeEval(input: Any): Any =
    UrlCanonicalizer.canonicalizeUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.UrlCanonicalizer.canonicalizeUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

object CanonicalizeUrl {
  /** Column-API entry point. */
  def canonicalize_url(c: Column): Column =
    Bridge.column(CanonicalizeUrl(Bridge.expression(c)))
}

/** Column ⇄ Expression bridging for Spark 4 (Column wraps a ColumnNode in
  * the public API; GraftSqlBridge reaches the private[sql] conversion). */
private[graft] object Bridge {
  import org.apache.spark.sql.GraftSqlBridge
  def expression(c: Column): Expression = GraftSqlBridge.toExpression(c)
  def column(e: Expression): Column = GraftSqlBridge.toColumn(e)
}
