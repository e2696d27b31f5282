package graft.expr

import java.util.regex.Pattern
import com.fasterxml.jackson.databind.ObjectMapper

/** The INDEPENDENT pure-Scala extraction oracle (SURVEY.md §2.3): parses
  * extraction-spec.json itself and applies java.util.regex directly —
  * deliberately shares no code with graft.expr.Extraction, so the
  * byte-equality test is a real cross-implementation check. If
  * /root/reference is ever populated, re-derive the spec from it and this
  * oracle (plus the goldens) enforces parity with zero engine changes. */
object ExtractionOracle {
  private val node = {
    val in = getClass.getResourceAsStream("/extraction-spec.json")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  private val (pat, grp, noMatch) = {
    val s = node.get("section")
    var f = 0
    s.get("flags").forEach { x =>
      if (x.asText() == "DOTALL") f |= Pattern.DOTALL
      if (x.asText() == "CASE_INSENSITIVE") f |= Pattern.CASE_INSENSITIVE
    }
    (Pattern.compile(s.get("pattern").asText(), f),
      s.get("group").asInt(), s.get("noMatch").asText())
  }

  def extract(text: String): String = {
    val m = pat.matcher(text)
    if (m.find()) Option(m.group(grp)).getOrElse(noMatch) else noMatch
  }

  def metrics(text: String): Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    node.get("metrics").forEach { mn =>
      val m = Pattern.compile(mn.get("pattern").asText()).matcher(text)
      if (m.find()) {
        val g = m.group(mn.get("group").asInt())
        if (g != null) b += mn.get("name").asText() -> g.toDouble
      }
    }
    b.result()
  }
}
