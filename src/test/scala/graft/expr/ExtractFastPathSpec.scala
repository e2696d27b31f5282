package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** The indexOf fast path must be indistinguishable from the spec regex on
  * ANY input — including texts with the open marker but no close marker,
  * repeated markers, marker fragments, and empty sections. Randomized
  * marker soups use a FIXED seed (deterministic test). */
class ExtractFastPathSpec extends AnyFunSuite {

  // Reference built directly from the raw spec resource — independent of
  // graft.expr.ExtractionSpec (whose name the golden-test class shadows in
  // this package anyway).
  private val (pattern, group, noMatch) = {
    val in = getClass.getResourceAsStream("/extraction-spec.json")
    val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    finally in.close()
    val sec = root.get("section")
    (java.util.regex.Pattern.compile(sec.get("pattern").asText(),
      java.util.regex.Pattern.DOTALL),
      sec.get("group").asInt(), sec.get("noMatch").asText())
  }

  private def regexReference(text: String): String = {
    val m = pattern.matcher(text)
    if (m.find()) {
      val g = m.group(group)
      if (g == null) noMatch else g
    } else noMatch
  }

  test("fast path is active for the pinned spec") {
    assert(graft.expr.Extraction.extractItem("zITEM 7.abcITEM 7A.z") == "abc")
  }

  private val fragments = Array(
    "ITEM 7.", "ITEM 7A.", "ITEM 7", "ITEM", " 7A.", "filler text ",
    "$420 million ", "\n\n", "ITEM 7. nested ITEM 7. again ", "A.", ".")

  test("fast path ≡ regex on 1000 seeded adversarial marker soups") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val text = Seq.fill(rnd.nextInt(12))(fragments(rnd.nextInt(fragments.length))).mkString
      assert(Extraction.extractItem(text) == regexReference(text), s"<$text>")
    }
  }

  // literalPair lives on the Extraction object (the golden-test class
  // named ExtractionSpec shadows the spec object in this package).
  private def lp(raw: String) = graft.expr.Extraction.literalPair(raw)

  test("class/anchor escapes disable the fast path; metachar escapes don't") {
    // Alphanumeric escapes are regex semantics (\d \w \s \b \Q \1), not
    // literal chars — a pattern carrying one must fall back to the regex
    // path instead of matching the letter literally.
    for (esc <- Seq("\\d", "\\w", "\\s", "\\b", "\\Q", "\\1", "\\A", "\\z"))
      assert(lp(s"A${esc}B(.*?)C").isEmpty, esc)
    for (esc <- Seq("\\d", "\\w", "\\s"))
      assert(lp(s"AB(.*?)C${esc}D").isEmpty, esc)
    // True metachar escapes ARE the literal char.
    assert(lp("""ITEM 7\.(.*?)ITEM 7A\.""")
      .contains(("ITEM 7.", "ITEM 7A.")))
    assert(lp("""a\$b(.*?)c""").contains(("a$b", "c")))
    // \\d = escaped backslash then plain 'd' — a literal, NOT the \d class.
    assert(lp("""a(.*?)c\\d""").contains(("a", "c\\d")))
    // Unescaped regex syntax anywhere → no fast path.
    assert(lp("a[b](.*?)c").isEmpty)
    assert(lp("ab(.*?)c|d").isEmpty)
  }

  test("fast path ≡ regex on hand-picked edges") {
    val cases = Seq(
      "", "ITEM 7.", "ITEM 7A.", "ITEM 7.ITEM 7A.", "ITEM 7.xITEM 7A.",
      "ITEM 7A.ITEM 7.", "preITEM 7.midITEM 7A.post",
      "ITEM 7.no close marker here", "ITEM 7.aITEM 7.bITEM 7A.c",
      "ITEM 7.aITEM 7A.bITEM 7A.c")
    for (t <- cases) assert(Extraction.extractItem(t) == regexReference(t), s"<$t>")
  }
}
