package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.fixtures.SyntheticCorpus

class CanonicalizeUrlSpec extends AnyFunSuite {
  /** Deterministic stand-in for scalatestplus forAll (bridge jar not in the
    * offline cache): 500 samples from a fixed ScalaCheck seed. */
  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit =
    (0 until 500).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }
  private def c(s: String) = UrlCanonicalizer.canonicalize(s)

  test("examples from the pinned spec") {
    assert(c("HTTPS://H0.Example/filings/1/10-K.htm") == "https://h0.example/filings/1/10-K.htm")
    assert(c("https://h0.example:443/a") == "https://h0.example/a")
    assert(c("http://h0.example:80/a") == "http://h0.example/a")
    assert(c("http://h0.example:8080/a") == "http://h0.example:8080/a")
    assert(c("https://h0.example/a/./b") == "https://h0.example/a/b")
    assert(c("https://h0.example/a/../b") == "https://h0.example/b")
    assert(c("https://h0.example/a//b") == "https://h0.example/a/b")
    assert(c("https://h0.example/a#frag") == "https://h0.example/a")
    assert(c("https://h0.example") == "https://h0.example/")
    assert(c("https://h0.example/a/") == "https://h0.example/a/")
    assert(c("https://h0.example/a?x=1&y=2&x=3") == "https://h0.example/a?x=1&y=2")
    assert(c("https://h0.example/a?") == "https://h0.example/a")
    assert(c("not a url") == "not a url")
    assert(c("  https://h0.example/a  ") == "https://h0.example/a")
  }

  test("idempotent on every synthetic-corpus noisy URL") {
    for (i <- 0L until 500L; k <- 0 until 3) {
      val noisy = SyntheticCorpus.noisyUrl(i, 42L, 100, i * 37 + k)
      val once = c(noisy)
      assert(c(once) == once, s"not idempotent on $noisy")
    }
  }

  test("every noisy variant collapses to the canonical URL") {
    for (i <- 0L until 500L; k <- 0 until 3) {
      val noisy = SyntheticCorpus.noisyUrl(i, 42L, 100, i * 37 + k)
      assert(c(noisy) == SyntheticCorpus.canonicalUrl(i, 42L, 100),
        s"variant $noisy did not canonicalize")
    }
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
    host   <- Gen.oneOf("A.example", "b.Example.COM", "h9.example")
    port   <- Gen.oneOf("", ":80", ":443", ":8080")
    path   <- Gen.oneOf("", "/", "/a/b", "/a/./b", "/a/../b", "//x", "/a/b/")
    query  <- Gen.oneOf("", "?", "?a=1", "?a=1&a=2&b=3", "?b=&a")
    frag   <- Gen.oneOf("", "#f", "#a/b?c")
  } yield s"$scheme://$host$port$path$query$frag"

  test("property: idempotence over generated URLs") {
    forAll(urlGen) { u => assert(c(c(u)) == c(u), s"not idempotent: $u") }
  }

  test("property: output has no fragment and no default port") {
    forAll(urlGen) { u =>
      val out = c(u)
      assert(!out.contains("#"))
      // only the scheme's own default port is stripped
      if (out.startsWith("http://")) assert(!out.contains(":80/"), s"$u -> $out")
      if (out.startsWith("https://")) assert(!out.contains(":443/"), s"$u -> $out")
    }
  }
}
