package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Example-based pins for kernels.canonicalUrl — one case per rule plus
  * the edge shapes the DuckDB oracle chain (q70) must agree on.
  */
class UrlKernelSpec extends AnyFunSuite {

  private def c(s: String): String =
    kernels.canonicalUrl(UTF8String.fromString(s)).toString

  test("each rule, in isolation and combined") {
    // fragment cut
    assert(c("https://example.com/a#frag") == "https://example.com/a")
    // scheme+authority lowercase, path case preserved
    assert(c("HTTPS://EXAMPLE.COM/Path") == "https://example.com/Path")
    // www strip
    assert(c("https://www.example.com/a") == "https://example.com/a")
    // default ports (scheme-specific)
    assert(c("http://example.com:80/a") == "http://example.com/a")
    assert(c("https://example.com:443/a") == "https://example.com/a")
    assert(c("https://example.com:80/a") == "https://example.com:80/a")
    assert(c("http://example.com:8080/a") == "http://example.com:8080/a")
    // trailing slashes (all of them, rtrim semantics; root too)
    assert(c("https://example.com/a///") == "https://example.com/a")
    assert(c("https://example.com/") == "https://example.com")
    // tracking params dropped, '?' dropped when nothing survives
    assert(c("https://example.com/a?utm_source=x&utm_medium=y") ==
      "https://example.com/a")
    assert(c("https://example.com/a?gclid=1&fbclid=2&ref=3&msclkid=4") ==
      "https://example.com/a")
    // ...but only exact-name tracking params ('refresh' is not 'ref')
    assert(c("https://example.com/a?refresh=1") ==
      "https://example.com/a?refresh=1")
    // surviving params sorted byte-lexicographically; empties dropped
    assert(c("https://example.com/a?b=2&a=1&&utm_c=3") ==
      "https://example.com/a?a=1&b=2")
    // trailing slash strips from the PATH, not the query
    assert(c("https://example.com/a/?b=2") == "https://example.com/a?b=2")
    // combined (the q70 planted shapes)
    assert(c("https://www.Example.com/item/7/?utm_source=x") ==
      "https://example.com/item/7")
    assert(c("HTTPS://EXAMPLE.COM:443/item/7") ==
      "https://example.com/item/7")
    assert(c("http://example.com:80/item/7#frag") ==
      "http://example.com/item/7")
    assert(c("https://example.com/item/7?a=1&b=2&gclid=zzz") ==
      "https://example.com/item/7?a=1&b=2")
  }

  test("edge shapes: no scheme, whitespace, second '?', null") {
    // no "://": authority rules skipped, others still apply
    assert(c("example.com/a/?utm_source=x") == "example.com/a")
    assert(c("WWW.Example.com/A") == "WWW.Example.com/A")
    // surrounding whitespace trimmed
    assert(c("  https://example.com/a  ") == "https://example.com/a")
    // later '?' stays inside the first query's param values
    assert(c("https://example.com/a?x=1?y=2") ==
      "https://example.com/a?x=1?y=2")
    // idempotence: canonical of canonical is canonical
    val once = c("https://www.Example.com/item/7/?b=2&a=1&utm_s=x#f")
    assert(c(once) == once)
    assert(kernels.canonicalUrl(null).toString == "")
    assert(c("") == "")
  }
}
