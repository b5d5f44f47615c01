package graft.miners

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for miner-internal helpers (package-private, so this
  * spec lives in `graft.miners`).
  */
class MinerInternalsSpec extends AnyFunSuite {

  test("decodeEntities decodes &amp; last, preserving escaped entities") {
    // a page that literally shows "&lt;" encodes it as "&amp;lt;" —
    // decoding &amp; first would double-decode it into "<"
    assert(Mappers.decodeEntities("&amp;lt;") === "&lt;")
    assert(Mappers.decodeEntities("&amp;amp;") === "&amp;")
    // the plain entities still decode
    assert(Mappers.decodeEntities("a &lt;b&gt; &quot;c&quot; &amp; d") ===
      "a <b> \"c\" & d")
    assert(Mappers.decodeEntities("&#x41;&#66;&nbsp;&ge;&le;") ===
      "AB ≥≤")
  }

  test("collector URL components percent-encode reserved characters") {
    // unreserved names pass through byte-identical
    assert(CollectFlow.encSeg("requests") === "requests")
    assert(CollectFlow.encSeg("cms-core.json") === "cms-core.json")
    // reserved characters cannot break the path / query structure
    assert(CollectFlow.encSeg("a b") === "a%20b")
    assert(CollectFlow.encSeg("a#b") === "a%23b")
    assert(CollectFlow.encSeg("a?b") === "a%3Fb")
    assert(CollectFlow.encSeg("a/b") === "a%2Fb")
    assert(CollectFlow.encSeg("a+b") === "a%2Bb")
    assert(CollectFlow.encQ("1.0 beta+x") === "1.0+beta%2Bx")
  }

  test("collect builds encoded request URLs for hostile purl names") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val recorder = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = {
        seen += uri; Left("not found")
      }
    }
    CollectFlow.collectPurl("pkg:cran/a b", recorder)
    CollectFlow.collectPurl("pkg:hackage/x%23y", recorder)
    CollectFlow.collectPurl("pkg:pub/p q@1 2", recorder)
    assert(seen.exists(_ == "https://crandb.r-pkg.org/a%20b/all"))
    assert(seen.exists(_ ==
      "https://hackage.haskell.org/package/x%23y.json"))
    assert(seen.exists(_ ==
      "https://pub.dev/api/packages/p%20q/versions/1%202"))
    assert(seen.forall(u => !u.contains(" ")))
  }
}
