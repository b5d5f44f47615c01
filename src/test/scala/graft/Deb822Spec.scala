package graft

import graft.sources.EcosystemParsers
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the deb822 paragraph reader against the debian
  * miner's own Release / Sources / Packages fixtures — the expected
  * files are the reference's checked-in Python-repr dumps of
  * `debcon.get_paragraphs_data` output.
  */
class Deb822Spec extends AnyFunSuite {

  private val dir = "/root/reference/minecode/tests/testfiles/debian"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$path")), "UTF-8")

  /** Parse the reference's Python-repr dict/list-of-dict dumps:
    * single-quoted strings with `\n`/`\'`/`\\` escapes only. */
  private def pyDicts(text: String): Seq[Map[String, String]] = {
    val out = Seq.newBuilder[Map[String, String]]
    var fields = Map.empty[String, String]
    var key: Option[String] = None
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) c match {
        case '\\' if i + 1 < text.length =>
          text.charAt(i + 1) match {
            case 'n'   => sb += '\n'
            case 't'   => sb += '\t'
            case other => sb += other
          }
          i += 1
        case '\'' =>
          inStr = false
          key match {
            case None    => key = Some(sb.result())
            case Some(k) => fields += k -> sb.result(); key = None
          }
          sb.clear()
        case other => sb += other
      } else c match {
        case '\'' => inStr = true
        case '}'  => out += fields; fields = Map.empty; key = None
        case _    =>
      }
      i += 1
    }
    out.result()
  }

  private def check(fixture: String, expectedPath: String): Unit = {
    val got = EcosystemParsers.deb822Paragraphs(read(fixture))
    val want = pyDicts(read(expectedPath))
    assert(got.size == want.size, fixture)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"paragraph mismatch in $fixture")
    }
  }

  test("Release files parse like debcon, with and without checksum blocks") {
    check("release/Release", "release/Release_expected")
    check("release/Release_with_md5", "release/Release_with_md5_expected")
  }

  test("Sources indexes parse like debcon for debian and ubuntu") {
    check("sources/debian_Sources", "sources/debian_Sources_visit_expected")
    check("sources/ubuntu_Sources", "sources/ubuntu_Sources_visit_expected")
  }

  test("Packages indexes parse like debcon") {
    check("packages/debian_Packages",
      "packages/debian_Packages-visit-expected.json")
  }
}
