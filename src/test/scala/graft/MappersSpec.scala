package graft

import graft.miners.Mappers
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the package mappers against the reference's own
  * `mapper_*_expected.json` fixtures (the fields this engine's
  * catalog carries — license detection outputs are scancode-side and
  * out of scope).
  */
class MappersSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/minecode/tests/testfiles"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$path")), "UTF-8")

  private def arr(path: String): Seq[JValue] =
    JsonMethods.parse(read(path)) match {
      case JArray(items) => items
      case other         => Seq(other)
    }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s); case _ => None
  }

  test("packagist mapper matches the reference's expected package") {
    val got = Mappers.packagistPackages(read("packagist/00f100_cakephp-opauth.json"))
    val want = arr("packagist/packaglist_00f100_cakephp-opauth_expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.name == str(w \ "name").get)
      assert(g.row.version == str(w \ "version"))
      assert(g.row.description == str(w \ "description"))
      assert(g.row.primary_language == str(w \ "primary_language"))
      assert(g.row.download_url == str(w \ "download_url").get)
      assert(g.row.sha1 == str(w \ "sha1"))
      assert(g.row.homepage_url == str(w \ "homepage_url"))
      assert(g.vcsUrl == str(w \ "vcs_url"))
      val wantKeywords = (w \ "keywords") match {
        case JArray(ks) => ks.flatMap(str); case _ => Seq.empty
      }
      assert(g.row.keywords == wantKeywords)
      val wantParties = (w \ "parties") match {
        case JArray(ps) => ps.map(p =>
          (str(p \ "name"), str(p \ "email"), str(p \ "url")))
        case _ => Seq.empty
      }
      assert(g.parties.map(p => (p.name, p.email, p.url)) == wantParties)
    }
  }

  test("github mapper matches the reference's expected grit packages") {
    val got = Mappers.githubPackages(
      read("github/mojombo_grit_from_visitor_4mapper_input.json"))
    val want = arr("github/mojombo_grit_result_mapper_expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.name == str(w \ "name").get)
      assert(g.row.version == str(w \ "version"))
      assert(g.row.download_url == str(w \ "download_url").get)
      assert(g.row.sha1 == str(w \ "sha1"))
      assert(g.row.primary_language == str(w \ "primary_language"))
      assert(g.row.homepage_url == str(w \ "homepage_url"))
      assert(g.vcsUrl == str(w \ "vcs_url"))
    }
  }

  test("golang mapper matches the reference's expected packages") {
    def checkOne(input: String, purl: String, expectedPath: String): Unit = {
      val g = Mappers.golangPackage(read(input), purl).get
      val w = arr(expectedPath).head
      assert(g.row.name == str(w \ "name").get)
      assert(g.row.namespace == str(w \ "namespace"))
      assert(g.row.ptype == str(w \ "type").get)
      assert(g.row.description == str(w \ "description"))
      assert(g.row.homepage_url == str(w \ "homepage_url"))
      assert(g.row.primary_language == str(w \ "primary_language"))
      assert(g.vcsUrl == str(w \ "vcs_url"))
    }
    checkOne("golang/glog.json",
      "pkg:golang/github.com/golang/glog?vcs_repository=https://github.com/golang/glog",
      "golang/glog_expected.json")
    checkOne("golang/math3.json",
      "pkg:bitbucket/bitbucket.org/zombiezen/yaml?vcs_repository=https://bitbucket.org/zombiezen/yaml",
      "golang/math3_expected.json")
    checkOne("golang/winter.json",
      "pkg:golang/winterdrache.de/bindings/sdl",
      "golang/winter_expected.json")
  }

  test("golang mapper survives namespace-less purls and encoded qualifiers") {
    val bare = Mappers.golangPackage("""{"synopsis": "s"}""", "pkg:golang/mypkg").get
    assert(bare.row.homepage_url == Some("https://mypkg"))
    // an encoded '&' inside vcs_repository must survive the qualifier split
    val enc = Mappers.golangPackage("{}",
      "pkg:golang/github.com/x/y?vcs_repository=https%3A%2F%2Fgithub.com%2Fx%2Fy%3Fa%3D1%26b%3D2").get
    assert(enc.vcsUrl == Some("git+https://github.com/x/y?a=1&b=2"))
  }

  test("cran html mapper matches the reference's expected ANN2 packages") {
    val got = Mappers.cranPackagesFromHtml(read("cran/CRAN_Package_ANN2.html"),
      "https://cloud.r-project.org/web/packages/ANN2/index.html")
    val want = arr("cran/mapper_ANN2_expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.name == str(w \ "name").get)
      assert(g.row.version == str(w \ "version"))
      assert(g.row.download_url == str(w \ "download_url").get)
      assert(g.row.homepage_url == str(w \ "homepage_url"))
      assert(g.row.release_date.map(_.toString.take(10)) ==
        str(w \ "release_date").map(_.take(10)))
      val wantParties = (w \ "parties") match {
        case JArray(ps) => ps.map(p =>
          (str(p \ "name"), str(p \ "email"),
            str(p \ "role").getOrElse("")))
        case _ => Seq.empty
      }
      assert(g.parties.map(p =>
        (p.name, p.email, p.role.getOrElse(""))) == wantParties)
    }
  }

  test("nuget mapper matches the reference's expected entityframework package") {
    val got = Mappers.nugetPackage(read("nuget/entityframework2.json")).get
    val w = arr("nuget/nuget_mapper_expected.json").head
    assert(got.row.name == str(w \ "name").get)
    assert(got.row.version == str(w \ "version"))
    assert(got.row.description == str(w \ "description"))
    assert(got.row.homepage_url == str(w \ "homepage_url"))
    // scancode license DETECTION (ms-net-library) is out of scope; the
    // raw statement is the licenseUrl the reference extracted
    assert(got.row.declared_license_expression ==
      str(w \ "extracted_license_statement"))
    val wantKeywords = (w \ "keywords") match {
      case JArray(ks) => ks.flatMap(str); case _ => Seq.empty
    }
    assert(got.row.keywords == wantKeywords)
    assert(got.parties.map(_.name) == Seq(Some("Microsoft")))
  }

  test("cran html mapper matches the reference's expected abe packages") {
    val got = Mappers.cranPackagesFromHtml(read("cran/CRAN_Package_abe.html"),
      "https://cloud.r-project.org/web/packages/abe/index.html")
    val want = arr("cran/mapper_abe_expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.download_url == str(w \ "download_url").get)
      assert(g.row.version == str(w \ "version"))
    }
  }
}
