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
    checkGithub("github/mojombo_grit_from_visitor_4mapper_input.json",
      "github/mojombo_grit_result_mapper_expected.json")
  }

  test("github mapper matches the calendar_builder branch golden") {
    // miners/test_github.py:142-151 — no tags/downloads, two branch
    // archive packages with the owner party and the vcs tuple quirk
    checkGithub("github/calendar_builder.json",
      "github/mapper_calendar_builder_expected.json")
  }

  private def checkGithub(input: String, expectedPath: String): Unit = {
    val got = Mappers.githubPackages(read(input))
    val want = arr(expectedPath)
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

  test("haxe package mapper matches the reference's expected package") {
    // miners/test_haxe.py:55-62 vs haxe/project_package.json-expected
    val got = Mappers.haxePackages(read("haxe/project_package.json"))
    val want = arr("haxe/project_package.json-expected")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.name == str(w \ "name").get)
      assert(g.row.version == str(w \ "version"))
      assert(g.row.primary_language == str(w \ "primary_language"))
      assert(g.row.description == str(w \ "description"))
      assert(g.row.download_url == str(w \ "download_url").get)
      // package.json-only fields are not mapped, like the reference
      assert(g.row.homepage_url == str(w \ "homepage_url"))
      assert(g.row.keywords.isEmpty && (w \ "keywords") == JNull)
      assert(g.row.declared_license_expression ==
        str(w \ "extracted_license_statement"))
      assert(g.parties.map(p => (p.role, p.name, p.email, p.url)) ==
        ((w \ "parties") match {
          case JArray(ps) => ps.map(p => (str(p \ "role"), str(p \ "name"),
            str(p \ "email"), str(p \ "url")))
          case _ => Seq.empty
        }))
      assert(g.dependencies.map(d => (d.purl, d.is_pinned)) ==
        ((w \ "dependencies") match {
          case JArray(ds) => ds.map(d =>
            (str(d \ "purl").get, (d \ "is_pinned") == JBool(true)))
          case _ => Seq.empty
        }))
    }
  }

  test("nuget package-page html mapper matches the log4net golden") {
    // miners/test_nuget.py:95-107 vs nuget_mapper_log4net_expected.json
    val got = Mappers.nugetHtmlPackages(read("nuget/log4net.html"),
      "https://www.nuget.org/packages/log4net")
    val want = arr("nuget/nuget_mapper_log4net_expected.json")
    assert(got.size == want.size, s"${got.size} != ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.name == str(w \ "name").get)
      assert(g.row.version == str(w \ "version"))
      assert(g.row.description == str(w \ "description"))
      assert(g.row.download_url == str(w \ "download_url").get)
      assert(g.row.homepage_url == str(w \ "homepage_url"))
      assert(g.row.copyright == str(w \ "copyright"))
      assert(g.row.declared_license_expression ==
        str(w \ "extracted_license_statement"))
    }
  }

  test("bower mapper matches both reference goldens") {
    // miners/test_bower.py:48-75
    def checkOne(input: String, expectedPath: String): Unit = {
      val got = Mappers.bowerPackages(read(input), "http://t")
      val want = arr(expectedPath)
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) =>
        assert(g.row.name == str(w \ "name").get)
        assert(g.row.version == str(w \ "version"))
        assert(g.row.description == str(w \ "description"))
        assert(g.row.homepage_url == str(w \ "homepage_url"))
        assert(g.row.declared_license_expression ==
          str(w \ "extracted_license_statement"))
        assert(g.vcsUrl == str(w \ "vcs_url"))
        assert(g.row.keywords == ((w \ "keywords") match {
          case JArray(ks) => ks.flatMap(str); case _ => Seq.empty
        }))
        assert(g.parties.map(p => (p.role, p.name)) ==
          ((w \ "parties") match {
            case JArray(ps) => ps.map(p => (str(p \ "role"), str(p \ "name")))
            case _          => Seq.empty
          }))
        // bare bower dependency names are not purls — dropped on both
        // sides (the goldens record empty dependency lists)
        assert(g.dependencies.isEmpty)
        assert(Seq(JArray(Nil), JNothing, JNull).contains(w \ "dependencies"))
      }
    }
    checkOne("bower/28msec_bower.json", "bower/expected_28msec_bower.json")
    checkOne("bower/example1_bower.json",
      "bower/expected_mapper_example1_bower.json")
  }

  test("cpan meta-file mapper matches the yaml and json goldens") {
    // miners/test_cpan.py:99-121
    def checkOne(input: String, uri: String, expectedPath: String): Unit = {
      val got = Mappers.cpanMetaPackages(read(input), uri)
      val want = arr(expectedPath)
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) =>
        assert(g.row.name == str(w \ "name").get)
        assert(g.row.version == str(w \ "version"))
        assert(g.row.description == str(w \ "description"))
        assert(g.row.download_url == str(w \ "download_url").get, input)
        assert(g.vcsUrl == str(w \ "vcs_url"))
        assert(g.row.declared_license_expression ==
          str(w \ "extracted_license_statement"))
        assert(g.row.keywords == ((w \ "keywords") match {
          case JArray(ks) => ks.flatMap(str); case _ => Seq.empty
        }))
        assert(g.parties.map(p => (p.name, p.email)) ==
          ((w \ "parties") match {
            case JArray(ps) => ps.map(p =>
              (str(p \ "name"), str(p \ "email")))
            case _ => Seq.empty
          }))
      }
    }
    checkOne("cpan/variable-2009110702.meta",
      "http://www.cpan.org/authors/id/A/AB/ABIGAIL/variable-2009110702.metadata",
      "cpan/expected_yaml_cpanmapper.json")
    checkOne("cpan/Regexp-Common-2016010701.meta",
      "http://www.cpan.org/authors/id/A/AB/ABIGAIL/Regexp-Common-2016010701.metadata",
      "cpan/expected_json_cpanmapper.json")
  }

  test("cpan readme mapper matches both reference goldens") {
    // miners/test_cpan.py:123-155 — readme → sections → package
    def checkOne(input: String, uri: String, expectedPath: String): Unit = {
      val sections = graft.miners.MoreVisitors.cpanReadmeSections(read(input))
      val got = Mappers.cpanReadmePackages(sections, uri)
      val want = arr(expectedPath)
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) =>
        assert(g.row.name == str(w \ "name").get)
        assert(g.row.version == str(w \ "version"))
        assert(g.row.description == str(w \ "description"))
        assert(g.row.download_url == str(w \ "download_url").get)
        assert(g.vcsUrl == str(w \ "vcs_url"))
        // the reference iterates the AUTHOR string char-by-char, so
        // parties are '<'-count empty entries — asserted exactly
        assert(g.parties.map(p => (p.name, p.email)) ==
          ((w \ "parties") match {
            case JArray(ps) => ps.map(p =>
              (str(p \ "name"), str(p \ "email")))
            case _ => Seq.empty
          }))
      }
    }
    checkOne("cpan/Mojolicious-Plugin-Nour-Config-0.09.readme",
      "http://www.cpan.org/authors/id/A/AM/AMIRITE/Mojolicious-Plugin-Nour-Config-0.09.readme",
      "cpan/expected_json_readmefile_cpanmapper.json")
    checkOne("cpan/Algorithm-Graphs-TransitiveClosure-2009110901.readme",
      "http://www.cpan.org/authors/id/A/AB/ABIGAIL/Algorithm-Graphs-TransitiveClosure-2009110901.readme",
      "cpan/expected_json_readmefile_cpanmapper2.json")
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
