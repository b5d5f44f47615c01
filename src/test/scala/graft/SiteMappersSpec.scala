package graft

import graft.miners.Mappers
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the hosting-site package mappers — Eclipse,
  * F-Droid, SourceForge, Apache, Docker Hub, GitLab, OpenSSL, and
  * Bitbucket — against the reference's own expected fixtures.
  */
class SiteMappersSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/minecode/tests/testfiles"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$path")), "UTF-8")

  private def jstr(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s); case _ => None
  }

  private def jarr(path: String): List[JValue] =
    JsonMethods.parse(read(path)).asInstanceOf[JArray].arr

  private def checkCommon(g: Mappers.MappedPackage, w: JValue,
      tag: String): Unit = {
    assert(g.row.name == jstr(w \ "name").get, tag)
    assert(g.row.version == jstr(w \ "version"), tag)
    assert(g.row.description == jstr(w \ "description"), tag)
    assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""), tag)
    assert(g.row.homepage_url == jstr(w \ "homepage_url"), tag)
    assert(g.row.declared_license_expression ==
      jstr(w \ "extracted_license_statement"), tag)
    assert(g.bugTrackingUrl == jstr(w \ "bug_tracking_url"), tag)
  }

  test("eclipse json mapper matches the birt expected packages") {
    val got = Mappers.eclipseJsonPackages(read("eclipse/birt.json"))
    val want = jarr("eclipse/eclipse_birt_expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) => checkCommon(g, w, "birt") }
  }

  test("eclipse html mapper matches the Acceleo expected packages") {
    val got = Mappers.eclipseHtmlPackages(
      read("eclipse/Acceleo_projects.eclipse.org.html"))
    val want = jarr("eclipse/Acceleo_projects_expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) => checkCommon(g, w, "acceleo") }
  }

  test("fdroid mapper matches the index-v2 expected packages") {
    val visited = jarr("fdroid/index-v2-visited.json")
    val got = visited.flatMap { u =>
      (jstr(u \ "package_url"), jstr(u \ "data")) match {
        case (Some(purl), Some(data)) => Mappers.fdroidPackages(purl, data)
        case _                        => Seq.empty
      }
    }
    val want = jarr("fdroid/index-v2-visited-expected-mapped.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      val tag = s"fdroid ${g.row.name}@${g.row.version}"
      checkCommon(g, w, tag)
      assert(g.row.sha256 == jstr(w \ "sha256"), tag)
      assert(g.row.size == ((w \ "size") match {
        case JInt(n) => Some(n.toLong); case _ => None
      }), tag)
      assert(g.vcsUrl == jstr(w \ "vcs_url"), tag)
      assert(g.row.keywords == ((w \ "keywords") match {
        case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
      }), tag)
      assert(g.sourcePackages == ((w \ "source_packages") match {
        case JArray(ss) => ss.flatMap(jstr); case _ => Seq.empty
      }), tag)
      assert(g.parties.map(p => (p.name, p.email, p.url)) ==
        ((w \ "parties") match {
          case JArray(ps) => ps.map(p =>
            (jstr(p \ "name"), jstr(p \ "email"), jstr(p \ "url")))
          case _ => Seq.empty
        }), tag)
    }
  }

  test("sourceforge mapper matches four expected project fixtures") {
    Seq("odanur" -> "mapper_odanur_expected.json",
      "openstunts" -> "mapper_openstunts_expected.json",
      "monoql" -> "mapper_omonoql_expected.json",
      "niftyphp" -> "mapper_niftyphp_expected.json").foreach {
      case (input, expectedPath) =>
        val g = Mappers.sourceforgePackage(
          read(s"sourceforge/$input.json")).get
        val w = jarr(s"sourceforge/$expectedPath").head
        checkCommon(g, w, input)
        assert(g.row.primary_language == jstr(w \ "primary_language"), input)
        assert(g.row.keywords == ((w \ "keywords") match {
          case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
        }), input)
        assert(g.parties.map(p => (p.name, p.url)) == ((w \ "parties") match {
          case JArray(ps) => ps.map(p => (jstr(p \ "name"), jstr(p \ "url")))
          case _          => Seq.empty
        }), input)
    }
  }

  test("apache download mapper matches both expected fixtures") {
    val g1 = Mappers.apacheDownloadPackage(
      "http://archive.apache.org/dist/groovy/2.4.6/sources/apache-groovy-src-2.4.6.zip",
      "pkg:apache/groovy@2.4.6").get
    val w1 = JsonMethods.parse(read("apache/map-groovy_expected.json"))
    checkCommon(g1, w1, "groovy")
    val g2 = Mappers.apacheDownloadPackage(
      "http://archive.apache.org/dist/turbine/maven/turbine-webapp-2.3.3-1.0.0-source-release.zip",
      "pkg:apache/turbine-webapp@2.3.3-1.0.0-source-release").get
    val w2 = JsonMethods.parse(read("apache/map-turbine-webapp_expected.json"))
    checkCommon(g2, w2, "turbine")
  }

  test("apache projects mapper matches the expected packages") {
    val got = Mappers.apacheProjectsPackages(read("apache/projects.json"))
    val want = jarr("apache/projects_expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      val tag = s"apache ${g.row.name}@${g.row.version}"
      checkCommon(g, w, tag)
      assert(g.row.primary_language == jstr(w \ "primary_language"), tag)
      assert(g.codeViewUrl == jstr(w \ "code_view_url"), tag)
      assert(g.row.keywords == ((w \ "keywords") match {
        case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
      }), tag)
      assert(g.row.release_date.map(_.toString.take(10)) ==
        jstr(w \ "release_date").map(_.take(10)), tag)
      assert(g.parties.map(p => (p.name, p.email)) == ((w \ "parties") match {
        case JArray(ps) => ps.map(p => (jstr(p \ "name"), jstr(p \ "email")))
        case _          => Seq.empty
      }), tag)
    }
  }

  test("apache podling mapper matches the amaterasu fixture") {
    val g = Mappers.apachePodlingPackage(
      read("apache/podling_amaterasu.json")).get
    val w = jarr("apache/podling_amaterasu_expected.json").head
    checkCommon(g, w, "amaterasu")
  }

  test("dockerhub json mapper matches the elixir fixture") {
    val g = Mappers.dockerhubJsonPackage(read("dockerhub/elixir.json")).get
    val w = jarr("dockerhub/expected_dockerhubmapper.json").head
    checkCommon(g, w, "elixir")
  }

  test("gitlab project mapper matches the microservice fixture") {
    val g = Mappers.gitlabProjectPackage(
      read("gitlab/microservice-express-mongo.json")).get
    val w = jarr("gitlab/microservice-express-mongo_expected.json").head
    checkCommon(g, w, "gitlab")
    assert(g.vcsUrl == jstr(w \ "vcs_url"))
    assert(g.codeViewUrl == jstr(w \ "code_view_url"))
    assert(g.row.release_date.map(_.toString.take(10)) ==
      jstr(w \ "release_date").map(_.take(10)))
  }

  test("openssl mapper matches the snapshot fixture") {
    val g = Mappers.opensslPackage(
      "https://ftp.openssl.org/snapshot/openssl-1.0.2-stable-SNAP-20180518.tar.gz",
      Some(527L),
      Some(java.sql.Timestamp.valueOf("2014-11-19 17:49:00")))
    val w = jarr("openssl/openssl_mapper_expected.json").head
    checkCommon(g, w, "openssl")
    assert(g.row.version == jstr(w \ "version"))
    assert(g.row.size == Some(527L))
    assert(g.vcsUrl == jstr(w \ "vcs_url"))
    assert(g.codeViewUrl == jstr(w \ "code_view_url"))
    assert(g.row.copyright == jstr(w \ "copyright"))
  }

  test("bitbucket repo and download mappers match the map fixtures") {
    val g1 = Mappers.bitbucketRepoPackage(read("bitbucket/map/repository.json"),
      "pkg:bitbucket/bastiand/mercurialeclipse").get
    val w1 = JsonMethods.parse(read("bitbucket/map/repository_expected.json"))
    checkCommon(g1, w1, "repo")
    assert(g1.vcsUrl == jstr(w1 \ "vcs_url"))
    assert(g1.codeViewUrl == jstr(w1 \ "code_view_url"))
    assert(g1.row.primary_language == jstr(w1 \ "primary_language"))
    assert(g1.parties.map(p => (p.name, p.url)) == ((w1 \ "parties") match {
      case JArray(ps) => ps.map(p => (jstr(p \ "name"), jstr(p \ "url")))
      case _          => Seq.empty
    }))

    val g2 = Mappers.bitbucketRepoPackage(read("bitbucket/map/tweakmsg.json"),
      "pkg:bitbucket/phlogistonjohn/tweakmsg").get
    val w2 = JsonMethods.parse(read("bitbucket/map/tweakmsg_expected.json"))
    checkCommon(g2, w2, "tweakmsg")

    def checkDownloads(input: String, purl: String, expectedPath: String): Unit = {
      // the reference maps the whole paginated payload as one record
      val got = Mappers.bitbucketDownloadPackage(
        JsonMethods.parse(read(input)), purl).toSeq
      val want = jarr(expectedPath)
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) =>
        assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""), input)
        assert(g.row.size == ((w \ "size") match {
          case JInt(n) => Some(n.toLong); case _ => None
        }), input)
        assert(g.row.name == jstr(w \ "name").get, input)
      }
    }
    checkDownloads("bitbucket/map/downloads.json",
      "pkg:bitbucket/bastiand/mercurialeclipse",
      "bitbucket/map/downloads_expected.json")
    checkDownloads("bitbucket/map/downloads_many.json",
      "pkg:bitbucket/pypa/setuptools",
      "bitbucket/map/downloads_many_expected.json")
  }
}
