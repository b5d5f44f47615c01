package graft

import graft.miners.DistroVisitors
import graft.miners.DistroVisitors._
import graft.miners.Mappers
import graft.sources.EcosystemParsers
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the distro / hosting-site miners (FreeBSD,
  * OpenWrt, gstreamer, freedesktop, Google Code, alpm) against the
  * reference's own `*_expected` fixtures.
  */
class DistroVisitorsSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/minecode/tests/testfiles"

  private def read(path: String): String =
    new String(bytes(path), "UTF-8")

  private def bytes(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$path"))

  private def jstr(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s); case _ => None
  }

  /** Expected-URI rows: (uri, package_url, data, file_name, size,
    * date, md5, sha1, sha256). */
  private def expected(path: String) =
    JsonMethods.parse(read(path)) match {
      case JArray(items) => items.map { it =>
        def str(f: String): Option[String] = jstr(it \ f)
        val size = (it \ "size") match {
          case JInt(n) => Some(n.toLong); case _ => None
        }
        (str("uri").get, str("package_url"), str("data"), str("file_name"),
          size, str("date"), str("md5"), str("sha1"), str("sha256"))
      }
      case _ => fail(s"unexpected fixture shape: $path")
    }

  private def check(
      got: Seq[graft.miners.RegistryVisitors.VisitedUri],
      want: Seq[(String, Option[String], Option[String], Option[String],
        Option[Long], Option[String], Option[String], Option[String],
        Option[String])]): Unit = {
    assert(got.size == want.size)
    got.zip(want).foreach {
      case (g, (uri, purl, data, fileName, size, date, md5, sha1, sha256)) =>
        assert(g.uri == uri)
        assert(g.packageUrl == purl, s"purl mismatch for $uri")
        (g.data, data) match {
          case (Some(a), Some(b)) =>
            assert(JsonMethods.parse(a) == JsonMethods.parse(b)
              || JString(a) == JsonMethods.parse(b),
              s"data mismatch for $uri")
          case (None, None)    =>
          case (a, b)          => fail(s"data presence mismatch for $uri: $a vs $b")
        }
        assert(g.fileName == fileName, s"file_name mismatch for $uri")
        assert(g.size == size, s"size mismatch for $uri")
        assert(g.date == date, s"date mismatch for $uri")
        assert(g.md5 == md5, s"md5 mismatch for $uri")
        assert(g.sha1 == sha1, s"sha1 mismatch for $uri")
        assert(g.sha256 == sha256, s"sha256 mismatch for $uri")
    }
  }

  // ------------------------------------------------------------- freebsd

  test("freebsd base visitor matches the reference's expected URIs") {
    check(
      freebsdBaseUris(read("freebsd/FreeBSD.org.html"),
        "https://pkg.freebsd.org"),
      expected("freebsd/FreeBSD.org.html_expected"))
  }

  test("freebsd sub-listing visitor matches the reference's expected URIs") {
    check(
      freebsdSubUris(read("freebsd/FreeBSD-10-i386_release_0_.html"),
        "https://pkg.freebsd.org/FreeBSD:10:i386/release_0/"),
      expected("freebsd/FreeBSD-10-i386_release_0_.html_expected"))
  }

  test("freebsd index mapper matches the reference's expected packages") {
    val got = Mappers.freebsdIndexPackages(read("freebsd/mapper_input1"))
    val want = JsonMethods.parse(
      read("freebsd/indexfile_expected_mapper.json")).asInstanceOf[JArray].arr
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.name == jstr(w \ "name").get)
      assert(g.row.version == jstr(w \ "version"))
      assert(g.row.download_url == jstr(w \ "download_url").get)
      assert(g.row.description == jstr(w \ "description"))
      assert(g.row.homepage_url == jstr(w \ "homepage_url"))
      assert(g.codeViewUrl == jstr(w \ "code_view_url"))
      assert(g.row.declared_license_expression ==
        jstr(w \ "extracted_license_statement"))
      val wantQuals = (w \ "qualifiers") match {
        case JObject(fs) => fs.collect { case (k, JString(v)) => s"$k=$v" }
          .sorted.mkString("&")
        case _ => ""
      }
      assert(g.row.qualifiers.getOrElse("") == wantQuals)
      val wantKeywords = (w \ "keywords") match {
        case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
      }
      assert(g.row.keywords == wantKeywords)
      val wantEmails = (w \ "parties") match {
        case JArray(ps) => ps.flatMap(p => jstr(p \ "email")); case _ => Seq.empty
      }
      assert(g.parties.flatMap(_.email) == wantEmails)
    }
  }

  // ------------------------------------------------------------- openwrt

  test("openwrt download-page visitor matches both expected fixtures") {
    check(
      openwrtDownloadPageUris(
        read("openwrt/Index_of_chaos_calmer_15.05_.html"),
        "https://downloads.openwrt.org/chaos_calmer/15.05/"),
      expected("openwrt/chaos_calmer_15.05_expected"))
    check(
      openwrtDownloadPageUris(
        read("openwrt/Index_of_chaos_calmer_15.05_adm5120_rb1xx_packages_base_.html"),
        "https://downloads.openwrt.org/chaos_calmer/15.05/adm5120/rb1xx/packages/base/"),
      expected("openwrt/chaos_calmer_15.05_expected_2"))
  }

  test("openwrt Packages.gz visitor matches the reference's expected URIs") {
    val got = openwrtPackagesGzUris(bytes("openwrt/Packages.gz"),
      "https://downloads.openwrt.org/chaos_calmer/15.05/adm5120/rb1xx/packages/base/Packages.gz")
    val want = expected("openwrt/Packages_gz_expected")
    // the reference's checked-in expected fixture covers only the first
    // 53 paragraphs of its own 1005-paragraph Packages.gz (stale
    // fixture); golden-match that prefix and sanity-check the rest
    assert(got.size == 1005)
    check(got.take(want.size), want)
  }

  test("openwrt ipk control extraction matches the reference's expected fields") {
    def checkIpk(ipk: String, expectedPath: String): Seq[(String, String)] = {
      val control = EcosystemParsers.ipkControl(bytes(ipk))
        .getOrElse(fail(s"no control in $ipk"))
      val want = JsonMethods.parse(read(expectedPath)) match {
        case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
        case _           => fail(s"unexpected shape: $expectedPath")
      }
      assert(control.toMap == want)
      control
    }
    val control = checkIpk("openwrt/6to4_12-2_all.ipk",
      "openwrt/6to4_12-2_all_ipk_expected")
    checkIpk("openwrt/wpa-cli_0.5.7-1_mipsel.ipk",
      "openwrt/wpa-cli_0.5.7-1_mipsel.ipk_expected")

    // and the ipk mapper against its expected package
    val g = Mappers.openwrtIpkPackage(control,
      "https://downloads.openwrt.org/chaos_calmer/15.05/adm5120/rb1xx/packages/base/6to4_12-2_all.ipk").get
    val w = JsonMethods.parse(
      read("openwrt/6to4_12-2_all_ipk_expected_mapper.json"))
      .asInstanceOf[JArray].arr.head
    assert(g.row.name == jstr(w \ "name").get)
    assert(g.row.version == jstr(w \ "version"))
    assert(g.row.description == jstr(w \ "description"))
    assert(g.row.size.map(_.toInt) == ((w \ "size") match {
      case JInt(n) => Some(n.toInt); case _ => None
    }))
    assert(g.row.declared_license_expression == jstr(w \ "declared_license"))
    assert(g.row.keywords == ((w \ "keywords") match {
      case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
    }))
    assert(g.parties.map(p => (p.name, p.email)) == ((w \ "parties") match {
      case JArray(ps) => ps.map(p => (jstr(p \ "name"), jstr(p \ "email")))
      case _          => Seq.empty
    }))
    assert(g.dependencies.map(_.purl) == ((w \ "dependencies") match {
      case JArray(ds) => ds.flatMap(d => jstr(d \ "purl")); case _ => Seq.empty
    }))

    // wpa-cli mapper golden (miners/test_openwrt.py:93-102)
    val wpaControl = EcosystemParsers.ipkControl(
      bytes("openwrt/wpa-cli_0.5.7-1_mipsel.ipk"))
      .getOrElse(fail("no control in wpa-cli ipk"))
    val g2 = Mappers.openwrtIpkPackage(wpaControl,
      "https://downloads.openwrt.org/chaos_calmer/15.05/adm5120/rb1xx/packages/base/wpa-cli_0.5.7-1_mipsel.ipk").get
    val w2 = JsonMethods.parse(
      read("openwrt/wpa-cli_0.5.7-1_mipsel.ipk_expected_mapper.json"))
      .asInstanceOf[JArray].arr.head
    assert(g2.row.name == jstr(w2 \ "name").get)
    assert(g2.row.version == jstr(w2 \ "version"))
    assert(g2.row.description == jstr(w2 \ "description"))
    assert(g2.row.keywords == ((w2 \ "keywords") match {
      case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
    }))
    assert(g2.parties.map(p => (p.name, p.email)) == ((w2 \ "parties") match {
      case JArray(ps) => ps.map(p => (jstr(p \ "name"), jstr(p \ "email")))
      case _          => Seq.empty
    }))
    assert(g2.dependencies.map(_.purl) == ((w2 \ "dependencies") match {
      case JArray(ds) => ds.flatMap(d => jstr(d \ "purl")); case _ => Seq.empty
    }))
  }

  // ----------------------------------------------------------- gstreamer

  test("gstreamer src visitors match the reference's expected URIs") {
    check(
      gstreamerSrcUris(read("gstreamer/src_root.html"),
        "https://gstreamer.freedesktop.org/src/"),
      expected("gstreamer/src_root.html-expected"))
    check(
      gstreamerSrcUris(read("gstreamer/src_gst-openmax_pre.html"),
        "https://gstreamer.freedesktop.org/src/gst-openmax/pre/"),
      expected("gstreamer/src_gst-openmax_pre.html-expected"))
  }

  test("gstreamer url mapper matches the reference's expected package") {
    val g = Mappers.gstreamerUrlPackage(
      "https://gstreamer.freedesktop.org/src/gst-openmax/pre/gst-openmax-0.10.0.2.tar.bz2").get
    val w = JsonMethods.parse(
      read("gstreamer/mapper_build_from_url-expected"))
      .asInstanceOf[JArray].arr.head
    assert(g.row.name == jstr(w \ "name").get)
    assert(g.row.version == jstr(w \ "version"))
    assert(g.row.download_url == jstr(w \ "download_url").get)
    assert(g.row.homepage_url == jstr(w \ "homepage_url"))
  }

  // --------------------------------------------------------- freedesktop

  test("freedesktop software visitor matches the reference's expected URIs") {
    check(
      freedesktopSoftwareUris(read("freedesktop/Software.html"),
        "https://www.freedesktop.org/wiki/Software"),
      expected("freedesktop/freedesktop_software_expected"))
  }

  test("freedesktop project mapper matches hal and libinput expected") {
    def checkOne(html: String, uri: String, purl: String,
        expectedPath: String): Unit = {
      val g = Mappers.freedesktopProject(read(html), uri, purl).get
      val w = JsonMethods.parse(read(expectedPath)).asInstanceOf[JArray].arr.head
      assert(g.row.name == jstr(w \ "name").get)
      assert(g.row.description == jstr(w \ "description"))
      assert(g.row.homepage_url == jstr(w \ "homepage_url"))
      assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""))
      assert(g.bugTrackingUrl == jstr(w \ "bug_tracking_url"))
      assert(g.codeViewUrl == jstr(w \ "code_view_url"))
      assert(g.vcsUrl == jstr(w \ "vcs_url"))
    }
    checkOne("freedesktop/hal.html",
      "https://www.freedesktop.org/wiki/Software/hal",
      "pkg:freedesktop/hal", "freedesktop/hal_project_expected.json")
    checkOne("freedesktop/libinput.html",
      "https://www.freedesktop.org/wiki/Software/libinput/",
      "pkg:freedesktop/libinput",
      "freedesktop/libinput_project_expected.json")
  }

  // ---------------------------------------------------------- googlecode

  test("googlecode archive-zip visitor matches the reference's expected URIs") {
    check(
      googlecodeArchiveZipUris(bytes("googlecode/google-code-archive.txt.zip"),
        "https://storage.googleapis.com/google-code-archive/google-code-archive.txt.zip"),
      expected("googlecode/expected_google-code-archive.txt.zip.json"))
  }

  test("googlecode project-page visitors match both expected pages") {
    check(
      googlecodeProjectPageUris(
        read("googlecode/v2_api/GoogleCodeProjectHosting.htm"),
        "https://code.google.com/archive/search?q=domain:code.google.com"),
      expected("googlecode/v2_api/expected_googleprojects.json"))
    check(
      googlecodeProjectPageUris(
        read("googlecode/v2_api/GoogleCodeProjectHosting_page2.htm"),
        "https://code.google.com/archive/search?q=domain:code.google.com&page=2"),
      expected("googlecode/v2_api/expected_googleproject_page2.json"))
  }

  test("googlecode project json visitor yields the first downloads page") {
    assert(googlecodeProjectJsonUris(
      "https://storage.googleapis.com/google-code-archive/v2/code.google.com/hg4j/project.json")
      .map(_.uri) == Seq(
      "https://storage.googleapis.com/google-code-archive/v2/code.google.com/hg4j/downloads-page-1.json"))
  }

  test("googlecode downloads-page visitor matches the reference's expected URIs") {
    check(
      googlecodeDownloadsPageUris(
        read("googlecode/v2_api/downloads-page-1.json"),
        "https://storage.googleapis.com/google-code-archive/v2/code.google.com/hg4j/downloads-page-1.json"),
      expected("googlecode/v2_api/hg4j_download_expected.json"))
  }

  test("googlecode v2 project mapper matches the expected package") {
    val g = Mappers.googlecodeProjectV2(
      read("googlecode/v2_api/project.json")).get
    val w = JsonMethods.parse(
      read("googlecode/v2_api/package_expected_project.json"))
      .asInstanceOf[JArray].arr.head
    assert(g.row.name == jstr(w \ "name").get)
    assert(g.row.description == jstr(w \ "description"))
    assert(g.row.declared_license_expression ==
      jstr(w \ "extracted_license_statement"))
    assert(g.row.keywords == ((w \ "keywords") match {
      case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
    }))
  }

  test("googlecode v1 project mapper matches the expected package") {
    val g = Mappers.googlecodeProjectV1(
      read("googlecode/v2_apache-extras.org_124799961-qian_project.json")).get
    val w = JsonMethods.parse(
      read("googlecode/mapper_expected_v2_apache-extras.org_124799961-qian_project.json"))
      .asInstanceOf[JArray].arr.head
    assert(g.row.name == jstr(w \ "name").get)
    assert(g.row.namespace == jstr(w \ "namespace"))
    assert(g.row.description == jstr(w \ "description"))
    assert(g.row.declared_license_expression ==
      jstr(w \ "extracted_license_statement"))
    assert(g.vcsUrl == jstr(w \ "vcs_url"))
  }

  // ---------------------------------------------------------------- alpm

  test("alpm mapper matches the reference's expected bemenu package") {
    val g = Mappers.alpmPackage(
      read("alpm/bemenu-ncurses/.PKGINFO"),
      read("alpm/bemenu-ncurses/.BUILDINFO"),
      "pkg:alpm/bemenu-ncurses@0.6.13-1?arch=x86_64",
      "https://archive.archlinux.org/packages/b/bemenu-ncurses/bemenu-ncurses-0.6.13-1-x86_64.pkg.tar.zst").get
    val w = JsonMethods.parse(read("alpm/bemenu_ncurses_expected.json"))
      .asInstanceOf[JArray].arr.head
    assert(g.row.name == jstr(w \ "name").get)
    assert(g.row.version.contains("0.6.13-1"))
    assert(g.row.description == jstr(w \ "description"))
    assert(g.row.download_url == jstr(w \ "download_url").get)
    assert(g.row.size == Some(22200L))
    assert(g.row.sha256 == jstr(w \ "sha256"))
    // PackageRow has a single homepage slot; the reference stores the
    // .PKGINFO url as repository_homepage_url
    assert(g.row.homepage_url == jstr(w \ "repository_homepage_url"))
    assert(g.row.declared_license_expression ==
      jstr(w \ "extracted_license_statement"))
    assert(g.row.qualifiers.contains("arch=x86_64"))
    assert(g.parties.map(p => (p.name, p.email)) == Seq(
      (Some("Ivy Foster"), Some("iff@archlinux.org"))))
    assert(g.dependencies.map(_.purl) == ((w \ "dependencies") match {
      case JArray(ds) => ds.flatMap(d => jstr(d \ "purl")); case _ => Seq.empty
    }))
  }

  test("dockerhub search conditions and seeds match the goldens") {
    // miners/test_dockerhub.py:29-38
    val wantConds = (JsonMethods.parse(read("dockerhub/conditions_expected"))
      : @unchecked) match { case JArray(cs) => cs.flatMap(jstr) }
    assert(DistroVisitors.dockerhubSearchConditions == wantConds)
    val wantSeeds = (JsonMethods.parse(read("dockerhub/seeds_expected"))
      : @unchecked) match { case JArray(ss) => ss.flatMap(jstr) }
    assert(DistroVisitors.dockerhubSeeds == wantSeeds)
  }

  test("dockerhub explore-page visitor matches the expected URIs") {
    check(
      DistroVisitors.dockerhubExplorePageUris(
        read("dockerhub/Explore_DockerHub_Page1.html"),
        "https://hub.docker.com/explore/?page=1"),
      expected("dockerhub/visitor_explore_page1_expected"))
  }

  test("dockerhub search-api visitor matches the expected URIs") {
    check(
      DistroVisitors.dockerhubSearchUris(read("dockerhub/search.json"),
        "https://index.docker.io/v1/search?q=1a&n=100&page=2"),
      expected("dockerhub/visitor_search_expected"))
  }

  test("dockerhub project-page metadata matches the elixir golden") {
    val got = DistroVisitors.dockerhubProjectMeta(
      read("dockerhub/library_elixir.html"))
    val want = (JsonMethods.parse(
      read("dockerhub/visitor_library_elixir_expected")): @unchecked) match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> v
      }.toMap
    }
    assert(got == want)
  }
}
