package graft

import graft.miners.Mappers
import graft.sources.EcosystemParsers
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the registry package mappers — RubyGems (API v1,
  * API v2, and the YAML `metadata` inside real `.gem` archives),
  * crates.io, Alpine APKINDEX, and MetaCPAN release search — against
  * the reference's own expected-package fixtures.
  */
class RegistryMappersSpec extends AnyFunSuite {

  private val dir = "/root/reference/minecode/tests/testfiles/rubygems"

  private def bytes(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$path"))

  private def read(path: String): String = new String(bytes(path), "UTF-8")

  private def jstr(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s); case _ => None
  }

  private def checkPackage(g: Mappers.MappedPackage, w: JValue): Unit = {
    assert(g.row.name == jstr(w \ "name").get)
    assert(g.row.version == jstr(w \ "version"), s"version of ${g.row.name}")
    assert(g.row.description == jstr(w \ "description"),
      s"description of ${g.row.name}@${g.row.version}")
    assert(g.row.homepage_url == jstr(w \ "homepage_url"))
    assert(g.row.sha256 == jstr(w \ "sha256"))
    assert(g.row.declared_license_expression ==
      jstr(w \ "extracted_license_statement"))
    assert(g.parties.map(_.name.getOrElse("")) == ((w \ "parties") match {
      case JArray(ps) => ps.flatMap(p => jstr(p \ "name")); case _ => Seq.empty
    }))
    // release_date compares on the date part (fixtures store either a
    // bare date or a full instant)
    val wantDate = jstr(w \ "release_date").map(_.take(10))
    assert(g.row.release_date.map(_.toString.take(10)) == wantDate,
      s"release_date of ${g.row.name}@${g.row.version}")
    val wantDeps = (w \ "dependencies") match {
      case JArray(ds) => ds.map(d => (jstr(d \ "purl").get,
        jstr(d \ "extracted_requirement"), jstr(d \ "scope")))
      case _ => Seq.empty
    }
    assert(g.dependencies.map(d =>
      (d.purl, d.extracted_requirement, d.scope)) == wantDeps,
      s"dependencies of ${g.row.name}@${g.row.version}")
  }

  private def checkMetadataGem(gemFile: String, expectedPath: String,
      extract: Boolean = true): Unit = {
    val metadata =
      if (extract) EcosystemParsers.gemMetadataText(bytes(gemFile))
        .getOrElse(fail(s"no metadata.gz in $gemFile"))
      else read(gemFile)
    val downloadUrl = "https://rubygems.org/downloads/" +
      gemFile.replace(".metadata", "")
    val g = Mappers.gemMetadataPackage(metadata, Some(downloadUrl)).get
    val w = JsonMethods.parse(read(expectedPath)).asInstanceOf[JArray].arr.head
    assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""))
    checkPackage(g, w)
  }

  test("gem metadata mapper matches all reference package fixtures") {
    checkMetadataGem("0mq-0.4.1.gem.metadata", "0mq-0.4.1.gem.package.json",
      extract = false)
    Seq(
      "a_okay-0.1.0.gem",
      "archive-tar-minitar-0.5.2.gem",
      "blankslate-3.1.3.gem",
      "m2r-2.1.0.gem",
      "mysmallidea-address_standardization-0.4.1.gem",
      "mysmallidea-mad_mimi_mailer-0.0.9.gem",
      "ng-rails-csrf-0.1.0.gem",
      "small-0.2.gem",
      "small_wonder-0.1.10.gem",
      "sprockets-vendor_gems-0.1.3.gem"
    ).foreach { gem =>
      checkMetadataGem(gem, s"$gem.package.json")
    }
  }

  test("gem versions API v1 mapper matches all reference fixtures") {
    Seq(
      ("apiv1/0xffffff.api.json", "0xffffff", "apiv1/0xffffff.api.package.json"),
      ("apiv1/zuck.api.json", "zuck", "apiv1/zuck.api.package.json"),
      ("apiv1/a1630ty_a1630ty.api.json", "a1630ty_a1630ty",
        "apiv1/a1630ty_a1630ty.api.package.json"),
      ("apiv1/action_tracker.api.json", "action_tracker",
        "apiv1/action_tracker.api.package.json")
    ).foreach { case (input, name, expectedPath) =>
      val got = Mappers.gemApiPackages(read(input), name)
      val want = JsonMethods.parse(read(expectedPath))
        .asInstanceOf[JArray].arr
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) => checkPackage(g, w) }
    }
  }

  test("pypi mapper matches the reference's expected packages across fixtures") {
    val pypiDir = "/root/reference/minecode/tests/testfiles/pypi"
    def readP(p: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$pypiDir/$p")), "UTF-8")
    def checkAll(input: String, expectedPath: String): Unit = {
      val got = Mappers.pypiPackages(readP(input))
      val want = JsonMethods.parse(readP(expectedPath))
        .asInstanceOf[JArray].arr
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) =>
        val tag = s"$input ${g.row.download_url}"
        assert(g.row.name == jstr(w \ "name").get, tag)
        assert(g.row.version == jstr(w \ "version"), tag)
        assert(g.row.description == jstr(w \ "description"), tag)
        assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""), tag)
        assert(g.row.homepage_url == jstr(w \ "homepage_url"), tag)
        assert(g.row.md5 == jstr(w \ "md5"), tag)
        assert(g.row.sha256 == jstr(w \ "sha256"), tag)
        assert(g.row.size == ((w \ "size") match {
          case JInt(n) => Some(n.toLong); case _ => None
        }), tag)
        assert(g.row.release_date.map(_.toString.take(10)) ==
          jstr(w \ "release_date").map(_.take(10)), tag)
        assert(g.row.declared_license_expression ==
          jstr(w \ "extracted_license_statement"), tag)
        assert(g.row.keywords == ((w \ "keywords") match {
          case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
        }), tag)
        assert(g.parties.map(p => (p.role, p.name, p.email)) ==
          ((w \ "parties") match {
            case JArray(ps) => ps.map(p =>
              (jstr(p \ "role"), jstr(p \ "name"), jstr(p \ "email")))
            case _ => Seq.empty
          }), tag)
      }
    }
    checkAll("lxml-3.2.0.json", "expected-lxml-3.2.0.json")
    checkAll("boolean.py-2.0.dev3.json", "expected-boolean.py-2.0.dev3.json")
    checkAll("cage_1.1.3.json", "expected-CAGE-1.1.3.json")
    checkAll("cage_1.1.2.json", "expected-CAGE-1.1.2.json")

    // the map-stage golden (miners/test_pypi.py:190-199): the release
    // JSON arrives as a ResourceURI `data` payload
    val resUri = JsonMethods.parse(readP("map/3to2-1.1.1.json"))
    val data = jstr(resUri \ "data").get
    val got = Mappers.pypiPackages(data)
    val want = JsonMethods.parse(readP("map/expected-3to2-1.1.1.json"))
      .asInstanceOf[JArray].arr
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.row.name == jstr(w \ "name").get)
      assert(g.row.version == jstr(w \ "version"))
      assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""))
      assert(g.row.md5 == jstr(w \ "md5"))
    }
  }

  private val npmDir = "/root/reference/minecode/tests/testfiles/npm"
  private def readN(p: String) = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get(s"$npmDir/$p")), "UTF-8")

  /** Compare npm build_packages output to an expected-packages golden. */
  private def checkNpmPackages(got: Seq[Mappers.MappedPackage],
      want: Seq[JValue], input: String): Unit = {
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) =>
        val tag = s"$input ${g.row.name}@${g.row.version}"
        assert(g.row.name == jstr(w \ "name").get, tag)
        assert(g.row.version == jstr(w \ "version"), tag)
        assert(g.row.description == jstr(w \ "description"), tag)
        assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""), tag)
        assert(g.row.homepage_url == jstr(w \ "homepage_url"), tag)
        assert(g.row.sha1 == jstr(w \ "sha1"), tag)
        assert(g.row.declared_license_expression ==
          jstr(w \ "extracted_license_statement"), tag)
        assert(g.vcsUrl == jstr(w \ "vcs_url"), tag)
        assert(g.bugTrackingUrl == jstr(w \ "bug_tracking_url"), tag)
        assert(g.row.keywords == ((w \ "keywords") match {
          case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
        }), tag)
        assert(g.parties.map(p => (p.role, p.name, p.email)) ==
          ((w \ "parties") match {
            case JArray(ps) => ps.map(p =>
              (jstr(p \ "role"), jstr(p \ "name"), jstr(p \ "email")))
            case _ => Seq.empty
          }), tag)
        assert(g.dependencies.map(d =>
          (d.purl, d.extracted_requirement, d.scope, d.is_runtime,
            d.is_optional)) ==
          ((w \ "dependencies") match {
            case JArray(ds) => ds.map(d => (jstr(d \ "purl").get,
              jstr(d \ "extracted_requirement"), jstr(d \ "scope"),
              (d \ "is_runtime") == JBool(true),
              (d \ "is_optional") == JBool(true)))
            case _ => Seq.empty
          }), tag)
      }
  }

  test("npm mapper matches the reference's expected packages across fixtures") {
    def checkAll(input: String, expectedPath: String): Unit =
      checkNpmPackages(Mappers.npmVersionPackages(readN(input)),
        JsonMethods.parse(readN(expectedPath)).asInstanceOf[JArray].arr,
        input)
    checkAll("0flux.json", "0flux_npm_expected.json")
    checkAll("2112.json", "npm_2112_expected.json")
    checkAll("microdata.json", "microdata-node_expected.json")
    checkAll("jsonp-filter.json", "jsonp-filter-expected.json")
    checkAll("mapper/index.json", "mapper/index.expected.json")
  }

  test("npm visitor-fed records map to the reference's goldens") {
    // test_npm.py:111-145 — records picked out of the _changes
    // visitor output (index 0 is the next-changes URI on both sides),
    // built into packages and compared to the checked-in goldens: the
    // problem packages of tickets 439 (angular2-autosize) and 440
    // (npm-research). (The 1000_records.json input behind the
    // 29/554_record goldens is not checked in to the reference.)
    def checkRecord(changes: String, count: Int, index: Int,
        expectedPath: String): Unit = {
      val uris = graft.miners.RegistryVisitors
        .npmRegistryUris(readN(changes), "http://t").toOption.get
      assert(uris.size == count, changes)
      val got = Mappers.npmVersionPackages(uris(index).data.get)
      checkNpmPackages(got,
        JsonMethods.parse(readN(expectedPath)).asInstanceOf[JArray].arr,
        s"$changes[$index]")
    }
    checkRecord("ticket_439.json", 11, 1, "expected_ticket_439.json")
    checkRecord("ticket_440_records.json", 11, 1, "expected_ticket_440.json")
  }

  test("cpan release-search mapper matches both reference fixtures") {
    val cpanDir = "/root/reference/minecode/tests/testfiles/cpan"
    def readP(p: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$cpanDir/$p")), "UTF-8")
    def checkAll(input: String, expectedPath: String): Unit = {
      val got = Mappers.cpanReleaseSearchPackages(readP(input))
      val want = JsonMethods.parse(readP(expectedPath))
        .asInstanceOf[JArray].arr
      assert(got.size == want.size, input)
      got.zip(want).foreach { case (g, w) =>
        assert(g.row.name == jstr(w \ "name").get)
        assert(g.row.version == jstr(w \ "version"))
        assert(g.row.description == jstr(w \ "description"))
        assert(g.row.download_url == jstr(w \ "download_url").getOrElse(""))
        assert(g.row.homepage_url == jstr(w \ "homepage_url"))
        assert(g.row.declared_license_expression ==
          jstr(w \ "extracted_license_statement"))
        assert(g.vcsUrl == jstr(w \ "vcs_url"))
        assert(g.bugTrackingUrl == jstr(w \ "bug_tracking_url"))
        assert(g.row.release_date.map(_.toString.take(10)) ==
          jstr(w \ "release_date").map(_.take(10)))
        assert(g.parties.flatMap(_.name) == ((w \ "parties") match {
          case JArray(ps) => ps.flatMap(p => jstr(p \ "name"))
          case _          => Seq.empty
        }))
      }
    }
    checkAll("release_search.json", "expected_release_search.json")
    checkAll("MIYAGAWA_author_release_search.json",
      "expected_release_search_author_MIYAGAWA.json")
  }

  test("apk mapper matches both alpine expected fixtures") {
    val alpineDir = "/root/reference/minecode/tests/testfiles/alpine"
    def readA(p: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$alpineDir/$p")), "UTF-8")
    def checkOne(index: String, purl: String, downloadUrl: String,
        expectedPath: String): Unit = {
      val g = Mappers.apkPackage(readA(s"$index/APKINDEX"), purl,
        downloadUrl).get
      val w = JsonMethods.parse(readA(expectedPath))
        .asInstanceOf[JArray].arr.head
      assert(g.row.name == jstr(w \ "name").get)
      assert(g.row.version == jstr(w \ "version"))
      assert(g.row.description == jstr(w \ "description"))
      assert(g.row.download_url == jstr(w \ "download_url").get)
      assert(g.row.homepage_url == jstr(w \ "repository_homepage_url"))
      assert(g.row.declared_license_expression ==
        jstr(w \ "extracted_license_statement"))
      assert(g.row.sha1 == jstr(w \ "sha1"))
      assert(g.row.size == ((w \ "size") match {
        case JInt(n) => Some(n.toLong); case _ => None
      }))
      assert(g.parties.map(p => (p.name, p.email)) == ((w \ "parties") match {
        case JArray(ps) => ps.map(p => (jstr(p \ "name"), jstr(p \ "email")))
        case _          => Seq.empty
      }))
      val wantQuals = (w \ "qualifiers") match {
        case JObject(fs) => fs.collect { case (k, JString(v)) => s"$k=$v" }
          .sorted.mkString("&")
        case _ => ""
      }
      assert(g.row.qualifiers.getOrElse("") == wantQuals)
    }
    checkOne("postgresql16-contrib_v3.14-community-armhf",
      "pkg:apk/postgresql16-contrib@16.10-r0?arch=x86_64&repo=main&alpine_version=latest-stable",
      "https://dl-cdn.alpinelinux.org/alpine/latest-stable/main/x86_64/postgresql16-contrib-16.10-r0.apk",
      "mapper_postgresql16_contrib_expected.json")
    checkOne("perf-bash-completion_latest-stable_main_x86_64",
      "pkg:apk/perf-bash-completion@5.10.42-r0?arch=armhf&repo=community&alpine_version=v3.14",
      "https://dl-cdn.alpinelinux.org/v3.14/community/armhf/perf-bash-completion-5.10.42-r0.apk",
      "mapper_perf_bash_completion_expected.json")
  }

  test("cargo mapper matches the sam fixtures with and without a version") {
    val cargoDir = "/root/reference/minecode/tests/testfiles/cargo"
    def readC(p: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$cargoDir/$p")), "UTF-8")
    def checkAll(purlVersion: Option[String], expectedPath: String): Unit = {
      val got = Mappers.cargoPackages(readC("sam.json"), purlVersion)
      val want = JsonMethods.parse(readC(expectedPath))
        .asInstanceOf[JArray].arr
      assert(got.size == want.size)
      got.zip(want).foreach { case (g, w) =>
        assert(g.row.name == jstr(w \ "name").get)
        assert(g.row.version == jstr(w \ "version"))
        assert(g.row.description == jstr(w \ "description"))
        assert(g.row.download_url == jstr(w \ "download_url").get)
        assert(g.row.sha256 == jstr(w \ "sha256"))
        assert(g.row.size == ((w \ "size") match {
          case JInt(n) => Some(n.toLong); case _ => None
        }))
        assert(g.row.declared_license_expression ==
          jstr(w \ "extracted_license_statement"))
        assert(g.row.homepage_url == jstr(w \ "homepage_url"))
        assert(g.row.keywords == ((w \ "keywords") match {
          case JArray(ks) => ks.flatMap(jstr); case _ => Seq.empty
        }))
        assert(g.parties.flatMap(_.name) == ((w \ "parties") match {
          case JArray(ps) => ps.flatMap(p => jstr(p \ "name"))
          case _          => Seq.empty
        }))
      }
    }
    checkAll(None, "expected-sam.json")
    checkAll(Some("0.3.1"), "expected-sam-0.3.1.json")
  }

  test("gem API v2 mapper matches the rails fixture") {
    val g = Mappers.gemApiV2Package(read("apiv2/rails-8.0.2.json")).get
    val w = JsonMethods.parse(read("apiv2/expected-rails-8.0.2.json"))
      .asInstanceOf[JArray].arr.head
    assert(g.row.download_url == jstr(w \ "download_url").get)
    checkPackage(g, w)
  }
}
