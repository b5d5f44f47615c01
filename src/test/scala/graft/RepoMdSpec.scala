package graft

import graft.miners.Transport
import graft.sources.RepoMd
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the yum/dnf repomd collect walk against the
  * reference's own centos and opensuse fixtures and their
  * expected.json (miners/test_repomd_parser.py expectations).
  */
class RepoMdSpec extends AnyFunSuite {

  private val dir =
    "/root/reference/minecode/tests/testfiles/repodata_rpms/repomd_parser"

  private def bytesOf(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  private def transportFor(fixtureDir: String, baseUrl: String): Transport =
    new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] =
        if (!uri.startsWith(baseUrl)) Left(s"unexpected fetch: $uri")
        else {
          val name = uri.substring(uri.lastIndexOf('/') + 1)
          val p = java.nio.file.Paths.get(s"$fixtureDir/$name")
          if (java.nio.file.Files.exists(p)) Right(bytesOf(p.toString))
          else Left(s"no fixture for $uri")
        }
    }

  /** Reference-computed fields of expected.json rows:
    * (name, version, download_url, homepage_url, license). */
  private def expected(path: String): Seq[(String, String, String, Option[String], Option[String])] =
    JsonMethods.parse(new String(bytesOf(path), "UTF-8")) match {
      case JArray(items) => items.map { it =>
        def str(f: String): Option[String] = it \ f match {
          case JString(v) => Some(v); case _ => None
        }
        (str("name").get, str("version").get, str("download_url").get,
          str("homepage_url"), str("extracted_license_statement"))
      }
      case _ => fail(s"unexpected fixture shape: $path")
    }

  test("centos repomd collect matches the reference's expected packages") {
    val uri = "http://vault.centos.org/3.8/updates/x86_64/repodata/repomd.xml"
    val rows = RepoMd.collectFromRepomd(
      uri, transportFor(s"$dir/centos", "http://vault.centos.org/"))
      .fold(e => fail(e), identity)
    val want = expected(s"$dir/centos/expected.json")
    assert(rows.size == want.size)
    rows.zip(want).foreach { case (r, (name, version, dl, home, lic)) =>
      assert(r.name == name)
      assert(r.version.contains(version))
      assert(r.download_url == dl)
      assert(r.homepage_url == home)
      assert(r.declared_license_expression == lic)
    }
    // the centos fixture uses sha(1) checksums
    assert(rows.head.sha1.contains("96eb0196f9a9461438b845cf5a7455216e66e721"))
    assert(rows.head.sha256.isEmpty)
  }

  test("opensuse repomd collect matches the reference's expected packages") {
    val uri = "http://download.opensuse.org/distribution/12.3/repo/oss/suse/repodata/repomd.xml"
    val rows = RepoMd.collectFromRepomd(
      uri, transportFor(s"$dir/opensuse", "http://download.opensuse.org/"))
      .fold(e => fail(e), identity)
    val want = expected(s"$dir/opensuse/expected.json")
    assert(rows.size == want.size)
    rows.zip(want).foreach { case (r, (name, version, dl, home, _)) =>
      assert(r.name == name)
      assert(r.version.contains(version))
      assert(r.download_url == dl)
      assert(r.homepage_url == home)
    }
  }

  test("evr renders epoch 0 explicitly, like packagedcode") {
    assert(RepoMd.evr(Some("0"), Some("1.5.0"), Some("1.el7"))
      .contains("0:1.5.0-1.el7"))
    assert(RepoMd.evr(None, Some("2.0"), None).contains("2.0"))
    assert(RepoMd.evr(Some(""), Some("2.0"), Some("3")).contains("2.0-3"))
  }

  test("absolute location hrefs bypass the base join") {
    assert(RepoMd.buildDownloadUrl("http://b/x",
      "http://mirror/pkg.rpm") == "http://mirror/pkg.rpm")
    assert(RepoMd.buildDownloadUrl("http://b/x/", "/RPMS/a.rpm") ==
      "http://b/x/RPMS/a.rpm")
  }

  test("an absolute primary href walks through unmangled") {
    // mirrored repos may point at an absolute primary.xml URL — the
    // walk must fetch it as-is, not join it onto the base
    val repomd =
      """<repomd><data type="primary">
        |<location href="http://mirror.example/repodata/primary.xml"/>
        |</data></repomd>""".stripMargin
    val primary =
      """<metadata><package type="rpm"><name>zsh</name><arch>x86_64</arch>
        |<version epoch="0" ver="4.3" rel="1"/>
        |<location href="RPMS/zsh-4.3.rpm"/><format/></package></metadata>"""
        .stripMargin
    val t = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = uri match {
        case "http://base/os/repodata/repomd.xml" => Right(repomd.getBytes)
        case "http://mirror.example/repodata/primary.xml" =>
          Right(primary.getBytes)
        case u => Left(s"unexpected fetch: $u")
      }
    }
    val rows = RepoMd.collectFromRepomd("http://base/os/repodata/repomd.xml", t)
      .fold(e => fail(e), identity)
    assert(rows.map(_.name) == Seq("zsh"))
    assert(rows.head.download_url == "http://base/os/RPMS/zsh-4.3.rpm")
  }

  test("three-file repodata merge matches the reference's expected dict") {
    // minecode/tests/miners/test_repodata.py test_get_pkg_infos — the
    // combined primary+other+filelists record, field for field
    val fx = "/root/reference/minecode/tests/testfiles/repodata_rpms/repodata"
    def read(f: String) = new String(bytesOf(s"$fx/$f"), "UTF-8")
    val out = RepoMd.combinedPkgInfos(
      read("filelists.xml"), read("primary.xml"), read("other.xml"))
    assert(out.size == 1)
    val d = out.head
    def sc(k: String): Option[String] = d.scalars.getOrElse(k,
      fail(s"missing key $k"))
    assert(sc("type").contains("rpm"))
    assert(sc("name").contains("python-ceilometerclient"))
    assert(sc("arch").contains("src"))
    assert(sc("epoch").contains("0") && sc("ver").contains("1.5.0") &&
      sc("rel").contains("1.el7"))
    assert(sc("pkgid").contains(
      "36547e200627ea25c4e3fb6f9735d58e682f8e35cd815dceed796c83628e60d5"))
    assert(sc("checksum") == sc("pkgid"))
    assert(sc("href").contains("python-ceilometerclient-1.5.0-1.el7.src.rpm"))
    assert(sc("license").contains("ASL 2.0"))
    assert(sc("url").contains(
      "https://github.com/openstack/python-ceilometerclient"))
    assert(sc("summary").contains(
      "Python API and CLI for OpenStack Ceilometer"))
    assert(sc("description").isEmpty)  // key present, value None
    assert(sc("sourcerpm").isEmpty)
    assert(sc("buildhost").contains("c1bk.rdu2.centos.org"))
    assert(sc("group").contains("Development/Languages"))
    assert(sc("package_size").contains("101516"))
    assert(sc("installed_size").contains("99230"))
    assert(sc("archive_size").contains("99648"))
    assert(sc("file_time").contains("1446590411"))
    assert(sc("build_time").contains("1442515098"))
    assert(sc("start_header_range").contains("880"))
    assert(sc("end_header_range").contains("4876"))
    // packager and vendor tag TEXT is dropped (attrs only) — reference
    // convert_tuples_to_dict over .items()
    assert(!d.scalars.contains("packager") && !d.scalars.contains("vendor"))
    assert(d.requiredRpms.contains(Seq(
      Map("name" -> "python-d2to1"),
      Map("name" -> "python-oslo-sphinx", "flags" -> "GE",
        "epoch" -> "0", "ver" -> "2.5.0"),
      Map("name" -> "python-pbr"),
      Map("name" -> "python-setuptools"),
      Map("name" -> "python-sphinx"),
      Map("name" -> "python2-devel"))))
    assert(d.providedRpms.isEmpty) // no provides tag -> key absent
    assert(d.files.contains(Seq("python-ceilometerclient-1.5.0.tar.gz",
      "python-ceilometerclient.spec")))
    assert(d.directories.contains(Seq.empty))
    assert(d.changelogs.contains(Seq(Map(
      "date" -> "1387195200",
      "author" -> "Jakub Ruzicka <jruzicka@redhat.com> 1.0.8-1",
      "changelog" -> "- Update to upstream 1.0.8\n- New dependency: python-six"))))
  }

  test("repomd urlForType resolves the filelists data entry") {
    // test_repodata.py test_get_url_for_tag
    val fx = "/root/reference/minecode/tests/testfiles/repodata_rpms/repodata"
    val xml = new String(bytesOf(s"$fx/repomd.xml"), "UTF-8")
    assert(RepoMd.urlForType(xml, "filelists").contains(
      "repodata/4c31e7e12c7aa42cf4d7d0b6ab7166fad76b5e40ea18f911e4a820cfa68d1541-filelists.xml.gz"))
  }
}
