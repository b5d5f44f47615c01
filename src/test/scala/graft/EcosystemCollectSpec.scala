package graft

import graft.miners.{CollectFlow, Transport}
import graft.sources.{EcosystemParsers, GzipTolerant}
import org.scalatest.funsuite.AnyFunSuite

/** Long-tail ecosystem collectors (§3.2): parsers golden-tested
  * against the reference's own fixture files
  * (`minecode/tests/testfiles/`), plus end-to-end collectPurl branches
  * over a fake registry transport.
  */
class EcosystemCollectSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/minecode/tests/testfiles"

  private def fixture(path: String): String = {
    val p = java.nio.file.Paths.get(s"$fixtures/$path")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  // ------------------------------------------------- fixture parity

  test("cpan release parses the reference's Mojolicious fixture") {
    val r = EcosystemParsers.cpanRelease(fixture("cpan/Mojolicious-9.22.json")).get
    assert(r.version == "9.22")
    assert(r.downloadUrl.contains(
      "https://cpan.metacpan.org/authors/id/S/SR/SRI/Mojolicious-9.22.tar.gz"))
    assert(r.date.contains("2021-10-21T11:53:53"))
    assert(r.abstractText.contains("Real-time web framework"))
    assert(r.licenses == Seq("artistic_2"))
    assert(r.sha256.contains(
      "6b76e024d3d6c077ad984ea3b3d229f093373d5e06438aca248235150d029043"))
    assert(r.author.contains("SRI"))
  }

  test("bitbucket tags parse the reference's paginated fixture") {
    val (tags, next) =
      EcosystemParsers.bitbucketTags(fixture("bitbucket/visit/paginated_tags.json"))
    assert(tags.map(_.name) == Seq("Import/Export", "tip"))
    assert(next.exists(_.contains("page=E8Ux")))
  }

  test("dockerhub tags parse the reference's nginx fixture") {
    val (tags, _) = EcosystemParsers.dockerhubTags(fixture("dockerhub/nginx.json"))
    val perl = tags.find(_.name == "stable-perl").get
    assert(perl.digest.contains(
      "sha256:3d8957cb61d0223de2ab1aa2ec91d29796eb82a81cdcc1e968c090c29606d648"))
    assert(perl.size.contains(83983956L))
    assert(perl.lastPushed.contains("2025-09-09T14:52:48.1674Z"))
    assert(perl.lastUpdater.contains("doijanky"))
  }

  test("github repo tags parse the reference's swift fixture") {
    val (desc, tags) =
      EcosystemParsers.githubRepoTags(fixture("swift/swift-ui-coordinator.json"))
    assert(desc.exists(_.startsWith("SwiftUICoordinator is a package")))
    assert(tags.take(3).map(_.name) == Seq("3.0.0", "2.5.0", "2.4.3"))
    assert(tags.head.tarballUrl.contains(
      "https://api.github.com/repos/erikdrobne/SwiftUICoordinator/tarball/refs/tags/3.0.0"))
  }

  test("conan config.yml + conandata.yml parse the reference's zlib recipe") {
    val cfg = fixture("conan/zlib/manifest/config.yml")
    assert(EcosystemParsers.conanVersionFolder(cfg, "1.3.1").contains("all"))
    assert(EcosystemParsers.conanVersionFolder(cfg, "9.9.9").isEmpty)
    val data = fixture("conan/zlib/manifest/conandata.yml")
    // url is a mirror list for 1.3.1 (first mirror wins) and a scalar
    // for 1.2.12 — both shapes decode
    val (url1, sha1) = EcosystemParsers.conanSource(data, "1.3.1").get
    assert(url1 == "https://zlib.net/fossils/zlib-1.3.1.tar.gz")
    assert(sha1.contains(
      "9a93b2b7dfdac77ceba5a558a580e74667dd6fede4585b91eefb60f03b72df23"))
    val (url2, sha2) = EcosystemParsers.conanSource(data, "1.2.12").get
    assert(url2 == "https://zlib.net/fossils/zlib-1.2.12.tar.gz")
    assert(sha2.contains(
      "91844808532e5ce316b3c010929493c0244f3d37593afd6de04f71821d5136d9"))
  }

  test("gnu directory listing parses the reference's glibc index") {
    val entries =
      EcosystemParsers.dirListingVersions(fixture("gnu/glibc/index.html"), "glibc")
    assert(entries.size == 145)
    assert(entries.exists(e => e.file == "glibc-1.09.1.tar.gz" && e.version == "1.09.1"))
    assert(entries.exists(e => e.file == "glibc-2.39.tar.xz" && e.version == "2.39"))
    // platform binaries, diffs and signatures are excluded
    assert(!entries.exists(_.file.contains(".bin.")))
    assert(!entries.exists(_.file.contains(".diff")))
    assert(entries.find(_.file == "glibc-2.0.1.tar.gz").get.date.contains("1997-02-04"))
  }

  test("openssl source listing parses the reference's index fixture") {
    val entries = EcosystemParsers.dirListingVersions(
      fixture("openssl/Indexof_source.html"), "openssl")
    assert(entries.map(e => (e.file, e.version)).toSet == Set(
      ("openssl-1.0.2o.tar.gz", "1.0.2o"),
      ("openssl-1.1.0h.tar.gz", "1.1.0h")))
  }

  test("alpm .PKGINFO parses the reference's bemenu-ncurses fixture") {
    val info = EcosystemParsers.pkginfo(fixture("alpm/bemenu-ncurses/.PKGINFO"))
    assert(info("pkgname") == Seq("bemenu-ncurses"))
    assert(info("pkgver") == Seq("0.6.13-1"))
    assert(info("license") == Seq("GPL3", "LGPL3"))
    assert(info("depend") == Seq("libbemenu", "ncurses"))
    assert(info("builddate") == Seq("1666046802"))
    assert(info("size") == Seq("22200"))
  }

  // -------------------------------------------- collectPurl branches

  private def mkTarGz(entries: (String, String)*): Array[Byte] = {
    // minimal ustar writer matching EcosystemParsers.tarEntries
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, content) =>
      val data = content.getBytes("UTF-8")
      val header = new Array[Byte](512)
      val nameBytes = name.getBytes("US-ASCII")
      System.arraycopy(nameBytes, 0, header, 0, nameBytes.length)
      val size = ("%011o".format(data.length) + " ").getBytes("US-ASCII")
      System.arraycopy(size, 0, header, 124, size.length)
      header(156) = '0'.toByte
      out.write(header)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    GzipTolerant.gzip(out.toByteArray)
  }

  private val transport = new Transport {
    def fetch(uri: String): Either[String, Array[Byte]] = uri match {
      case u if u.contains("crandb.r-pkg.org/dplyr/all") =>
        Right("""{"versions": {"1.0.0": {"Date/Publication": "2020-05-29T14:30:00"},
          "1.1.0": {}}, "timeline": {"1.1.0": "2023-01-29T20:10:02"}}""".getBytes)
      case u if u.contains("hackage.haskell.org/package/ac-halfinteger.json") =>
        Right("""{"1.1": "normal", "1.1.1": "normal", "0.9": "deprecated"}""".getBytes)
      case u if u.contains("repo.anaconda.com/pkgs/main/linux-64/repodata.json") =>
        Right("""{"packages": {"absl-py-0.4.1-py36h06a4308_0.tar.bz2":
          {"sha256": "c1a2", "md5": "9f8e", "size": 101,
           "license": "Apache-2.0", "depends": ["python >=3.6"]}}}""".getBytes)
      case u if u.contains("dl-cdn.alpinelinux.org/alpine/v3.18/main/x86_64/APKINDEX.tar.gz") =>
        Right(mkTarGz("APKINDEX" ->
          """P:curl
            |V:8.1.2-r0
            |A:x86_64
            |T:URL retrieval utility and library
            |L:curl
            |S:253402
            |t:1685990713
            |
            |P:zlib
            |V:1.2.13-r1
            |A:x86_64
            |T:compression library
            |L:Zlib
            |S:55136
            |t:1681228881
            |""".stripMargin))
      case u if u.contains("fastapi.metacpan.org") && u.contains("Mojolicious") =>
        Right(fixture("cpan/Mojolicious-9.22.json").getBytes)
      case u if u.contains("pub.dev/api/packages/http") && !u.contains("versions/") =>
        Right("""{"versions": [
          {"version": "0.13.0", "published": "2021-03-01T00:00:00Z",
           "pubspec": {"description": "composable http", "homepage": "https://h"}},
          {"version": "1.0.0", "published": "2023-05-01T00:00:00Z",
           "pubspec": {"description": "composable http"}}]}""".getBytes)
      case u if u.contains("api.github.com/repos/mojombo/grit/tags?page=1") =>
        Right("""[{"name": "v2.5.0"}, {"name": "v2.4.1"}]""".getBytes)
      case u if u.contains("api.github.com/repos/mojombo/grit/tags?page=2") =>
        Right("[]".getBytes)
      case u if u.contains("gitlab.com/api/v4/projects/inkscape%2Finkscape/repository/tags") =>
        Right("""[{"name": "1.3", "commit": {"author_name": "Ted",
          "author_email": "t@x.org", "created_at": "2023-07-21T00:00:00Z"}}]""".getBytes)
      case u if u.contains("api.bitbucket.org/2.0/repositories/bastiand/mercurialeclipse/refs/tags") =>
        Right(fixture("bitbucket/visit/paginated_tags.json")
          // break the fixture's pagination so the walk ends after page 1
          .replace("\"next\":", "\"next_disabled\":").getBytes)
      case u if u == "https://hub.docker.com/v2/repositories/library/nginx/" =>
        // the reference fixture wraps the repo summary under "summary"
        Right(org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.parse(fixture("dockerhub/nginx.json"))
            \ "summary").getBytes)
      case u if u.contains("hub.docker.com/v2/repositories/library/nginx/tags") =>
        Right(fixture("dockerhub/nginx.json").getBytes)
      case u if u.contains("huggingface.co/api/models/google/bert") =>
        Right("""{"sha": "abc123", "author": "google",
          "createdAt": "2022-03-02T23:29:04.000Z",
          "cardData": {"license": "apache-2.0"},
          "siblings": [{"rfilename": "config.json"},
            {"rfilename": "pytorch_model.bin"},
            {"rfilename": "model.safetensors"}]}""".getBytes)
      case u if u.contains("conan-center-index/master/recipes/zlib/config.yml") =>
        Right(fixture("conan/zlib/manifest/config.yml").getBytes)
      case u if u.contains("conan-center-index/master/recipes/zlib/all/conandata.yml") =>
        Right(fixture("conan/zlib/manifest/conandata.yml").getBytes)
      case u if u.contains("api.github.com/repos/erikdrobne/SwiftUICoordinator") =>
        Right(fixture("swift/swift-ui-coordinator.json").getBytes)
      case u if u.contains("ftp.gnu.org/gnu/glibc/") =>
        Right(fixture("gnu/glibc/index.html").getBytes)
      case u if u == "https://www.openssl.org/source/" =>
        Right(fixture("openssl/Indexof_source.html").getBytes)
      case u if u.contains("luarocks.org/manifests/kikito/inspect-3.1.1.src.rock") =>
        Right(Array.emptyByteArray)
      case u if u.contains("search.devbox.sh/v2/pkg?name=SDL_mixer") =>
        Right(fixture("nix/SDL_mixer_package-expected.json").getBytes)
      case u if u.contains("cache.nixos.org/") && u.endsWith(".narinfo") =>
        val hash = u.split("/").last.stripSuffix(".narinfo")
        Right((s"StorePath: /nix/store/$hash-x\n" +
          s"URL: nar/$hash.nar.xz\nCompression: xz\n").getBytes)
      case u => Left(s"unexpected fetch: $u")
    }
  }

  private def rowsOf(purl: String) =
    CollectFlow.collectPurl(purl, transport).fold(
      e => fail(s"collect failed: $e"), identity)

  test("cran collect resolves crandb versions to src/contrib tarballs") {
    val rows = rowsOf("pkg:cran/dplyr")
    assert(rows.map(_.version.get).toSet == Set("1.0.0", "1.1.0"))
    assert(rows.forall(_.download_url.startsWith(
      "https://cran.r-project.org/src/contrib/dplyr_")))
    // timeline date wins over the per-version Date/Publication
    assert(rows.find(_.version.contains("1.1.0")).get.release_date.get
      .toString.startsWith("2023-01-29"))
    assert(rowsOf("pkg:cran/dplyr@1.1.0").size == 1)
  }

  test("hackage collect keeps deprecated versions and builds tarball urls") {
    val rows = rowsOf("pkg:hackage/ac-halfinteger")
    assert(rows.map(_.version.get).toSet == Set("1.1", "1.1.1", "0.9"))
    val r = rowsOf("pkg:hackage/ac-halfinteger@1.1.1").head
    assert(r.download_url ==
      "https://hackage.haskell.org/package/ac-halfinteger-1.1.1/ac-halfinteger-1.1.1.tar.gz")
    assert(r.primary_language.contains("haskell"))
  }

  test("conda collect reads repodata metadata for the purl's artifact") {
    val r = rowsOf(
      "pkg:conda/absl-py@0.4.1?build=py36h06a4308_0&channel=main&subdir=linux-64&type=tar.bz2").head
    assert(r.download_url ==
      "https://repo.anaconda.com/pkgs/main/linux-64/absl-py-0.4.1-py36h06a4308_0.tar.bz2")
    assert(r.sha256.contains("c1a2") && r.md5.contains("9f8e"))
    assert(r.size.contains(101L))
    assert(r.declared_license_expression.contains("Apache-2.0"))
  }

  test("apk collect extracts the APKINDEX entry for the purl") {
    val r = rowsOf(
      "pkg:apk/alpine/curl@8.1.2-r0?arch=x86_64&repo=main&alpine_version=v3.18").head
    assert(r.download_url ==
      "https://dl-cdn.alpinelinux.org/alpine/v3.18/main/x86_64/curl-8.1.2-r0.apk")
    assert(r.description.contains("URL retrieval utility and library"))
    assert(r.declared_license_expression.contains("curl"))
    assert(r.size.contains(253402L))
    assert(r.release_date.get.getTime == 1685990713L * 1000L)
  }

  test("cpan collect carries the metacpan release record") {
    val r = rowsOf("pkg:cpan/Mojolicious@9.22").head
    assert(r.download_url ==
      "https://cpan.metacpan.org/authors/id/S/SR/SRI/Mojolicious-9.22.tar.gz")
    assert(r.sha256.contains(
      "6b76e024d3d6c077ad984ea3b3d229f093373d5e06438aca248235150d029043"))
    assert(r.description.contains("Real-time web framework"))
  }

  test("pub collect lists all versions with pub.dev archive urls") {
    val rows = rowsOf("pkg:pub/http")
    assert(rows.map(_.version.get) == Seq("0.13.0", "1.0.0"))
    assert(rows.head.download_url ==
      "https://pub.dev/packages/http/versions/0.13.0.tar.gz")
    assert(rows.head.homepage_url.contains("https://h"))
  }

  test("github collect pages tags and builds archive urls") {
    val rows = rowsOf("pkg:github/mojombo/grit")
    assert(rows.map(_.version.get) == Seq("v2.5.0", "v2.4.1"))
    assert(rows.head.download_url ==
      "https://github.com/mojombo/grit/archive/refs/tags/v2.5.0.tar.gz")
  }

  test("gitlab collect builds /-/archive tarball urls") {
    val r = rowsOf("pkg:gitlab/inkscape/inkscape@1.3").head
    assert(r.download_url ==
      "https://gitlab.com/inkscape/inkscape/-/archive/1.3/inkscape-1.3.tar.gz")
    assert(r.release_date.get.toString.startsWith("2023-07-21"))
  }

  test("bitbucket collect walks refs/tags") {
    val rows = rowsOf("pkg:bitbucket/bastiand/mercurialeclipse")
    assert(rows.map(_.version.get) == Seq("Import/Export", "tip"))
    assert(rows.last.download_url ==
      "https://bitbucket.org/bastiand/mercurialeclipse/get/tip.tar.gz")
  }

  test("docker collect matches the reference's expected-nginx1 mapping") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val rows = rowsOf("pkg:docker/nginx@stable-perl")
    assert(rows.size == 1)
    val r = rows.head
    val w = JsonMethods.parse(fixture("dockerhub/expected-nginx1.json")) match {
      case JArray(items) => items.head
      case other         => other
    }
    def str(f: String): Option[String] = w \ f match {
      case JString(v) => Some(v); case _ => None
    }
    assert(r.name == str("name").get)
    assert(r.version == str("version"))
    assert(r.description == str("description"))
    assert(r.sha256 == str("sha256"))
    assert(r.homepage_url == str("homepage_url"))
    assert(r.size == (w \ "size" match {
      case JInt(n) => Some(n.toLong); case _ => None
    }))
    assert(r.download_url == str("download_url").get)
  }

  test("docker collect matches the reference's expected-nginx2 mapping") {
    // miners/test_dockerhub.py:97-111 — the purl version is a sha256
    // digest instead of a tag name; selection is by image digest
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val rows = rowsOf("pkg:docker/nginx@sha256:" +
      "3d8957cb61d0223de2ab1aa2ec91d29796eb82a81cdcc1e968c090c29606d648")
    assert(rows.size == 1)
    val r = rows.head
    val w = JsonMethods.parse(fixture("dockerhub/expected-nginx2.json")) match {
      case JArray(items) => items.head
      case other         => other
    }
    def str(f: String): Option[String] = w \ f match {
      case JString(v) => Some(v); case _ => None
    }
    assert(r.name == str("name").get)
    assert(r.version == str("version"))
    assert(r.description == str("description"))
    assert(r.sha256 == str("sha256"))
    assert(r.homepage_url == str("homepage_url"))
    assert(r.size == (w \ "size" match {
      case JInt(n) => Some(n.toLong); case _ => None
    }))
    assert(r.download_url == str("download_url").get)
  }

  test("huggingface collect yields one row per .bin weight file") {
    val rows = rowsOf("pkg:huggingface/google/bert@abc123")
    assert(rows.size == 1)
    assert(rows.head.download_url ==
      "https://huggingface.co/google/bert/resolve/abc123/pytorch_model.bin")
    assert(rows.head.declared_license_expression.contains("apache-2.0"))
    assert(rows.head.release_date.get.toString.startsWith("2022-03-02"))
  }

  test("conan collect resolves the recipe folder then the source url") {
    val r = rowsOf("pkg:conan/zlib@1.3.1").head
    assert(r.download_url == "https://zlib.net/fossils/zlib-1.3.1.tar.gz")
    assert(r.sha256.contains(
      "9a93b2b7dfdac77ceba5a558a580e74667dd6fede4585b91eefb60f03b72df23"))
  }

  test("swift collect filters the github repo tags to the purl version") {
    val rows = rowsOf("pkg:swift/github.com/erikdrobne/SwiftUICoordinator@2.5.0")
    assert(rows.size == 1)
    assert(rows.head.download_url ==
      "https://api.github.com/repos/erikdrobne/SwiftUICoordinator/tarball/refs/tags/2.5.0")
    assert(rows.head.primary_language.contains("swift"))
  }

  test("gnu collect lists source tarballs from the mirror index") {
    val rows = rowsOf("pkg:gnu/glibc")
    assert(rows.size == 145)
    val r239 = rowsOf("pkg:gnu/glibc@2.39")
    assert(r239.map(_.download_url).toSet == Set(
      "https://ftp.gnu.org/gnu/glibc/glibc-2.39.tar.bz2",
      "https://ftp.gnu.org/gnu/glibc/glibc-2.39.tar.gz",
      "https://ftp.gnu.org/gnu/glibc/glibc-2.39.tar.xz"))
  }

  test("openssl collect lists source tarballs") {
    val rows = rowsOf("pkg:openssl/openssl@1.0.2o")
    assert(rows.size == 1)
    assert(rows.head.download_url ==
      "https://www.openssl.org/source/openssl-1.0.2o.tar.gz")
  }

  test("luarocks collect probes the rockspec url") {
    val r = rowsOf("pkg:luarocks/kikito/inspect@3.1.1").head
    assert(r.download_url ==
      "https://luarocks.org/manifests/kikito/inspect-3.1.1.src.rock")
    assert(r.homepage_url.contains("https://luarocks.org/modules/kikito/inspect"))
  }

  test("alpm collect builds the archive.archlinux.org url") {
    val r = rowsOf("pkg:alpm/arch/bemenu-ncurses@0.6.13-1?arch=x86_64").head
    assert(r.download_url ==
      "https://archive.archlinux.org/packages/b/bemenu-ncurses/bemenu-ncurses-0.6.13-1-x86_64.pkg.tar.zst")
  }

  test("nix collect resolves store paths through narinfo per platform output") {
    val rows = rowsOf("pkg:nix/nixpkgs/SDL_mixer@1.2.12")
    // 4 platforms × 2 outputs in the reference fixture
    assert(rows.size == 8)
    val first = rows.head
    assert(first.download_url ==
      "https://cache.nixos.org/nar/bgg1d95f9px23i9db6aal7cjbkdw025n.nar.xz")
    assert(first.qualifiers.contains(
      "commit=3d46470bb3030020f7e1361f33514854f5bfa86d&output=out&system=aarch64-linux"))
    assert(first.description.contains("SDL multi-channel audio mixer library"))
    assert(first.declared_license_expression.contains("Zlib"))
    assert(first.release_date.get.toString.startsWith("2026-06-27"))
    // non-nixpkgs namespaces are refused like the reference
    assert(CollectFlow.collectPurl("pkg:nix/myrepo/SDL_mixer@1", transport).isLeft)
  }

  test("generic collect requires and uses the download_url qualifier") {
    val r = rowsOf(
      "pkg:generic/ipxe@1.21.1?download_url=https%3A%2F%2Fgithub.com%2Fipxe%2Fipxe%2Farchive%2Fv1.21.1.tar.gz").head
    assert(r.download_url == "https://github.com/ipxe/ipxe/archive/v1.21.1.tar.gz")
    assert(CollectFlow.collectPurl("pkg:generic/ipxe@1.21.1", transport).isLeft)
    // an encoded '&' inside the value must survive the qualifier split
    val enc = rowsOf(
      "pkg:generic/foo@1.0?download_url=http%3A%2F%2Fhost%2Fdl%3Fa%3D1%26b%3D2").head
    assert(enc.download_url == "http://host/dl?a=1&b=2")
  }

  test("github collect fails rather than truncating on a mid-pagination error") {
    val flaky = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = uri match {
        case u if u.contains("tags?page=1") =>
          Right("""[{"name": "v1.0"}]""".getBytes)
        case _ => Left("HTTP 500")
      }
    }
    val r = CollectFlow.collectPurl("pkg:github/torvalds/linux", flaky)
    assert(r.isLeft && r.swap.exists(_.contains("page 2")))
  }

  test("nix collect fails when a narinfo cannot be resolved") {
    val broken = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = uri match {
        case u if u.contains("search.devbox.sh/v2/pkg?name=SDL_mixer") =>
          Right(fixture("nix/SDL_mixer_package-expected.json").getBytes)
        case u if u.endsWith(".narinfo") => Left("HTTP 404")
        case u => Left(s"unexpected fetch: $u")
      }
    }
    assert(CollectFlow.collectPurl("pkg:nix/nixpkgs/SDL_mixer@1.2.12", broken).isLeft)
  }

  test("tar entries tolerate space-padded octal size fields") {
    val data = "space-padded".getBytes("UTF-8")
    val header = new Array[Byte](512)
    val nameBytes = "APKINDEX".getBytes("US-ASCII")
    System.arraycopy(nameBytes, 0, header, 0, nameBytes.length)
    // POSIX-legal left-space-padded size with a trailing space
    val size = ("%11s".format("%o".format(data.length)) + " ").getBytes("US-ASCII")
    System.arraycopy(size, 0, header, 124, 12)
    header(156) = '0'.toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    out.write(data)
    out.write(new Array[Byte]((512 - data.length % 512) % 512))
    out.write(new Array[Byte](1024))
    val entries = EcosystemParsers.tarEntries(out.toByteArray)
    assert(entries.map { case (n, b) => (n, new String(b, "UTF-8")) } ==
      Seq("APKINDEX" -> "space-padded"))
  }
}
