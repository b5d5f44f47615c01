package graft

import graft.miners.MoreVisitors._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the tier-2 frontier visitors (Packagist, F-Droid,
  * Apache podlings, Haxe, godoc search, Bower) against the
  * reference's own `*_expected_uris` fixtures.
  */
class MoreVisitorsSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/minecode/tests/testfiles"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$path")), "UTF-8")

  /** (uri, package_url, visited, data-as-JValue) rows of an expected
    * fixture; `data` arrives either as a JSON string or an inline
    * object depending on the miner. */
  private def expected(path: String): Seq[(String, Option[String], Boolean, Option[JValue])] =
    JsonMethods.parse(read(path)) match {
      case JArray(items) => items.map { it =>
        def str(f: String): Option[String] = it \ f match {
          case JString(v) => Some(v); case _ => None
        }
        val data = it \ "data" match {
          case JNothing | JNull => None
          case JString(s)       => Some(JsonMethods.parse(s))
          case other            => Some(other)
        }
        // package_url arrives either as a purl string or as serialized
        // PackageURL components [type, ns, name, version, quals, subpath]
        val purl = it \ "package_url" match {
          case JString(p) => Some(p)
          case JArray(JString(t) :: ns :: JString(n) :: v :: _) =>
            val nsPart = ns match { case JString(s) => s + "/"; case _ => "" }
            val vPart = v match { case JString(s) => "@" + s; case _ => "" }
            Some(s"pkg:$t/$nsPart$n$vPart")
          case _ => None
        }
        (str("uri").get, purl, it \ "visited" == JBool(true), data)
      }
      case _ => fail(s"unexpected fixture shape: $path")
    }

  private def check(
      got: Seq[graft.miners.RegistryVisitors.VisitedUri],
      want: Seq[(String, Option[String], Boolean, Option[JValue])]): Unit = {
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, (uri, purl, visited, data)) =>
      assert(g.uri == uri)
      assert(g.packageUrl == purl, s"purl mismatch for $uri")
      assert(g.visited == visited, s"visited mismatch for $uri")
      (g.data, data) match {
        case (Some(a), Some(b)) =>
          val parsed = JsonMethods.parse(a)
          assert(parsed == b || mojibake(parsed) == b,
            s"data mismatch for $uri")
        case (None, None) =>
        case (a, b) => fail(s"data presence mismatch for $uri: $a vs $b")
      }
    }
  }

  /** Some reference fixtures captured their reader's byte-as-char
    * decoding of UTF-8 values (e.g. "centralbyrÃ¥n" for raw C3 A5 —
    * see MavenIndexArtifactsSpec); the comparison accepts our
    * correctly-decoded string when its latin-1 rendering matches the
    * fixture. */
  private def mojibake(v: JValue): JValue = v match {
    case JString(s) => JString(new String(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1))
    case JObject(fs) => JObject(fs.map { case (k, x) => k -> mojibake(x) })
    case JArray(xs)  => JArray(xs.map(mojibake))
    case other       => other
  }

  test("packagist list visitor matches the reference's expected URIs") {
    val src = "https://packagist.org/packages/list.json"
    check(
      packagistListUris(read("packagist/list.json"), src),
      expected("packagist/packagist_list_expected"))
  }

  test("fdroid index-v2 visitor matches the reference's expected URIs") {
    val src = "https://f-droid.org/repo/index-v2.json"
    check(
      fdroidIndexUris(read("fdroid/index-v2.json"), src),
      expected("fdroid/index-v2-expected-visit.json"))
  }

  test("apache podlings visitor matches the reference's expected URIs") {
    val src = "https://projects.apache.org/json/foundation/podlings.json"
    check(
      apachePodlingsUris(read("apache/podlings.json"), src),
      expected("apache/podlings_expected_uris.json"))
  }

  test("haxe all-projects visitor matches the reference's expected URIs") {
    val src = "https://lib.haxe.org/all"
    check(
      haxeProjectsUris(read("haxe/all_haxelibs.html"), src),
      expected("haxe/all_haxelibs.html-expected"))
  }

  test("haxe versions visitor matches the reference's expected URIs") {
    val src = "https://lib.haxe.org/p/openfl/versions"
    check(
      haxeVersionsUris(read("haxe/all_versions_openfl.html"), src),
      expected("haxe/all_versions_openfl.html-expected"))
  }

  test("godoc search visitor matches the reference's expected URIs") {
    check(
      godocSearchUris(read("golang/godoc_search.json"),
        "https://api.godoc.org/search?q=github.com/golang"),
      expected("golang/godoc_search_expected_uris.json"))
  }

  test("godoc off-github search visitor matches the reference's expected URIs") {
    check(
      godocSearchUris(read("golang/godoc_search_off_github.json"),
        "https://api.godoc.org/search?q=github.com/golang*"),
      expected("golang/godoc_search_off_github_expected_uris.json"))
  }

  test("debian and ubuntu ls-lR visitors match the reference's expected URIs") {
    checkLsLr("http://ftp.debian.org/debian/ls-lR.gz",
      "debian/lslr/ls-lR_debian", "debian/lslr/ls-lR_debian.gz-expected.json")
    checkLsLr("http://archive.ubuntu.com/ubuntu/ls-lR.gz",
      "debian/lslr/ls-lR_ubuntu", "debian/lslr/ls-lR_ubuntu.gz-expected.json")
  }

  private def checkLsLr(src: String, input: String,
      expectedPath: String): Unit = {
    val got = debianLsLrUris(read(input), src)
    val wantRaw = JsonMethods.parse(read(expectedPath))
    val want = wantRaw match {
      case JArray(items) => items.map { it =>
        def str(f: String): Option[String] = it \ f match {
          case JString(v) => Some(v); case _ => None
        }
        val size = it \ "size" match {
          case JInt(n) => Some(n.toLong); case _ => None
        }
        (str("uri").get, str("package_url"), str("file_name"), size, str("date"))
      }
      case _ => fail("unexpected fixture shape")
    }
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, (uri, purl, fileName, size, date)) =>
      assert(g.uri == uri)
      assert(g.packageUrl == purl, s"purl mismatch for $uri")
      assert(g.fileName == fileName)
      assert(g.size == size)
      assert(g.date == date)
    }
  }

  test("sourceforge sitemap visitors match the reference's expected URIs") {
    check(
      sourceforgeSitemapIndexUris(read("sourceforge/sitemap.xml"),
        "http://sourceforge.net/sitemap.xml"),
      expected("sourceforge/expected_sf_sitemap_new.json"))
    check(
      sourceforgeSitemapPageUris(read("sourceforge/sitemap-1.xml"),
        "http://sourceforge.net/sitemap-1.xml"),
      expected("sourceforge/expected_sf_sitemap_page_new.json"))
    check(
      sourceforgeSitemapPageUris(read("sourceforge/sitemap-6.xml"),
        "https://sourceforge.net/sitemap-6.xml"),
      expected("sourceforge/expected_sitemap-6.json"))
  }

  test("apache find-ls dist index visitor matches the reference's expected URIs") {
    val src = "http://apache.org/dist/zzz/find-ls.gz"
    val gz = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$fixtures/apache/find-ls.gz"))
    val listing = new String(graft.sources.GzipTolerant.readAll(gz), "UTF-8")
    val got = apacheFindLsUris(listing, src)
    // the fixture serializes package_url as PackageURL components
    val want = JsonMethods.parse(read("apache/find-ls.gz_uris-expected.json")) match {
      case JArray(items) => items.map { it =>
        val uri = (it \ "uri").asInstanceOf[JString].s
        val visited = it \ "visited" == JBool(true)
        val size = it \ "size" match {
          case JInt(n) => Some(n.toLong); case _ => None
        }
        val purl = it \ "package_url" match {
          case JArray(JString(t) :: ns :: JString(n) :: v :: _) =>
            val version = v match { case JString(s) => "@" + s; case _ => "" }
            Some(s"pkg:$t/$n$version")
          case _ => None
        }
        (uri, purl, visited, size)
      }
      case _ => fail("unexpected fixture shape")
    }
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, (uri, purl, visited, size)) =>
      assert(g.uri == uri)
      assert(g.packageUrl == purl, s"purl mismatch for $uri")
      assert(g.visited == visited, s"visited mismatch for $uri")
      assert(g.size == size, s"size mismatch for $uri")
    }
  }

  test("nuget visitors match the reference's expected URIs") {
    check(
      nugetQueryUris(read("nuget/query.json"),
        "https://api-v2v3search-0.nuget.org/query"),
      expected("nuget/nuget_query_expected"))
    check(
      nugetPageUris(read("nuget/query_search.json"),
        "https://api-v2v3search-0.nuget.org/query?skip=0"),
      expected("nuget/nuget_page_json_expected"))
    check(
      nugetDownloadUris(read("nuget/entityframework.json"),
        "https://api.nuget.org/v3/registration1/entityframework/6.1.3.json"),
      expected("nuget/nuget_downlloadvisitor_json_expected"))
    check(
      nugetHtmlPageUris(read("nuget/packages.html"),
        "https://www.nuget.org/packages?page=1"),
      expected("nuget/packages.html.expected.json"))
  }

  test("cpan visitors match the reference's expected URIs") {
    // miners/test_cpan.py:25-59
    check(
      cpanAuthorSearchUris(read("cpan/search_email_a.json"),
        "https://fastapi.metacpan.org/author/_search?q=email:a*&size=5000"),
      expected("cpan/expected_search_email_a.json"))
    check(
      cpanModulesIndexUris(
        read("cpan/Modules on CPAN alphabetically.html"),
        "http://www.cpan.org/modules/01modules.index.html"),
      expected("cpan/expected_html_modules.json"))
    check(
      cpanAuthorDirUris(read("cpan/Index_of_authors_id_L_LD_LDS.html"),
        "http://www.cpan.org/authors/id/L/LD/LDS/"),
      expected("cpan/expected_html_files.json"))
  }

  test("cpan readme parser matches the reference's expected sections") {
    // miners/test_cpan.py:61-71 vs cpan/expected_readme.json
    val got = cpanReadmeSections(
      read("cpan/Mojolicious-Plugin-Nour-Config-0.09.readme"))
    val want = (JsonMethods.parse(read("cpan/expected_readme.json"))
      : @unchecked) match {
      case JObject(fields) => fields.map {
        case (k, JString(v)) => k -> v
        case (k, other)      => k -> other.toString
      }
    }
    assert(got == want)
  }

  test("rubygems specs-index visitor matches the first 1000 expected URIs") {
    // miners/test_rubygems.py:58-67 — the golden records uris[0:1000]
    // of the >260k produced from the Marshal 4.8 specs index
    val gz = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$fixtures/rubygems/index/latest_specs.4.8.gz"))
    val got = rubyGemsIndexUris(gz, "http://rubygems.org/specs.4.8.gz")
      .take(1000).toSeq
    val want = expected("rubygems/index/latest_specs.4.8.gz.expected.json")
    assert(want.size == 1000)
    check(got, want)
  }

  test("gitlab projects visitor matches the reference's expected URIs") {
    check(
      gitlabProjectsUris(read("gitlab/projects_visitor.json"),
        "https://gitlab.com/api/v4/projects?page=1&per_page=70&statistics=true"),
      expected("gitlab/expected_projects_visitor.json"))
  }

  test("bitbucket repo-index visitors match the reference's expected URIs") {
    check(
      bitbucketIndexUris(read("bitbucket/visit/index-repositories.json"),
        "https://bitbucket.org/api/2.0/repositories/?pagelen=100"),
      expected("bitbucket/visit/index-repositories_expected_uris.json"))
    check(
      bitbucketRepoUris(read("bitbucket/visit/singlerepo.json"),
        "https://api.bitbucket.org/2.0/repositories/bastiand/mercurialeclipse"),
      expected("bitbucket/visit/singlerepo_expected_uris.json"))
  }

  test("openssl listing visitors match the reference's expected URIs") {
    def checkFull(got: Seq[graft.miners.RegistryVisitors.VisitedUri],
        fixture: String): Unit = {
      val want = JsonMethods.parse(read(fixture)) match {
        case JArray(items) => items.map { it =>
          def str(f: String): Option[String] = it \ f match {
            case JString(v) => Some(v); case _ => None
          }
          // the reference emits sizes as strings in this fixture
          val size = it \ "size" match {
            case JInt(n)    => Some(n.toLong)
            case JString(s) => s.toLongOption
            case _          => None
          }
          (str("uri").get, str("package_url"), str("file_name"), size,
            str("date"))
        }
        case _ => fail("unexpected fixture shape")
      }
      assert(got.size == want.size)
      got.zip(want).foreach { case (g, (uri, purl, fileName, size, date)) =>
        assert(g.uri == uri)
        assert(g.packageUrl == purl, s"purl mismatch for $uri")
        assert(g.fileName == fileName, s"file_name mismatch for $uri")
        assert(g.size == size, s"size mismatch for $uri")
        assert(g.date == date, s"date mismatch for $uri")
      }
    }
    checkFull(
      opensslIndexUris(read("openssl/Index.html"), "https://ftp.openssl.org/"),
      "openssl/expected_uri_openssl_index.json")
    checkFull(
      opensslIndexUris(read("openssl/Indexof_source.html"),
        "https://ftp.openssl.org/source/"),
      "openssl/expected_uri_openssl_sourceindex.json")
  }

  test("apache projects.json visitor matches the expected URIs") {
    // miners/test_apache.py:58-67
    check(
      apacheProjectsUris(read("apache/projects.json")),
      expected("apache/projects_uris-expected.json"))
  }

  test("bitbucket paginated tags visitor follows the next link") {
    // miners/test_bitbucket.py:61-74
    check(
      bitbucketPaginatedUris(read("bitbucket/visit/paginated_tags.json"),
        "https://api.bitbucket.org/2.0/repositories/bastiand/mercurialeclipse/refs/tags?pagelen=2"),
      expected("bitbucket/visit/paginated_tags_expected_uris.json"))
  }

  test("maven nexus index visitor matches all three expected_uris goldens") {
    // miners/test_maven.py:263-299 — full, increment and buggy indexes
    def gz(p: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$p"))
    check(
      graft.miners.MavenIndexArtifacts.nexusIndexUris(
        gz("maven/index/nexus-maven-repository-index.gz"),
        "https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.gz")
        .toSeq,
      expected("maven/index/expected_uris.json"))
    check(
      graft.miners.MavenIndexArtifacts.nexusIndexUris(
        gz("maven/index/increment/nexus-maven-repository-index.445.gz"),
        "https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.445.gz")
        .toSeq,
      expected("maven/index/increment/expected_uris.json"))
    check(
      graft.miners.MavenIndexArtifacts.nexusIndexUris(
        gz("maven/index/buggy/nexus-maven-repository-index.gz"),
        "https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.gz")
        .toSeq,
      expected("maven/index/buggy/expected_uris.json"))
  }

  test("maven increment2 index: every-500th URI and its mini package") {
    // miners/test_maven.py:777-801
    val gz457 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"$fixtures/maven/index/increment2/nexus-maven-repository-index.457.gz"))
    val uris = graft.miners.MavenIndexArtifacts.nexusIndexUris(gz457,
      "https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.457.gz")
      .zipWithIndex.collect { case (u, i) if i % 500 == 0 => u }.toSeq
    check(uris, expected("maven/index/increment2/expected_uris.json"))

    // get_mini_package over those URIs' data payloads
    val got = uris.map(_.data.flatMap(
      graft.miners.MavenIndexArtifacts.miniPackageFromIndexData))
    val want = (JsonMethods.parse(read(
      "maven/index/increment2/expected_mini_package.json")): @unchecked) match {
      case JArray(items) => items
    }
    assert(got.size == want.size)
    got.zip(want).foreach {
      case (None, JNull) =>
      case (Some(p), w) =>
        def ws(f: String) = w \ f match {
          case JString(s) if s.nonEmpty => Some(s); case _ => None
        }
        assert(Some(p.name) == ws("name"))
        assert(p.namespace == ws("namespace"))
        assert(p.version == ws("version"))
        assert(Some(p.download_url) == ws("download_url"))
        assert(p.sha1 == ws("sha1"))
        assert(p.description == ws("description"))
      case (a, b) => fail(s"mini package mismatch: $a vs $b")
    }
  }

  test("maven index properties visitor yields the increment URIs") {
    // miners/test_maven.py:272-281
    check(
      mavenIndexPropertiesUris(
        read("maven/index/increment/nexus-maven-repository-index.properties"),
        "https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.properties"),
      expected("maven/index/increment/expected_properties_uris.json"))
  }

  test("maven html-index visitor matches all three jcenter goldens") {
    // miners/test_maven.py:551-585
    check(
      mavenHtmlPageUris(read("maven/html/jcenter.bintray.com.html"),
        "http://jcenter.bintray.com/"),
      expected("maven/html/visitor_expected_jcenter.bintray.com2.html.json"))
    check(
      mavenHtmlPageUris(read("maven/html/app.html"),
        "http://jcenter.bintray.com/Action/app/"),
      expected("maven/html/visitor_expected_app.html.json"))
    check(
      mavenHtmlPageUris(read("maven/html/stateframework-compiler.html"),
        "http://jcenter.bintray.com/'com/virtualightning'/stateframework-compiler/"),
      expected("maven/html/visitor_expected_stateframework-compiler.html.json"))
  }

  test("maven-metadata.xml visitor matches the reference's expected URIs") {
    // miners/test_maven.py:538-549
    check(
      mavenMetadataXmlUris(read("maven/maven-metadata/maven-metadata.xml"),
        "https://repo1.maven.org/maven2/st/digitru/identity-core/maven-metadata.xml"),
      expected("maven/maven-metadata/expected_maven_xml.json"))
  }

  test("eclipse list-of-projects visitor matches the reference's expected URIs") {
    check(
      eclipseProjectsListUris(read("eclipse/projects.eclipse.org.html"),
        "https://projects.eclipse.org/list-of-projects"),
      expected("eclipse/eclipse_projects_expected"))
  }

  test("eclipse git repository visitor matches the reference's expected URIs") {
    check(
      eclipseGitRepoUris(read("eclipse/Eclipse_Git_repositories.html"),
        "http://git.eclipse.org/c"),
      expected("eclipse/eclipse_git_repos_expected"))
  }

  test("eclipse packages visitor matches the reference's expected URIs") {
    check(
      eclipsePackagesUris(read("eclipse/All_Releases_Packages.html"),
        "http://www.eclipse.org/downloads/packages/all"),
      expected("eclipse/eclipse_packages_expected"))
  }

  test("eclipse release visitor matches the reference's expected URIs") {
    val src = "http://www.eclipse.org/downloads/packages/release/Neon/R"
    val got = eclipseReleaseUris(read("eclipse/Neon_R.html"), src)
    val want = expected("eclipse/Neon_R-expected.json")
    check(got, want)
  }

  test("bower visitor matches the reference's expected URIs") {
    // every fixture entry's name differs from its repo path
    // ("0x100-angular-steps" vs ".../0x100/angular-steps.git"), so the
    // reference's `name in url` guard drops them all — the checked-in
    // expected fixture is the empty list
    val src = "https://registry.bower.io/packages"
    val got = bowerPackagesUris(read("bower/packages.json"), src)
    check(got, expected("bower/packages_expected_uris.json"))
    // and the documented positive path on a name-in-url entry
    val synthetic = bowerPackagesUris(
      """[{"name": "bello", "url": "https://github.com/QiaoBuTang/bello.git"}]""",
      src)
    assert(synthetic.map(u => (u.uri, u.packageUrl.get)) == Seq(
      ("https://raw.githubusercontent.com/QiaoBuTang/bello/master/bower.json",
        "pkg:bower/bello")))
    // owner == name (the common layout) must not crash or mis-slice,
    // nor must a name that occurs inside the host ("hub")
    val tricky = bowerPackagesUris(
      """[{"name": "angular", "url": "https://github.com/angular/angular.git"},
         |{"name": "hub", "url": "https://github.com/acme/hub.git"},
         |{"name": "x", "url": "https://github.com/x"}]""".stripMargin, src)
    assert(tricky.map(_.uri) == Seq(
      "https://raw.githubusercontent.com/angular/angular/master/bower.json",
      "https://raw.githubusercontent.com/acme/hub/master/bower.json"))
  }
}
