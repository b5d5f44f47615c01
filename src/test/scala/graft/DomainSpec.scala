package graft

import graft.catalog.{Enhance, PackageRow, Sbom}
import graft.functions.{CanonicalUrl, EcosystemVersions, LicenseExpressions, VersRange, VersionHint}
import graft.miners.{LsParser, Router, SourceRepo}
import org.apache.spark.sql.functions._

class DomainSpec extends SparkTestBase {
  import spark.implicits._

  test("version_hint extracts versions from artifact paths") {
    assert(VersionHint("repo/foo-1.2.3.tar.gz").contains("1.2.3"))
    assert(VersionHint("x/blueproximity-1.2.4-1.fc8.noarch.rpm")
      .contains("1.2.4"))
    assert(VersionHint("a/b/pkg-2.0.0rc1.zip", ignorePreReleases = true)
      .contains("2.0.0"))
    assert(VersionHint("a/v1.5.0/file.jar", removeVPrefix = true)
      .exists(_.startsWith("1.5")))
    assert(VersionHint("dist/2024-01-15/thing.zip").contains("2024-01-15"))
    assert(VersionHint("no/version/here").isEmpty ||
      VersionHint("no/version/here").isDefined) // total function, no throw
  }

  test("canonical_url normalizes scheme/host/port/fragment") {
    assert(CanonicalUrl("HTTP://Example.COM:80/a/../b#frag")
      .contains("http://example.com/b"))
    assert(CanonicalUrl("https://example.com:443/x?q=1")
      .contains("https://example.com/x?q=1"))
    assert(CanonicalUrl("https://example.com:8443/x")
      .contains("https://example.com:8443/x"))
    assert(CanonicalUrl("http://example.com").contains("http://example.com/"))
    assert(CanonicalUrl("not a url").isEmpty)
  }

  test("combine_expressions AND-joins with dedup and parens") {
    assert(LicenseExpressions.combine(Seq("mit", "mit")) == Some("mit"))
    assert(LicenseExpressions.combine(Seq("mit", "apache-2.0")) ==
      Some("mit AND apache-2.0"))
    assert(LicenseExpressions.combine(Seq("mit OR gpl-2.0", "apache-2.0")) ==
      Some("(mit OR gpl-2.0) AND apache-2.0"))
    assert(LicenseExpressions.combine(Seq("", "  ")) == None)
  }

  test("vers range: comparators, unions, exclusions, wildcards") {
    def in(vers: String, v: String) = VersRange.contains(vers, v).get
    assert(in("vers:npm/>=1.2.3|<2.0.0", "1.5.0"))
    assert(!in("vers:npm/>=1.2.3|<2.0.0", "2.1.0"))
    assert(in("vers:pypi/*", "anything"))
    assert(!in("vers:pypi/*|!=1.0", "1.0"))
    assert(in("vers:gem/=2.3.4", "2.3.4"))
    assert(!in("vers:gem/=2.3.4", "2.3.5"))
    // two intervals: [1.0,2.0] and [3.0,∞)
    val multi = "vers:maven/>=1.0|<=2.0|>=3.0"
    assert(in(multi, "1.5") && in(multi, "3.1") && !in(multi, "2.5"))
    // pre-release ordering
    assert(VersRange.compareVersions("1.0.0-alpha", "1.0.0") < 0)
    assert(VersRange.compareVersions("1.2", "1.10") < 0)
    assert(VersRange.compareVersions("1.2.1", "1.2") > 0)
    assert(!in("vers:npm/>=1.0.0", "1.0.0-rc1"))
  }

  test("pep440 ordering: epoch, dev, pre, post, local") {
    // golden ordering per PEP 440's own examples
    val ordered = Seq(
      "1.0.dev1", "1.0a1", "1.0a2.dev1", "1.0a2", "1.0b1", "1.0rc1",
      "1.0", "1.0.post1", "1.1.dev1", "1.1", "1!0.5")
    val c = EcosystemVersions.pep440Compare _
    ordered.sliding(2).foreach { case Seq(lo, hi) =>
      assert(c(lo, hi) < 0, s"$lo should sort before $hi")
      assert(c(hi, lo) > 0, s"$hi should sort after $lo")
    }
    // normalization aliases: c == rc, alpha == a, -1 == .post1
    assert(c("1.0c1", "1.0rc1") == 0)
    assert(c("1.0alpha1", "1.0a1") == 0)
    assert(c("1.0-1", "1.0.post1") == 0)
    assert(c("v1.0", "1.0") == 0)
    // local versions: absence < presence, numeric segments numeric
    assert(c("1.0", "1.0+abc") < 0)
    assert(c("1.0+abc.5", "1.0+abc.7") < 0)
    assert(c("1.0+5", "1.0+abc") > 0) // numeric local > alphanumeric
  }

  test("debian ordering: epoch, tilde, revisions, digit runs") {
    val c = EcosystemVersions.debianCompare _
    val ordered = Seq(
      "1.0~~", "1.0~~a", "1.0~rc1", "1.0", "1.0-1", "1.0-2",
      "1.0.1", "1.2", "1.10", "2.0", "1:0.5", "2:0.1")
    ordered.sliding(2).foreach { case Seq(lo, hi) =>
      assert(c(lo, hi) < 0, s"$lo should sort before $hi")
    }
    // letters sort before non-letters; ~ before everything
    assert(c("1.0a", "1.0+") < 0)
    assert(c("1.0~", "1.0") < 0)
    assert(c("09", "9") == 0) // leading zeros
  }

  test("maven ordering: qualifier table, null tokens, aliases") {
    val c = EcosystemVersions.mavenCompare _
    val ordered = Seq(
      "1.0-alpha", "1.0-alpha-2", "1.0-beta", "1.0-milestone",
      "1.0-rc", "1.0-SNAPSHOT", "1.0", "1.0-sp", "1.0-zeta", "1.0.1")
    ordered.sliding(2).foreach { case Seq(lo, hi) =>
      assert(c(lo, hi) < 0, s"$lo should sort before $hi")
    }
    assert(c("1.0-cr", "1.0-rc") == 0)     // cr alias
    assert(c("1.0-ga", "1.0") == 0)        // ga/final/release = ''
    assert(c("1.0-final", "1") == 0)
    assert(c("1.0.0", "1") == 0)           // trailing zero trim
    assert(c("1.2", "1.10") < 0)           // numeric tokens
  }

  test("semver ordering: prerelease identifiers, build metadata") {
    val c = EcosystemVersions.semverCompare _
    val ordered = Seq(
      "1.0.0-alpha", "1.0.0-alpha.1", "1.0.0-alpha.beta", "1.0.0-beta",
      "1.0.0-beta.2", "1.0.0-beta.11", "1.0.0-rc.1", "1.0.0", "1.0.1")
    ordered.sliding(2).foreach { case Seq(lo, hi) =>
      assert(c(lo, hi) < 0, s"$lo should sort before $hi")
    }
    assert(c("1.0.0+build.42", "1.0.0") == 0) // build metadata ignored
    assert(c("v1.2.3", "1.2.3") == 0)         // golang v prefix
    assert(c("1.0.0-1", "1.0.0-alpha") < 0)   // numeric < alphanumeric
  }

  test("rubygems ordering: letter segments are pre-releases") {
    val c = EcosystemVersions.rubygemsCompare _
    assert(c("1.0.a", "1.0") < 0)
    assert(c("1.0", "1.0.1") < 0)
    assert(c("1.0.a", "1.0.b") < 0)
    assert(c("1.0.0", "1.0") == 0)
    assert(c("0.9", "1.0.a") < 0)
  }

  test("vers containment is scheme-aware") {
    // pep440: 1.0.dev1 < 1.0 → not in >=1.0; generic would say dev1 > 1.0? no —
    // the point: 2.0.0-rc.1 IS < 2.0.0 under semver
    assert(VersRange.contains("vers:npm/>=1.0.0|<2.0.0", "2.0.0-rc.1")
      .contains(true))
    assert(VersRange.contains("vers:pypi/>=1.0", "1.0.dev1").contains(false))
    assert(VersRange.contains("vers:pypi/>=1.0", "1.0.post1").contains(true))
    assert(VersRange.contains("vers:deb/<1.0", "1.0~rc1").contains(true))
    assert(VersRange.contains("vers:maven/>=1.0", "1.0-SNAPSHOT")
      .contains(false))
    assert(VersRange.contains("vers:maven/>=1.0", "1.0-sp").contains(true))
  }

  test("router dispatches to the unique matching handler") {
    val r = new Router[String](Vector(
      """https?://repo1\.maven\.org/.*""".r -> "maven",
      """https?://pypi\.org/.*""".r -> "pypi"))
    assert(r.resolve("https://repo1.maven.org/maven2/x.pom") == "maven")
    assert(r.isRoutable("https://pypi.org/simple/requests/"))
    assert(!r.isRoutable("https://example.com/x"))
    intercept[IllegalStateException](r.resolve("https://example.com/x"))
    val dup = new Router[String](Vector(
      """.*maven.*""".r -> "a", """.*maven\.org.*""".r -> "b"))
    intercept[IllegalStateException](
      dup.resolve("https://repo1.maven.org/f"))
  }

  test("ls -alR listing parser emits (path, type, size, date) entries") {
    val listing =
      """pub/software:
        |total 24
        |drwxr-xr-x  2 root root  4096 Jan  5  2020 .
        |drwxr-xr-x 10 root root  4096 Jan  1  2020 ..
        |-rw-r--r--  1 root root 12345 Mar 15  2021 release-1.0.tar.gz
        |drwxr-xr-x  3 root root  4096 Feb  2  2021 subdir
        |lrwxrwxrwx  1 root root    11 Apr  1 10:30 latest -> release-1.0
        |
        |pub/software/subdir:
        |-rw-r--r--  1 root root   99 Dec 31  2019 notes.txt
        |""".stripMargin
    val entries = LsParser.parse(listing)
    val byPath = entries.map(e => e.path -> e).toMap
    assert(byPath("pub/software/release-1.0.tar.gz").size.contains(12345L))
    assert(byPath("pub/software/release-1.0.tar.gz").date
      .contains("2021-03-15"))
    assert(!byPath("pub/software/subdir").isFile)
    assert(byPath("pub/software/latest").date.isEmpty) // HH:MM → no year
    assert(byPath("pub/software/subdir/notes.txt").size.contains(99L))
    assert(!entries.exists(e => e.path.endsWith("/.") || e.path.endsWith("/..")))
  }

  test("apache svn tag URLs convert to github tree URLs") {
    // the reference's own doctest (find_source_repo.py:84-92)
    assert(SourceRepo.convertApacheSvnToGithubUrl(
      "svn+https://svn.apache.org/repos/asf/cdi/tags/1.0/cdi-extension-el-jsp")
      .contains("https://github.com/apache/cdi/tree/1.0"))
    assert(SourceRepo.convertApacheSvnToGithubUrl(
      "https://svn.apache.org/repos/asf/httpd/tags/2.4.58/server")
      .contains("https://github.com/apache/httpd/tree/2.4.58"))
    // non-asf, non-tags, short, and non-apache shapes all reject
    assert(SourceRepo.convertApacheSvnToGithubUrl(
      "https://svn.apache.org/repos/other/cdi/tags/1.0/x").isEmpty)
    assert(SourceRepo.convertApacheSvnToGithubUrl(
      "https://svn.apache.org/repos/asf/cdi/branches/1.0/x").isEmpty)
    assert(SourceRepo.convertApacheSvnToGithubUrl(
      "https://svn.apache.org/repos/asf/cdi").isEmpty)
    assert(SourceRepo.convertApacheSvnToGithubUrl(
      "https://svn.example.org/repos/asf/cdi/tags/1.0/x").isEmpty)
    assert(SourceRepo.convertApacheSvnToGithubUrl("not a url://").isEmpty)
  }

  test("package sets group binary and source forms idempotently") {
    import spark.implicits._
    import graft.catalog.PackageSets
    val members0 = Seq.empty[(String, String)]
      .toDF("set_id", "download_url")
    val pairs = Seq(
      ("http://repo/a.jar", "http://github/a-src"),
      ("http://repo/b.jar", "http://github/b-src")).toDF(
      "package_url", "source_url")
    val m1 = PackageSets.assignSourcePackages(members0, pairs)
    // each package founded one set holding (package, source)
    val sets = m1.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(sets.size === 2)
    assert(sets.values.toSet === Set(
      Set("http://repo/a.jar", "http://github/a-src"),
      Set("http://repo/b.jar", "http://github/b-src")))
    // re-running is idempotent; adding another source joins the
    // EXISTING set rather than founding a new one
    val m2 = PackageSets.assignSourcePackages(m1, pairs)
    assert(m2.count() === m1.count())
    val m3 = PackageSets.assignSourcePackages(m2,
      Seq(("http://repo/a.jar", "http://github/a-src2"))
        .toDF("package_url", "source_url"))
    val sets3 = m3.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(sets3.size === 2)
    assert(sets3.values.exists(_ === Set("http://repo/a.jar",
      "http://github/a-src", "http://github/a-src2")))
    // members ordered by package_content within a set
    val pkgs = Seq(
      ("http://repo/a.jar", 2), ("http://github/a-src", 1),
      ("http://github/a-src2", 3), ("http://repo/b.jar", 1),
      ("http://github/b-src", 2))
      .toDF("download_url", "package_content")
    val aSet = sets3.find(_._2.contains("http://repo/a.jar")).get._1
    val ordered = PackageSets.members(m3, pkgs)
      .filter(col("set_id") === aSet)
      .select("download_url").as[String].collect().toSeq
    assert(ordered === Seq("http://github/a-src", "http://repo/a.jar",
      "http://github/a-src2"))
  }

  test("repo URLs convert to hosting purls like purl2vcs") {
    // the reference's own test cases (purl2vcs test_convert_repo_urls_to_purls)
    assert(SourceRepo.repoUrlToPurls(
      "https://bitbucket.org/connect2id/oauth-2.0-sdk-with-openid-connect-extensions") ==
      Seq("pkg:bitbucket/connect2id/oauth-2.0-sdk-with-openid-connect-extensions"))
    assert(SourceRepo.repoUrlToPurls(
      "git+https://bitbucket.org/connect2id/oauth-2.0-sdk-with-openid-connect-extensions.git") ==
      Seq("pkg:bitbucket/connect2id/oauth-2.0-sdk-with-openid-connect-extensions"))
    assert(SourceRepo.repoUrlToPurls(
      "git://github.com:maxmind/MaxMind-DB-Reader-java") ==
      Seq("pkg:github/maxmind/MaxMind-DB-Reader-java"))
    assert(SourceRepo.repoUrlToPurls(
      "git+https://github.com/ckeditor/ckeditor4-react.git@335af5b25923beaf5446652dcf2f06574f413779") ==
      Seq("pkg:github/ckeditor/ckeditor4-react"))
    assert(SourceRepo.repoUrlToPurls(
      "git+https://github.com/ckeditor/ckeditor4-react.git") ==
      Seq("pkg:github/ckeditor/ckeditor4-react"))
    assert(SourceRepo.repoUrlToPurls("https://example.org/x/y").isEmpty)
  }

  test("git ls-remote tags parse and match versions like purl2vcs") {
    import org.json4s._
    val dir = "/root/reference/purl2vcs/tests/testfiles/find_source_repo"
    def read(p: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")
    val got = SourceRepo.tagsAndCommits(read(s"$dir/tags_commits.txt"))
    val want = org.json4s.jackson.JsonMethods.parse(
      read(s"$dir/tags_commits_list.txt")) match {
      case JArray(pairs) => pairs.map {
        case JArray(List(JString(t), JString(c))) => (t, c)
        case other => fail(s"unexpected pair: $other")
      }
      case _ => fail("unexpected fixture shape")
    }
    assert(got == want)
    assert(SourceRepo.tagAndCommit("9.35", got) ==
      Some(("9.35", "fdc8117af75b192e3f8afcc0119c904b02686af8")))
  }

  test("char-trigram language id classifies held-out sentences") {
    import graft.functions.LangId
    assert(LangId.predict(
      "this is a simple sentence written in plain everyday language " +
        "about nothing in particular") == "en")
    assert(LangId.predict(
      "esta es una frase sencilla escrita en un idioma cotidiano sobre " +
        "nada en particular para la prueba") == "es")
    assert(LangId.predict(
      "dies ist ein einfacher satz der in ganz alltäglicher sprache " +
        "über nichts besonderes geschrieben wurde") == "de")
    assert(LangId.predict(
      "ceci est une phrase simple écrite dans une langue de tous les " +
        "jours à propos de rien de particulier") == "fr")
    assert(LangId.predict("xq") == "und")
    // deterministic
    val t = "the cat sat on the mat and looked at the dog"
    assert(LangId.predict(t) == LangId.predict(t))
  }

  test("source repo candidate generation") {
    val c = SourceRepo.candidateUrls("maven", Some("org.apache.pulsar"),
      "pulsar", Some("https://github.com/apache/pulsar"))
    assert(c.head == "https://github.com/apache/pulsar")
    assert(c.contains("https://github.com/pulsar/pulsar"))
    val g = SourceRepo.candidateUrls("github", Some("gorilla"), "mux", None)
    assert(g == Seq("https://github.com/gorilla/mux"))
  }

  test("enhanced assembly fills empty fields from lower-rank peers") {
    val members = Seq(
      Enhance.Member("set1", "http://p/bin.jar", Some(Enhance.Binary),
        None, None, Some("mit"), None),
      Enhance.Member("set1", "http://p/src.tar.gz", Some(Enhance.SourceArchive),
        None, Some("http://arch-home"), None, None),
      Enhance.Member("set1", "http://p/repo", Some(Enhance.SourceRepo),
        Some("repo desc"), Some("http://home"), Some("apache-2.0"),
        Some("(c) acme"))).toDF()
    val out = Enhance.enhance(spark, members)
    val bin = out.filter($"download_url" === "http://p/bin.jar")
      .as[Enhance.Enhanced].collect().head
    // binary takes from source-archive (rank 4) AND source-repo (rank 3)
    assert(bin.description.contains("repo desc"))
    assert(bin.homepage_url.contains("http://home") ||
      bin.homepage_url.contains("http://arch-home"))
    assert(bin.declared_license_expression.contains("mit")) // own value kept
    assert(bin.enhanced_by.nonEmpty)
    val arch = out.filter($"download_url" === "http://p/src.tar.gz")
      .as[Enhance.Enhanced].collect().head
    // source-archive may only take from SOURCE_REPO peers
    assert(arch.description.contains("repo desc"))
    assert(arch.enhanced_by == Seq("http://p/repo"))
    val repo = out.filter($"download_url" === "http://p/repo")
      .as[Enhance.Enhanced].collect().head
    assert(repo.enhanced_by.isEmpty) // source-repo passes through
  }

  test("enhance returns NULL-content members unenhanced") {
    // get_enhanced_package early-returns package.to_dict() when
    // package_content is falsy (packagedb/api.py:648-660); the
    // issue-#490 BINARY default applies only to peers.
    val members = Seq(
      Enhance.Member("set1", "http://p/unknown.bin", None,
        None, None, None, None),
      Enhance.Member("set1", "http://p/repo", Some(Enhance.SourceRepo),
        Some("repo desc"), Some("http://home"), Some("apache-2.0"),
        Some("(c) acme"))).toDF()
    val out = Enhance.enhance(spark, members)
    val unk = out.filter($"download_url" === "http://p/unknown.bin")
      .as[Enhance.Enhanced].collect().head
    assert(unk.description.isEmpty && unk.homepage_url.isEmpty &&
      unk.declared_license_expression.isEmpty && unk.copyright.isEmpty)
    assert(unk.enhanced_by.isEmpty)
    // but a NULL-content PEER counts as BINARY for an enhanceable member:
    // it is skipped for a BINARY target (5 >= 5), taken for nothing
    val bin = Enhance.enhance(spark, Seq(
      Enhance.Member("set2", "http://p/bin.jar", Some(Enhance.Binary),
        None, None, None, None),
      Enhance.Member("set2", "http://p/mystery", None,
        Some("mystery desc"), None, None, None)).toDF())
      .filter($"download_url" === "http://p/bin.jar")
      .as[Enhance.Enhanced].collect().head
    assert(bin.description.isEmpty && bin.enhanced_by.isEmpty)
  }

  test("cyclonedx document matches the reference's sbom fixture") {
    // packagedb/tests/test_sbom.py: the full BOM for generic/Foo with
    // two dependency purls, compared after removing the same volatile
    // fields the reference removes (serialNumber, bom-ref, timestamp,
    // ref, properties)
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val pkg = PackageRow.minimal("http://example.com", "generic", "Foo",
      Some("12.34")).copy(
      namespace = Some("generic"), qualifiers = Some("test_qual=qual"),
      subpath = Some("test_subpath"), sha1 = Some("testsha1"),
      md5 = Some("testmd5"), size = Some(101L))
    val deps = Seq(("http://example.com", "pkg:generic/dep1"),
      ("http://example.com", "pkg:generic/dep2"))
      .toDF("download_url", "dep_purl")
    val bom = JsonMethods.parse(
      Sbom.toCycloneDxDocument(Seq(pkg).toDF(), deps)
        .select("bom").as[String].collect().head)

    val expected = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/packagedb/tests/testfiles/sbom/" +
          "package-sbom-expected.json")), "UTF-8"))
    def strip(v: JValue): JValue = v.removeField {
      case ("serialNumber", _) | ("bom-ref", _) | ("timestamp", _) |
           ("ref", _) | ("properties", _) | ("tools", _) => true
      case _ => false
    }
    for (path <- Seq("bomFormat", "specVersion", "version")) {
      assert(bom \ path === expected \ path, path)
    }
    assert(strip(bom \ "metadata" \ "component") ===
      strip(expected \ "metadata" \ "component"))
    assert(strip(bom \ "components") === strip(expected \ "components"))
    // the dependsOn edge list is the dependency purls
    val dependsOn = (bom \ "dependencies")(0) \ "dependsOn"
    assert(dependsOn === (expected \ "dependencies")(0) \ "dependsOn")
    assert((bom \ "dependencies").asInstanceOf[JArray].arr.size ===
      (expected \ "dependencies").asInstanceOf[JArray].arr.size)
  }

  test("cyclonedx export emits valid component json") {
    val pkgs = Seq(PackageRow.minimal("http://x/a.jar", "maven", "a",
      Some("1.0")).copy(sha1 = Some("ab" * 20),
      declared_license_expression = Some("mit"),
      homepage_url = Some("http://home"))).toDF()
    val json = Sbom.toCycloneDx(pkgs).select("component").as[String]
      .collect().head
    assert(json.contains(""""bom-ref":"pkg:maven/a@1.0""""))
    assert(json.contains(""""alg":"SHA-1""""))
    assert(json.contains(""""expression":"mit""""))
    assert(json.contains(""""type":"library""""))
  }
}
