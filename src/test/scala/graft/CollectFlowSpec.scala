package graft

import graft.catalog.PackageRow
import graft.miners.{CollectFlow, Transport}

/** End-to-end §3.2 collect flow with a fake registry transport:
  * request → fetch → parse → build → level-aware merge into the
  * catalog.
  */
class CollectFlowSpec extends SparkTestBase {
  import spark.implicits._

  private val transport = new Transport {
    def fetch(uri: String): Either[String, Array[Byte]] = uri match {
      case u if u.contains("pypi.org/pypi/requests") =>
        Right("""{"releases": {"2.31.0": [{"upload_time": "2023-05-22T00:00:00"}],
          "2.30.0": [{"upload_time": "2023-05-03T00:00:00"}]}}""".getBytes)
      case u if u.contains("repo1.maven.org") && u.endsWith("maven-metadata.xml") =>
        Right("""<metadata><versioning><versions>
          <version>2.5.0</version><version>2.5.1</version>
          </versions></versioning></metadata>""".getBytes)
      case u if u.contains("registry.npmjs.org/leftpad") =>
        Left("404 not found")
      case u if u.contains("registry.npmjs.org/@types%2Fnode") =>
        Right("""{"versions": {"20.1.0": {}},
          "time": {"20.1.0": "2023-05-05T00:00:00Z"}}""".getBytes)
      case u if u.contains("crates.io/api/v1/crates/serde") =>
        Right("""{"versions": [
          {"num": "1.0.100", "updated_at": "2019-10-17T00:00:00Z"}]}"""
          .getBytes)
      case u if u.contains("rubygems.org/api/v1/versions/rails.json") =>
        Right("""[{"number": "7.0.2.3",
          "published_at": "2022-03-08T17:50:52.496Z"}]""".getBytes)
      case u if u.contains("api.nuget.org/v3/registration5-semver1/razorengine") =>
        Right("""{"items": [{"items": [{"catalogEntry":
          {"version": "3.0.0", "published": "2011-11-24T00:26:02Z"}}]}]}"""
          .getBytes)
      case u if u.contains("repo.packagist.org/p/typo3/cms-core.json") =>
        Right("""{"packages": {"typo3/cms-core": {
          "v9.5.1": {"time": "2018-10-30T10:45:30+00:00",
            "dist": {"url": "https://api.github.com/repos/TYPO3/zip/abc"}},
          "10.2.x-dev": {"time": "2020-01-01T00:00:00+00:00"}}}}""".getBytes)
      case u if u.contains("hex.pm/api/packages/jason") =>
        Right("""{"releases": [
          {"version": "1.4.0", "inserted_at": "2022-10-01T00:00:00Z"}]}"""
          .getBytes)
      case u if u.contains("proxy.golang.org/github.com/!burnt!sushi/toml/@v/list") =>
        Right("v0.3.1\nv1.0.0\n".getBytes)
      case u if u.contains("sources.debian.org/api/src/zlib") =>
        Right("""{"versions": [{"version": "1:1.2.13.dfsg-1"}]}""".getBytes)
      case u if u.contains("api.launchpad.net") && u.contains("source_name=bash") &&
          !u.contains("memo") =>
        // page 1 of a paginated getPublishedSources collection
        Right("""{"entries": [
            {"source_package_version": "0:5.1-6ubuntu1",
             "date_published": "2022-03-01T10:00:00.123456+00:00"}],
          "next_collection_link": "https://api.launchpad.net/1.0/ubuntu/+archive/primary?ws.op=getPublishedSources&source_name=bash&exact_match=true&memo=1"}"""
          .getBytes)
      case u if u.contains("api.launchpad.net") && u.contains("memo=1") =>
        Right("""{"entries": [
            {"source_package_version": "5.2-2ubuntu3",
             "date_published": "2023-05-10T09:30:00+00:00"}]}""".getBytes)
      case u => Left(s"unexpected fetch: $u")
    }
  }

  test("collect fetches, parses, builds, and merges per ecosystem") {
    val existing = Seq(
      // pre-existing row at HIGHER level with a description: the
      // incoming collect (level 50) must replace version-empty fields
      // only where merge rules allow
      PackageRow.minimal(
        "https://pypi.org/packages/source/r/requests/requests-2.31.0.tar.gz",
        "pypi", "requests", Some("2.31.0"), miningLevel = 10)
        .copy(description = Some("kept desc"))).toDF()

    val (merged, errors) = CollectFlow.collect(spark, existing,
      Seq("pkg:pypi/requests",
        "pkg:maven/org.apache.pulsar/pulsar",
        "pkg:npm/leftpad",     // transport 404
        "pkg:brew/wget",       // unsupported ecosystem
        "not-a-purl"),
      transport, "2026-08-12T00:00:00Z")

    val rows = merged.select("download_url", "ptype", "name", "version",
      "mining_level")
      .as[(String, String, String, String, Int)].collect()
    // 2 pypi versions (one pre-existing, updated) + 2 maven versions
    assert(rows.length == 4)
    val pulsar = rows.filter(_._2 == "maven")
    assert(pulsar.map(_._4).toSet == Set("2.5.0", "2.5.1"))
    // existing pypi row survived the merge at the bumped level,
    // description kept (incoming had none)
    val req = merged.filter($"version" === "2.31.0").collect().head
    assert(req.getAs[String]("description") == "kept desc")
    assert(req.getAs[Int]("mining_level") == 50) // 50 >= 10 → bumped

    assert(errors.exists(_.contains("404")))
    assert(errors.exists(_.contains("unsupported ecosystem")))
    assert(errors.exists(_.contains("invalid purl")))
  }

  test("collect covers cargo, gem, nuget, composer, hex, golang, deb") {
    val empty = Seq.empty[PackageRow].toDF()
    val (merged, errors) = CollectFlow.collect(spark, empty,
      Seq("pkg:cargo/serde", "pkg:gem/rails", "pkg:nuget/RazorEngine",
        "pkg:composer/typo3/cms-core", "pkg:hex/jason",
        "pkg:golang/github.com/BurntSushi/toml",
        "pkg:deb/debian/zlib"),
      transport, "2026-08-12T00:00:00Z")
    assert(errors.isEmpty, errors.mkString("; "))
    val rows = merged.select("ptype", "name", "version", "download_url")
      .as[(String, String, String, String)].collect()
    val byType = rows.groupBy(_._1).view.mapValues(_.toSeq).toMap
    assert(byType("cargo").head._4 ==
      "https://static.crates.io/crates/serde/serde-1.0.100.crate")
    assert(byType("gem").head._3 == "7.0.2.3")
    // nuget ids and versions lowercase in the flatcontainer URL
    assert(byType("nuget").head._4 ==
      "https://api.nuget.org/v3-flatcontainer/razorengine/3.0.0/razorengine.3.0.0.nupkg")
    assert(byType("nuget").head._2 == "RazorEngine")
    // composer: dev version skipped, v stripped, dist URL used
    assert(byType("composer").map(_._3).toSeq == Seq("9.5.1"))
    assert(byType("composer").head._4.contains("api.github.com"))
    assert(byType("hex").head._4 ==
      "https://repo.hex.pm/tarballs/jason-1.4.0.tar")
    // golang: case-encoded proxy path, both versions
    assert(byType("golang").map(_._3).toSet == Set("v0.3.1", "v1.0.0"))
    assert(byType("golang").head._4.startsWith(
      "https://proxy.golang.org/github.com/!burnt!sushi/toml/@v/"))
    // deb: epoch kept (not the default 0:), pool layout
    assert(byType("deb").head._3 == "1:1.2.13.dfsg-1")
    assert(byType("deb").head._4 ==
      "https://deb.debian.org/debian/pool/main/z/zlib/zlib_1:1.2.13.dfsg-1.dsc")
  }

  test("scoped npm purls build scope-aware registry and tarball URLs") {
    val empty = Seq.empty[PackageRow].toDF()
    val (merged, errors) = CollectFlow.collect(spark, empty,
      Seq("pkg:npm/%40types/node"), transport, "2026-08-12T00:00:00Z")
    assert(errors.isEmpty, errors.mkString("; "))
    val row = merged.select("namespace", "name", "version", "download_url")
      .as[(Option[String], String, String, String)].collect().head
    assert(row._1.contains("@types"))
    assert(row._4 ==
      "https://registry.npmjs.org/@types/node/-/node-20.1.0.tgz")
    // npm versions carry the registry's time{} release date (A7/J9
    // latest-version ordering keys off release_date)
    val rd = merged.select("release_date").collect().head.get(0)
    assert(rd != null && rd.toString.startsWith("2023-05-05"))
  }

  test("ubuntu debs resolve via Launchpad with pagination and epoch strip") {
    val empty = Seq.empty[PackageRow].toDF()
    val (merged, errors) = CollectFlow.collect(spark, empty,
      Seq("pkg:deb/ubuntu/bash"), transport, "2026-08-12T00:00:00Z")
    assert(errors.isEmpty, errors.mkString("; "))
    val rows = merged
      .select("namespace", "version", "download_url", "release_date")
      .collect()
    // both pages walked via next_collection_link; default epoch gone
    assert(rows.map(_.getString(1)).toSet == Set("5.1-6ubuntu1", "5.2-2ubuntu3"))
    assert(rows.forall(_.getString(0) == "ubuntu"))
    assert(rows.forall(_.getString(2).startsWith(
      "https://archive.ubuntu.com/ubuntu/pool/main/b/bash/bash_")))
    assert(rows.forall(_.get(3) != null)) // date_published parsed
    // debian namespace still routes to sources.debian.org
    val (m2, e2) = CollectFlow.collect(spark, empty,
      Seq("pkg:deb/debian/zlib"), transport, "2026-08-12T00:00:00Z")
    assert(e2.isEmpty)
    assert(m2.select("version").collect().head.getString(0) == "1:1.2.13.dfsg-1")
  }

  test("npm collect of lodash matches the reference's collector test") {
    // collectors/test_npm.py:48-59 — map_npm_package over the real
    // checked-in lodash registry document must produce
    // pkg:npm/lodash@4.17.21 with the canonical tarball download_url
    val lodashJson = java.nio.file.Files.readAllBytes(java.nio.file.Paths
      .get("/root/reference/minecode/tests/testfiles/npm/" +
        "lodash_package-expected.json"))
    val lodashTransport = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] =
        if (uri == "https://registry.npmjs.org/lodash/4.17.21")
          Right(lodashJson)
        else Left(s"unexpected fetch: $uri")
    }
    val (merged, errors) = CollectFlow.collect(spark,
      Seq.empty[PackageRow].toDF(), Seq("pkg:npm/lodash@4.17.21"),
      lodashTransport, "2026-08-12T00:00:00Z")
    assert(errors.isEmpty, errors.mkString("; "))
    val rows = merged.filter($"version" === "4.17.21")
      .select("ptype", "name", "download_url").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "npm" &&
      rows.head.getString(1) == "lodash")
    assert(rows.head.getString(2) ==
      "https://registry.npmjs.org/lodash/-/lodash-4.17.21.tgz")
  }

  test("collect with no resolvable purls leaves the catalog untouched") {
    val existing = Seq(PackageRow.minimal("http://x", "maven", "a")).toDF()
    val (merged, errors) = CollectFlow.collect(spark, existing,
      Seq("pkg:npm/leftpad"), transport, "2026-08-12T00:00:00Z")
    assert(merged.count() == 1)
    assert(errors.size == 1)
  }
}
