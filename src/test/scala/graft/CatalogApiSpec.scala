package graft

import java.sql.Timestamp

import graft.api.CatalogApi
import graft.catalog.PackageRow
import org.apache.spark.sql.DataFrame

class CatalogApiSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val catalog: DataFrame = Seq(
    PackageRow.minimal("http://r/a-1.2.jar", "maven", "alib", Some("1.2"))
      .copy(namespace = Some("org.acme"), sha1 = Some("s1"),
        release_date = Some(Timestamp.valueOf("2021-01-01 00:00:00"))),
    PackageRow.minimal("http://r/a-1.10.jar", "maven", "alib", Some("1.10"))
      .copy(namespace = Some("org.acme"), sha1 = Some("s1"),
        release_date = Some(Timestamp.valueOf("2020-01-01 00:00:00"))),
    PackageRow.minimal("http://r/b-2.0.tgz", "npm", "blib", Some("2.0"))
      .copy(sha1 = Some("s2")),
    PackageRow.minimal("http://r/c-0.1.whl", "pypi", "clib", Some("0.1")))
    .toDF()

  test("purl filter: conjunctive lookup, OR across purls, distinct") {
    val out = CatalogApi.compile(catalog, CatalogApi.Query(
      purls = Seq("pkg:maven/org.acme/alib@1.2", "pkg:npm/blib")))
    val names = out.select("download_url").as[String].collect().toSet
    assert(names == Set("http://r/a-1.2.jar", "http://r/b-2.0.tgz"))
  }

  test("search DSL + filters compose") {
    val out = CatalogApi.compile(catalog, CatalogApi.Query(
      search = Some("lib name:a^"),
      filters = Map("ptype" -> Seq("maven"))))
    assert(out.select("name").as[String].collect().toSet == Set("alib"))
  }

  test("natural-version sort and stable pagination") {
    val page1 = CatalogApi.compile(catalog, CatalogApi.Query(
      sort = Seq("-version"), pageSize = 2))
      .select("version").as[String].collect().toSeq
    assert(page1 == Seq("2.0", "1.10")) // 1.10 > 1.2 naturally
    val page2 = CatalogApi.compile(catalog, CatalogApi.Query(
      sort = Seq("-version"), page = 2, pageSize = 2))
      .select("version").as[String].collect().toSeq
    assert(page2 == Seq("1.2", "0.1"))
  }

  test("unknown sort or filter fields are rejected") {
    intercept[IllegalArgumentException](CatalogApi.compile(catalog,
      CatalogApi.Query(sort = Seq("bogus"))).collect())
    intercept[IllegalArgumentException](CatalogApi.compile(catalog,
      CatalogApi.Query(filters = Map("nope" -> Seq("x")))).collect())
  }

  test("checksum lookup keeps the earliest release per sha1") {
    val out = CatalogApi.filterByChecksums(catalog, Seq("s1", "s2"))
    val rows = out.select("sha1", "download_url").as[(String, String)]
      .collect().toMap
    assert(rows("s1") == "http://r/a-1.10.jar") // 2020 before 2021
    assert(rows("s2") == "http://r/b-2.0.tgz")
  }

  test("checksum lookup with setMembers enhances hits from set peers") {
    // binary hit (content=5) with empty description; source-repo peer
    // (content=3) in the same set carries the description
    val withSets = Seq(
      PackageRow.minimal("http://r/bin.jar", "maven", "xlib", Some("1.0"))
        .copy(sha1 = Some("sx"), package_content = Some(5)),
      PackageRow.minimal("http://r/src.tar.gz", "maven", "xlib", Some("1.0"))
        .copy(package_content = Some(3),
          description = Some("from source repo")))
      .toDF()
    val sets = Seq(
      ("set1", "http://r/bin.jar"),
      ("set1", "http://r/src.tar.gz")).toDF("set_id", "download_url")
    val out = CatalogApi.filterByChecksums(withSets, Seq("sx"), Some(sets))
    val row = out.select("download_url", "description")
      .as[(String, Option[String])].collect().toMap
    assert(row.keySet == Set("http://r/bin.jar"))
    assert(row("http://r/bin.jar").contains("from source repo"))
  }

  test("purl validation mirrors the reference's endpoint") {
    // packagedb/tests/test_api.py test_api_purl_validation*
    import graft.api.CatalogApi.validatePurl
    // catalog hit
    val hit = validatePurl(catalog, "pkg:npm/blib@2.0",
      checkExistence = true)
    assert(hit.valid && hit.exists.contains(true))
    assert(hit.message === "The provided Package URL is valid, and " +
      "the package exists in the upstream repo.")
    // malformed purl
    val bad = validatePurl(catalog, "pkg:npm/?foobar@1.1.0",
      checkExistence = true)
    assert(!bad.valid && bad.exists.isEmpty)
    assert(bad.message === "The provided PackageURL is not valid.")
    // valid, no existence check requested
    val syntaxOnly = validatePurl(catalog, "pkg:npm/foobar@1.1.0")
    assert(syntaxOnly.valid && syntaxOnly.exists.isEmpty)
    assert(syntaxOnly.message === "The provided PackageURL is valid.")
    // unsupported ecosystem for check_existence
    val unsup = validatePurl(catalog, "pkg:random/foobar@1.1.0",
      checkExistence = true)
    assert(unsup.valid && unsup.exists.isEmpty)
    assert(unsup.message === "The provided PackageURL is valid, but " +
      "`check_existence` is not supported for this package type.")
    // upstream says the version exists / does not exist
    val up = validatePurl(catalog, "pkg:npm/foobar@1.1.0",
      checkExistence = true,
      fetchVersions = p => { assert(p === "pkg:npm/foobar")
        Some(Seq("1.0.0", "1.1.0")) })
    assert(up.exists.contains(true))
    val down = validatePurl(catalog, "pkg:npm/foobar@9.9.9",
      checkExistence = true, fetchVersions = _ => Some(Seq("1.1.0")))
    assert(down.exists.contains(false))
    assert(down.message === "The provided PackageURL is valid, but " +
      "does not exist in the upstream repo.")
  }

  test("purl+vers requests resolve to concrete package versions") {
    // packagedb/api.py get_resolved_packages: versioned purls pass at
    // priority 100, versionless resolve upstream, vers ranges subset,
    // malformed/unsupported inputs reported
    import graft.api.CatalogApi.resolvePackages
    val versions = Map("pkg:npm/foo" -> Seq("1.0.0", "1.5.0", "2.0.0"))
    val out = resolvePackages(
      Seq(
        ("pkg:npm/bar@3.0.0", None),                       // explicit
        ("pkg:npm/foo", None),                             // all versions
        ("pkg:npm/foo", Some("vers:npm/>=1.0.0|<2.0.0")),  // range
        ("pkg:npm/foo", Some("vers:npm/>5.0.0")),          // empty range
        ("pkg:wat/x@1", None),                             // unsupported
        ("not-a-purl", None)),                             // malformed
      p => versions.get(p))
    assert(out.resolved.toMap === Map(
      "pkg:npm/bar@3.0.0" -> 100,
      "pkg:npm/foo@1.0.0" -> 0, "pkg:npm/foo@1.5.0" -> 0,
      "pkg:npm/foo@2.0.0" -> 0))
    assert(out.unsupportedPurls === Seq("pkg:wat/x@1", "not-a-purl"))
    assert(out.unsupportedVers === Seq("vers:npm/>5.0.0"))
    // the range request alone yields only the in-range versions
    val ranged = resolvePackages(
      Seq(("pkg:npm/foo", Some("vers:npm/>=1.0.0|<2.0.0"))),
      p => versions.get(p))
    assert(ranged.resolved.map(_._1).toSet ===
      Set("pkg:npm/foo@1.0.0", "pkg:npm/foo@1.5.0"))
  }

  test("latest version resolves by natural order") {
    val out = CatalogApi.latestVersion(catalog, "maven", Some("org.acme"),
      "alib").select("version").as[String].collect()
    assert(out.toSeq == Seq("1.10"))
  }

  test("update_packages endpoint: existing report as-is, missing create") {
    // packagedb/api.py:520-573 — the request example's semantics:
    // an existing purl is untouched ("Already Exists"); a missing one
    // creates a bare row with a single-space download_url, the
    // content-type code, and an "Updated" status
    val existingPurl = {
      val r = catalog.select("ptype", "namespace", "name", "version")
        .as[(String, Option[String], String, Option[String])].collect().head
      s"pkg:${r._1}/${r._2.fold("")(_ + "/")}${r._3}@${r._4.get}"
    }
    val out = CatalogApi.updatePackages(catalog, Seq(
      existingPurl -> 1,
      "pkg:npm/less@1.0.32" -> 2,
      "not-a-purl" -> 1))
    assert(out.statuses == Seq(
      existingPurl -> "Already Exists",
      "pkg:npm/less@1.0.32" -> "Updated",
      // reference purl_to_lookups raises on this; per-row error status
      "not-a-purl" -> "Invalid PURL"))
    assert(out.created.size == 1)
    val c = out.created.head
    assert(c.download_url == " ")
    assert(c.ptype == "npm" && c.name == "less" &&
      c.version.contains("1.0.32"))
    assert(c.package_content.contains(2))
  }

  test("create_source_repo_packages: inventory import in one pass") {
    // packagedb/management/commands/create_source_repo_packages.py:
    // 60-105 — missing purls skipped; source packages get_or_create'd
    // as SOURCE_REPO (only new ones enqueued); pairs already sharing a
    // set are left alone (intersection guard)
    import graft.catalog.PackageSets
    val cat = Seq(
      PackageRow.minimal("http://d/p1.jar", "maven", "p1", Some("1"))
        .copy(namespace = Some("org.x")),
      PackageRow.minimal("http://d/p2.jar", "maven", "p2", Some("2"))
        .copy(namespace = Some("org.x")),
      // an already-cataloged source repo
      PackageRow.minimal("http://src/p2-src.tgz", "github", "p2src",
        Some("2")).copy(package_content = Some(3))).toDF()
    val scannables = Seq.empty[(String, Int)].toDF("uri", "priority")
    // p2 and its source already share set s1
    val membership = Seq(("s1", "http://d/p2.jar"),
      ("s1", "http://src/p2-src.tgz")).toDF("set_id", "download_url")
    val inventory = Seq(
      // p1: source absent from catalog -> created + enqueued + set
      ("pkg:maven/org.x/p1@1", "github", "gh", "p1src", "1",
        "http://src/p1-src.tgz"),
      // p2: source exists AND shares a set -> fully a no-op
      ("pkg:maven/org.x/p2@2", "github", "gh", "p2src", "2",
        "http://src/p2-src.tgz"),
      // unknown purl -> skipped
      ("pkg:maven/org.x/ghost@9", "github", "gh", "g", "9",
        "http://src/ghost.tgz"))
      .toDF("purl", "source_type", "source_namespace", "source_name",
        "source_version", "source_download_url")

    val (cat2, scan2, mem2, skipped) = PackageSets
      .createSourceRepoPackages(cat, scannables, membership, inventory)

    assert(skipped.as[String].collect().toSeq ==
      Seq("pkg:maven/org.x/ghost@9"))
    val created = cat2.join(cat.select("download_url"),
      Seq("download_url"), "left_anti").collect()
    assert(created.map(_.getAs[String]("download_url")).toSeq ==
      Seq("http://src/p1-src.tgz"))
    assert(created.head.getAs[Int]("package_content") == 3)
    // only the newly created source is enqueued
    assert(scan2.select("uri").as[String].collect().toSeq ==
      Seq("http://src/p1-src.tgz"))
    // p1 founded a set with its source; the p2 pair stayed untouched
    val mem = mem2.as[(String, String)].collect().toSet
    assert(mem.exists(_._2 == "http://src/p1-src.tgz"))
    assert(mem.filter(_._1 == "s1") == Set(
      ("s1", "http://d/p2.jar"), ("s1", "http://src/p2-src.tgz")))
    val p1Sets = mem.filter(_._2 == "http://d/p1.jar").map(_._1)
    assert(p1Sets.size == 1 &&
      mem.contains((p1Sets.head, "http://src/p1-src.tgz")))
  }
}
