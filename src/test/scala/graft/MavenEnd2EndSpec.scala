package graft

import graft.catalog.MergeEngine
import graft.miners.{MavenIndexArtifacts, MavenPom}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Replay of the reference's multi-step maven end2end corpus
  * (`minecode/tests/miners/test_maven.py:427-484` with the
  * `maven/end2end_multisteps/` goldens): the `maven-index://`
  * pre-visited artifact data maps into the catalog, then the POM for
  * the same artifact maps at a higher mining level and merges into
  * the SAME package row — both steps hash-matching the checked-in
  * expected packages (which are identical: the POM supplies no field
  * the index row does not already carry).
  */
class MavenEnd2EndSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "/root/reference/minecode/tests/testfiles/maven/end2end_multisteps"

  private def readJson(path: String): JValue =
    JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  private def jstr(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s); case _ => None
  }

  private def assertGolden(row: org.apache.spark.sql.Row,
      goldenPath: String): Unit = {
    val w = (readJson(goldenPath): @unchecked) match {
      case JArray(Seq(p)) => p
    }
    assert(row.getAs[String]("ptype") == "maven")
    assert(Option(row.getAs[String]("namespace")) == jstr(w \ "namespace"))
    assert(row.getAs[String]("name") == jstr(w \ "name").get)
    assert(Option(row.getAs[String]("version")) == jstr(w \ "version"))
    assert(Option(row.getAs[String]("description")) == jstr(w \ "description"))
    assert(row.getAs[String]("download_url") == jstr(w \ "download_url").get)
    assert(Option(row.getAs[String]("sha1")) == jstr(w \ "sha1"))
    assert(Option(row.getAs[Long]("size")).map(BigInt(_)) ==
      ((w \ "size") match { case JInt(n) => Some(n); case _ => None }))
    assert(Option(row.getAs[java.sql.Timestamp]("release_date"))
      .map(_.toString.take(10)) ==
      jstr(w \ "release_date").map(_.take(10)))
  }

  test("index data maps, then the POM merges into the same package") {
    // Step 1: the pre-visited index URI's data payload → mini package
    val indexUri = readJson(s"$base/commons-jaxrs-1.21-index-data.json")
    val pkg = MavenIndexArtifacts
      .miniPackageFromIndexData(jstr(indexUri \ "data").get)
      .getOrElse(fail("index data did not build a package"))
    val catalog = Seq(pkg).toDF()
    assertGolden(catalog.collect().head,
      s"$base/expected_mapped_commons-jaxrs-1.21-from-index.json")

    // Step 2: the POM maps at mining level 20. The reference's POM
    // parse yields no download_url (`model_utils.py:257-262` then
    // returns without merging), so the catalog is untouched — which
    // is exactly why the from-pom golden is byte-identical to the
    // from-index golden. The POM itself must still parse cleanly.
    val pomUri = readJson(s"$base/commons-jaxrs-1.21-pom-data.json")
    val pomText = jstr(pomUri \ "data").get
    val pom = MavenPom.parse(pomText).getOrElse(fail("unparseable POM"))
    assert(pom.artifactId.contains("commons-jaxrs"))
    assert(pom.effectiveGroupId.contains("edu.psu.swe.commons"))
    assert(pom.effectiveVersion.contains("1.21"))

    val pomPkg = MavenPom.pomPackage(pomText)
      .getOrElse(fail("POM did not build a package")).row
    // our builder falls back to the POM's own URL when the POM names
    // no artifact download; the reference's flow treats that as "no
    // download_url" and skips the merge (model_utils.py:257-262)
    val incoming = Seq(pomPkg).toDF()
      .filter(!$"download_url".endsWith(".pom"))
      .withColumn("visit_level",
        lit((pomUri \ "mining_level") match {
          case JInt(n) => n.toInt; case _ => 20
        }))
    val merged =
      if (incoming.isEmpty) catalog
      else MergeEngine.mergePackages(catalog, incoming,
        "2026-08-12T00:00:00Z").packages
    assert(merged.count() == 1)
    assertGolden(merged.collect().head,
      s"$base/expected_mapped_commons-jaxrs-1.21-from-pom.json")
  }

  test("get_maven_release_dates fills dates from directory listings") {
    // minecode/management/commands/get_maven_release_dates.py — only
    // maven rows missing a date under repo1.maven.org are touched;
    // the listing's artifact timestamp becomes the release_date
    import graft.catalog.PackageRow
    import graft.miners.{MavenCrawl, Transport}
    val base = "https://repo1.maven.org/maven2/g/a/1.0"
    val listing =
      """<a href="../">../</a>
        |<a href="a-1.0.jar" title="a-1.0.jar">a-1.0.jar</a>
        |                 2015-09-22 16:03       12345
        |<a href="a-1.0.pom" title="a-1.0.pom">a-1.0.pom</a>
        |                 2015-09-22 16:02       321
        |""".stripMargin
    val transport = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] =
        if (uri == base) Right(listing.getBytes("UTF-8"))
        else Left(s"unexpected fetch: $uri")
    }
    val existingDate =
      Some(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    val pkgs = Seq(
      PackageRow.minimal(s"$base/a-1.0.jar", "maven", "a", Some("1.0")),
      // already dated: untouched (and its page never fetched)
      PackageRow.minimal(s"$base/a-1.0.pom", "maven", "a", Some("1.0"))
        .copy(release_date = existingDate),
      // non-repo1: untouched
      PackageRow.minimal("https://other.repo/x.jar", "maven", "x"),
      // non-maven: untouched
      PackageRow.minimal(s"$base/a-1.0.jar.other", "npm", "a")).toDF()
    val out = MavenCrawl.fillReleaseDates(pkgs, transport)
      .select("download_url", "release_date")
      .as[(String, Option[java.sql.Timestamp])].collect().toMap
    assert(out(s"$base/a-1.0.jar")
      .contains(java.sql.Timestamp.valueOf("2015-09-22 16:03:00")))
    assert(out(s"$base/a-1.0.pom") == existingDate)
    assert(out("https://other.repo/x.jar").isEmpty)
    assert(out(s"$base/a-1.0.jar.other").isEmpty)
  }

  test("update_maven_package_data: refresh, lowercase-fix, dedupe, create") {
    // minecode/management/commands/update_maven_package_data.py —
    // the four decision paths of the index-vs-catalog diff
    import graft.catalog.PackageRow
    import graft.miners.MavenCrawl
    def idxRow(ns: String, name: String, v: String, url: String,
        date: String): PackageRow =
      PackageRow.minimal(url, "maven", name, Some(v))
        .copy(namespace = Some(ns),
          release_date = Some(java.sql.Timestamp.valueOf(date)))
    val index = Seq(
      idxRow("org.a", "lib", "1.0", "https://r/a/lib-1.0.jar",
        "2020-01-01 00:00:00"),
      idxRow("org.b", "MixedCase", "2.0", "https://r/b/mixedcase-2.0.jar",
        "2021-01-01 00:00:00"),
      idxRow("org.c", "fresh", "3.0", "https://r/c/fresh-3.0.jar",
        "2022-01-01 00:00:00")).toDF()
    val catalog = Seq(
      // exact match, stale date and a coordinate-duplicate at a wrong URL
      PackageRow.minimal("https://r/a/lib-1.0.jar", "maven", "lib",
        Some("1.0")).copy(namespace = Some("org.a")),
      PackageRow.minimal("https://r/a/WRONG-lib-1.0.jar", "maven", "lib",
        Some("1.0")).copy(namespace = Some("org.a")),
      // lowercased coordinates that need canonicalizing
      PackageRow.minimal("https://r/b/mixedcase-2.0.jar", "maven",
        "mixedcase", Some("2.0")).copy(namespace = Some("org.b")),
      // untouched non-maven row
      PackageRow.minimal("https://npm/x.tgz", "npm", "x")).toDF()

    val out = MavenCrawl.updateFromIndex(catalog, index,
      createMissing = true)
    val rows = out.packages
      .select("download_url", "name", "release_date")
      .as[(String, String, Option[java.sql.Timestamp])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // refresh: exact match got the index date
    assert(rows("https://r/a/lib-1.0.jar")._2
      .contains(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
    // dedupe: the wrong-URL duplicate was deleted
    assert(!rows.contains("https://r/a/WRONG-lib-1.0.jar"))
    assert(out.deleted.select("download_url").as[String].collect().toSeq ==
      Seq("https://r/a/WRONG-lib-1.0.jar"))
    // lowercase-fix: coordinates canonicalized to the index casing
    assert(rows("https://r/b/mixedcase-2.0.jar")._1 == "MixedCase")
    // create: the unseen index package materialized
    assert(rows.contains("https://r/c/fresh-3.0.jar"))
    // non-maven untouched
    assert(rows.contains("https://npm/x.tgz"))
    // 3 survivors (duplicate deleted) + 1 created
    assert(out.packages.count() == 4)
  }

  test("update_maven_package_data: coordinate match without the index URL") {
    // update_maven_package_data.py:219-242 — when no coordinate match
    // carries the index URL, update_maven_packages returns None and
    // its collected duplicates are DISCARDED: the stale row survives
    // untouched and the index package is created alongside
    import graft.catalog.PackageRow
    import graft.miners.MavenCrawl
    val index = Seq(
      PackageRow.minimal("https://r/d/lib-4.0.jar", "maven", "lib",
        Some("4.0")).copy(namespace = Some("org.d"),
        release_date =
          Some(java.sql.Timestamp.valueOf("2023-01-01 00:00:00")))).toDF()
    val catalog = Seq(
      PackageRow.minimal("https://r/d/OLD-lib-4.0.jar", "maven", "lib",
        Some("4.0")).copy(namespace = Some("org.d"))).toDF()
    val out = MavenCrawl.updateFromIndex(catalog, index,
      createMissing = true)
    val urls = out.packages.select("download_url").as[String].collect().toSet
    assert(urls == Set("https://r/d/OLD-lib-4.0.jar",
      "https://r/d/lib-4.0.jar"))
    assert(out.deleted.isEmpty)
  }

  test("unicode POM visit-and-map yields no package (empty golden)") {
    // test_maven.py:390-425: the 1.22 POM (with unicode content)
    // parses, but a bare POM map has no download_url, so the mapped-
    // packages golden is the empty list
    val pomText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/minecode/tests/testfiles/" +
        "maven/end2end_unicode/commons-jaxrs-1.22.pom")), "UTF-8")
    val pom = MavenPom.parse(pomText).getOrElse(fail("unparseable POM"))
    assert(pom.artifactId.contains("commons-jaxrs"))
    assert(pom.effectiveVersion.contains("1.22"))
    val golden = readJson("/root/reference/minecode/tests/testfiles/" +
      "maven/end2end_unicode/expected_mapped_commons-jaxrs-1.22.json")
    assert(golden == JArray(Nil))
    val mapped = Seq(MavenPom.pomPackage(pomText).get.row).toDF()
      .filter(!$"download_url".endsWith(".pom"))
    assert(mapped.isEmpty)
  }

  test("fix_purl_values repairs maven rows from the sha1 index") {
    // packagedb/management/commands/fix_purl_values.py:147-204 —
    // no-hit deletes, dead-url self-fix, case-insensitive
    // canonicalization; resolving rows and non-maven rows untouched
    import graft.catalog.PackageRow
    import graft.miners.MavenCrawl
    import graft.miners.MavenCrawl.FixArtifact
    def m(url: String, ns: String, name: String, ver: String,
        sha1: String) =
      PackageRow.minimal(url, "maven", name, Some(ver))
        .copy(namespace = Some(ns), sha1 = Some(sha1))
    val catalog = Seq(
      m("http://r/a-1.0.jar", "org.x", "a", "1.0", "s1"),  // self-fix
      m("http://r/b-1.0.jar", "org.x", "b", "1.0", "s2"),  // delete
      m("http://r/C-2.0.jar", "ORG.Y", "Cc", "2.0", "s3"), // canon
      m("http://r/d-3.0.jar", "org.z", "d", "3.0", "s4"),  // resolves
      PackageRow.minimal("http://n/p.tgz", "npm", "p", Some("1"))).toDF()
    val lookup: String => Seq[FixArtifact] = {
      case "s1" => Seq(FixArtifact("org.x", "a", "1.0", "",
        "http://repo1/a-1.0.jar", None))
      case "s2" => Seq.empty
      case "s3" => Seq(FixArtifact("org.y", "cc", "2.0", "",
        "http://repo1/cc-2.0.jar", None))
      case "s4" => Seq(FixArtifact("org.z", "d", "3.0", "",
        "http://repo1/d-3.0.jar", None))
      case _ => Seq.empty
    }
    val resolves: String => Boolean = _ == "http://r/d-3.0.jar"
    val (repaired, deleted) =
      MavenCrawl.fixPurlValues(catalog, lookup, resolves)

    assert(deleted.select("download_url").as[String].collect().toSeq ==
      Seq("http://r/b-1.0.jar"))
    val rows = repaired.collect().map(r =>
      r.getAs[String]("sha1") -> r).toMap
    // dead URL re-pointed, coordinates untouched
    assert(rows("s1").getAs[String]("download_url") ==
      "http://repo1/a-1.0.jar")
    assert(rows("s1").getAs[String]("namespace") == "org.x")
    // case-different row canonicalized to the artifact's coordinates
    assert(rows("s3").getAs[String]("namespace") == "org.y")
    assert(rows("s3").getAs[String]("name") == "cc")
    assert(rows("s3").getAs[String]("download_url") ==
      "http://repo1/cc-2.0.jar")
    // resolving row and the non-maven row pass through unchanged
    assert(rows("s4").getAs[String]("download_url") == "http://r/d-3.0.jar")
    assert(repaired.filter($"ptype" === "npm")
      .select("download_url").as[String].collect().toSeq ==
      Seq("http://n/p.tgz"))
    assert(repaired.count() == 4)
  }
}
