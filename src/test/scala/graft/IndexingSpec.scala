package graft

import graft.matching.Indexing
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Golden tests for the scan-data indexing flow against the
  * reference's own `indexing/` fixtures (`minecode/tests/
  * test_indexing.py`): the wagon-api scan's resource rows and index
  * counts, the dwarf scan's halo1 index, the summary-driven package
  * field updates, and the sha1 duplicate preference.
  */
class IndexingSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtures = "/root/reference/minecode/tests/testfiles/indexing"

  private def read(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$name")), "UTF-8")

  private val wagonUrl = "https://repo1.maven.org/maven2/maven/wagon-api/" +
    "20040705.181715/wagon-api-20040705.181715.jar"

  private lazy val wagonScan = Indexing.scanResources(
    Seq((wagonUrl, read("scancodeio_wagon-api-20040705.181715.json")))
      .toDF("download_url", "scan_json")).cache()

  test("wagon-api scan explodes into the reference's resource rows") {
    // test_indexing_index_package_files: 64 resources, fields matching
    // the checked-in expected JSON row for row
    val got = Indexing.resources(wagonScan).collect()
      .map(r => r.getAs[String]("path") -> r).toMap
    assert(got.size === 64)

    val expected = JsonMethods.parse(
      read("scancodeio_wagon-api-20040705.181715-expected.json"))
      .asInstanceOf[JArray].arr
    assert(expected.size === 64)
    def str(v: JValue, k: String): String = v \ k match {
      case JString(s) => s
      case _          => null
    }
    expected.foreach { e =>
      val path = str(e, "path")
      val r = got(path)
      assert(r.getAs[String]("name") === str(e, "name"), path)
      assert(r.getAs[Boolean]("is_file") === (str(e, "type") == "file"), path)
      val JInt(sz) = (e \ "size"): @unchecked
      assert(r.getAs[Long]("size") === sz.toLong, path)
      assert(Option(r.getAs[String]("sha1")).getOrElse("") ===
        str(e, "sha1"), path)
      assert(Option(r.getAs[String]("md5")).getOrElse("") ===
        str(e, "md5"), path)
      assert(Option(r.getAs[String]("sha256")).getOrElse("") ===
        str(e, "sha256"), path)
      assert(Option(r.getAs[String]("mime_type")).getOrElse("") ===
        str(e, "mime_type"), path)
      assert(Option(r.getAs[String]("programming_language")).getOrElse("")
        === str(e, "programming_language"), path)
    }
  }

  test("wagon-api scan builds the reference's index counts") {
    // test_indexing_index_package_files: 11 / 11 / 2 / 45
    assert(Indexing.directoryContentIndex(wagonScan).count() === 11)
    assert(Indexing.directoryStructureIndex(wagonScan).count() === 11)
    assert(Indexing.resourceContentIndex(wagonScan).count() === 2)
    assert(Indexing.exactFileIndex(wagonScan).count() === 45)

    // the META-INF directory-content fingerprint is indexed verbatim
    val metaInf = Indexing.directoryContentIndex(wagonScan)
      .filter(col("path") === "META-INF").collect()
    assert(metaInf.length === 1)
    assert(metaInf(0).getAs[String]("fingerprint") ===
      "000000022b0422490200223401893280e0912000")
    assert(!metaInf(0).getAs[Boolean]("is_file"))

    // index rows are the approximateMatch input shape
    assert(Indexing.directoryContentIndex(wagonScan).columns.toSet ===
      Set("fingerprint", "download_url", "path", "name", "size", "is_file"))
  }

  test("matchcode api batch filters look up the built indexes") {
    // matchcode/api.py:160-260 — multi-sha1 and multi-fingerprint
    // batch lookups over the same index frames
    import graft.matching.MatchApi
    val files = Indexing.exactFileIndex(wagonScan)
    val someSha1 = files.select("sha1")
      .as[String].collect().take(2).toSeq
    val hit = MatchApi.filterBySha1s(files,
      someSha1.map(_.toUpperCase) :+ "feedfeed")
    assert(hit.select("sha1").as[String].collect().toSet == someSha1.toSet)
    assert(MatchApi.filterBySha1s(files, Seq("feedfeed")).isEmpty)
    assert(MatchApi.filterBySha1s(files, Seq.empty).count() == files.count())

    val dirs = Indexing.directoryContentIndex(wagonScan)
    val metaInfFp = "000000022b0422490200223401893280e0912000"
    val fpHit = MatchApi.filterByFingerprints(dirs, Seq(metaInfFp))
    assert(fpHit.select("path").as[String].collect().toSeq == Seq("META-INF"))
    assert(MatchApi.filterByFingerprints(dirs, Seq("0" * 40)).isEmpty)
  }

  test("dwarf scan yields one resource and no fingerprint indexes") {
    // test_indexing_index_package_dwarf: one resource; its extra_data
    // carries dwarf paths, no fingerprints, so every index is empty
    val url = "https://github.com/nexB/elf-inspector/raw/" +
      "4333e1601229da87fa88961389d7397af6e027c4/tests/data/" +
      "dwarf_and_elf/analyze.so.debug"
    val scan = Indexing.scanResources(
      Seq((url, read("get_scan_data_dwarf.json")))
        .toDF("download_url", "scan_json"))
    val rows = Indexing.resources(scan).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("path") === "analyze.so.debug")
    assert(rows(0).getAs[String]("sha1") ===
      "0c2ec13722082672f1bb2949e8236564ac6ee36c")
    assert(rows(0).getAs[Long]("size") === 38412L)
    assert(rows(0).getAs[Boolean]("is_binary"))
    assert(Indexing.exactFileIndex(scan).count() === 1)
    assert(Indexing.resourceContentIndex(scan).count() === 0)
    assert(Indexing.directoryContentIndex(scan).count() === 0)
    assert(Indexing.snippetIndex(scan).count() === 0)
  }

  test("summary data updates package fields without clobbering") {
    // test_indexing_index_package: apache-2.0 + holder copyright +
    // archive checksums land; empty summary values never override
    val packages = Seq(
      (wagonUrl, "maven", "wagon-api", null: String, null: String,
        null: String, null: String, null: String, null: String,
        0L, "existing-desc"),
      ("http://other/pkg", "npm", "other", "mit", "kept (c)",
        "m0", "s0", "s2", "s5", 7L, "d"))
      .toDF("download_url", "ptype", "name",
        "declared_license_expression", "copyright", "md5", "sha1",
        "sha256", "sha512", "size", "description")
    val updates = Seq(
      (wagonUrl, "apache-2.0", Seq.empty[String],
        "Apache Software Foundation", "md5", "sha1", "sha256", "sha512",
        100L),
      // dwarf-style empty summary: nothing overrides
      ("http://other/pkg", null: String, Seq.empty[String], "",
        "", "", "", "", 0L))
      .toDF("download_url", "declared_license_expression",
        "other_license_expressions", "declared_holder", "md5", "sha1",
        "sha256", "sha512", "size")

    val out = Indexing.packageUpdates(packages, updates)
      .collect().map(r => r.getAs[String]("download_url") -> r).toMap
    val wagon = out(wagonUrl)
    assert(wagon.getAs[String]("declared_license_expression") ===
      "apache-2.0")
    assert(wagon.getAs[String]("copyright") ===
      "Copyright (c) Apache Software Foundation")
    assert(wagon.getAs[String]("md5") === "md5")
    assert(wagon.getAs[String]("sha512") === "sha512")
    assert(wagon.getAs[Long]("size") === 100L)
    assert(wagon.getAs[String]("description") === "existing-desc")
    val other = out("http://other/pkg")
    assert(other.getAs[String]("declared_license_expression") === "mit")
    assert(other.getAs[String]("copyright") === "kept (c)")
    assert(other.getAs[String]("md5") === "m0")
  }

  test("other license expressions combine like the reference") {
    val packages = Seq(("u", "maven", null: String, null: String,
      null: String, null: String, null: String, null: String, 0L))
      .toDF("download_url", "ptype", "declared_license_expression",
        "copyright", "md5", "sha1", "sha256", "sha512", "size")
    def run(other: Seq[String]): String =
      Indexing.packageUpdates(packages,
        Seq(("u", null: String, other, "", "", "", "", "", 0L))
          .toDF("download_url", "declared_license_expression",
            "other_license_expressions", "declared_holder", "md5",
            "sha1", "sha256", "sha512", "size"))
        .collect()(0).getAs[String]("other_license_expression")
    assert(run(Seq("mit")) === "mit")
    assert(run(Seq("mit", "apache-2.0")) === "mit AND apache-2.0")
    assert(run(Seq("mit OR gpl-2.0", "apache-2.0")) ===
      "(mit OR gpl-2.0) AND apache-2.0")
    assert(run(Seq("mit", "mit", "")) === "mit")
    assert(run(Seq.empty) === null)
  }

  test("sha1 duplicates prefer registry over source-forge provenance") {
    // test_update_check_for_duplicate_packages: same sha1 from github
    // and maven — the maven (repo-type) row wins, github is flagged
    val packages = Seq(
      ("https://github.com//wagon-api/wagon-api.jar", "github", "12345",
        null: String),
      ("https://repo1.maven.org/wagon-api.jar", "maven", "12345",
        null: String),
      ("http://x/no-sha", "npm", null: String, null: String),
      // same sha1, both plain types: earliest release wins
      ("http://a/old", "generic", "99", "2020-01-01"),
      ("http://b/new", "generic", "99", "2021-01-01"))
      .toDF("download_url", "ptype", "sha1", "rd")
      .withColumn("release_date", col("rd").cast("timestamp")).drop("rd")
    val out = Indexing.markDuplicates(packages).collect()
      .map(r => r.getAs[String]("download_url") ->
        r.getAs[Boolean]("is_duplicate")).toMap
    assert(out("https://repo1.maven.org/wagon-api.jar") === false)
    assert(out("https://github.com//wagon-api/wagon-api.jar") === true)
    assert(out("http://x/no-sha") === false)
    assert(out("http://a/old") === false)
    assert(out("http://b/new") === true)
  }

  test("snippet indexes explode fingerprint arrays with positions") {
    val json = """{"files": [
      {"path": "a.c", "type": "file", "name": "a.c", "sha1": "aa",
       "extra_data": {"snippets": [
          {"snippet": "0123456789abcdef0123456789abcdef", "position": 0},
          {"snippet": "ffffffffffffffffffffffffffffffff", "position": 7}],
        "stemmed_snippets": [
          {"snippet": "0000000000000000ffffffffffffffff", "position": 3}]}},
      {"path": "b.c", "type": "file", "name": "b.c", "sha1": "bb",
       "extra_data": {}}]}"""
    val scan = Indexing.scanResources(
      Seq(("http://p", json)).toDF("download_url", "scan_json"))
    val sn = Indexing.snippetIndex(scan).orderBy("position").collect()
    assert(sn.map(r => (r.getAs[String]("fingerprint"),
      r.getAs[Long]("position"), r.getAs[String]("path"))).toSeq === Seq(
      ("0123456789abcdef0123456789abcdef", 0L, "a.c"),
      ("ffffffffffffffffffffffffffffffff", 7L, "a.c")))
    assert(Indexing.stemmedSnippetIndex(scan).count() === 1)
  }
}
