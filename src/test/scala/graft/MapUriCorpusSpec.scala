package graft

import graft.catalog._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Replay of the reference's map/merge golden corpus through
  * `MergeEngine.mergePackages`:
  *
  *   - `minecode/tests/test_run_map.py:297-614` with its checked-in
  *     `run_map` goldens — same / lesser / higher mining level,
  *     merge_packages with and without replace, mismatched-sha1;
  *   - `minecode/tests/test_model_utils.py:55-128` with the
  *     `model_utils/{before_merge,after_merge,expected_updated_fields}
  *     .json` goldens — the pulsar-2.5.1 scanned-package merge.
  *
  * Both the merged package fields and the recorded `updated_fields`
  * entries (field / old_value / new_value, in the reference's
  * `to_dict()` iteration order) are asserted against the goldens,
  * restricted to the catalog columns this engine carries (parties and
  * dependencies live in child tables covered by `mergeChildSet`;
  * license-detection internals, vcs/bug-tracker URLs and repository_*
  * URLs are scancode/serializer-side fields out of catalog scope).
  */
class MapUriCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private val runMap = "/root/reference/minecode/tests/testfiles/run_map"
  private val modelUtils = "/root/reference/minecode/tests/testfiles/model_utils"
  private val NOW = "2026-08-12T00:00:00Z"

  /** updated_fields labels for columns the catalog carries. */
  private val carried = Set(
    "type", "namespace", "name", "version", "qualifiers", "subpath",
    "package_content", "primary_language", "description", "release_date",
    "keywords", "homepage_url", "download_url", "size", "md5", "sha1",
    "sha256", "sha512", "copyright", "declared_license_expression")

  private def readJson(path: String): JValue =
    JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  private def jstr(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _          => None
  }

  /** Golden updated_fields entries restricted to carried labels, as
    * (field, old_value, new_value) with nulls preserved. */
  private def goldenEntries(path: String): Seq[(String, Option[String], Option[String])] =
    (readJson(path): @unchecked) match {
      case JArray(items) => items.collect {
        case obj if jstr(obj \ "field").exists(carried) =>
          (jstr(obj \ "field").get, jstr(obj \ "old_value"), jstr(obj \ "new_value"))
      }
    }

  private def actualEntries(row: Row): Seq[(String, Option[String], Option[String])] =
    row.getSeq[Row](row.fieldIndex("updated_fields")).map(e =>
      (e.getAs[String]("field"), Option(e.getAs[String]("old_value")),
        Option(e.getAs[String]("new_value"))))

  /** Compare a merged row to a package-expected golden on the carried
    * scalar columns; Django blank CharFields serialize as "" where our
    * unset options are null — both count as empty. */
  private def assertPackageGolden(row: Row, goldenPath: String): Unit = {
    val g = readJson(goldenPath)
    val fields = Seq(
      "type" -> "ptype", "namespace" -> "namespace", "name" -> "name",
      "version" -> "version", "qualifiers" -> "qualifiers",
      "subpath" -> "subpath", "primary_language" -> "primary_language",
      "description" -> "description", "homepage_url" -> "homepage_url",
      "download_url" -> "download_url", "md5" -> "md5", "sha1" -> "sha1",
      "sha256" -> "sha256", "sha512" -> "sha512",
      "copyright" -> "copyright",
      "declared_license_expression" -> "declared_license_expression")
    fields.foreach { case (label, col) =>
      val want = jstr(g \ label).filter(_.nonEmpty)
      val got = Option(row.getAs[String](col)).filter(_.nonEmpty)
      assert(got == want, s"$label: got $got want $want")
    }
  }

  private def pkgDf(rows: PackageRow*): DataFrame = rows.toDF()

  private def withLevel(df: DataFrame, level: Int): DataFrame =
    df.withColumn("visit_level", lit(level))

  private def mergeOne(existing: DataFrame, in: DataFrame,
      url: String): Row =
    MergeEngine.mergePackages(existing, in, NOW)
      .packages.filter($"download_url" === url).collect().head

  test("map_uri updates with same mining level (run_map golden)") {
    val url = "http://testdomap2.com"
    val existing = pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.1"), miningLevel = 0)
        .copy(description = Some("Description Existing"), sha1 = Some("beef")))
    val incoming = withLevel(pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.2"))
        .copy(description = Some("Description Updated"))), 0)
    val row = mergeOne(existing, incoming, url)

    assert(actualEntries(row) == goldenEntries(
      s"$runMap/test_map_uri_does_update_with_same_mining_level_expected_updated_fields.json"))
    assertPackageGolden(row,
      s"$runMap/test_map_uri_does_update_with_same_mining_level-expected.json")
    val hist = row.getSeq[Row](row.fieldIndex("history"))
    assert(hist.size == 1 &&
      hist.head.getAs[String]("message") ==
        "Package field values have been updated.")
    assert(row.getAs[Int]("mining_level") == 0)
  }

  test("map_uri only fills empties with lesser mining level (run_map golden)") {
    val url = "http://testdomap3.com"
    val existing = pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.1"), miningLevel = 10)
        .copy(description = Some(""), sha1 = Some("")))
    val incoming = withLevel(pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.2"))
        .copy(description = Some("Description Updated"), sha1 = Some("feed"))), 0)
    val row = mergeOne(existing, incoming, url)

    // inline expectation in the reference test (test_run_map.py:439-447)
    assert(actualEntries(row) == Seq(
      ("description", Some(""), Some("Description Updated")),
      ("sha1", Some(""), Some("feed"))))
    assertPackageGolden(row,
      s"$runMap/test_map_uri_update_only_empties_with_lesser_new_mining_level-expected.json")
    assert(row.getAs[Int]("mining_level") == 10)
  }

  test("map_uri replaces with higher mining level (run_map golden)") {
    val url = "http://testdomap4.com"
    val existing = pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.1"), miningLevel = 5)
        .copy(description = Some(""), sha1 = Some("beef")))
    val incoming = withLevel(pkgDf(
      PackageRow.minimal(url, "generic", "pack2", Some("0.2"))
        .copy(description = Some("Description Updated"))), 10)
    val row = mergeOne(existing, incoming, url)

    assert(actualEntries(row) == goldenEntries(
      s"$runMap/test_map_uri_replace_with_new_with_higher_new_mining_level_expected_updated_fields.json"))
    assertPackageGolden(row,
      s"$runMap/test_map_uri_replace_with_new_with_higher_new_mining_level-expected.json")
    assert(row.getAs[Int]("mining_level") == 10)
  }

  test("merge_packages without replace (run_map golden)") {
    val url = "http://testdomap3.com"
    val existing = pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.1"), miningLevel = 50)
        .copy(description = Some(""), sha1 = Some("beef")))
    val incoming = withLevel(pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.2"))
        .copy(description = Some("Description Updated"))), 10)
    assertPackageGolden(mergeOne(existing, incoming, url),
      s"$runMap/test_merge_packages_no_replace-expected.json")
  }

  test("merge_packages with replace (run_map golden)") {
    val url = "http://testdomap3.com"
    val existing = pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.1"), miningLevel = 50)
        .copy(description = Some(""), sha1 = Some("beef")))
    val incoming = withLevel(pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.2"))
        .copy(description = Some("Description Updated"))), 50)
    assertPackageGolden(mergeOne(existing, incoming, url),
      s"$runMap/test_merge_packages_with_replace-expected.json")
  }

  test("merge_packages with a different sha1 errors, package untouched") {
    // test_run_map.py:594-614 — the reference raises; this engine
    // routes the row to the errors frame and keeps the stored package
    val url = "http://testdomap3.com"
    val existing = pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.1"), miningLevel = 0)
        .copy(description = Some(""), sha1 = Some("beef")))
    val incoming = withLevel(pkgDf(
      PackageRow.minimal(url, "generic", "pack", Some("0.2"))
        .copy(description = Some("Description Updated"), sha1 = Some("feed"))), 50)
    val out = MergeEngine.mergePackages(existing, incoming, NOW)
    val err = out.errors.collect()
    assert(err.length == 1 &&
      err.head.getSeq[String](err.head.fieldIndex("fields")) == Seq("sha1"))
    val row = out.packages.collect().head
    assert(row.getAs[String]("version") == "0.1")
    assert(row.getAs[String]("sha1") == "beef")
    assert(row.getSeq[Any](row.fieldIndex("updated_fields")).isEmpty)
  }

  test("model_utils pulsar merge reproduces the before/after goldens") {
    val g = readJson(s"$modelUtils/created_package.json")
    val url = jstr(g \ "download_url").get

    // before_merge.json is the bare pre-existing row the reference
    // creates (type/namespace/name/version/download_url only)
    val before = readJson(s"$modelUtils/before_merge.json")
    val existing = pkgDf(PackageRow.minimal(
      url, jstr(before \ "type").get, jstr(before \ "name").get,
      jstr(before \ "version"), miningLevel = 0)
      .copy(namespace = jstr(before \ "namespace")))

    // the scanned package == the created-package golden's carried fields
    val incoming = withLevel(pkgDf(PackageRow.minimal(
      url, jstr(g \ "type").get, jstr(g \ "name").get,
      jstr(g \ "version"), miningLevel = 0)
      .copy(
        namespace = jstr(g \ "namespace"),
        primary_language = jstr(g \ "primary_language"),
        description = jstr(g \ "description"),
        homepage_url = jstr(g \ "homepage_url"),
        declared_license_expression = jstr(g \ "declared_license_expression"))),
      50)

    val row = mergeOne(existing, incoming, url)
    assert(actualEntries(row) ==
      goldenEntries(s"$modelUtils/expected_updated_fields.json"))
    assertPackageGolden(row, s"$modelUtils/after_merge.json")
    assert(row.getAs[Int]("mining_level") == 50)
    val hist = row.getSeq[Row](row.fieldIndex("history"))
    assert(hist.map(_.getAs[String]("message")) ==
      Seq("Package field values have been updated."))
  }
}
