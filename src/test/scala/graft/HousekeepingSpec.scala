package graft

import graft.catalog._
import graft.miners.MavenPom
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Replay of the reference's check_licenses housekeeping corpus
  * (`minecode/tests/test_housekeeping.py` with the `housekeeping/`
  * goldens): the ambiguous-license sweep over the catalog, its
  * command counters, and the visit-and-map-a-POM flow whose mapped
  * package must NOT be flagged (the bytejta POM declares no license —
  * expected golden is the empty list).
  */
class HousekeepingSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtures = "/root/reference/minecode/tests/testfiles/housekeeping"

  private def readJson(path: String): JValue =
    JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  private val ambiguous = PackageRow.minimal(
    "http://example.com", "maven", "Foo")
    .copy(declared_license_expression = Some("apache-2.0 and unknown"))

  test("find_ambiguous_packages flags a declared 'unknown' (golden)") {
    // declared_license_search_expected.json == license_expression_
    // search_expected.json == example_expected.json: the one package
    val found = Housekeeping.findAmbiguousPackages(Seq(ambiguous).toDF())
      .collect()
    assert(found.length == 1)
    val g = readJson(s"$fixtures/declared_license_search_expected.json") match {
      case JArray(Seq(p)) => p
      case other          => fail(s"unexpected golden shape: $other")
    }
    val row = found.head
    assert(row.getAs[String]("ptype") == (g \ "type").values)
    assert(row.getAs[String]("name") == (g \ "name").values)
    assert(row.getAs[String]("download_url") == (g \ "download_url").values)
    assert(row.getAs[String]("declared_license_expression") ==
      (g \ "declared_license_expression").values)
  }

  test("the match is case-insensitive (ignore_upper_case golden)") {
    val upper = ambiguous.copy(
      declared_license_expression = Some("Unknown"))
    val found = Housekeeping.findAmbiguousPackages(Seq(upper).toDF()).collect()
    assert(found.length == 1)
    val g = readJson(s"$fixtures/ignore_upper_case_search_expected.json")
    assert((g.asInstanceOf[JArray].arr.head \ "declared_license_expression")
      .values == "Unknown")
    assert(found.head.getAs[String]("declared_license_expression") == "Unknown")
  }

  test("keywords outside the list and types outside scope do not match") {
    val rows = Seq(
      ambiguous,
      ambiguous.copy(download_url = "http://example.com/2",
        declared_license_expression = Some("apache-2.0")),
      ambiguous.copy(download_url = "http://example.com/3",
        ptype = "npm")).toDF()
    val found = Housekeeping.findAmbiguousPackages(rows)
      .select("download_url").as[String].collect().toSeq
    assert(found == Seq("http://example.com"))
  }

  test("check_licenses counters match the command output") {
    // "Visited 1 packages\nFound 1 possible packages"
    val (visited, found) =
      Housekeeping.checkLicensesCounts(Seq(ambiguous).toDF())
    assert((visited, found) == (1L, 1L))
    // empty-catalog variant: "Visited 0 packages\nFound 0 ..."
    val (v0, f0) = Housekeeping.checkLicensesCounts(
      Seq.empty[PackageRow].toDF())
    assert((v0, f0) == (0L, 0L))
  }

  test("visit-and-map the bytejta POM yields no ambiguous package (golden)") {
    val pomText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$fixtures/bytejta-supports-0.5.0-ALPHA4.pom")), "UTF-8")
    val pom = MavenPom.parse(pomText).get
    assert(pom.artifactId.contains("bytejta-supports"))
    assert(pom.effectiveGroupId.contains("org.bytesoft"))
    assert(pom.effectiveVersion.contains("0.5.0-ALPHA4"))
    assert(pom.licenses.isEmpty)

    val mapped = PackageRow.minimal(
      "http://repo1.maven.org/maven2/org/bytesoft/bytejta-supports/" +
        "0.5.0-ALPHA4/bytejta-supports-0.5.0-ALPHA4.jar",
      "maven", pom.artifactId.get, pom.effectiveVersion)
      .copy(
        namespace = pom.effectiveGroupId,
        description = pom.description,
        homepage_url = pom.url,
        declared_license_expression =
          pom.licenses.headOption.flatMap(_._1))
    val found =
      Housekeeping.findAmbiguousPackages(Seq(mapped).toDF()).collect()
    val golden = readJson(
      s"$fixtures/bytejta-supports-0.5.0-ALPHA4.pom_search_expected.json")
    assert(golden == JArray(Nil) && found.isEmpty)
  }
}
