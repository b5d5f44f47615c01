package graft

import graft.matching.{Indexing, Matching}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The reference's `models/match-test.json` do_match suite
  * (`matchcode/tests/test_match.py` MatchcodeTestCase): one codebase
  * run through all four match types — exact package archive, exact
  * file, approximate directory content and structure — each compared
  * against the reference's checked-in expected results.
  */
class MatchTestCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "/root/reference/matchcode/tests/testfiles/models"

  private def read(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/$name")), "UTF-8")

  private val testPkgUrl = "https://test.com/test.tar.gz"

  private val purlByUrl = Map(
    "http://repo1.maven.org/maven2/abbot/abbot/0.12.3/abbot-0.12.3.jar" ->
      "pkg:maven/abbot@0.12.3",
    ("https://repo1.maven.org/maven2/org/zkoss/zkforge/dojoz/0.4.1-1/" +
      "dojoz-0.4.1-1.jar") -> "pkg:maven/dojoz@0.4.1-1",
    ("https://repo1.maven.org/maven2/acegisecurity/acegi-security/0.51/" +
      "acegi-security-0.51.jar") -> "pkg:maven/acegi-security@0.51",
    testPkgUrl -> "pkg:maven/test@0.01")

  /** The scan's resource rows, attributed to the test package (the
    * reference's setUp loads match-test.json as test@0.01's own
    * resources). */
  private lazy val scanRes: DataFrame = Indexing.resources(
    Indexing.scanResources(Seq((testPkgUrl, read("match-test.json")))
      .toDF("download_url", "scan_json"))).cache()

  private def expected(name: String): Map[String, Set[String]] = {
    val files = (JsonMethods.parse(read(name)) \ "files")
      .asInstanceOf[JArray].arr
    files.map { f =>
      val JString(path) = (f \ "path"): @unchecked
      val matched = f \ "matched_to" match {
        case JArray(xs) => xs.collect { case JString(s) => s }.toSet
        case _          => Set.empty[String]
      }
      path -> matched
    }.toMap
  }

  test("exact package archive match recovers each jar's package") {
    // ExactPackageArchiveIndex: PACKAGE-level sha1s (setUp's
    // index_packages_sha1); a scanned file whose sha1 equals an
    // archive sha1 matches that package
    val archiveIndex = Seq(
      ("51d28a27d919ce8690a40f4f335b9d591ceb16e9",
        "http://repo1.maven.org/maven2/abbot/abbot/0.12.3/abbot-0.12.3.jar",
        "abbot-0.12.3.jar"),
      ("ae9d68fd6a29906606c2d9407d1cc0749ef84588",
        "https://repo1.maven.org/maven2/org/zkoss/zkforge/dojoz/0.4.1-1/" +
          "dojoz-0.4.1-1.jar", "dojoz-0.4.1-1.jar"),
      ("ede156692b33872f5ee9465b7a06d6b2bc9e5e7f",
        "https://repo1.maven.org/maven2/acegisecurity/acegi-security/" +
          "0.51/acegi-security-0.51.jar", "acegi-security-0.51.jar"))
      .toDF("sha1", "download_url", "path")
    val queries = scanRes.filter(col("is_file"))
      .select(col("path"), col("sha1"))
    val got = Matching.exactMatch(queries, archiveIndex).collect()
      .groupBy(_.getAs[String]("q_path"))
      .view.mapValues(_.map(r =>
        purlByUrl(r.getAs[String]("download_url"))).toSet).toMap
    val exp = expected("match-test-exact-package-results.json")
      .filter(_._2.nonEmpty)
    assert(got === exp)
  }

  test("exact file match recovers the indexing package for every file") {
    // ExactFileIndex built from the scan itself (setUp's
    // index_package_files_sha1 for test@0.01)
    val fileIndex = Indexing.exactFileIndex(scanRes)
      .withColumn("path", lit(null).cast("string"))
    val queries = scanRes.filter(col("is_file"))
      .select(col("path"), col("sha1"))
    val got = Matching.exactMatch(queries, fileIndex).collect()
      .groupBy(_.getAs[String]("q_path"))
      .view.mapValues(_.map(r =>
        purlByUrl(r.getAs[String]("download_url"))).toSet).toMap
    val exp = expected("match-test-exact-file-results.json")
      .filter(_._2.nonEmpty)
    assert(got === exp)
  }

  private def dirMatch(fpCol: String, idx: DataFrame => DataFrame)
      : Map[String, Set[String]] = {
    val index = idx(scanRes)
    val queries = graft.matching.Fingerprints
      .directoryFingerprints(scanRes)
      .select(col("path").as("q_path"), col("name").as("q_name"),
        col("size").as("q_size"), col("is_file").as("q_is_file"),
        col(fpCol).as("fingerprint"))
    val dirMatches = Matching.approximateMatch(queries, index)
      .select(col("q_path"), col("download_url")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => purlByUrl(r.getString(1))).toSet).toMap
    scanRes.select("path").as[String].collect().map { p =>
      val ancestors = p.split('/').inits.map(_.mkString("/"))
        .filter(_.nonEmpty).toSeq
      p -> ancestors.flatMap(a => dirMatches.getOrElse(a, Set.empty)).toSet
    }.toMap
  }

  test("approximate directory content match tags the whole codebase") {
    val got = dirMatch("directory_content",
      sr => Indexing.directoryFingerprintIndexes(sr)._1)
    val exp = expected("match-test-approximate-directory-content-results.json")
    assert(got.keySet === exp.keySet)
    exp.foreach { case (p, m) => assert(got(p) === m, p) }
  }

  test("approximate directory structure match tags the whole codebase") {
    val got = dirMatch("directory_structure",
      sr => Indexing.directoryFingerprintIndexes(sr)._2)
    val exp =
      expected("match-test-approximate-directory-structure-results.json")
    exp.foreach { case (p, m) => assert(got(p) === m, p) }
  }
}
