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
}
