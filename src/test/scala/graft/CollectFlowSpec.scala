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
        "pkg:cargo/serde",     // unsupported ecosystem
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

  test("collect with no resolvable purls leaves the catalog untouched") {
    val existing = Seq(PackageRow.minimal("http://x", "maven", "a")).toDF()
    val (merged, errors) = CollectFlow.collect(spark, existing,
      Seq("pkg:npm/leftpad"), transport, "2026-08-12T00:00:00Z")
    assert(merged.count() == 1)
    assert(errors.size == 1)
  }
}
