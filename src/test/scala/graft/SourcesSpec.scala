package graft

import graft.multimodal.Multimodal
import graft.sources._

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("gzip tolerant reader survives trailing garbage and truncation") {
    val payload = "hello gzip world".getBytes("UTF-8")
    val clean = GzipTolerant.gzip(payload)
    assert(GzipTolerant.readAll(clean).sameElements(payload))
    // trailing garbage after the gzip stream
    val garbage = clean ++ Array[Byte](1, 2, 3, 4, 5)
    assert(GzipTolerant.readAll(garbage).sameElements(payload))
    // truncated stream: returns the decodable prefix without throwing
    val truncated = clean.dropRight(5)
    val got = GzipTolerant.readAll(truncated)
    assert(new String(got, "UTF-8").startsWith("hello") || got.isEmpty)
  }

  test("binary index reader: lazy records, torn tail dropped") {
    val records = (1 to 100).map(i => Map(
      "groupId" -> s"org.example$i", "artifactId" -> s"art$i",
      "version" -> s"1.$i"))
    val bytes = BinaryIndexReader.writeRecords(records)
    val read = BinaryIndexReader.readRecords(
      new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(read == records)
    // torn final record: clean prefix still parses
    val torn = bytes.dropRight(3)
    val readTorn = BinaryIndexReader.readRecords(
      new java.io.ByteArrayInputStream(torn)).toSeq
    assert(readTorn.size == 99)
    intercept[IllegalArgumentException](
      BinaryIndexReader.readRecords(
        new java.io.ByteArrayInputStream("junk!!!!".getBytes)).toSeq)
  }

  test("registry parsers: pypi, npm, maven-metadata") {
    val pypi = """{"releases": {"1.0": [{"upload_time": "2020-01-01T00:00:00"}],
      "2.0": [{"upload_time": "2021-06-15T00:00:00"}], "3.0rc1": []}}"""
    val pv = RegistryParsers.pypiVersions(pypi)
    assert(pv.map(_.value).toSet == Set("1.0", "2.0", "3.0rc1"))
    assert(pv.find(_.value == "2.0").get.releaseDate
      .contains("2021-06-15T00:00:00"))

    val npm = """{"versions": {"1.0.0": {}, "1.1.0": {}},
      "time": {"1.0.0": "2019-01-01T00:00:00Z", "created": "x"}}"""
    val nv = RegistryParsers.npmVersions(npm)
    assert(nv.map(_.value).toSet == Set("1.0.0", "1.1.0"))
    assert(nv.find(_.value == "1.0.0").get.releaseDate.isDefined)

    val xml = """<?xml version="1.0"?><metadata>
      <versioning><versions>
        <version>2.5.0</version><version>2.5.1</version>
      </versions></versioning></metadata>"""
    assert(RegistryParsers.mavenMetadataVersions(xml).map(_.value) ==
      Seq("2.5.0", "2.5.1"))
  }

  private def fixture(name: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/packagedb/tests/testfiles/package_manager_data", name)),
      "UTF-8")

  test("gem parser matches the reference fixture expectations") {
    // same expectations as the reference's own test_ruby_fetch test
    val got = RegistryParsers.gemVersions(fixture("gem.json"))
    assert(got.map(_.value) == Seq("7.0.2.3", "7.0.2.2"))
    assert(got.head.releaseDate.contains("2022-03-08T17:50:52.496Z"))
  }

  test("composer parser matches the reference fixture expectations") {
    // reference expects the 9.5.x releases: -dev versions skipped,
    // leading v stripped
    val got = RegistryParsers.composerVersions(
      fixture("composer.json"), "typo3/cms-core")
    val values = got.map(_.version).toSet
    assert(!values.exists(_.contains("dev")))
    assert(values.contains("9.5.1") && values.contains("9.5.19"))
    assert(got.forall(!_.version.startsWith("v")))
    assert(got.find(_.version == "9.5.1").get.releaseDate
      .exists(_.startsWith("2018-10-30")))
  }

  test("nuget parser matches the reference fixture expectations") {
    val got = RegistryParsers.nugetVersions(fixture("nuget-data.json"))
    val values = got.map(_.value)
    // reference expects 2.1.0 first with its published date
    assert(values.take(2) == Seq("2.1.0", "3.0.0"))
    assert(got.head.releaseDate.exists(_.startsWith("2011-01-22")))
    assert(values.contains("3.5.0-beta2"))
  }

  test("maven-metadata parser matches the reference fixture") {
    val got = RegistryParsers.mavenMetadataVersions(
      fixture("maven-metadata.xml"))
    assert(got.map(_.value) == Seq("1.2.2", "1.2.3", "1.3.0"))
  }

  test("registry parsers: cargo, hex, debian, goproxy") {
    val cargo = """{"versions": [
      {"num": "1.0.100", "updated_at": "2019-10-17T00:00:00Z"},
      {"num": "1.0.99", "updated_at": "2019-10-01T00:00:00Z"}]}"""
    val cv = RegistryParsers.cargoVersions(cargo)
    assert(cv.map(_.value) == Seq("1.0.100", "1.0.99"))
    assert(cv.head.releaseDate.contains("2019-10-17T00:00:00Z"))

    val hex = """{"releases": [
      {"version": "1.4.0", "inserted_at": "2022-10-01T00:00:00Z"},
      {"version": "1.3.0", "inserted_at": "2021-01-01T00:00:00Z"}]}"""
    assert(RegistryParsers.hexVersions(hex).map(_.value) ==
      Seq("1.4.0", "1.3.0"))

    // default 0: epoch removed; error payload yields nothing
    val deb = """{"versions": [{"version": "0:1.2.11.dfsg-2"},
      {"version": "1:1.2.13-1"}]}"""
    assert(RegistryParsers.debianVersions(deb).map(_.value) ==
      Seq("1.2.11.dfsg-2", "1:1.2.13-1"))
    assert(RegistryParsers.debianVersions(
      """{"error": 404}""").isEmpty)

    val list = "v0.3.1\nv1.0.0 2022-01-01T00:00:00Z\n"
    val gv = RegistryParsers.goproxyList(list)
    assert(gv.map(_.value) == Seq("v0.3.1", "v1.0.0"))
    assert(gv(1).releaseDate.contains("2022-01-01T00:00:00Z"))
  }

  test("goproxy path escaping and module trimming") {
    // case-encoding per golang.org/ref/mod#goproxy-protocol
    assert(RegistryParsers.goEscapePath("github.com/BurntSushi/toml") ==
      "github.com/!burnt!sushi/toml")
    assert(RegistryParsers.goEscapePath("v1.0.0-RC1") == "v1.0.0-!r!c1")
    // same doctest cases as the reference's trim_go_url_path
    assert(RegistryParsers.trimGoUrlPath("https://github.com/xx/a/b")
      .contains("github.com/xx/a"))
    assert(RegistryParsers.trimGoUrlPath(
      "https://pkg.go.dev/https://github.com/xx/a/b")
      .contains("github.com/xx/a"))
    assert(RegistryParsers.trimGoUrlPath("github.com/xx/a/b")
      .contains("github.com/xx/a"))
    assert(RegistryParsers.trimGoUrlPath("github.com/xx").isEmpty)
  }

  test("robots.txt parsing and crawl gate") {
    val robots = """# comment
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp/
      |Crawl-delay: 2.5
      |
      |User-agent: other-bot
      |Disallow: /
      |""".stripMargin
    val rules = Robots.parse(robots)
    assert(rules.disallow == Seq("/private/", "/tmp/"))
    assert(rules.crawlDelaySec.contains(2.5))
    assert(Robots.allowed("/public/x", rules))
    assert(!Robots.allowed("/private/x", rules))
  }

  test("publisher batching") {
    val b = Publisher.batches((1 to 250).toSeq)
    assert(b.map(_.size) == Seq(100, 100, 50))
  }

  test("multimodal: schema, determinism, frame sampling, features") {
    val media = Multimodal.mediaTable(spark, sf001)
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))

    val feats = Multimodal.features(media, dim = 16).collect()
    assert(feats.forall(_.embedding.size == 16))
    // deterministic across runs
    val feats2 = Multimodal.features(media, dim = 16).collect()
    assert(feats.sortBy(_.media_id).map(_.embedding).toSeq ==
      feats2.sortBy(_.media_id).map(_.embedding).toSeq)

    val imgs = Multimodal.imagePipeline(media, 224, 224).collect()
    assert(imgs.nonEmpty && imgs.forall(_._2 == 224))

    val frames = Multimodal.frameSamples(media, everyNth = 10)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    assert(perVideo.nonEmpty && perVideo.values.forall(_ > 0))
  }
}
