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
