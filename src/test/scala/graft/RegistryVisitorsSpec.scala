package graft

import java.sql.Timestamp

import graft.miners.RegistryVisitors._
import graft.miners.Transport
import graft.streaming.Frontier
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Golden tests for the npm `_changes` follower and the PyPI
  * visitors, against the reference's own checked-in fixtures and the
  * same expectations as its miners/test_npm.py and test_pypi.py —
  * then end-to-end through a frontier visit cycle.
  */
class RegistryVisitorsSpec extends SparkTestBase {

  private val npmDir = "/root/reference/minecode/tests/testfiles/npm"
  private val pypiDir = "/root/reference/minecode/tests/testfiles/pypi"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")

  /** The fixture's expected URI list: (uri, package_url, visited,
    * data) tuples in order. */
  private def expectedUris(path: String)
      : Seq[(String, Option[String], Boolean, Option[String])] =
    JsonMethods.parse(read(path)) match {
      case JArray(items) => items.map { it =>
        def str(f: String): Option[String] = it \ f match {
          case JString(v) => Some(v); case _ => None
        }
        (str("uri").get, str("package_url"),
          it \ "visited" == JBool(true), str("data"))
      }
      case _ => fail(s"unexpected fixture shape: $path")
    }

  test("npm _changes visitor matches the reference's expected URI list") {
    val src = "https://replicate.npmjs.com/registry/_changes?" +
      "include_docs=true&limit=1000&since=2300000"
    val got = npmRegistryUris(read(s"$npmDir/replicate_doc1.json"), src)
      .fold(e => fail(e), identity)
    val want = expectedUris(s"$npmDir/expected_doclimit_visitor.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, (uri, purl, visited, data)) =>
      assert(g.uri == uri)
      assert(g.packageUrl == purl, s"purl mismatch for $uri")
      assert(g.visited == visited, s"visited mismatch for $uri")
      assert(g.sourceUri == src)
      // the data payload is the package doc minus readme; compare as
      // JSON (serialization details differ between engines)
      (g.data, data) match {
        case (Some(a), Some(b)) =>
          assert(JsonMethods.parse(a) == JsonMethods.parse(b),
            s"data mismatch for $uri")
          // only the TOP-LEVEL readme is dropped (nested version
          // objects keep theirs, like the reference)
          JsonMethods.parse(a) match {
            case JObject(fields) => assert(!fields.exists(_._1 == "readme"))
            case _               => fail("data is not an object")
          }
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"data for $uri")
      }
    }
  }

  test("npm visitor always yields the next-index URI (over_limit fixture)") {
    val src = "https://replicate.npmjs.com/registry/_changes?" +
      "include_docs=true&limit=1000&since=2300000"
    val got = npmRegistryUris(read(s"$npmDir/over_limit.json"), src)
      .fold(e => fail(e), identity)
    val want = expectedUris(s"$npmDir/expected_over_limit.json")
    assert(got.map(_.uri) == want.map(_._1))
    assert(got.head.uri.contains("_changes?include_docs=true&limit=1000&since="))
  }

  test("npm visitor aborts on missing last_seq, skips non-package docs") {
    assert(npmRegistryUris("""{"results": []}""", "src").isLeft)
    assert(npmRegistryUris("""{"last_seq": 5}""", "src").isLeft)
    val only = npmRegistryUris(
      """{"last_seq": 9, "results": [
           {"doc": {"_id": "_design/app"}},
           {"doc": {"name": "left-pad", "versions": {"1.0.0": {}},
                    "readme": "BIG TEXT"}}]}""", "src")
      .fold(e => fail(e), identity)
    assert(only.size == 2)
    assert(only(1).uri == "https://registry.npmjs.org/left-pad")
    assert(only(1).data.exists(!_.contains("BIG TEXT")))
  }

  test("npm scoped names split case-preserving; purls lowercase") {
    assert(splitScopedName("@Types/Node") == (Some("@Types"), "Node"))
    assert(npmApiUrl(Some("@Types"), "Node") ==
      "https://registry.npmjs.org/@Types%2fNode")
    assert(npmPurl(Some("@Types"), "Node") == "pkg:npm/%40types/node")
    assert(npmPurl(None, "Reston") == "pkg:npm/reston")
  }

  test("pypi index visitor matches pypiindexvisitor-expected.json") {
    // the reference test feeds this in-code list through a mocked
    // xmlrpc client (test_pypi.py:50-60)
    val names = Seq("0", "0-._.-._.-._.-._.-._.-._.-0", "0.0.1",
      "00print_lol", "vmnet", "vmo", "vmock", "vmonere", "VMPC")
    val got = pypiIndexUris(names, "https://pypi.python.org/pypi/")
    val want = expectedUris(s"$pypiDir/pypiindexvisitor-expected.json")
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, (uri, purl, _, _)) =>
      assert(g.uri == uri)
      assert(g.packageUrl == purl, s"purl mismatch for $uri")
    }
  }

  test("pypi package visitor yields per-release URIs (cage, boolean.py)") {
    for ((fixture, expected, name) <- Seq(
        ("cage.json", "expected_uris-cage.json", "CAGE"),
        ("boolean.py.json", "expected_uris-boolean.py.json", "boolean.py"))) {
      val src = s"https://pypi.python.org/pypi/$name/json"
      val got = pypiPackageUris(read(s"$pypiDir/$fixture"), src)
      val want = expectedUris(s"$pypiDir/$expected")
      assert(got.map(_.uri).sorted == want.map(_._1).sorted, fixture)
      assert(got.map(_.packageUrl).sorted == want.map(_._2).sorted, fixture)
    }
  }

  test("pypi release visitor yields download URIs with file metadata") {
    for ((fixture, expected, name, release) <- Seq(
        ("cage_1.1.2.json", "expected_uris-cage_1.1.2.json", "CAGE", "1.1.2"),
        ("cage_1.1.3.json", "expected_uris-cage_1.1.3.json", "CAGE", "1.1.3"),
        ("boolean.py-2.0.dev3.json", "expected_uris-boolean.py-2.0.dev3.json",
          "boolean.py", "2.0.dev3"))) {
      val src = s"https://pypi.python.org/pypi/$name/$release/json"
      val got = pypiReleaseUris(read(s"$pypiDir/$fixture"), src)
      val want = JsonMethods.parse(read(s"$pypiDir/$expected")) match {
        case JArray(items) => items
        case _             => fail(s"bad fixture $expected")
      }
      assert(got.size == want.size, fixture)
      got.zip(want).foreach { case (g, w) =>
        def str(f: String): Option[String] = w \ f match {
          case JString(v) => Some(v); case _ => None
        }
        assert(g.uri == str("uri").get, fixture)
        assert(g.packageUrl == str("package_url"), fixture)
        assert(g.fileName == str("file_name"), fixture)
        assert(g.md5 == str("md5"), fixture)
        assert(g.sha256 == str("sha256"), fixture)
        assert(g.size == (w \ "size" match {
          case JInt(s) => Some(s.toLong); case _ => None
        }), fixture)
      }
    }
  }

  test("npm follower drives a frontier visit cycle end-to-end") {
    import spark.implicits._
    val src = "https://replicate.npmjs.com/registry/_changes?" +
      "include_docs=true&limit=1000&since=2300000"
    val changes = read(s"$npmDir/replicate_doc1.json")
    val transport = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] =
        if (uri == src) Right(changes.getBytes("UTF-8"))
        else Left(s"404: $uri")
    }
    val now = Timestamp.valueOf("2026-08-12 00:00:00")
    val seed = Seq(Frontier.UriRow(src, src, "replicate.npmjs.com", 1,
      None, None, None, None)).toDF()
    val next = Frontier.visitCycle(spark, seed,
      graft.miners.RegistryVisitors.npmFrontierVisitor(transport),
      now, batchSize = 5)
    val rows = next.select("uri", "last_visit_date").collect()
    val want = expectedUris(s"$npmDir/expected_doclimit_visitor.json")
    // seed visited; every yielded URI inserted pending
    assert(rows.length == 1 + want.size)
    assert(rows.count(_.get(1) != null) == 1)
    val inserted = rows.filter(_.get(1) == null).map(_.getString(0)).toSet
    assert(inserted == want.map(_._1).toSet)
  }
}
