package graft

import graft.matching.{HaloHash, Indexing, Matching}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The reference's directory-matching corpus end-to-end
  * (`matchcode/tests/test_match.py` DirectoryMatchingTestCase): index
  * the eight abbrev releases' directory fingerprints — COMPUTED from
  * their file sha1s/sizes by the toolkit-parity producer, not read
  * from fixtures — then match each release's scan (and get-stdin,
  * which is not indexed) and compare the matched packages per
  * resource, with ancestor propagation, against the reference's
  * checked-in expected JSON.
  */
class DirectoryMatchingSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "/root/reference/matchcode/tests/testfiles/match/directory-matching"

  private val packages = Seq( // (scan file stem, purl)
    "abbrev-1.0.3" -> "pkg:npm/abbrev@1.0.3",
    "abbrev-1.0.4" -> "pkg:npm/abbrev@1.0.4",
    "abbrev-1.0.5" -> "pkg:npm/abbrev@1.0.5",
    "abbrev-1.0.6" -> "pkg:npm/abbrev@1.0.6",
    "abbrev-1.0.7" -> "pkg:npm/abbrev@1.0.7",
    "abbrev-1.0.9" -> "pkg:npm/abbrev@1.0.9",
    "abbrev-1.1.0" -> "pkg:npm/abbrev@1.1.0",
    "abbrev-1.1.1" -> "pkg:npm/abbrev@1.1.1")

  private def read(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/$name")), "UTF-8")

  private def scanResources(stem: String): DataFrame =
    Indexing.resources(Indexing.scanResources(
      Seq((s"https://registry.npmjs.org/${stem.split('-').head}/-/" +
        s"$stem.tgz", read(s"$stem-i.json")))
        .toDF("download_url", "scan_json")))

  private lazy val indexes: (DataFrame, DataFrame) = {
    val all = packages.map(p => scanResources(p._1))
      .reduce(_ unionByName _)
    val (c, s) = Indexing.directoryFingerprintIndexes(all)
    (c.cache(), s.cache())
  }

  private lazy val purlByUrl: Map[String, String] = packages.map {
    case (stem, purl) =>
      s"https://registry.npmjs.org/${stem.split('-').head}/-/$stem.tgz" ->
        purl
  }.toMap

  /** Expected matched_to per path from the reference's expected JSON. */
  private def expectedMatches(stem: String): Map[String, Set[String]] = {
    val files = (JsonMethods.parse(read(s"$stem-i-expected.json"))
      \ "files").asInstanceOf[JArray].arr
    files.map { f =>
      val JString(path) = (f \ "path"): @unchecked
      val matched = f \ "matched_to" match {
        case JArray(xs) => xs.collect { case JString(s) => s }.toSet
        case _          => Set.empty[String]
      }
      path -> matched
    }.toMap
  }

  /** Run one index type over one query scan and propagate directory
    * matches to all descendants, as the reference's do_match does. */
  private def matchedPaths(stem: String, index: DataFrame,
      fpCol: String): Map[String, Set[String]] = {
    val sr = scanResources(stem)
    val queries = graft.matching.Fingerprints.directoryFingerprints(sr)
      .select(col("path").as("q_path"), col("name").as("q_name"),
        col("size").as("q_size"), col("is_file").as("q_is_file"),
        col(fpCol).as("fingerprint"))
    val dirMatches = Matching.approximateMatch(queries, index)
      .select(col("q_path"), col("download_url")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => purlByUrl(r.getString(1))).toSet).toMap
    // propagate: every resource inherits the matches of itself and all
    // of its ancestor directories
    val allPaths = sr.select("path").as[String].collect()
    allPaths.map { p =>
      val ancestors = p.split('/').inits.map(_.mkString("/"))
        .filter(_.nonEmpty).toSeq
      p -> ancestors.flatMap(a => dirMatches.getOrElse(a, Set.empty)).toSet
    }.toMap
  }

  test("toolkit-parity producer reconstructs the wagon fixture fingerprints") {
    val fx = "/root/reference/minecode/tests/testfiles/indexing/" +
      "scancodeio_wagon-api-20040705.181715.json"
    assume(new java.io.File(fx).exists())
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fx)), "UTF-8")
    val sr = Indexing.resources(Indexing.scanResources(
      Seq(("http://wagon", json)).toDF("download_url", "scan_json")))
    val got = graft.matching.Fingerprints.directoryFingerprints(sr)
      .select("path", "directory_content", "directory_structure")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    // every recorded fingerprint reproduced bit-for-bit
    val expected = (JsonMethods.parse(json) \ "files")
      .asInstanceOf[JArray].arr.flatMap { f =>
        (f \ "type", f \ "path", f \ "extra_data" \ "directory_content",
          f \ "extra_data" \ "directory_structure") match {
          case (JString("directory"), JString(p), JString(c), JString(s))
            if c.nonEmpty => Some(p -> (c, s))
          case _ => None
        }
      }.toMap
    assert(expected.size === 11)
    expected.foreach { case (p, cs) =>
      assert(got.get(p) === Some(cs), p)
    }
    // single-file directories are skipped, exactly as recorded
    assert(!got.contains("META-INF/plexus"))
  }

  test("bah128md5 direct form matches a known fixture fingerprint") {
    // wagon META-INF content fingerprint from its two file sha1s
    assert(HaloHash.ofMd5(Seq(
      "ba8ab5a0280b953aa97435ff8946cbcbb2755a27",
      "bd5dabe6dc214429300e5eb9cf6208f5a8384f21")) ===
      "000000022b0422490200223401893280e0912000")
  }

  for ((stem, purl) <- packages) {
    test(s"directory content match: $stem matches only itself") {
      val got = matchedPaths(stem, indexes._1, "directory_content")
      val exp = expectedMatches(stem)
      assert(got.keySet === exp.keySet)
      exp.foreach { case (p, m) => assert(got(p) === m, p) }
      assert(got.values.flatten.toSet === Set(purl))
    }
    test(s"directory structure match: $stem matches only itself") {
      val got = matchedPaths(stem, indexes._2, "directory_structure")
      val exp = expectedMatches(stem)
      exp.foreach { case (p, m) => assert(got(p) === m, p) }
    }
  }

  // ---- nested corpus (MatchNestedPackagesTestCase): a codebase with a
  // package vendored under node_modules matches the nested package on
  // the right subtree only
  private val nestedBase =
    "/root/reference/matchcode/tests/testfiles/match/nested"

  private def readNested(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$nestedBase/$name")), "UTF-8")

  private lazy val nestedIndexes: (DataFrame, DataFrame) = {
    val all = Indexing.resources(Indexing.scanResources(Seq(
      ("https://registry.npmjs.org/@umijs/plugin-request/-/" +
        "plugin-request-2.4.1.tgz", readNested("plugin-request-2.4.1-ip.json")),
      ("https://registry.npmjs.org/@types/underscore/-/" +
        "underscore-1.10.9.tgz", readNested("underscore-1.10.9-ip.json")))
      .toDF("download_url", "scan_json")))
    val (c, s) = Indexing.directoryFingerprintIndexes(all)
    (c.cache(), s.cache())
  }

  private val nestedPurls = Map(
    ("https://registry.npmjs.org/@umijs/plugin-request/-/" +
      "plugin-request-2.4.1.tgz") -> "pkg:npm/plugin-request@2.4.1",
    ("https://registry.npmjs.org/@types/underscore/-/" +
      "underscore-1.10.9.tgz") -> "pkg:npm/underscore@1.10.9")

  private def nestedMatch(index: DataFrame, fpCol: String)
      : Map[String, Set[String]] = {
    val sr = Indexing.resources(Indexing.scanResources(
      Seq(("http://q/nested", readNested("nested.json")))
        .toDF("download_url", "scan_json")))
    val queries = graft.matching.Fingerprints.directoryFingerprints(sr)
      .select(col("path").as("q_path"), col("name").as("q_name"),
        col("size").as("q_size"), col("is_file").as("q_is_file"),
        col(fpCol).as("fingerprint"))
    val dirMatches = Matching.approximateMatch(queries, index)
      .select(col("q_path"), col("download_url")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => nestedPurls(r.getString(1))).toSet).toMap
    sr.select("path").as[String].collect().map { p =>
      val ancestors = p.split('/').inits.map(_.mkString("/"))
        .filter(_.nonEmpty).toSeq
      p -> ancestors.flatMap(a => dirMatches.getOrElse(a, Set.empty)).toSet
    }.toMap
  }

  private def nestedExpected(name: String): Map[String, Set[String]] = {
    val files = (JsonMethods.parse(readNested(name)) \ "files")
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

  test("nested codebase: content match finds the vendored package subtree") {
    val got = nestedMatch(nestedIndexes._1, "directory_content")
    val exp = nestedExpected("nested-directory-content-match-expected.json")
    assert(got.keySet === exp.keySet)
    exp.foreach { case (p, m) => assert(got(p) === m, p) }
  }

  test("nested codebase: structure match finds the vendored package subtree") {
    val got = nestedMatch(nestedIndexes._2, "directory_structure")
    val exp = nestedExpected("nested-directory-structure-match-expected.json")
    exp.foreach { case (p, m) => assert(got(p) === m, p) }
  }

  // ---- async corpus (matchcode/tests/test_models.py): two ADJACENT
  // versions indexed; the query matches only its own version — the
  // fingerprints discriminate 0.2.9 from 0.2.10
  test("async 0.2.9 matches itself but not the adjacent 0.2.10") {
    val mBase = "/root/reference/matchcode/tests/testfiles/models/" +
      "directory-matching"
    def mRead(n: String): String =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$mBase/$n")), "UTF-8")
    val all = Indexing.resources(Indexing.scanResources(Seq(
      ("https://registry.npmjs.org/async/-/async-0.2.10.tgz",
        mRead("async-0.2.10.tgz-i.json")),
      ("https://registry.npmjs.org/async/-/async-0.2.9.tgz",
        mRead("async-0.2.9-i.json")))
      .toDF("download_url", "scan_json")))
    val (cIdx, sIdx) = Indexing.directoryFingerprintIndexes(all)
    val qr = Indexing.resources(Indexing.scanResources(
      Seq(("http://q/async", mRead("async-0.2.9-i.json")))
        .toDF("download_url", "scan_json")))
    for ((idx, fpCol) <- Seq((cIdx, "directory_content"),
        (sIdx, "directory_structure"))) {
      val queries = graft.matching.Fingerprints.directoryFingerprints(qr)
        .select(col("path").as("q_path"), col("name").as("q_name"),
          col("size").as("q_size"), col("is_file").as("q_is_file"),
          col(fpCol).as("fingerprint"))
      val out = Matching.approximateMatch(queries, idx)
        .select("q_path", "download_url").collect()
        .map(r => (r.getString(0), r.getString(1)))
      // expected-content/-structure: only 'package' matches, and only
      // to async@0.2.9
      assert(out.toSeq === Seq(("package",
        "https://registry.npmjs.org/async/-/async-0.2.9.tgz")), fpCol)
    }
  }

  // ---- approximate FILE match (test_do_match_approximate_package_file
  // _match): the halo1 content fingerprint of a lightly edited file
  // matches the indexed original under the byte-distance threshold
  test("halo1 producer reconstructs the reference's indexed fingerprint") {
    val afDir = "/root/reference/matchcode/tests/testfiles/match/" +
      "approximate-file-matching"
    val inflate = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$afDir/inflate.c")), "UTF-8")
    // the exact fingerprint the reference's setUp indexes for inflate.c
    // (matchcode/tests/test_match.py:108)
    assert(HaloHash.halo1(inflate) ===
      "000018fba23a49e4cd40718d1297be719e6564a4")
    assert(HaloHash.halo1("too few words") === null)
  }

  test("approximate file match: the reference's query scan matches inflate") {
    // test_do_match_approximate_package_file_match: the query scan
    // carries its halo1 directly (approximate-match-test.json); the
    // index holds the fingerprint the reference's setUp indexes for
    // inflate.c of pkg:generic/inflate@1.0.0
    val index = Seq(("inflate.com/inflate.tar.gz", "inflate.c",
      "inflate.c", 55466L, true,
      "000018fba23a49e4cd40718d1297be719e6564a4"))
      .toDF("download_url", "path", "name", "size", "is_file",
        "fingerprint")
    val queries = Seq(("inflate-mod.c", "inflate-mod.c", 55466L, true,
      "000018f4aa3a49e4cd40718d1297be519e6564a4"))
      .toDF("q_path", "q_name", "q_size", "q_is_file", "fingerprint")
    val out = Matching.approximateMatch(queries, index).collect()
    // approximate-match-test-results.json: matched_to
    // pkg:generic/inflate@1.0.0
    assert(out.length === 1)
    assert(out(0).getAs[String]("download_url") ===
      "inflate.com/inflate.tar.gz")
    assert(out(0).getAs[Int]("hamming") === 2)
  }

  test("directory match: unindexed get-stdin matches nothing") {
    val got = matchedPaths("get-stdin-3.0.2", indexes._1,
      "directory_content")
    assert(got.values.forall(_.isEmpty))
    val exp = expectedMatches("get-stdin-3.0.2")
    assert(exp.values.forall(_.isEmpty))
  }
}
