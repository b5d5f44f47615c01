package graft

import graft.matching._
import org.apache.spark.sql.functions._

class MatchingSpec extends SparkTestBase {
  import spark.implicits._

  test("ratcliff-obershelp matches difflib reference values") {
    // values computed by python difflib.SequenceMatcher(None, a, b).ratio()
    assert(RatcliffObershelp.ratio("abcd", "abcd") == 1.0)
    assert(RatcliffObershelp.ratio("abcd", "bcde") == 0.75)
    assert(math.abs(RatcliffObershelp.ratio("pkg-core.jar", "pkg-core2.jar")
      - 0.96) < 1e-9)
    assert(RatcliffObershelp.ratio("abc", "xyz") == 0.0)
    assert(RatcliffObershelp.ratio("", "") == 1.0)
  }

  test("fingerprint codec roundtrip") {
    val fp = "000001efb4c8d6e34fb56809a7695fa73822e675"
    val df = Seq(fp).toDF("fingerprint").select(
      Fingerprints.elementsCount(col("fingerprint")).as("cnt"),
      hex(Fingerprints.bah128(col("fingerprint"))).as("bah"),
      hex(Fingerprints.chunk(col("fingerprint"), 0)).as("c0"),
      hex(Fingerprints.chunk(col("fingerprint"), 3)).as("c3"))
    val r = df.collect().head
    assert(r.getAs[Int]("cnt") == 0x1ef)
    assert(r.getAs[String]("bah") == "B4C8D6E34FB56809A7695FA73822E675")
    assert(r.getAs[String]("c0") == "B4C8D6E3")
    assert(r.getAs[String]("c3") == "3822E675")
  }

  test("merge_spans merges overlapping and near spans") {
    val df = Seq(Seq((40, 55), (1, 16), (10, 25), (80, 95)))
      .toDF("raw")
      .select(MatchFunctions.merge_spans(
        expr("transform(raw, s -> struct(s._1 AS start, s._2 AS end))"), 16)
        .as("m"))
    val spans = df.collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1)))
    // 1-16 and 10-25 overlap → 1-25; 40-55 within gap 16 of 25 → merged;
    // 80-95 is 25 past 55 → separate
    assert(spans == Seq((1, 55), (80, 95)))
  }

  private def fp(count: Int, bahHex: String) = f"$count%08x$bahHex"

  test("approximate match: banding, hamming verify, best-group ranking") {
    val bahA = "b4c8d6e34fb56809a7695fa73822e675"
    val bahA1 = "b4c8d6e34fb56809a7695fa73822e674" // 1 bit off
    val bahFar = "0000000000000000ffffffffffffffff" // very different
    // shares chunk1 with bahA (candidate) but hamming way over threshold
    val bahBand = "b4c8d6e300000000ffffffffffffffff"
    val queries = Seq(
      ("dir/q1", "q1", 100L, false, fp(500, bahA))
    ).toDF("q_path", "q_name", "q_size", "q_is_file", "fingerprint")
    val index = Seq(
      ("http://p/good.jar", "lib/q1", "q1", 100L, false, fp(510, bahA1)),
      ("http://p/alsogood.jar", "lib/q1b", "q1b", 100L, false, fp(510, bahA1)),
      ("http://p/far.jar", "lib/far", "far", 100L, false, fp(500, bahFar)),
      ("http://p/banded.jar", "lib/band", "band", 100L, false, fp(505, bahBand)),
      ("http://p/outofband.jar", "lib/oob", "oob", 100L, false, fp(900, bahA))
    ).toDF("download_url", "path", "name", "size", "is_file", "fingerprint")

    val out = Matching.approximateMatch(queries, index).collect()
    // far: fails hamming; banded: candidate but hamming too high;
    // outofband: identical hash but count outside ±5%;
    // good vs alsogood: same hamming+size, name q1 closer than q1b → good only
    assert(out.length == 1)
    assert(out.head.getAs[String]("download_url") == "http://p/good.jar")
    assert(out.head.getAs[Int]("hamming") == 1)
  }

  test("approximate match keeps ties on the full rank tuple") {
    val bah = "b4c8d6e34fb56809a7695fa73822e675"
    val queries = Seq(("q", "same", 10L, true, fp(100, bah)))
      .toDF("q_path", "q_name", "q_size", "q_is_file", "fingerprint")
    val index = Seq(
      ("http://p/1.jar", "a/same", "same", 10L, true, fp(100, bah)),
      ("http://p/2.jar", "b/same", "same", 10L, true, fp(100, bah)))
      .toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val out = Matching.approximateMatch(queries, index).collect()
    assert(out.length == 2) // rank() keeps both tied best matches
  }

  test("snippet match: jaccard scoring and span merging") {
    val qs = Seq(
      ("q", "aa11", 0L), ("q", "bb22", 8L), ("q", "cc33", 100L))
      .toDF("q_path", "fingerprint", "position")
    val idx = Seq(
      ("http://p/x.jar", "src/f.c", "aa11", 0L),
      ("http://p/x.jar", "src/f.c", "bb22", 8L),
      ("http://p/x.jar", "src/f.c", "dd44", 50L),
      ("http://p/y.jar", "src/g.c", "zz99", 0L))
      .toDF("download_url", "path", "fingerprint", "position")
    val out = Matching.snippetMatch(qs, idx).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("matched_fps") == 2)
    // jaccard = 2 / (3 + 3 - 2) = 0.5
    assert(r.getAs[Double]("jaccard") == 0.5)
    val spans = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("matched_spans"))
      .map(x => (x.getInt(0), x.getInt(1)))
    // positions 0 and 8 with window 16 → spans 0-15, 8-23 → merged 0-23
    assert(spans == Seq((0, 23)))
  }

  test("pipeline gates later stages on earlier matches") {
    val resources = Seq(
      ("arch/lib", "lib", false, 0L, null,
        fp(100, "b4c8d6e34fb56809a7695fa73822e675"), null),
      ("arch/lib/a.c", "a.c", true, 10L, "sha_exact", null, null),
      ("arch/lib/b.c", "b.c", true, 20L, null, null,
        fp(50, "00000000000000000000000000000001")),
      ("other/c.c", "c.c", true, 30L, null, null,
        fp(60, "0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f")))
      .toDF("path", "name", "is_file", "size", "sha1", "dir_fingerprint",
        "file_fingerprint")
    val exactIdx = Seq(("sha_exact", "http://p/e.jar", "x/a.c"))
      .toDF("sha1", "download_url", "path")
    val dirIdx = Seq(
      ("http://p/d.jar", "pkg/lib", "lib", 0L, false,
        fp(100, "b4c8d6e34fb56809a7695fa73822e675")))
      .toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val fileIdx = Seq(
      // would match b.c — but b.c lives under matched dir arch/lib → gated
      ("http://p/f.jar", "y/b.c", "b.c", 20L, true,
        fp(50, "00000000000000000000000000000001")),
      ("http://p/f.jar", "y/c.c", "c.c", 30L, true,
        fp(60, "0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f")))
      .toDF("download_url", "path", "name", "size", "is_file", "fingerprint")

    val out = Matching.pipeline(resources, exactIdx, dirIdx, fileIdx)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set(
      ("arch/lib/a.c", "exact_file"),
      ("arch/lib", "approx_directory"),
      ("other/c.c", "approx_file")))
  }

  test("matchCodebase adds a snippet stage for the still-unmatched tail") {
    val resources = Seq(
      ("src/a.c", "a.c", true, 10L, "sha_exact", null, null),
      ("src/b.c", "b.c", true, 20L, null, null, null)) // only snippets match b
      .toDF("path", "name", "is_file", "size", "sha1", "dir_fingerprint",
        "file_fingerprint")
    val exactIdx = Seq(("sha_exact", "http://p/e.jar", "x/a.c"))
      .toDF("sha1", "download_url", "path")
    val emptyDir = Seq.empty[(String, String, String, Long, Boolean, String)]
      .toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val qsnip = Seq(
      ("src/a.c", "f1", 0L), // a.c already matched → must be gated out
      ("src/b.c", "f2", 0L), ("src/b.c", "f3", 16L))
      .toDF("q_path", "fingerprint", "position")
    val snipIdx = Seq(
      ("http://p/s.jar", "y/b.c", "f2", 0L),
      ("http://p/s.jar", "y/b.c", "f3", 16L),
      ("http://p/other.jar", "z/a.c", "f1", 0L))
      .toDF("download_url", "path", "fingerprint", "position")
    val out = Matching.matchCodebase(resources, exactIdx, emptyDir, emptyDir,
      qsnip, snipIdx)
      .select("path", "download_url", "match_type")
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("src/a.c", "http://p/e.jar", "exact_file"),
      ("src/b.c", "http://p/s.jar", "snippet")))
  }

  test("stemmed snippet stage runs last and only on the snippet-unmatched tail") {
    // c.c matches via plain snippets; d.c only matches once tokens are
    // stemmed (Foo2 vs foo) — the stemmed stage must claim d.c but NOT
    // re-claim c.c (reference stage ordering: the stemmed pass excludes
    // snippet-matched resources, matchcode/pipes/matching.py:399-409)
    val resources = Seq(
      ("src/c.c", "c.c", true, 10L, null, null, null),
      ("src/d.c", "d.c", true, 20L, null, null, null))
      .toDF("path", "name", "is_file", "size", "sha1", "dir_fingerprint",
        "file_fingerprint")
    val emptyExact = Seq.empty[(String, String, String)]
      .toDF("sha1", "download_url", "path")
    val emptyDir = Seq.empty[(String, String, String, Long, Boolean, String)]
      .toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val qsnip = Seq(
      ("src/c.c", "plain1", 0L), ("src/c.c", "plain2", 16L),
      ("src/d.c", "Foo2", 0L), ("src/d.c", "Bar9", 16L))
      .toDF("q_path", "fingerprint", "position")
    val snipIdx = Seq(
      ("http://p/s.jar", "y/c.c", "plain1", 0L),
      ("http://p/s.jar", "y/c.c", "plain2", 16L),
      // d.c's raw tokens don't hit anything (index has stemmed forms)
      ("http://p/t.jar", "z/d.c", "foo", 0L),
      ("http://p/t.jar", "z/d.c", "bar", 16L))
      .toDF("download_url", "path", "fingerprint", "position")
    // stemmed query side: stemToken(Foo2) = foo, stemToken(Bar9) = bar
    val stemmedQ = qsnip
      .withColumn("fingerprint", Matching.stemToken($"fingerprint"))
    val stemmedIdx = snipIdx
      .withColumn("fingerprint", Matching.stemToken($"fingerprint"))
    val out = Matching.matchCodebase(resources, emptyExact, emptyDir,
      emptyDir, qsnip, snipIdx, minJaccard = 0.5,
      stemmedQuerySnippets = Some(stemmedQ), stemmedIndex = Some(stemmedIdx))
      .select("path", "download_url", "match_type")
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("src/c.c", "http://p/s.jar", "snippet"),        // NOT stemmed
      ("src/d.c", "http://p/t.jar", "stemmed_snippet")))
  }

  test("rankPackages keeps the dominant package per resource") {
    val matches = Seq(
      ("r1", "http://p/big.jar", "exact_file"),
      ("r2", "http://p/big.jar", "exact_file"),
      ("r3", "http://p/big.jar", "approx_file"),
      ("r1", "http://p/small.jar", "exact_file"))
      .toDF("path", "download_url", "match_type")
    val out = Matching.rankPackages(matches)
    val r1 = out.filter($"path" === "r1").collect().head
    assert(r1.getAs[String]("download_url") == "http://p/big.jar")
    assert(out.count() == 3)
  }

  test("snippet pipeline matches the reference's approximate-file corpus") {
    // The reference's approximate-file-matching fixtures: index.js is
    // deep-equal 1.0.1's real source, index-modified.js a lightly
    // edited copy that the reference expects to match it
    // (index-modified.js-expected.json); inflate.c / inflate-mod.c the
    // same for zlib. End-to-end: tokenize, produce REAL 16-token
    // rolling-window fingerprints per position (rollhash_fps, the X6
    // producer), snippet-match, and assert the reference's expected
    // best-match outcomes with no cross-corpus confusion.
    graft.functions.GraftFunctions.register(spark) // rollhash_fps in expr()
    val dir = "/root/reference/matchcode/tests/testfiles/match/" +
      "approximate-file-matching"
    def tokens(name: String): Seq[String] =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, name)), "UTF-8")
        .split("[^A-Za-z0-9]+").filter(_.nonEmpty).toSeq

    def windowFps(files: Seq[String]): org.apache.spark.sql.DataFrame =
      files.map(f => (f, tokens(f))).toDF("path", "tokens")
        .select(col("path"),
          posexplode(expr(
            """transform(sequence(1, greatest(size(tokens) - 15, 1)),
                 p -> element_at(
                   rollhash_fps(slice(tokens, p, 16), 16, 1), 1))""")))
        .withColumnRenamed("pos", "position")
        .withColumnRenamed("col", "fingerprint")
        .select(col("path"), col("fingerprint").cast("string"),
          col("position").cast("long").as("position"))

    val queries = windowFps(Seq("index-modified.js", "inflate-mod.c"))
      .withColumnRenamed("path", "q_path")
    val index = windowFps(Seq("index.js", "index-2.js", "inflate.c"))
      .withColumn("download_url", concat(lit("pkg://"), col("path")))
    val out = Matching.snippetMatch(queries, index).collect()

    def jaccard(q: String, i: String): Double = out
      .find(r => r.getAs[String]("q_path") == q &&
        r.getAs[String]("download_url") == s"pkg://$i")
      .map(_.getAs[Double]("jaccard")).getOrElse(0.0)

    // the reference's expected outcomes
    assert(jaccard("index-modified.js", "index.js") > 0.5,
      "modified deep-equal source must match its original")
    assert(jaccard("inflate-mod.c", "inflate.c") > 0.5,
      "modified zlib inflate must match its original")
    // best-match ordering within the JS corpus
    assert(jaccard("index-modified.js", "index.js") >
      jaccard("index-modified.js", "index-2.js"))
    // no cross-language confusion
    assert(jaccard("index-modified.js", "inflate.c") < 0.05)
    assert(jaccard("inflate-mod.c", "index.js") < 0.05)
  }
}
