package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class ExpressionSpec extends SparkTestBase {
  import spark.implicits._

  test("purl_parse full form") {
    val p = PurlParse.parse(
      "pkg:maven/org.apache.spark/spark-core@3.5.0?classifier=tests&repository_url=x#sub/path")
    assert(p(0) == "maven")
    assert(p(1) == "org.apache.spark")
    assert(p(2) == "spark-core")
    assert(p(3) == "3.5.0")
    // qualifiers sorted by key
    assert(p(4) == "classifier=tests&repository_url=x")
    assert(p(5) == "sub/path")
  }

  test("purl_parse minimal + no namespace") {
    val p = PurlParse.parse("pkg:pypi/requests@2.31.0")
    assert(p(0) == "pypi" && p(1) == null && p(2) == "requests" &&
      p(3) == "2.31.0" && p(4) == null && p(5) == null)
  }

  test("purl_parse multi-segment namespace and pct-decoding") {
    val p = PurlParse.parse("pkg:golang/github.com/gorilla/mux@v1.8.1")
    assert(p(1) == "github.com/gorilla" && p(2) == "mux")
    val q = PurlParse.parse("pkg:npm/%40babel/core@7.0.0")
    assert(q(1) == "@babel" && q(2) == "core")
  }

  test("purl_parse malformed returns null") {
    assert(PurlParse.parse("not-a-purl") == null)
    assert(PurlParse.parse("pkg:onlytype") == null)
  }

  test("purl_parse scoped npm with literal @ and no version") {
    // '@' before the last '/' is a scope marker, not a version
    // separator (packageurl-python tolerant form)
    val p = PurlParse.parse("pkg:npm/@babel/core")
    assert(p != null)
    assert(p(0) == "npm" && p(1) == "@babel" && p(2) == "core" &&
      p(3) == null)
    // and the same purl WITH a version still parses the version
    val q = PurlParse.parse("pkg:npm/@babel/core@7.0.0")
    assert(q(1) == "@babel" && q(2) == "core" && q(3) == "7.0.0")
  }

  test("purl_parse as a Column expression") {
    val df = Seq("pkg:gem/rails@7.0.0").toDF("purl")
      .select(GraftFunctions.purl_parse(col("purl")).as("p"))
      .select("p.ptype", "p.name", "p.version")
    assert(df.collect().head == Row("gem", "rails", "7.0.0"))
  }

  test("natver_key reproduces reference natsort('.'→'~'+'z') ordering") {
    val versions = Seq("1.2", "1.2.1", "1.10", "1.2rc1", "0.9", "1.2.10",
      "1.2.2", "2.0", "10.0")
    val sorted = versions.sortBy(NatVersionKey.key)
    // pre-release before base, patch releases between base and next minor
    assert(sorted == Seq("0.9", "1.2rc1", "1.2", "1.2.1", "1.2.2",
      "1.2.10", "1.10", "2.0", "10.0"))
  }

  test("hamming_bin popcount of xor") {
    val df = Seq(("ff00", "0f00"), ("ffff", "ffff")).toDF("a", "b")
      .select(GraftFunctions.hamming_bin(unhex(col("a")), unhex(col("b")))
        .as("hd"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(4, 0))
  }

  test("hamming_bin null on length mismatch") {
    val df = Seq(("ff00", "ff")).toDF("a", "b")
      .select(GraftFunctions.hamming_bin(unhex(col("a")), unhex(col("b")))
        .as("hd"))
    assert(df.collect().head.isNullAt(0))
  }

  test("simhash64: identical and near-identical token sets") {
    val base = (1 to 200).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED").updated(100, "ALSO")
    val far = (1 to 200).map(i => s"other$i")
    val df = Seq(base, near, far).toDF("toks")
      .select(GraftFunctions.simhash64(col("toks")).as("h"))
    val Array(h1, h2, h3) = df.collect().map(_.getLong(0))
    assert(h1 == Seq(base).toDF("toks")
      .select(GraftFunctions.simhash64(col("toks"))).collect().head.getLong(0))
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hd(h1, h2) <= 8, s"near docs should be close, got ${hd(h1, h2)}")
    assert(hd(h1, h3) > 8, s"far docs should be far, got ${hd(h1, h3)}")
  }

  test("minhash_sig: jaccard estimate tracks true overlap") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (1 to 100).map(i => if (i <= 90) s"sh$i" else s"x$i") // J≈0.818
    val c = (1 to 100).map(i => s"z$i") // J=0
    val df = Seq(a, b, c).toDF("toks")
      .select(GraftFunctions.minhash_sig(col("toks"), 64).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    def est(x: Seq[Long], y: Seq[Long]) =
      x.zip(y).count { case (p, q) => p == q } / 64.0
    assert(est(sigs(0), sigs(1)) > 0.6)
    assert(est(sigs(0), sigs(2)) < 0.2)
  }

  test("rollhash_fps deterministic winnowed fingerprints") {
    val toks = (1 to 50).map(i => s"w$i")
    val df = Seq(toks, toks).toDF("toks")
      .select(GraftFunctions.rollhash_fps(col("toks"), 16, 8).as("fps"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
    assert(rows(0).length == 8)
    assert(rows(0) == rows(0).sorted)
  }

  test("custom functions usable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT natver_key('1.10') > natver_key('1.2') AS later").collect()
    assert(r.head.getBoolean(0))
    val routable = spark.sql(
      """SELECT uri_routable('pkg:npm/lodash@4.17.21', 'priority') AS a,
                uri_routable('https://example.org/x', 'visit') AS b""")
      .collect().head
    assert(routable.getBoolean(0) && !routable.getBoolean(1))
  }

  test("unicode_nfc composes decomposed sequences, identity on NFC") {
    val decomposed = "café Å" // e+◌́, A+◌̊
    val composed = "café Å"          // é, Å precomposed
    val df = Seq((decomposed, composed)).toDF("d", "c")
      .select(
        GraftFunctions.unicode_nfc(col("d")).as("nd"),
        GraftFunctions.unicode_nfc(col("c")).as("nc"))
    val row = df.collect().head
    assert(row.getString(0) == composed)
    assert(row.getString(1) == composed) // already-NFC input unchanged
    // null-safe + SQL registration
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT unicode_nfc(NULL) AS a, unicode_nfc('plain ascii') AS b")
      .collect().head
    assert(viaSql.isNullAt(0) && viaSql.getString(1) == "plain ascii")
  }
}
