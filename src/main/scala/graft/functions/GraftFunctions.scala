package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Column-API surface for the custom Catalyst expressions, plus SQL
  * registration so `spark.sql("SELECT purl_parse(...)")` works too.
  */
object GraftFunctions {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  /** PURL string -> struct<ptype,namespace,name,version,qualifiers,subpath>. */
  def purl_parse(c: Column): Column = col(PurlParse(ex(c)))

  /** Compose a canonical PURL string from component columns (nulls
    * collapse their segment). Pure built-in ops — codegen-friendly. */
  def purl_build(ptype: Column, namespace: Column, name: Column,
      version: Column): Column =
    concat(
      lit("pkg:"), lower(ptype), lit("/"),
      when(namespace.isNull or namespace === "", lit(""))
        .otherwise(concat(namespace, lit("/"))),
      name,
      when(version.isNull or version === "", lit(""))
        .otherwise(concat(lit("@"), version)))

  /** Natural-version sort key (binary-comparable string). */
  def natver_key(c: Column): Column = col(NatVersionKey(ex(c)))

  /** Popcount of XOR over two equal-length binary columns. */
  def hamming_bin(a: Column, b: Column): Column = col(HammingBin(ex(a), ex(b)))

  /** Differing-BYTE count over two equal-length binary columns — the
    * reference's byte_hamming_distance approximate-match metric. */
  def hamming_bytes(a: Column, b: Column): Column =
    col(HammingBytes(ex(a), ex(b)))

  /** 64-bit SimHash over an array<string> of tokens. */
  def simhash64(c: Column): Column = col(SimHash64(ex(c)))

  /** k-value MinHash signature over an array<string> of tokens. */
  def minhash_sig(c: Column, k: Int): Column =
    col(MinHashSig(ex(c), ex(lit(k))))

  /** Integer dot product over two array<long> columns (codegen'd
    * single loop — the hot op of the quantized-embedding family). */
  def dot_long(a: Column, b: Column): Column = col(DotLong(ex(a), ex(b)))

  /** Winnowed rolling-hash fingerprints over token windows. */
  def rollhash_fps(c: Column, window: Int, keep: Int): Column =
    col(RollingFingerprints(ex(c), ex(lit(window)), ex(lit(keep))))

  /** F2 — URL canonicalization (NULL for unparseable input). */
  def canonical_url(c: Column): Column = col(CanonicalUrlExpr(ex(c)))

  /** F15 — vers range membership (NULL for unsupported specs). */
  def vers_contains(range: Column, version: Column): Column =
    col(VersContains(ex(range), ex(version)))

  /** F15/F6 — sign of the scheme-aware version comparison. */
  def vers_cmp(scheme: Column, a: Column, b: Column): Column =
    col(VersCmp(ex(scheme), ex(a), ex(b)))

  /** Trigram-profile language identification. */
  def langid(c: Column): Column = col(LangIdExpr(ex(c)))

  /** Unicode NFC normalization (UAX #15 via java.text.Normalizer). */
  def unicode_nfc(c: Column): Column = col(NfcNormalize(ex(c)))

  /** X3 — route-registry membership (visit/map/priority), the
    * reference's `is_routable`, prefix-pruned. */
  def uri_routable(c: Column, registry: String): Column =
    col(UriRoutable(ex(c), registry))

  /** Register all custom functions in the session's FunctionRegistry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("purl_parse",
      es => PurlParse(es.head), "built-in")
    reg.createOrReplaceTempFunction("natver_key",
      es => NatVersionKey(es.head), "built-in")
    reg.createOrReplaceTempFunction("hamming_bin",
      es => HammingBin(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("hamming_bytes",
      es => HammingBytes(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("halo1",
      es => graft.matching.Halo1(es.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_long",
      es => DotLong(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("rollhash_fps",
      es => RollingFingerprints(es.head, es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("canonical_url",
      es => CanonicalUrlExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("vers_contains",
      es => VersContains(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vers_cmp",
      es => VersCmp(es.head, es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("langid",
      es => LangIdExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("unicode_nfc",
      es => NfcNormalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("uri_routable",
      es => UriRoutable(es.head, es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"uri_routable registry must be a string literal, got $other")
      }), "built-in")
  }
}
