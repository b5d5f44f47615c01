package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — projections / filters / predicates. Each filter is
  * a declarative Column predicate so Catalyst pushes it into the
  * parquet scan (PushedFilters) and prunes columns (ReadSchema).
  */
object Filters {

  val p1 = QueryDef(
    "p1_lookup_filter", "P1",
    "PURL-lookup-style conjunctive equality filter (null fields omitted)",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_brand") === "Brand#13" && col("p_type") === "ECONOMY")
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size
      FROM part WHERE p_brand = 'Brand#13' AND p_type = 'ECONOMY'
      ORDER BY p_partkey"""))

  val p2 = QueryDef(
    "p2_iexact", "P2",
    "case-insensitive equality (iexact) filter",
    (s, dir) =>
      t(s, dir, "part")
        .filter(lower(col("p_name")) === lower(lit("COLD WIDGET")))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand
      FROM part WHERE lower(p_name) = lower('COLD WIDGET')
      ORDER BY p_partkey"""))

  val p3 = QueryDef(
    "p3_multi_in", "P3/P9",
    "multi-value IN filter plus status flag",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus = 'F'
      ORDER BY o_orderkey"""))

  val p4 = QueryDef(
    "p4_or_of_lookups", "P4/A8",
    "disjunction of conjunctive lookups + distinct (multi-PURL filter)",
    (s, dir) =>
      t(s, dir, "part")
        .filter((col("p_brand") === "Brand#13" && col("p_type") === "ECONOMY") ||
          (col("p_brand") === "Brand#5" && col("p_type") === "PROMO"))
        .select("p_brand", "p_type", "p_size")
        .distinct()
        .orderBy("p_brand", "p_type", "p_size"),
    Some("""SELECT DISTINCT p_brand, p_type, p_size FROM part
      WHERE (p_brand='Brand#13' AND p_type='ECONOMY')
         OR (p_brand='Brand#5' AND p_type='PROMO')
      ORDER BY p_brand, p_type, p_size"""))

  val p5 = QueryDef(
    "p5_search_dsl", "P5",
    "search mini-DSL compiled to a pushed-down predicate tree",
    (s, dir) => {
      val part = t(s, dir, "part")
      val pred = SearchDsl.compile(
        """widget size:20> -brand:Brand#13= type:ECO^""",
        fields = Map(
          "name" -> col("p_name"), "brand" -> col("p_brand"),
          "type" -> col("p_type"), "size" -> col("p_size")),
        bareFields = Seq(col("p_name"), col("p_brand"), col("p_type")))
      part.filter(pred)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      WHERE (position('widget' IN lower(p_name)) > 0
             OR position('widget' IN lower(p_brand)) > 0
             OR position('widget' IN lower(p_type)) > 0)
        AND p_size > 20
        AND NOT (lower(p_brand) = 'brand#13')
        AND lower(p_type) LIKE 'eco%'
      ORDER BY p_partkey"""))

  val p6 = QueryDef(
    "p6_null_blank", "P6",
    "isnull / has_value / non-blank predicates",
    (s, dir) =>
      t(s, dir, "documents")
        .filter(col("lang").isNotNull &&
          nullif(trim(col("text")), lit("")).isNotNull && col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, n_chars FROM documents
      WHERE lang IS NOT NULL AND NULLIF(TRIM(text), '') IS NOT NULL
        AND n_chars > 0
      ORDER BY doc_id"""))

  val p7 = QueryDef(
    "p7_path_prefix", "P7",
    "descendant path-prefix filter with trailing-/ guard (src1 ≠ src10)",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("path",
          concat(col("source"), lit("/doc"), col("doc_id").cast("string")))
      docs.filter(concat(col("source"), lit("/")).startsWith("src1/"))
        .select("doc_id", "path")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, source || '/doc' || CAST(doc_id AS VARCHAR) AS path
      FROM documents
      WHERE (source || '/') LIKE 'src1/%'
      ORDER BY doc_id"""))

  val p8 = QueryDef(
    "p8_regex", "P8",
    "regex predicate (rlike) on names",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").rlike("^(cold|blue) (widget|rod)$"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name FROM part
      WHERE regexp_matches(p_name, '^(cold|blue) (widget|rod)$')
      ORDER BY p_partkey"""))

  val p10 = QueryDef(
    "p10_projection", "P10",
    "projection pruning — only two columns reach the scan",
    (s, dir) =>
      t(s, dir, "supplier").select("s_suppkey", "s_name").orderBy("s_suppkey"),
    Some("SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey"))

  val p11 = QueryDef(
    "p11_checksum_normalize", "P11/F3",
    "invalid-length checksum nulled at ingest (write-side normalization)",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("fp", md5(col("text")))
        .select(col("doc_id"),
          when(length(col("fp")) === 32, col("fp")).as("fp_norm"),
          when(length(col("lang")) === 2, lower(col("lang"))).as("lang_norm"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
      CASE WHEN length(md5(text)) = 32 THEN md5(text) END AS fp_norm,
      CASE WHEN length(lang) = 2 THEN lower(lang) END AS lang_norm
      FROM documents ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(p1, p2, p3, p4, p5, p6, p7, p8, p10, p11)
}
