package graft.ops

import graft._
import graft.core._
import graft.functions.GraftFunctions.natver_key
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.6 sorts/limits/pagination and §2.7 set operations. */
object SortsSets {

  val o1 = QueryDef(
    "o1_multisort_limit", "O1/O5",
    "validated multi-field sort with desc flags + limit (API sort shape)",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_orderpriority"), desc("o_totalprice"), col("o_orderkey"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .limit(100),
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey LIMIT 100"""))

  val o3 = QueryDef(
    "o3_natural_version_sort", "O3/F6",
    "natural-version ordering via natver_key ('1.2' < '1.2.1' < '1.10')",
    (s, dir) =>
      t(s, dir, "part")
        .withColumn("version",
          concat(pmod(col("p_partkey"), lit(3)).cast("string"), lit("."),
            pmod(col("p_partkey"), lit(12)).cast("string")))
        .select(col("p_partkey"), col("version"))
        .orderBy(natver_key(col("version")), col("p_partkey"))
        .limit(50),
    Some("""SELECT p_partkey,
        CAST(p_partkey % 3 AS VARCHAR) || '.' || CAST(p_partkey % 12 AS VARCHAR) AS version
      FROM part
      ORDER BY p_partkey % 3, p_partkey % 12, p_partkey LIMIT 50"""))

  val o4 = QueryDef(
    "o4_pagination", "O4",
    "stable offset pagination via top-k + bounded row_number (page 6, size 20)",
    (s, dir) => {
      // orderBy + limit plans as distributed TakeOrderedAndProject;
      // the global row_number window then runs over at most
      // page*pageSize rows instead of the whole table
      val topK = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
        .limit(120)
      val w = Window.orderBy(col("o_orderkey"))
      topK.withColumn("rn", row_number().over(w))
        .filter(col("rn") > 100)
        .orderBy("rn")
    },
    Some("""SELECT o_orderkey, o_totalprice, rn FROM (
        SELECT o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
        FROM orders) WHERE rn > 100 AND rn <= 120
      ORDER BY rn"""))

  /** The SQL TEXT path end-to-end: temp view + `spark.sql` + the
    * extension-registered custom expressions (`purl_parse`,
    * `natver_key`, `vers_contains`) invoked BY NAME from SQL — the
    * surface a BI tool or notebook user actually touches. Same
    * Catalyst expressions as the Column API (codegen, no UDF), so
    * the oracle is the usual arithmetic mirror. */
  val sqlSurface = QueryDef(
    "sql_api_surface", "spark.sql text path + registered custom functions",
    "SQL-text query: purl_parse + natver_key + vers_contains over a temp view",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "part").createOrReplaceTempView("part_v")
      s.sql("""
        WITH v AS (
          SELECT p_partkey,
            CAST(p_partkey % 3 AS STRING) || '.' ||
              CAST(p_partkey % 12 AS STRING) AS version
          FROM part_v)
        SELECT p_partkey, version,
          purl_parse('pkg:maven/org.demo/p' || CAST(p_partkey AS STRING)
            || '@' || version).name AS pname,
          coalesce(vers_contains('vers:generic/>=0.4|<2.2', version),
            false) AS in_range
        FROM v
        ORDER BY natver_key(version), p_partkey
        LIMIT 100""")
    },
    Some("""WITH v AS (
        SELECT p_partkey,
          CAST(p_partkey % 3 AS VARCHAR) || '.' ||
            CAST(p_partkey % 12 AS VARCHAR) AS version
        FROM part)
      SELECT p_partkey, version,
        'p' || CAST(p_partkey AS VARCHAR) AS pname,
        ((p_partkey % 3 > 0) OR (p_partkey % 3 = 0 AND p_partkey % 12 >= 4))
          AND ((p_partkey % 3 < 2) OR (p_partkey % 3 = 2 AND p_partkey % 12 < 2))
          AS in_range
      FROM v
      ORDER BY p_partkey % 3, p_partkey % 12, p_partkey
      LIMIT 100"""))

  val u1 = QueryDef(
    "u1_union_distinct", "U1",
    "UNION (distinct) of two branch queries (visit-candidates shape)",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      cust.filter(col("c_mktsegment") === "FURNITURE").select("c_custkey")
        .union(cust.filter(col("c_acctbal") > 9000.0).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
      UNION
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
      ORDER BY c_custkey"""))

  val u2 = QueryDef(
    "u2_union_all_tagged", "U2",
    "UNION ALL accumulation of tagged branches (Q|Q shape)",
    (s, dir) => {
      val part = t(s, dir, "part")
      part.filter(col("p_type") === "PROMO")
        .select(col("p_partkey"), lit("promo").as("src"))
        .union(part.filter(col("p_size") > 45)
          .select(col("p_partkey"), lit("big").as("src")))
        .orderBy("p_partkey", "src")
    },
    Some("""SELECT p_partkey, 'promo' AS src FROM part WHERE p_type = 'PROMO'
      UNION ALL
      SELECT p_partkey, 'big' AS src FROM part WHERE p_size > 45
      ORDER BY p_partkey, src"""))

  val u3 = QueryDef(
    "u3_except", "U3",
    "EXCEPT / exclusion of a sub-population",
    (s, dir) => {
      val ord = t(s, dir, "orders").select("o_custkey")
      val furn = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "FURNITURE")
        .select(col("c_custkey").as("o_custkey"))
      ord.distinct().except(furn)
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    },
    Some("""SELECT custkey FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT c_custkey AS custkey FROM customer
        WHERE c_mktsegment = 'FURNITURE')
      ORDER BY custkey"""))

  val u4 = QueryDef(
    "u4_intersect", "U4",
    "INTERSECT of two key sets",
    (s, dir) => {
      val hi = t(s, dir, "customer").filter(col("c_acctbal") > 5000.0)
        .select("c_custkey")
      val furn = t(s, dir, "customer").filter(col("c_mktsegment") === "FURNITURE")
        .select("c_custkey")
      hi.intersect(furn).orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE')
      ORDER BY c_custkey"""))

  val defs: Seq[QueryDef] = Seq(o1, o3, o4, u1, u2, u3, u4, sqlSurface)
}
