package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._

/** Headline analytical queries (the bench set's backbone): scan →
  * filter → join → aggregate → sort plans shaped like the reference's
  * catalog statistics endpoints, expressed declaratively so Catalyst
  * gets pushdown/pruning/broadcast for free.
  */
object CoreQueries {

  private def pxc = cents(col("l_extendedprice"))
  private def dpc = cents(col("l_discount"))
  private def txc = cents(col("l_tax"))
  private val pxcSql = "CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)"
  private val dpcSql = "CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT)"
  private val txcSql = "CAST(FLOOR(l_tax*100 + 0.5) AS BIGINT)"

  val q1 = QueryDef(
    "q1_pricing_summary", "A1/A2/O1",
    "TPC-H-Q1-style grouped pricing summary; exact cents arithmetic",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          (asDouble(sum(pxc)) / 100.0).as("sum_base_price"),
          (asDouble(sum(pxc * (lit(100L) - dpc))) / 10000.0).as("sum_disc_price"),
          (asDouble(sum(pxc * (lit(100L) - dpc) * (lit(100L) + txc))) / 1000000.0).as("sum_charge"),
          (asDouble(sum(col("l_quantity").cast("long"))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      CAST(SUM($pxcSql) AS DOUBLE)/100.0 AS sum_base_price,
      CAST(SUM($pxcSql*(100-$dpcSql)) AS DOUBLE)/10000.0 AS sum_disc_price,
      CAST(SUM($pxcSql*(100-$dpcSql)*(100+$txcSql)) AS DOUBLE)/1000000.0 AS sum_charge,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  val q3 = QueryDef(
    "q3_top_revenue_orders", "J1/A1/O5",
    "customer⋈orders⋈lineitem revenue per order, top-10 (broadcast dim)",
    (s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "FURNITURE")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg((asDouble(sum(pxc * (lit(100L) - dpc))) / 10000.0).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM($pxcSql*(100-$dpcSql)) AS DOUBLE)/10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'FURNITURE'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  val q5 = QueryDef(
    "q5_region_revenue", "J3/A1/O1",
    "region⋈nation⋈customer⋈orders⋈lineitem revenue rollup per region",
    (s, dir) => {
      val geo = broadcast(
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")
            .join(t(s, dir, "region"),
              col("n_regionkey") === col("r_regionkey"))),
            col("c_nationkey") === col("n_nationkey")))
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(geo, col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"))
        .agg(
          (asDouble(sum(pxc * (lit(100L) - dpc))) / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("r_name"))
    },
    Some(s"""SELECT r_name,
      CAST(SUM($pxcSql*(100-$dpcSql)) AS DOUBLE)/10000.0 AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY revenue DESC, r_name"""))

  val defs: Seq[QueryDef] = Seq(q1, q3, q5)
}
