package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured bucketing evidence at volume: the q3-shaped fact⋈fact join
  * (filtered orders ⋈ lineitem on the order key, aggregate revenue,
  * top-10) over the 100× relational corpus, plain parquet vs tables
  * pre-bucketed on the join key. PlanSpec proves the plan shape at
  * sf0.001 ("zero Exchange"); this prints seconds + shuffle rows at
  * 60M lineitem / 15M orders so the layout lever the SURVEY §4 row
  * claims (bucketing replacing the reference's join-key indexes) is
  * demonstrated where it matters. The bucketed write itself is the
  * one-time shuffle a 100 TB deployment pays at ingest.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.BucketBench
  *   [relDir] (default /tmp/graft_scale_rel100x — build it first with
  *   SPARK_GRAFT_SCALE_MODE=rel SPARK_GRAFT_SCALE_FACTORS=100
  *   runMain graft.ScaleBench)
  */
object BucketBench {

  def main(args: Array[String]): Unit = {
    val relDir = args.headOption.getOrElse("/tmp/graft_scale_rel100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warehouse = "/tmp/graft_bucketbench_warehouse"
    // the metastore is per-session but managed-table LOCATIONS persist
    // on disk; wipe them so a re-run's saveAsTable does not collide
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rm)
      p.delete()
    }
    rm(new java.io.File(warehouse))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bucketbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new ScaleBench.ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    val orders = spark.read.parquet(s"$relDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$relDir/lineitem.parquet")

    // integer-cents revenue exactly as the oracled q3 (core.scala
    // exact-arithmetic conventions): the sum is a BIGINT, identical
    // under ANY partitioning, so plain vs bucketed must match
    // bit-for-bit; tie-break on the order key is deterministic
    def q3Shaped(o: DataFrame, l: DataFrame): Array[org.apache.spark.sql.Row] = {
      val pxc = expr("CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)")
      val dpc = expr("CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT)")
      o.filter(col("o_orderdate") < "1995-03-15")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(l.filter(col("l_shipdate") > "1995-03-15")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(pxc * (lit(100L) - dpc)).as("revenue_c4"))
        .orderBy(desc("revenue_c4"), col("o_orderkey"))
        .limit(10)
        .collect()
    }

    def measure(what: String)(body: => Array[org.apache.spark.sql.Row])
        : Array[org.apache.spark.sql.Row] = {
      body // warm-up (codegen + JIT; see BASELINE.md round-8 notes)
      var best = Double.MaxValue
      var bestSnap: (Long, Long, Long, Long, Long, Int) = null
      var out: Array[org.apache.spark.sql.Row] = null
      for (_ <- 1 to 2) {
        listener.reset()
        val t0 = System.nanoTime()
        out = body
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain async listener events
        if (secs < best) { best = secs; bestSnap = listener.snapshot }
      }
      val (_, _, wRecs, wBytes, maxW, stages) = bestSnap
      println(f"BUCKET_BENCH $what secs=$best%.2f sh_write_rows=$wRecs " +
        f"sh_write_mb=${wBytes / 1e6}%.1f max_stage_rows=$maxW stages=$stages")
      out
    }

    val plain = measure("plain-parquet")(q3Shaped(orders, lineitem))

    // one-time bucketed layout: both facts bucketed + sorted on the
    // join key, bucket count = shuffle partitions so the join maps
    // bucket-to-bucket
    listener.reset()
    val t0 = System.nanoTime()
    orders.write.bucketBy(cpus.toInt, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite")
      .saveAsTable("bb_orders")
    lineitem.write.bucketBy(cpus.toInt, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite")
      .saveAsTable("bb_lineitem")
    println(f"BUCKET_BENCH bucketed-write secs=${(System.nanoTime() - t0) / 1e9}%.2f" +
      s" (one-time ingest cost)")

    val bucketed = measure("bucketed-tables")(
      q3Shaped(spark.table("bb_orders"), spark.table("bb_lineitem")))

    require(plain.sameElements(bucketed),
      "bucketed plan changed the q3 result")
    println("BUCKET_BENCH results identical (integer-exact)")
    spark.stop()
  }
}
