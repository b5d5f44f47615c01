package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the integer dot product that dominates the
  * quantized-embedding family (IVF/PQ assignment, SemDeDup pair
  * verify, cosine re-rank): the codegen'd single-loop
  * `dot_long` expression vs the built-in `aggregate(zip_with(...))`
  * formulation, which allocates an intermediate array per evaluation.
  * Per-row CPU with no shuffle — rows/s/core is the whole scale
  * story; numbers go to BASELINE.md.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.DotProbe [nRows]
  */
object DotProbe {

  def main(args: Array[String]): Unit = {
    // 2M rows × two 64-long arrays ≈ 2 GB cached — fits the default
    // test-harness heap (10M rows OOMs it)
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dot-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // two deterministic 64-long arrays per row
    val corpus = spark.range(n).repartition(cpus.toInt)
      .select(
        expr("transform(sequence(0, 63), i -> (id + i) % 1000000)").as("a"),
        expr("transform(sequence(0, 63), i -> (id * 31 + i) % 1000000)")
          .as("b"))
      .cache()
    corpus.count() // materialize: exclude the build from every timing

    def time(what: String)(body: => Long): Long = {
      body // warm-up (codegen + JIT)
      def pass(): (Double, Long) = {
        val t0 = System.nanoTime()
        val out = body
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val (s1, o1) = pass()
      val (s2, o2) = pass()
      require(o1 == o2)
      val secs = math.min(s1, s2)
      println(f"DOT_PROBE $what n=$n secs=$secs%.3f rows_per_s=${n / secs}%.0f")
      o1
    }

    val viaExpr = time("dot_long(codegen)") {
      corpus.select(
        graft.functions.GraftFunctions.dot_long(col("a"), col("b"))
          .as("d"))
        .agg(sum(expr("d % 1000000007"))).head().getLong(0)
    }
    val viaZip = time("zip_with+aggregate") {
      corpus.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
        .as("d"))
        .agg(sum(expr("d % 1000000007"))).head().getLong(0)
    }
    require(viaExpr == viaZip, "dot variants disagree")
    spark.stop()
  }
}
