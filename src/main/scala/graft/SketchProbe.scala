package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-volume probe behind the `a_sketch_distinct` gate's claim:
  * the registered query carries BOTH the exact `countDistinct` branch
  * (for verification) and the HLL++ sketch — its shuffle therefore
  * scales with distinct (group, user) pairs. A production job keeps
  * only the sketch, whose partials are a fixed ~few KB per group per
  * task. This probe times and meters the two branches SEPARATELY on
  * the scaled events corpora so BASELINE.md states the flat-vs-linear
  * contrast as a measurement, not an argument.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *        runMain graft.SketchProbe
  * Reads the ScaleBench-built corpora in /tmp/graft_scale{10,100}x
  * (building them if absent, same builder).
  */
object SketchProbe {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sketch-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new ScaleBench.ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    val dirs = ("base" -> base) +: Seq(10, 100).map { f =>
      val out = s"/tmp/graft_scale${f}x"
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$out/events.parquet")))
        ScaleBench.buildScaledEvents(spark, base, out, f)
      s"x$f" -> out
    }

    // drain the async listener bus the ScaleBench way: poll until the
    // snapshot is stable across two reads (a fixed sleep undercounts
    // telemetry exactly on the big runs this probe exists to measure)
    def drained(): (Long, Long, Long, Long, Long, Int) = {
      var prev = listener.snapshot
      var stable = false
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!stable && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val cur = listener.snapshot
        stable = cur == prev
        prev = cur
      }
      listener.snapshot
    }

    def meter(tag: String, what: String)(
        plan: org.apache.spark.sql.DataFrame): Unit = {
      def pass(): (Double, (Long, Long, Long, Long, Long, Int)) = {
        listener.reset()
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, drained())
      }
      pass() // warm-up: codegen + JIT + page cache
      val (s1, snap1) = pass()
      val (s2, snap2) = pass()
      val (secs, snap) = if (s1 <= s2) (s1, snap1) else (s2, snap2)
      val (_, _, wr, wb, _, _) = snap
      println(f"SKETCH_PROBE $tag $what secs=$secs%.3f " +
        f"sh_write_rows=$wr sh_write_mb=${wb / 1e6}%.1f")
    }

    dirs.foreach { case (tag, dir) =>
      val events = core.t(spark, dir, "events")
        .select(col("event_type"), col("user_id"))
      meter(tag, "exact_distinct")(
        events.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n")))
      meter(tag, "hll_sketch")(
        events.groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.02).as("n")))
    }
    spark.stop()
  }
}
