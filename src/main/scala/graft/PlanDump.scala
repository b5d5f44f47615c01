package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization rounds' plan evidence (`plans/r<N>/<query>_before.txt`
  * / `_after.txt`). Usage:
  *
  *   runMain graft.PlanDump <outDir> <suffix> [name1,name2,...]
  *
  * writes `<outDir>/<name>_<suffix>.txt` per query (all registered
  * queries when no filter is given). The plan is the ANALYZED +
  * OPTIMIZED physical plan Spark would execute at
  * `$SPARK_GRAFT_SF_DIR` (default sf0.1) — captured without running
  * the query, so AQE nodes show `isFinalPlan=false`; Exchange count,
  * join strategy, PushedFilters and ReadSchema are all visible.
  * Queries whose `run` itself executes jobs (artifact lifecycles)
  * still only dump the FINAL returned frame's plan; their internal
  * stages are measured by [[OptProbe]] instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r13")
    val suffix = if (args.length > 1) args(1) else "before"
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val queries = only match {
      case Some(names) => Registry.all.filter(q => names.contains(q.name))
      case None        => Registry.all
    }
    queries.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(outDir, s"${q.name}_$suffix.txt"), plan)
        println(s"[plandump] wrote ${q.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      }
      graft.ops.SimilarityOps.releaseCaches()
      graft.ops.DedupOps.releaseCaches()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
