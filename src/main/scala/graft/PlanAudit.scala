package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Measurement-integrity audit for the bench harness: a `count()` on a
  * query's DataFrame lets Catalyst prune every column, and column-less
  * outer joins against unique-keyed right sides are then ELIMINATED
  * outright (`EliminateOuterJoin` + join-elimination over distinct
  * keys) — the "benchmark" measures a fraction of the plan the query
  * actually runs when its rows are consumed. This main compares, per
  * registered query, the join count of the full optimized plan against
  * the optimized plan of `SELECT COUNT(*)` over it, and prints the
  * queries whose count-plan lost joins.
  *
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {

  def joins(p: LogicalPlan): Int =
    p.collect { case j: Join => j }.size

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-planaudit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = Registry.all.flatMap { q =>
      try {
        val df = q.run(spark, dir)
        val full = joins(df.queryExecution.optimizedPlan)
        val counted = joins(
          df.groupBy().count().queryExecution.optimizedPlan)
        if (counted < full) Some((q.name, full, counted)) else None
      } catch {
        case e: Throwable =>
          println(s"[planaudit] ${q.name} failed: ${e.getMessage}")
          None
      }
    }
    println("[planaudit] queries whose count() plan eliminates joins:")
    rows.foreach { case (n, f, c) =>
      println(f"[planaudit]   $n%-28s full=$f count=$c")
    }
    println(s"[planaudit] ${rows.size} of ${Registry.all.size} affected")
    spark.stop()
  }
}
