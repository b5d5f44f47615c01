package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the X3 routability path: how fast does the
  * anchored 195-pattern alternation (`Frontier.withRoutability`, the
  * reference's `is_routable` check at `minecode/models.py:482-483`)
  * classify URIs, and how fast does the full three-router `resolve`
  * dispatch run? Both are per-row CPU with no shuffle — at cluster
  * scale they ride the scan stage — so rows/s/core is the whole scale
  * story; this prints it for BASELINE.md.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.RouteProbe [nRows]
  */
object RouteProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-route-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tpls = graft.miners.RouteRegistry.templates

    def time[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"ROUTE_PROBE $what n=$n secs=$secs%.2f rows_per_s=${n / secs}%.0f")
      out
    }

    // rlike alternation classification (the production frontier path)
    val flagged = graft.streaming.Frontier.withRoutability(
      spark.range(n).repartition(cpus.toInt)
        .select(expr(s"element_at(${tpls.map(t => s"'${t.replace("'", "''")}'")
          .mkString("array(", ",", ")")}, cast(id % ${tpls.size} as int) + 1)")
          .as("tpl"), col("id").cast("string").as("k"))
        .select(expr("replace(tpl, '#K#', k)").as("uri")))
    val (nVis, nMap) = time("withRoutability") {
      val r = flagged.agg(
        sum(when(col("is_visitable"), 1L).otherwise(0L)),
        sum(when(col("is_mappable"), 1L).otherwise(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    println(s"ROUTE_PROBE flags visitable=$nVis mappable=$nMap")

    // full three-router resolve (the x3 dispatch path)
    val corpus = flagged.select("uri").as[String]
    val nOk = time("resolve3") {
      corpus.mapPartitions { it =>
        val routers = Seq("visit", "map", "priority")
          .map(graft.miners.RouteRegistry.router)
        it.map(u => routers.count(_.resolveEither(u).isRight))
      }.agg(sum("value")).collect()(0).getLong(0)
    }
    println(s"ROUTE_PROBE resolved_ok=$nOk")
    spark.stop()
  }
}
