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

    // warm-up pass + two timed passes (min reported): the first action
    // on a fresh plan pays whole-stage-codegen compilation and JIT of
    // the match loops, which would otherwise swamp the comparison
    def time[A](what: String)(body: => A): A = {
      body // warm-up
      def pass(): (Double, A) = {
        val t0 = System.nanoTime()
        val out = body
        ((System.nanoTime() - t0) / 1e9, out)
      }
      val (s1, _) = pass()
      val (s2, out) = pass()
      val secs = math.min(s1, s2)
      println(f"ROUTE_PROBE $what n=$n secs=$secs%.2f rows_per_s=${n / secs}%.0f")
      out
    }

    val corpus = spark.range(n).repartition(cpus.toInt)
      .select(expr(s"element_at(${tpls.map(t => s"'${t.replace("'", "''")}'")
        .mkString("array(", ",", ")")}, cast(id % ${tpls.size} as int) + 1)")
        .as("tpl"), col("id").cast("string").as("k"))
      .select(expr("replace(tpl, '#K#', k)").as("uri"))
      .cache()
    corpus.count() // materialize: exclude the build from every timing

    // production path: prefix-pruned UriRoutable native expression
    val flagged = graft.streaming.Frontier.withRoutability(corpus)
    val (nVis, nMap) = time("withRoutability(pruned-expr)") {
      val r = flagged.agg(
        sum(when(col("is_visitable"), 1L).otherwise(0L)),
        sum(when(col("is_mappable"), 1L).otherwise(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    println(s"ROUTE_PROBE flags visitable=$nVis mappable=$nMap")

    // baseline: the reference-shaped monolithic ^(p1|..|pn)$ rlike —
    // must agree with the pruned expression exactly
    import graft.miners.RouteRegistry
    val rlikeFlagged = corpus
      .withColumn("is_visitable",
        col("uri").rlike(RouteRegistry.alternation(RouteRegistry.visit)))
      .withColumn("is_mappable",
        col("uri").rlike(RouteRegistry.alternation(RouteRegistry.map)))
    val (aVis, aMap) = time("withRoutability(rlike-alt)") {
      val r = rlikeFlagged.agg(
        sum(when(col("is_visitable"), 1L).otherwise(0L)),
        sum(when(col("is_mappable"), 1L).otherwise(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(aVis == nVis && aMap == nMap,
      s"pruned/alternation disagree: $nVis/$nMap vs $aVis/$aMap")

    // full three-router resolve (the x3 dispatch path)
    val corpusDs = flagged.select("uri").as[String]
    val nOk = time("resolve3") {
      corpusDs.mapPartitions { it =>
        val routers = Seq("visit", "map", "priority")
          .map(graft.miners.RouteRegistry.router)
        it.map(u => routers.count(_.resolveEither(u).isRight))
      }.agg(sum("value")).collect()(0).getLong(0)
    }
    println(s"ROUTE_PROBE resolved_ok=$nOk")

    // prune effectiveness: regex full-match attempts per URI with the
    // literal-prefix gate vs without (= pattern count)
    val regs = Seq(
      "visit" -> graft.miners.RouteRegistry.visit,
      "map" -> graft.miners.RouteRegistry.map,
      "priority" -> graft.miners.RouteRegistry.priority)
    val sample = tpls.flatMap(t => Seq(t.replace("#K#", "7"),
      t.replace("#K#", "31")))
    for ((name, entries) <- regs) {
      val prefixes = entries.map { case (p, _) =>
        graft.miners.Router.literalPrefix(p) }
      val attempts = sample.map(u => prefixes.count(u.startsWith(_)))
      println(s"ROUTE_PROBE prune $name: ${entries.size} patterns, " +
        f"mean regex attempts/URI ${attempts.sum.toDouble / attempts.size}%.1f" +
        s" (max ${attempts.max})")
    }
    spark.stop()
  }
}
