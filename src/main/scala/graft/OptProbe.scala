package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall breakdown of a registered query — the measurement
  * companion for queries whose `run` spans many Spark jobs (artifact
  * lifecycles: CC fixpoint → save → ingest → delete → resolve each
  * launch jobs of their own), where a single end-to-end number says
  * nothing about WHERE the time goes. Usage:
  *
  *   runMain graft.OptProbe name1[,name2,...] [passes]
  *
  * Runs each named query `passes` times (default 2 — first pass is
  * codegen/JIT warmup, reported separately) with a listener that
  * records every job's wall, description and stage shuffle totals,
  * then prints a per-job table for the LAST pass plus the end-to-end
  * wall of every pass. Forcing matches Bench (noop sink). */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val passes = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-optprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-id -> (start ns, description); completed rows appended in order
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (recording) {
        val props = Option(js.properties)
        val desc = props
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (recording) {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (recording) {
          shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def release(): Unit = {
      graft.ops.SimilarityOps.releaseCaches()
      graft.ops.DedupOps.releaseCaches()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val queries =
      if (names.isEmpty) Seq.empty else Registry.all.filter(q => names.contains(q.name))
    queries.foreach { q =>
      val walls = (1 to passes).map { p =>
        rows.clear(); starts.clear(); shuffleRead = 0L; shuffleWrite = 0L
        recording = p == passes // record detail only on the last pass
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[optprobe] ${q.name} FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        recording = false
        release()
        dt
      }
      println(f"== ${q.name}: " +
        walls.zipWithIndex.map { case (w, i) => f"pass${i + 1}=$w%.2fs" }.mkString(" "))
      import scala.jdk.CollectionConverters._
      val sorted = rows.asScala.toSeq.sortBy(_._1)
      sorted.foreach { case (id, dt, desc) =>
        println(f"  job $id%3d  $dt%7.3fs  ${desc.take(100)}")
      }
      println(f"  jobs=${sorted.length} jobWallSum=${sorted.map(_._2).sum}%.2fs " +
        f"shufRead=${shuffleRead / 1e6}%.1fMB shufWrite=${shuffleWrite / 1e6}%.1fMB")
    }
    spark.stop()
  }
}
