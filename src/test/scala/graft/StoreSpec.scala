package graft

import java.nio.file.Files

import graft.catalog.{PackageRow, Store}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class StoreSpec extends SparkTestBase {
  import spark.implicits._

  test("packages partition by ptype and prune on read") {
    val dir = Files.createTempDirectory("graft-store").toString
    val pkgs = Seq(
      PackageRow.minimal("http://r/a.jar", "maven", "a", Some("1.0")),
      PackageRow.minimal("http://r/b.tgz", "npm", "b", Some("2.0")),
      PackageRow.minimal("http://r/c.whl", "pypi", "c", Some("3.0"))).toDF()
    Store.writePackages(pkgs, dir)
    // physical layout: one directory per ptype
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("ptype=")).map(_.getName).sorted
    assert(partDirs.toSeq == Seq("ptype=maven", "ptype=npm", "ptype=pypi"))
    // read side: ptype filter becomes a partition filter, not a scan
    val back = Store.readPackages(spark, dir).filter(col("ptype") === "maven")
    assert(back.count() == 1)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("ptype"), plan.take(1200))
  }

  test("queue append partitions by day and accumulates") {
    val dir = Files.createTempDirectory("graft-queue").toString
    val day1 = Seq(("u1", java.sql.Timestamp.valueOf("2026-08-11 10:00:00")))
      .toDF("uri", "ts")
    val day2 = Seq(("u2", java.sql.Timestamp.valueOf("2026-08-12 10:00:00")))
      .toDF("uri", "ts")
    Store.appendQueue(day1, dir, "ts")
    Store.appendQueue(day2, dir, "ts")
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(back.select("__day").distinct().count() == 2)
  }

  test("index write clusters by band key") {
    val dir = Files.createTempDirectory("graft-index").toString
    val idx = Seq(("aa", "pkg1"), ("bb", "pkg2"), ("aa", "pkg3"))
      .toDF("band", "download_url")
    Store.writeIndex(idx, dir, "band", SaveMode.Overwrite)
    assert(spark.read.parquet(dir).count() == 3)
  }
}
