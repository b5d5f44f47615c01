package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Data layout → scan efficiency: the same rows written date-CLUSTERED
  * (repartitionByRange + sortWithinPartitions on l_shipdate, small
  * parquet row groups) vs hash-SHUFFLED, then filtered to a narrow
  * date range. Parquet row-group statistics let the clustered layout
  * skip almost every row group (the scan node emits ~selectivity
  * rows), while the shuffled layout's row groups all span the full
  * date range and must be decoded whole. This is the OSS stand-in for
  * Z-ordering: at 100 TB the clustered table answers a time-range
  * query by reading a sliver, the unclustered one by reading
  * everything.
  */
class LayoutSpec extends SparkTestBase {

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("date-clustered layout skips parquet row groups; shuffled reads all") {
    // cluster key is a DATE: TIMESTAMP_NTZ predicates ARE pushed
    // (PushedFilters shows them) but this Spark's parquet reader does
    // not consult NTZ row-group min/max, so an NTZ cluster key skips
    // nothing — a real layout lesson: give time-partitioned tables a
    // date (or epoch-int) cluster column
    val li = core.t(spark, sf001, "lineitem")
      .select(col("l_orderkey"),
        to_date(col("l_shipdate").cast("timestamp")).as("ship_date"),
        col("l_extendedprice"))
    val total = li.count()
    // per-run temp dir: a fixed path races with a concurrent test run
    // on the same machine (overwrite vs read)
    val base = java.nio.file.Files
      .createTempDirectory("graft_layout").toString
    // small row groups so the 6k-row table has many to skip
    li.repartitionByRange(4, col("ship_date"))
      .sortWithinPartitions("ship_date")
      .write.mode("overwrite")
      .option("parquet.block.size", 32 * 1024)
      .parquet(s"$base/clustered")
    li.repartition(4)
      .write.mode("overwrite")
      .option("parquet.block.size", 32 * 1024)
      .parquet(s"$base/shuffled")

    def narrow(path: String) =
      spark.read.parquet(path)
        .filter(col("ship_date") >= "1995-01-01" &&
          col("ship_date") < "1995-02-01")

    val a = narrow(s"$base/clustered")
    val b = narrow(s"$base/shuffled")
    // identical answers...
    assert(a.count() == b.count())
    val sel = a.count()
    assert(sel > 0 && sel < total / 10, s"filter not selective: $sel/$total")
    // ...radically different bytes decoded: the clustered scan's
    // row-group stats bound what the reader emits
    val clusteredRows = scanOutputRows(a)
    val shuffledRows = scanOutputRows(b)
    assert(shuffledRows > (total * 9) / 10,
      s"shuffled layout unexpectedly pruned: $shuffledRows of $total")
    assert(clusteredRows < total / 3,
      s"clustered layout did not skip row groups: $clusteredRows of $total " +
        s"(selective rows: $sel)")
  }
}
