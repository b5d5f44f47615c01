package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog storage layout (SURVEY §1.3, §4 "index access paths →
  * layout"): the reference's per-field B-tree indexes are replaced by
  * physical layout —
  *
  *   - `packages` partitioned by `ptype` (the catalog's coarsest,
  *     always-filtered dimension → partition pruning on every
  *     ecosystem-scoped query),
  *   - within partitions, files sorted by `download_url`
  *     (the merge identity) so MERGE-style joins and point lookups
  *     hit few row groups via parquet min/max stats,
  *   - fingerprint index tables sorted by their band keys for the
  *     same reason.
  *
  * Writers use `sortWithinPartitions` + `repartition` on the
  * partition columns — one shuffle, no global sort. (Plain parquet
  * here; the same calls take `format("delta")` when a Delta runtime
  * is on the classpath.)
  */
object Store {

  /** Write the packages table partitioned by ptype, clustered by
    * download_url. */
  def writePackages(packages: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    packages
      .repartition(col("ptype"))
      .sortWithinPartitions(col("ptype"), col("download_url"))
      .write.mode(mode)
      .partitionBy("ptype")
      .parquet(path)

  def readPackages(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a fingerprint index clustered by its join key so band
    * probes prune row groups. */
  def writeIndex(index: DataFrame, path: String, clusterKey: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    index
      .repartition(col(clusterKey))
      .sortWithinPartitions(col(clusterKey))
      .write.mode(mode)
      .parquet(path)

  /** Append-only event/queue tables (frontier, scan queue, inbox)
    * partitioned by date for retention and incremental reads. */
  def appendQueue(rows: DataFrame, path: String, tsCol: String): Unit =
    rows
      .withColumn("__day", to_date(col(tsCol)))
      .write.mode(SaveMode.Append)
      .partitionBy("__day")
      .parquet(path)
}
