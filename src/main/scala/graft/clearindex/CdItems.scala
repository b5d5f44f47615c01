package graft.clearindex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClearlyDefined item (CDitem) queryset semantics
  * (`clearcode/models.py:45-83`) as Column predicates over the
  * harvest-store frame (path, content, last_modified_date,
  * last_map_date, map_error), plus the sync store's `db_saver`
  * upsert (`clearcode/sync.py:234-257`).
  *
  * Scale notes: every selector is a pure predicate — partition-pruned
  * and codegen'd, no shuffle; the upsert is one anti-join + one
  * equi-join keyed on `path`.
  */
object CdItems {

  /** The package types the catalog can store (models.py:48-61). */
  val knownPackageTypes: Seq[String] = Seq(
    "composer", "crate", "deb", "debsrc", "gem", "git", "maven", "npm",
    "nuget", "pypi", "sourcearchive")

  def isKnownPackageType: Column =
    knownPackageTypes.map(t => col("path").startsWith(t)).reduce(_ || _)

  /** `definitions()`: anything that is not a tool harvest. */
  def isDefinition: Column = !col("path").contains("/tool/")

  /** `scancode_harvests()`. */
  def isScancodeHarvest: Column = col("path").contains("tool/scancode")

  /** `mappable()`: never mapped and never errored. */
  def isMappable: Column =
    col("last_map_date").isNull && col("map_error").isNull

  def definitions(items: DataFrame): DataFrame = items.filter(isDefinition)

  def scancodeHarvests(items: DataFrame): DataFrame =
    items.filter(isScancodeHarvest)

  def mappable(items: DataFrame): DataFrame = items.filter(isMappable)

  def mappableDefinitions(items: DataFrame): DataFrame =
    items.filter(isMappable && isDefinition && isKnownPackageType)

  def mappableScancodeHarvests(items: DataFrame): DataFrame =
    items.filter(isMappable && isScancodeHarvest && isKnownPackageType)

  def modifiedAfter(items: DataFrame, date: java.sql.Timestamp): DataFrame =
    items.filter(col("last_modified_date") > lit(date))

  /** `db_saver` as a batch upsert: new paths insert; existing paths
    * update only when the content changed (sync.py:244-252). Frames
    * carry (path, content, last_modified_date). */
  def upsert(existing: DataFrame, incoming: DataFrame,
      now: java.sql.Timestamp): DataFrame = {
    val in = incoming.dropDuplicates("path")
    val kept = existing.alias("e")
      .join(in.select(col("path"), col("content").as("new_content")),
        Seq("path"), "left")
      .select(col("path"),
        when(col("new_content").isNotNull &&
          col("new_content") =!= col("e.content"), col("new_content"))
          .otherwise(col("e.content")).as("content"),
        when(col("new_content").isNotNull &&
          col("new_content") =!= col("e.content"), lit(now))
          .otherwise(col("e.last_modified_date")).as("last_modified_date"))
    val created = in.join(existing.select("path"), Seq("path"), "left_anti")
      .select(col("path"), col("content"), lit(now).as("last_modified_date"))
    kept.unionByName(created)
  }
}
