package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S14 — CycloneDX SBOM export (`packagedb/models.py:802-887`,
  * `packagedb/sbom.py`): project catalog rows to CycloneDX component
  * JSON (bom-ref = purl; hashes, licenses, external references).
  * Pure column expressions → `to_json`, so export is a scan +
  * projection, no shuffle.
  */
object Sbom {

  private def purlCol: Column =
    graft.functions.GraftFunctions.purl_build(col("ptype"), col("namespace"),
      col("name"), col("version"))

  /** One CycloneDX component JSON string per catalog row. */
  def toCycloneDx(packages: DataFrame): DataFrame =
    packages.select(
      purlCol.as("purl"),
      to_json(struct(
        purlCol.as("bom-ref"),
        lit("library").as("type"),
        col("name"),
        col("version"),
        purlCol.as("purl"),
        when(col("description").isNotNull, col("description"))
          .as("description"),
        array_compact(array(
          when(col("sha1").isNotNull,
            struct(lit("SHA-1").as("alg"), col("sha1").as("content"))),
          when(col("md5").isNotNull,
            struct(lit("MD5").as("alg"), col("md5").as("content"))),
          when(col("sha256").isNotNull,
            struct(lit("SHA-256").as("alg"), col("sha256").as("content")))))
          .as("hashes"),
        when(col("declared_license_expression").isNotNull, array(struct(
          col("declared_license_expression").as("expression"))))
          .as("licenses"),
        when(col("homepage_url").isNotNull, array(struct(
          lit("website").as("type"), col("homepage_url").as("url"))))
          .as("externalReferences")), Map("ignoreNullFields" -> "true"))
        .as("component"))
}
