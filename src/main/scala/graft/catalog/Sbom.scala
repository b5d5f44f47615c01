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

  private def fullPurl: Column = concat(purlCol,
    when(col("qualifiers").isNotNull && col("qualifiers") =!= "",
      concat(lit("?"), col("qualifiers"))).otherwise(lit("")),
    when(col("subpath").isNotNull && col("subpath") =!= "",
      concat(lit("#"), col("subpath"))).otherwise(lit("")))

  private def hashesCol: Column = array_compact(array(
    when(col("md5").isNotNull,
      struct(lit("MD5").as("alg"), col("md5").as("content"))),
    when(col("sha1").isNotNull,
      struct(lit("SHA-1").as("alg"), col("sha1").as("content"))),
    when(col("sha256").isNotNull,
      struct(lit("SHA-256").as("alg"), col("sha256").as("content"))),
    when(col("sha512").isNotNull,
      struct(lit("SHA-512").as("alg"), col("sha512").as("content")))))

  /** One FULL CycloneDX 1.6 document per package
    * (`packagedb/sbom.py` `to_cyclonedx`, golden-matched against
    * `packagedb/tests/testfiles/sbom/package-sbom-expected.json`):
    * metadata.component is the package itself; each dependency purl
    * contributes a bare component and a dependsOn edge. `deps` rows:
    * (download_url, dep_purl). Still scan + projection + one
    * broadcastable dependency aggregation — no driver loops. */
  def toCycloneDxDocument(packages: DataFrame, deps: DataFrame)
      : DataFrame = {
    val depAgg = deps.groupBy(col("download_url"))
      .agg(sort_array(collect_list(col("dep_purl"))).as("dep_purls"))
    val component = struct(
      hashesCol.as("hashes"), col("name"), fullPurl.as("purl"),
      lit("library").as("type"), col("version"))
    val depPurls = coalesce(col("dep_purls"),
      array().cast("array<string>"))
    packages.join(depAgg, Seq("download_url"), "left")
      .select(fullPurl.as("purl"), to_json(struct(
        lit("http://cyclonedx.org/schema/bom-1.6.schema.json")
          .as("$schema"),
        lit("CycloneDX").as("bomFormat"),
        lit("1.6").as("specVersion"),
        lit(1).as("version"),
        struct(component.as("component")).as("metadata"),
        // unresolved dependency purls become bare library components,
        // then the package component itself (the reference's ordering);
        // both sides share one struct type, nulls dropped by to_json
        concat(
          transform(depPurls, _ => struct(
            lit(null).cast("array<struct<alg:string,content:string>>")
              .as("hashes"),
            lit("").as("name"), lit(null).cast("string").as("purl"),
            lit("library").as("type"),
            lit(null).cast("string").as("version"))),
          array(struct(hashesCol.as("hashes"), col("name"),
            fullPurl.as("purl"), lit("library").as("type"),
            col("version")))).as("components"),
        concat(
          array(struct(depPurls.as("dependsOn"))),
          transform(depPurls, _ =>
            struct(lit(null).cast("array<string>").as("dependsOn"))))
          .as("dependencies")),
        Map("ignoreNullFields" -> "true")).as("bom"))
  }

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
