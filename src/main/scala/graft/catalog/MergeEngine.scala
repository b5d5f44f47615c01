package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, NumericType, StringType}

/** Field-level merge/upsert engine — the Spark re-expression of the
  * reference's `merge_packages` / `merge_or_create_package`
  * (`minecode/model_utils.py:70-330`) as a single distributed plan
  * (the Delta-MERGE shape of SURVEY §2 S13/A6, built from a full outer
  * join + per-field CASE expressions so it runs on plain parquet).
  *
  * Semantics reproduced:
  *   - identity key = `download_url` (`model_utils.py:267-277`)
  *   - `visit_level >= existing.mining_level` → replace mode: new
  *     non-empty values win; else existing non-empty values win and
  *     only empty fields are filled (`model_utils.py:285-319`)
  *   - checksum conflict (md5/sha1/sha256/sha512 non-empty on both
  *     sides and different) raises in the reference
  *     (`model_utils.py:128-142`); here those rows are routed to an
  *     `errors` DataFrame and the stored package is left untouched —
  *     a driver-side throw would kill a 100 TB job for one bad row
  *   - `mining_level` bumps to the visit level only in replace mode
  *     (`model_utils.py:319`)
  *   - an `updated_fields` entry `{field, old_value, new_value}` is
  *     recorded for every field whose new value is truthy and whose
  *     existing value is empty or replace-mode is on — even when the
  *     two values are equal, exactly like the reference loop
  *     (`model_utils.py:143-222`; the run_map goldens record
  *     `type: generic -> generic` no-op entries), in the reference's
  *     `to_dict()` field order; a history entry with the reference's
  *     exact message "Package field values have been updated."
  *     (`model_utils.py:322-327`, F17) is appended when any entry
  *     exists
  *
  * Scale notes: one shuffle on the identity key; no driver-side loops;
  * per-field logic is pure Column CASE trees inside whole-stage
  * codegen. At 100 TB the join hash-partitions on download_url and
  * AQE handles skew.
  */
object MergeEngine {

  /** Scalar package fields subject to empty-wins/replace-wins rules. */
  val mergeableFields: Seq[String] = Seq(
    "ptype", "namespace", "name", "version", "qualifiers", "subpath",
    "primary_language", "description", "homepage_url",
    "declared_license_expression", "copyright",
    "md5", "sha1", "sha256", "sha512", "size", "release_date",
    "package_content")

  /** (reference `to_dict()` label, our column) in the reference's
    * iteration order (`packagedb` Package.to_dict key order, which
    * drives the order of `updated_fields` entries in
    * `model_utils.py:143-222`). `download_url` is the join key but
    * still gets a recorded entry in replace mode, as the run_map
    * goldens show. */
  val updateOrder: Seq[(String, String)] = Seq(
    "type" -> "ptype", "namespace" -> "namespace", "name" -> "name",
    "version" -> "version", "qualifiers" -> "qualifiers",
    "subpath" -> "subpath", "package_content" -> "package_content",
    "primary_language" -> "primary_language",
    "description" -> "description", "release_date" -> "release_date",
    "keywords" -> "keywords", "homepage_url" -> "homepage_url",
    "download_url" -> "download_url", "size" -> "size",
    "md5" -> "md5", "sha1" -> "sha1", "sha256" -> "sha256",
    "sha512" -> "sha512", "copyright" -> "copyright",
    "declared_license_expression" -> "declared_license_expression")

  val checksumFields: Seq[String] = Seq("md5", "sha1", "sha256", "sha512")

  final case class MergeOutput(packages: DataFrame, errors: DataFrame)

  private def isEmpty(df: DataFrame, field: String): Column = {
    val c = col(field)
    df.schema(field).dataType match {
      case StringType      => c.isNull || c === ""
      case _: ArrayType    => c.isNull || size(c) === 0
      case _               => c.isNull
    }
  }

  /** Merge `incoming` (one row per scanned package, must carry a
    * `visit_level` int column) into `existing` (catalog shape, see
    * [[PackageRow]]). `now` stamps history entries — passed in rather
    * than read from the clock so reruns are deterministic.
    */
  def mergePackages(existing: DataFrame, incoming: DataFrame,
      now: String): MergeOutput = {
    val e = existing.alias("e")
    val n = incoming.alias("n")
    val joined = e.join(n, col("e.download_url") === col("n.download_url"),
      "full_outer")

    val existsE = col("e.download_url").isNotNull
    val existsN = col("n.download_url").isNotNull
    val replace = col("n.visit_level") >= col("e.mining_level")

    // Python truthiness (`if not new_value` / `if not existing_value`,
    // model_utils.py:144,148): "" and 0 are as empty as NULL.
    def emptyAt(side: String, f: String) = {
      val c = col(s"$side.$f")
      existing.schema(f).dataType match {
        case StringType            => c.isNull || c === ""
        case _: ArrayType          => c.isNull || size(c) === 0
        case _: NumericType        => c.isNull || c === 0
        case _                     => c.isNull
      }
    }
    def emptyE(f: String) = emptyAt("e", f)
    def emptyN(f: String) = emptyAt("n", f)

    // checksum-conflict guard: both sides non-empty and different
    val conflict = checksumFields
      .map(f => existsE && existsN && !emptyE(f) && !emptyN(f) &&
        col(s"e.$f") =!= col(s"n.$f"))
      .reduce(_ || _)

    def mergedField(f: String): Column =
      when(!existsE, col(s"n.$f"))
        .when(!existsN || emptyN(f), col(s"e.$f"))
        .when(emptyE(f), col(s"n.$f"))
        .when(replace, col(s"n.$f"))
        .otherwise(col(s"e.$f"))

    // updated_fields entries, reference rule (model_utils.py:143-222):
    // recorded iff the new value is truthy AND (existing is empty OR
    // replace) — equality NOT required, matching the run_map goldens'
    // `type: generic -> generic` no-op entries. String rendering: raw
    // for strings, JSON for arrays, cast for numerics/timestamps.
    def asString(side: String, f: String): Column = {
      val c = col(s"$side.$f")
      existing.schema(f).dataType match {
        case StringType   => c
        case _: ArrayType => to_json(c)
        case _            => c.cast("string")
      }
    }
    def entryFor(label: String, f: String): Column =
      when(existsE && existsN && !emptyN(f) && (emptyE(f) || replace),
        struct(lit(label).as("field"),
          asString("e", f).as("old_value"),
          asString("n", f).as("new_value")))

    val updatedFields = array_compact(array(updateOrder.map {
      case (label, f) => entryFor(label, f)
    }: _*))

    val newHistory = {
      val base = when(existsE, coalesce(col("e.history"),
        array().cast("array<struct<timestamp:string,message:string>>")))
        .otherwise(array().cast("array<struct<timestamp:string,message:string>>"))
      when(size(updatedFields) > 0,
        concat(base, array(struct(
          lit(now).as("timestamp"),
          // the reference's exact history message (model_utils.py:325)
          lit("Package field values have been updated.").as("message")))))
        .otherwise(base)
    }

    val keyCol = coalesce(col("e.download_url"), col("n.download_url"))
      .as("download_url")
    val miningLevel =
      when(!existsE, col("n.visit_level"))
        .when(existsN && replace, col("n.visit_level"))
        .otherwise(col("e.mining_level"))
        .as("mining_level")

    val keywordsCol =
      when(!existsE, col("n.keywords"))
        .when(!existsN || size(coalesce(col("n.keywords"),
          array().cast("array<string>"))) === 0, col("e.keywords"))
        .when(size(coalesce(col("e.keywords"),
          array().cast("array<string>"))) === 0 || replace, col("n.keywords"))
        .otherwise(col("e.keywords"))
        .as("keywords")

    val emptyEntries = array()
      .cast("array<struct<field:string,old_value:string,new_value:string>>")
    val outCols: Seq[Column] =
      keyCol +: mergeableFields.map(f => mergedField(f).as(f)) :+
        keywordsCol :+ miningLevel :+ newHistory.as("history") :+
        updatedFields.as("updated_fields")

    val good = joined.filter(!conflict).select(outCols: _*)
    // conflicted rows: stored package wins untouched; emit error detail
    val kept = joined.filter(conflict).select(
      (col("e.download_url").as("download_url") +:
        mergeableFields.map(f => col(s"e.$f").as(f)) :+
        col("e.keywords").as("keywords") :+
        col("e.mining_level").as("mining_level") :+
        col("e.history").as("history") :+
        emptyEntries.as("updated_fields")): _*)
    val errors = joined.filter(conflict).select(
      col("e.download_url").as("download_url"),
      lit("checksum mismatch").as("error"),
      array_compact(array(checksumFields.map(f =>
        when(!emptyE(f) && !emptyN(f) && col(s"e.$f") =!= col(s"n.$f"),
          lit(f))): _*)).as("fields"))

    MergeOutput(good.unionByName(kept), errors)
  }

  /** Child-set replacement (parties / dependencies,
    * `model_utils.py:155-204`): the incoming set replaces the existing
    * set per package iff the merge ran in replace mode OR the existing
    * set is empty; otherwise the existing set is kept.
    * `decisions` must carry (download_url, use_new: boolean).
    */
  def mergeChildSet(existingChildren: DataFrame, incomingChildren: DataFrame,
      decisions: DataFrame): DataFrame = {
    val useNew = decisions.filter(col("use_new")).select("download_url")
    val keepOld = decisions.filter(!col("use_new")).select("download_url")
    existingChildren.join(keepOld, Seq("download_url"), "left_semi")
      .unionByName(
        incomingChildren.join(useNew, Seq("download_url"), "left_semi"))
  }

  /** Decision frame for child sets: use_new iff package is new, or
    * replace-mode, or existing child set empty. */
  def childDecisions(existing: DataFrame, incoming: DataFrame,
      existingChildren: DataFrame): DataFrame = {
    val childCounts = existingChildren.groupBy("download_url")
      .agg(count(lit(1)).as("n_children"))
    incoming.select(col("download_url"), col("visit_level"))
      .join(existing.select(col("download_url"), col("mining_level")),
        Seq("download_url"), "left")
      .join(childCounts, Seq("download_url"), "left")
      .select(col("download_url"),
        (col("mining_level").isNull ||
          col("visit_level") >= col("mining_level") ||
          coalesce(col("n_children"), lit(0L)) === 0).as("use_new"))
  }

  /** Resource upsert on (download_url, path), wholesale-replace
    * variant: incoming rows replace matching rows, unmatched existing
    * rows are kept. This is the indexing-flow shape (every incoming
    * row carries a full fresh scan); the faithful field-level variant
    * is [[upsertResourcesScanFields]]. */
  def upsertResources(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val keys = Seq("download_url", "path")
    existing.join(incoming.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(incoming)
  }

  /** X8 — the FULL `update_or_create_resource` semantics
    * (`minecode/model_utils.py:452-497` +
    * `packagedb/models.py:1156-1176` `set_scan_results`) as one
    * distributed MERGE plan:
    *
    *   - key = (download_url, path) — the reference's
    *     `(package, path)` get-or-create
    *   - unmatched existing rows pass through untouched
    *   - NEW keys insert the incoming row as-is (creation sets base
    *     fields AND scan fields from resource_data)
    *   - MATCHED keys keep every existing BASE field (the exists
    *     branch never touches them) and take the incoming value for a
    *     SCAN field only when it is truthy (`if value and field_name
    *     in scan_fields` — Django/Python truthiness: NULL, "" and 0
    *     all keep the existing value; the no-overwrite-with-empty
    *     rule)
    *
    * One full-outer join on the key, per-field CASE projection — the
    * same single-shuffle Delta-MERGE shape as [[mergePackages]];
    * both sides shuffle once on (download_url, path) and the CASE
    * evaluation is codegen'd. `scanFields` is the ScanFieldsModelMixin
    * whitelist; every other shared column is a base field. */
  def upsertResourcesScanFields(existing: DataFrame, incoming: DataFrame,
      scanFields: Seq[String]): DataFrame = {
    val keys = Seq("download_url", "path")
    val fields = existing.columns.toSeq
    val e = existing.alias("e")
    val n = incoming.alias("n")
    val keyCond = keys.map(k => col(s"e.$k") === col(s"n.$k"))
      .reduce(_ && _)
    val joined = e.join(n, keyCond, "full_outer")
    val existsE = col("e.path").isNotNull && col("e.download_url").isNotNull
    val existsN = col("n.path").isNotNull && col("n.download_url").isNotNull
    def truthyN(f: String) = {
      val c = col(s"n.$f")
      existing.schema(f).dataType match {
        case StringType     => c.isNotNull && c =!= ""
        case _: ArrayType   => c.isNotNull && size(c) > 0
        case _: NumericType => c.isNotNull && c =!= 0
        case _              => c.isNotNull
      }
    }
    joined.select(fields.map { f =>
      val out =
        if (keys.contains(f)) coalesce(col(s"e.$f"), col(s"n.$f"))
        else if (scanFields.contains(f))
          when(!existsE, col(s"n.$f"))
            .when(existsN && truthyN(f), col(s"n.$f"))
            .otherwise(col(s"e.$f"))
        else when(existsE, col(s"e.$f")).otherwise(col(s"n.$f"))
      out.as(f)
    }: _*)
  }
}
