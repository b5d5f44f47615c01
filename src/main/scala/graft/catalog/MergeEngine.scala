package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

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
  *   - a history entry listing updated fields is appended when
  *     anything changed (`model_utils.py:322-327`, F17)
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

    def emptyE(f: String) = {
      val c = col(s"e.$f")
      existing.schema(f).dataType match {
        case StringType   => c.isNull || c === ""
        case _: ArrayType => c.isNull || size(c) === 0
        case _            => c.isNull
      }
    }
    def emptyN(f: String) = {
      val c = col(s"n.$f")
      existing.schema(f).dataType match {
        case StringType   => c.isNull || c === ""
        case _: ArrayType => c.isNull || size(c) === 0
        case _            => c.isNull
      }
    }

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

    def changed(f: String): Column =
      existsE && existsN && !emptyN(f) && (emptyE(f) || replace) &&
        (col(s"e.$f").isNull || col(s"e.$f") =!= col(s"n.$f"))

    val changedFields = array_compact(array(mergeableFields.map(f =>
      when(changed(f), lit(f))): _*))

    val newHistory = {
      val base = when(existsE, coalesce(col("e.history"),
        array().cast("array<struct<timestamp:string,message:string>>")))
        .otherwise(array().cast("array<struct<timestamp:string,message:string>>"))
      when(size(changedFields) > 0,
        concat(base, array(struct(
          lit(now).as("timestamp"),
          concat(lit("Package field values have been updated: "),
            array_join(changedFields, ", ")).as("message")))))
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

    val outCols: Seq[Column] =
      keyCol +: mergeableFields.map(f => mergedField(f).as(f)) :+
        keywordsCol :+ miningLevel :+ newHistory.as("history")

    val good = joined.filter(!conflict).select(outCols: _*)
    // conflicted rows: stored package wins untouched; emit error detail
    val kept = joined.filter(conflict).select(
      (col("e.download_url").as("download_url") +:
        mergeableFields.map(f => col(s"e.$f").as(f)) :+
        col("e.keywords").as("keywords") :+
        col("e.mining_level").as("mining_level") :+
        col("e.history").as("history")): _*)
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

  /** Resource upsert on (download_url, path) with a scan-field
    * whitelist (`model_utils.py:452-497`, X8): incoming rows replace
    * matching rows, unmatched existing rows are kept. */
  def upsertResources(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val keys = Seq("download_url", "path")
    existing.join(incoming.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(incoming)
  }
}
