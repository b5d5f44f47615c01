package graft.matching

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan-data indexing (`minecode/indexing.py:26-253`): a completed
  * scancode.io scan for a package becomes catalog Resource rows plus
  * the matchcode index tables — exact file sha1s, approximate
  * directory-content / directory-structure / resource-content
  * fingerprints, and (stemmed) snippet fingerprints — and the scan
  * summary updates the package row's license/copyright/checksums
  * (`indexing.py:199-253`).
  *
  * Spark-first: scans arrive as (download_url, scan_json) rows — one
  * JSON document per scanned package, the shape the scan queue (ST4)
  * emits. `from_json` + `explode` distribute the decode; every index
  * is a pruned projection of that one exploded pass, so at 100 TB the
  * scan blobs are read once and each index shuffles only its own few
  * columns. The outputs feed [[Matching.exactMatch]],
  * [[Matching.approximateMatch]] and [[Matching.snippetMatch]]
  * directly.
  */
object Indexing {

  private val snippetType = ArrayType(StructType(Seq(
    StructField("snippet", StringType),
    StructField("position", LongType))))

  /** The slice of a scancode.io file record the catalog carries
    * (`model_utils.py:452-497`); unknown fields are pruned by
    * `from_json`, so scan-tool upgrades don't break the decode. */
  val fileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("type", StringType),
    StructField("name", StringType),
    StructField("extension", StringType),
    StructField("size", LongType),
    StructField("md5", StringType),
    StructField("sha1", StringType),
    StructField("sha256", StringType),
    StructField("mime_type", StringType),
    StructField("file_type", StringType),
    StructField("programming_language", StringType),
    StructField("is_binary", BooleanType),
    StructField("is_text", BooleanType),
    StructField("is_archive", BooleanType),
    StructField("is_media", BooleanType),
    StructField("is_key_file", BooleanType),
    StructField("extra_data", StructType(Seq(
      StructField("directory_content", StringType),
      StructField("directory_structure", StringType),
      StructField("halo1", StringType),
      StructField("snippets", snippetType),
      StructField("stemmed_snippets", snippetType))))))

  val scanSchema: StructType =
    StructType(Seq(StructField("files", ArrayType(fileSchema))))

  private def nonEmpty(c: Column): Column = c.isNotNull && c =!= ""

  /** (download_url, scan_json) → one row per scanned file/directory,
    * the single exploded pass every index below projects from. */
  def scanResources(scans: DataFrame): DataFrame =
    scans
      .select(col("download_url"),
        explode(from_json(col("scan_json"), scanSchema).getField("files"))
          .as("f"))
      .select(col("download_url"), col("f.*"))

  /** Resource-table rows (`update_or_create_resource`,
    * `model_utils.py:452-497`): upsert them with
    * [[graft.catalog.MergeEngine.upsertResources]]. */
  def resources(scanRes: DataFrame): DataFrame =
    scanRes.select(col("download_url"), col("path"),
      (col("type") === "file").as("is_file"),
      col("name"), col("extension"), col("size"), col("md5"), col("sha1"),
      col("sha256"), col("mime_type"), col("file_type"),
      col("programming_language"), col("is_binary"), col("is_text"),
      col("is_archive"), col("is_media"), col("is_key_file"))

  /** ExactFileIndex (`matchcode/models.py:80-88`): one row per
    * (package, sha1). */
  def exactFileIndex(scanRes: DataFrame): DataFrame =
    scanRes.filter(nonEmpty(col("sha1")))
      .select(col("sha1"), col("download_url"))
      .distinct()

  /** One approximate index (`matchcode/models.py:194-214`): rows keyed
    * by (fingerprint, path, package), carrying the columns
    * [[Matching.approximateMatch]] consumes. */
  private def approxIndex(scanRes: DataFrame, field: String): DataFrame =
    scanRes.filter(nonEmpty(col(s"extra_data.$field")))
      .select(col(s"extra_data.$field").as("fingerprint"),
        col("download_url"), col("path"), col("name"), col("size"),
        (col("type") === "file").as("is_file"))
      .dropDuplicates("fingerprint", "download_url", "path")

  def directoryContentIndex(scanRes: DataFrame): DataFrame =
    approxIndex(scanRes, "directory_content")

  def directoryStructureIndex(scanRes: DataFrame): DataFrame =
    approxIndex(scanRes, "directory_structure")

  def resourceContentIndex(scanRes: DataFrame): DataFrame =
    approxIndex(scanRes, "halo1")

  /** (Stemmed)SnippetIndex (`matchcode/models.py:451-...`): one row per
    * (fingerprint, position, resource), the [[Matching.snippetMatch]]
    * input shape. */
  private def snippetIdx(scanRes: DataFrame, field: String): DataFrame =
    scanRes.filter(col(s"extra_data.$field").isNotNull)
      .select(col("download_url"), col("path"),
        explode(col(s"extra_data.$field")).as("s"))
      .select(col("s.snippet").as("fingerprint"),
        col("s.position").as("position"),
        col("download_url"), col("path"))
      .dropDuplicates("fingerprint", "position", "download_url", "path")

  def snippetIndex(scanRes: DataFrame): DataFrame =
    snippetIdx(scanRes, "snippets")

  def stemmedSnippetIndex(scanRes: DataFrame): DataFrame =
    snippetIdx(scanRes, "stemmed_snippets")

  /** `index_package_directories` (`matchcode/utils.py:247-265`): when
    * the scan tool did NOT precompute directory fingerprints, compute
    * them from the resource rows ([[Fingerprints.directoryFingerprints]],
    * toolkit-parity) and return the (content, structure) index frames
    * in the [[Matching.approximateMatch]] input shape. */
  def directoryFingerprintIndexes(resources: DataFrame)
      : (DataFrame, DataFrame) = {
    val fps = Fingerprints.directoryFingerprints(resources)
    def idx(c: String): DataFrame =
      fps.select(col(c).as("fingerprint"), col("download_url"),
        col("path"), col("name"), col("size"), col("is_file"))
    (idx("directory_content"), idx("directory_structure"))
  }

  /** `combine_expressions` over an array column (`indexing.py:208-215`
    * via the license-expression lib, same rules as
    * [[graft.functions.LicenseExpressions.combine]]): distinct
    * non-empty expressions AND-ed, compounds parenthesized. Null when
    * nothing remains. */
  private def combineExpressions(exprs: Column): Column = {
    val cleaned = array_distinct(filter(
      transform(exprs, e => trim(e)), e => e.isNotNull && e =!= ""))
    val wrapped = transform(cleaned, e =>
      when(upper(e).contains(" OR ") || upper(e).contains(" AND "),
        concat(lit("("), e, lit(")"))).otherwise(e))
    when(size(cleaned) === 1, element_at(cleaned, 1))
      .when(size(cleaned) > 1, array_join(wrapped, " AND "))
  }

  /** `index_package`'s field updates (`indexing.py:199-253`): the scan
    * summary's declared license, AND-combined other license
    * expressions, "Copyright (c) {holder}" and the archive checksums
    * overwrite the package row — but empty values never override what
    * the catalog already has.
    *
    * `updates` columns: download_url, declared_license_expression,
    * other_license_expressions (array&lt;string&gt;), declared_holder,
    * md5, sha1, sha256, sha512, size. Returns `packages` with updated
    * fields plus an `other_license_expression` column.
    */
  def packageUpdates(packages: DataFrame, updates: DataFrame): DataFrame = {
    def e(name: String): Column =
      when(nonEmpty(col(name)), col(name)).as(s"u_$name")
    val upd = updates.select(col("download_url"),
      e("declared_license_expression"),
      combineExpressions(col("other_license_expressions"))
        .as("u_other_license_expression"),
      when(nonEmpty(col("declared_holder")),
        concat(lit("Copyright (c) "), col("declared_holder")))
        .as("u_copyright"),
      e("md5"), e("sha1"), e("sha256"), e("sha512"),
      col("size").as("u_size"))
    val updatable = Seq("declared_license_expression", "copyright",
      "md5", "sha1", "sha256", "sha512", "size")
    val joined = packages.join(upd, Seq("download_url"), "left")
    val kept = packages.columns.map {
      case c if updatable.contains(c) =>
        coalesce(col(s"u_$c"), col(c)).as(c)
      case c => col(c)
    }
    joined.select(kept :+
      col("u_other_license_expression").as("other_license_expression"): _*)
  }

  /** Repo-type preference for the ecosystems where the registry
    * artifact is authoritative (`indexing.py:148-168`). */
  private val RepoTypes = Seq("apache", "bower", "composer", "cpan",
    "cran", "crate", "deb", "docker", "eclipse", "fdroid", "gem",
    "golang", "gstreamer", "maven", "npm", "nuget", "openwrt", "pypi",
    "rpm")
  private val SourceRepoTypes =
    Seq("bitbucket", "github", "gitlab", "googlecode", "sourceforge")

  /** `check_for_duplicate_packages` (`indexing.py:133-196`) as one
    * distributed pass: within each sha1 group the best provenance wins
    * — registry artifact over source-forge mirror over anything else,
    * then earliest release, then stable key — and every other row is
    * flagged `is_duplicate`. The reference walks pairs at index time;
    * a window over the sha1-partitioned catalog is the same preference
    * applied set-wide, shuffling only (sha1, rank) — skew-safe because
    * a sha1 group is a handful of mirrors, never a hot key. */
  def markDuplicates(packages: DataFrame): DataFrame = {
    val rank = when(col("ptype").isin(RepoTypes: _*), 0)
      .when(col("ptype").isin(SourceRepoTypes: _*), 1)
      .otherwise(2)
    val w = Window.partitionBy(col("sha1")).orderBy(
      rank.asc, col("release_date").asc_nulls_last, col("download_url"))
    packages.withColumn("is_duplicate",
      nonEmpty(col("sha1")) && row_number().over(w) > 1)
  }
}
