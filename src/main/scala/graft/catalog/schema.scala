package graft.catalog

import java.sql.Timestamp

/** Catalog data model (SURVEY.md §1) — case classes mirroring the
  * reference's Package/Party/DependentPackage/Resource entities
  * (`packagedb/models.py:223-574,902-1008,1011-1226`), trimmed to the
  * load-bearing columns. Stored as parquet, partitioned by `ptype`
  * (the reference's per-field indexes are replaced by layout:
  * partition pruning on ptype + clustering on download_url/sha1).
  *
  * Identity: the reference's logical key is `download_url`
  * (`minecode/model_utils.py:267-277`) with the PURL 6-tuple kept as
  * columns; we keep both.
  */
final case class HistoryEntry(timestamp: String, message: String)

final case class PackageRow(
    download_url: String,
    ptype: String,
    namespace: Option[String],
    name: String,
    version: Option[String],
    qualifiers: Option[String],
    subpath: Option[String],
    primary_language: Option[String],
    description: Option[String],
    keywords: Seq[String],
    homepage_url: Option[String],
    declared_license_expression: Option[String],
    copyright: Option[String],
    md5: Option[String],
    sha1: Option[String],
    sha256: Option[String],
    sha512: Option[String],
    size: Option[Long],
    release_date: Option[Timestamp],
    mining_level: Int,
    package_content: Option[Int],
    history: Seq[HistoryEntry])

final case class PartyRow(
    download_url: String, // FK → PackageRow
    ptype: String,        // person | project | organization
    role: Option[String],
    name: Option[String],
    email: Option[String],
    url: Option[String])

final case class DependencyRow(
    download_url: String, // FK → PackageRow
    purl: String,
    extracted_requirement: Option[String],
    scope: Option[String],
    is_runtime: Boolean,
    is_optional: Boolean,
    is_pinned: Boolean)

final case class ResourceRow(
    download_url: String, // FK → PackageRow
    path: String,
    is_file: Boolean,
    name: Option[String],
    extension: Option[String],
    size: Option[Long],
    md5: Option[String],
    sha1: Option[String],
    sha256: Option[String],
    mime_type: Option[String],
    programming_language: Option[String])

object PackageRow {
  /** Minimal constructor with empty optionals for tests/builders. */
  def minimal(downloadUrl: String, ptype: String, name: String,
      version: Option[String] = None, miningLevel: Int = 0): PackageRow =
    PackageRow(downloadUrl, ptype, None, name, version, None, None, None,
      None, Seq.empty, None, None, None, None, None, None, None, None,
      None, miningLevel, None, Seq.empty)
}
