package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Housekeeping passes over the catalog — the reference's
  * license-oddity sweep (`minecode/management/commands/
  * check_licenses.py:77-103`): packages of the given types whose
  * license expression case-insensitively contains an ambiguous
  * keyword ("unknown", "proprietary", "commercial").
  *
  * The reference ORs `declared_license_expression__icontains` and
  * `other_license_expression__icontains` per keyword; this catalog
  * carries the declared expression only, so the filter covers that
  * column (the other_* columns are scancode-side detection outputs).
  *
  * Scale notes: a pure predicate — partition-pruned on `ptype` and
  * evaluated inside whole-stage codegen, no shuffle.
  */
object Housekeeping {

  val ambiguousKeywords: Seq[String] =
    Seq("unknown", "proprietary", "commercial")

  def ambiguousLicense(keywords: Seq[String] = ambiguousKeywords): Column =
    keywords
      .map(kw => lower(coalesce(col("declared_license_expression"), lit("")))
        .contains(kw.toLowerCase))
      .reduce(_ || _)

  /** The `find_ambiguous_packages` query (check_licenses.py:77-95). */
  def findAmbiguousPackages(packages: DataFrame,
      types: Seq[String] = Seq("maven"),
      keywords: Seq[String] = ambiguousKeywords): DataFrame =
    packages.filter(col("ptype").isin(types: _*))
      .filter(ambiguousLicense(keywords))

  /** The command's summary counters (check_licenses.py:66-73):
    * (visited = packages of the types, found = ambiguous). */
  def checkLicensesCounts(packages: DataFrame,
      types: Seq[String] = Seq("maven")): (Long, Long) = {
    val scoped = packages.filter(col("ptype").isin(types: _*))
    val counts = scoped.agg(
      count(lit(1)).as("visited"),
      count(when(ambiguousLicense(), lit(1))).as("found"))
      .collect().head
    (counts.getAs[Long]("visited"), counts.getAs[Long]("found"))
  }
}
