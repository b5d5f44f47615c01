package graft.clearindex

import graft.catalog.{MergeEngine, PackageRow}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClearlyDefined harvest → catalog mapping
  * (`clearindex/harvest.py:1-346`): a harvested CDitem carries a
  * ScanCode scan payload (`content.summary.packages[]` +
  * `content.files[]`); packages merge into the catalog in fill-empty
  * mode (the reference's `merge_packages(replace=False)`), per-file
  * copyright/license statements aggregate deduped-newline-joined, and
  * items with no usable download_url surface as map errors instead of
  * rows.
  *
  * Spark shape: harvest items arrive as a DataFrame of (path, data
  * JSON); parsing runs executor-side in mapPartitions, the package
  * merge is the distributed MergeEngine plan, and errors are a frame —
  * no driver-side loops, so a full ClearlyDefined snapshot maps in one
  * job.
  */
object Harvest {

  /** The reference's Resource-create fields for a harvest file row
    * (`harvest.py:134-150`). */
  final case class HarvestResource(
      download_url: String, path: String, is_file: Boolean,
      size: Option[Long], sha1: Option[String], md5: Option[String],
      sha256: Option[String], git_sha1: Option[String],
      copyright: Option[String], license_expression: Option[String])

  final case class HarvestResult(
      packages: Seq[PackageRow], resources: Seq[HarvestResource],
      errors: Seq[String])

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def str(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s)
    case _                        => None
  }
  private def lng(v: JValue): Option[Long] = v match {
    case JInt(i)     => Some(i.toLong)
    case JLong(l)    => Some(l)
    case JDouble(d)  => Some(d.toLong)
    case _           => None
  }

  /** Deduped, newline-joined license expressions of one file
    * (`harvest.py:26-38`); sorted for determinism where the reference
    * inherits Python set ordering. */
  def licenseExpressions(fileData: JValue): Option[String] =
    (fileData \ "license_expressions") match {
      case JArray(xs) if xs.nonEmpty =>
        val set = xs.flatMap(str).distinct.sorted
        if (set.isEmpty) None else Some(set.mkString("\n"))
      case _ => None
    }

  /** Deduped, newline-joined copyright statement values
    * (`harvest.py:41-52`). */
  def copyrightStatements(fileData: JValue): Option[String] =
    (fileData \ "copyrights") match {
      case JArray(xs) if xs.nonEmpty =>
        val set = xs.flatMap(c => str(c \ "value")).distinct.sorted
        if (set.isEmpty) None else Some(set.mkString("\n"))
      case _ => None
    }

  /** Parse one CDitem payload (`harvest.py:161-203`): packages from
    * content.summary.packages, resources from content.files attributed
    * to each package, an error per package with no download_url. */
  def parseItem(cditemPath: String, json: String): HarvestResult =
    try {
      val root = JsonMethods.parse(json)
      val content = root \ "content"
      val files = (content \ "files") match {
        case JArray(fs) => fs; case _ => Seq.empty
      }
      val pkgScans = (content \ "summary" \ "packages") match {
        case JArray(ps) => ps; case _ => Seq.empty
      }
      val (pkgs, errs) = pkgScans.foldLeft(
        (Seq.empty[PackageRow], Seq.empty[String])) { case ((ps, es), p) =>
        str(p \ "download_url") match {
          case None =>
            val purl = str(p \ "purl").getOrElse("<no purl>")
            (ps, es :+
              s"CDitemError: empty download_url for package: $purl")
          case Some(url) =>
            val row = PackageRow.minimal(url,
              str(p \ "type").getOrElse("generic"),
              str(p \ "name").getOrElse(""),
              str(p \ "version"))
              .copy(
                namespace = str(p \ "namespace"),
                qualifiers = str(p \ "qualifiers"),
                subpath = str(p \ "subpath"),
                primary_language = str(p \ "primary_language"),
                description = str(p \ "description"),
                homepage_url = str(p \ "homepage_url"),
                declared_license_expression = str(p \ "license_expression")
                  .orElse(str(p \ "declared_license")),
                copyright = str(p \ "copyright"),
                sha1 = str(p \ "sha1"), md5 = str(p \ "md5"),
                sha256 = str(p \ "sha256"), sha512 = str(p \ "sha512"),
                size = lng(p \ "size"))
            (ps :+ row, es)
        }
      }
      val resources = pkgs.flatMap { pkg =>
        files.flatMap { f =>
          str(f \ "path").map { path =>
            HarvestResource(pkg.download_url, path,
              is_file = str(f \ "type").contains("file"),
              size = lng(f \ "size"),
              sha1 = str(f \ "sha1"), md5 = str(f \ "md5"),
              sha256 = str(f \ "sha256"), git_sha1 = str(f \ "git_sha1"),
              copyright = copyrightStatements(f),
              license_expression = licenseExpressions(f))
          }
        }
      }
      HarvestResult(pkgs, resources, errs)
    } catch {
      case _: Exception => HarvestResult(Seq.empty, Seq.empty,
        Seq(s"CDitemError: empty content field for CDitem: $cditemPath"))
    }

  final case class MapOutput(packages: DataFrame, resources: DataFrame,
      errors: DataFrame)

  /** Map a frame of harvest items (path, data) into the catalog:
    * executor-side parse, fill-empty merge (visit_level 0 never beats
    * an existing mining level), resource rows deduped per
    * (package, path) like the reference's path-collision guard. */
  def mapHarvests(spark: SparkSession, catalog: DataFrame,
      harvests: DataFrame, now: String): MapOutput = {
    import spark.implicits._
    val parsed = harvests.select(col("path"), col("data"))
      .as[(String, String)]
      .mapPartitions(_.map { case (path, data) =>
        val r = parseItem(path, data)
        (path, r.packages, r.resources, r.errors)
      })
      .toDF("cditem_path", "packages", "resources", "errors")
      .localCheckpoint(true) // parse once: feeds three outputs

    val incoming = parsed
      .select(explode(col("packages")).as("p")).select(col("p.*"))
      .dropDuplicates("download_url")
      .withColumn("visit_level", lit(0))
    val resources = parsed
      .select(explode(col("resources")).as("r")).select(col("r.*"))
      .dropDuplicates("download_url", "path")
    val errors = parsed
      .select(col("cditem_path"), explode(col("errors")).as("error"))

    val merged =
      if (incoming.isEmpty) catalog
      else MergeEngine.mergePackages(catalog, incoming, now).packages
    MapOutput(merged, resources, errors)
  }
}
