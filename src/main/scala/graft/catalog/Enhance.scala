package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X9 — enhanced-package assembly (`packagedb/api.py:643-721`): for a
  * BINARY or SOURCE_ARCHIVE package in a package set, fill its empty
  * fields from set peers with strictly lower package_content rank
  * (SOURCE_ARCHIVE packages may only take data from SOURCE_REPO
  * peers); record each contributing peer in `enhanced_by`. Packages
  * with NULL package_content, SOURCE_REPO packages, any other content
  * kind (CURATION/PATCH/TEST/DOC), and packages outside any set pass
  * through unchanged — `get_enhanced_package` early-returns
  * `package.to_dict()` for all of those (`packagedb/api.py:648-679`).
  *
  * Package content ranks (reference PackageContentType): 1=CURATION,
  * 2=PATCH, 3=SOURCE_REPO, 4=SOURCE_ARCHIVE, 5=BINARY, 6=TEST, 7=DOC.
  * The issue-#490 default-to-BINARY applies only to NULL-content PEERS
  * inside `_get_enhanced_package` (`packagedb/api.py:691-699`) — a
  * NULL-content package itself never reaches that helper.
  *
  * Spark shape: per-set `mapGroups` fold — members sorted by content
  * rank ascending, left-to-right coalesce (SURVEY §2.10 X9). One
  * shuffle on set_id; sets are small (variants of one logical
  * package), so groups never skew.
  */
object Enhance {

  val SourceRepo = 3
  val SourceArchive = 4
  val Binary = 5

  final case class Member(set_id: String, download_url: String,
      package_content: Option[Int], description: Option[String],
      homepage_url: Option[String], declared_license_expression: Option[String],
      copyright: Option[String])

  final case class Enhanced(set_id: String, download_url: String,
      package_content: Option[Int], description: Option[String],
      homepage_url: Option[String], declared_license_expression: Option[String],
      copyright: Option[String], enhanced_by: Seq[String])

  /** `members`: one row per (set_id, package) with the Member shape. */
  def enhance(spark: SparkSession, members: DataFrame): DataFrame = {
    import spark.implicits._
    members.as[Member]
      .groupByKey(_.set_id)
      .flatMapGroups { (_, it) =>
        val all = it.toSeq
        all.map { m =>
          // NULL content early-returns unenhanced, same as SOURCE_REPO
          // and the other content kinds (packagedb/api.py:648-679); only
          // peers default NULL→BINARY (issue #490, api.py:691-699).
          val enhanceable = m.package_content match {
            case Some(SourceArchive) | Some(Binary) => true
            case _                                  => false
          }
          if (!enhanceable)
            Enhanced(m.set_id, m.download_url, m.package_content,
              m.description, m.homepage_url, m.declared_license_expression,
              m.copyright, Seq.empty)
          else {
            val content = m.package_content.get
            val peers0 = all.filter(_.download_url != m.download_url)
            val peers =
              if (content == SourceArchive)
                peers0.filter(_.package_content.contains(SourceRepo))
              else peers0
            // lower rank = more authoritative source of data; iterate
            // ascending and fill only still-empty fields
            var cur = Enhanced(m.set_id, m.download_url, m.package_content,
              m.description, m.homepage_url, m.declared_license_expression,
              m.copyright, Seq.empty)
            peers.sortBy(p => (p.package_content.getOrElse(Binary),
                p.download_url))
              .foreach { p =>
                val peerContent = p.package_content.getOrElse(Binary)
                if (peerContent < content) {
                  var took = false
                  def fill(curV: Option[String], peerV: Option[String]) = {
                    if (curV.forall(_.isEmpty) && peerV.exists(_.nonEmpty)) {
                      took = true; peerV
                    } else curV
                  }
                  val desc = fill(cur.description, p.description)
                  val home = fill(cur.homepage_url, p.homepage_url)
                  val lic = fill(cur.declared_license_expression,
                    p.declared_license_expression)
                  val cop = fill(cur.copyright, p.copyright)
                  cur = cur.copy(description = desc, homepage_url = home,
                    declared_license_expression = lic, copyright = cop,
                    enhanced_by =
                      if (took) cur.enhanced_by :+ p.download_url
                      else cur.enhanced_by)
                }
              }
            cur
          }
        }
      }.toDF()
  }
}
