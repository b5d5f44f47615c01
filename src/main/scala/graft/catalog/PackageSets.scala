package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Package sets — groups of related packages (one artifact's binary,
  * source-archive, and source-repo forms), `packagedb/models.py:
  * 1457-1474` plus the membership flow
  * `purl2vcs/src/purl2vcs/find_source_repo.py:115-141`.
  *
  * Membership is a plain (set_id, download_url) relation, so set
  * operations are joins — no driver-side mutation. Set ids are
  * deterministic (derived from the founding package's download_url)
  * rather than random UUIDs, so re-running the assignment is
  * idempotent across a 1000-executor job and needs no coordination.
  */
object PackageSets {

  /** `add_source_package_to_package_set`: for every (package_url,
    * source_url) pair, add the source package to each of the package's
    * sets — creating a set (seeded with the package) when it has none.
    *
    *  - `members`: existing membership (set_id, download_url)
    *  - `pairs`: (package_url, source_url)
    *
    * Returns the updated membership relation.
    */
  def assignSourcePackages(members: DataFrame,
      pairs: DataFrame): DataFrame = {
    // sets each package already belongs to
    val existing = pairs.join(members,
      pairs("package_url") === members("download_url"))
      .select(col("set_id"), col("package_url"), col("source_url"))

    // packages with no set found a new deterministic one
    val founders = pairs.join(members,
        pairs("package_url") === members("download_url"), "left_anti")
      .withColumn("set_id", sha2(col("package_url"), 256))

    val newRows =
      // the founding package seeds its new set...
      founders.select(col("set_id"), col("package_url").as("download_url"))
        // ...and the source package joins every set (new or existing)
        .unionByName(founders.select(col("set_id"),
          col("source_url").as("download_url")))
        .unionByName(existing.select(col("set_id"),
          col("source_url").as("download_url")))

    members.unionByName(newRows)
      .dropDuplicates("set_id", "download_url")
  }

  /** `get_package_set_members`: a set's packages ordered by
    * package_content (`packagedb/models.py:1470-1474`). */
  def members(membership: DataFrame, packages: DataFrame): DataFrame =
    membership.join(packages, Seq("download_url"))
      .orderBy(col("set_id"), col("package_content").asc_nulls_last,
        col("download_url"))
}
