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

  /** `create_source_repo_packages` (`packagedb/management/commands/
    * create_source_repo_packages.py:60-105`), the inventory import as
    * one distributed pass instead of the reference's per-row loop:
    * each inventory row names a catalog package (by purl) and its
    * source repo. Rows whose purl is not in the catalog are skipped
    * (returned for reporting, the command's "does not exist"
    * print); the source package is created when absent
    * (package_content = SOURCE_REPO = 3; only newly created rows are
    * enqueued for scanning), and the pair joins a package set UNLESS
    * the two already share one (the reference's intersection guard —
    * note this also skips the package's OTHER sets, which plain
    * [[assignSourcePackages]] would join).
    *
    * `inventory`: (purl, source_type, source_namespace, source_name,
    * source_version, source_download_url). Returns
    * (catalog', scannables', members', skippedPurls). */
  def createSourceRepoPackages(catalog: DataFrame, scannables: DataFrame,
      membership: DataFrame, inventory: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import graft.functions.GraftFunctions.purl_build
    val keyed = catalog.withColumn("purl",
      purl_build(col("ptype"), col("namespace"), col("name"),
        col("version")))
    val matched = inventory.join(
      keyed.select(col("purl"), col("download_url").as("package_url")),
      Seq("purl"))
    val skipped = inventory.join(keyed.select("purl"), Seq("purl"),
      "left_anti").select("purl")

    // get_or_create on the source coordinates: absent download_urls
    // become minimal SOURCE_REPO rows; only those enqueue for scanning
    val sources = matched.select(
        col("source_download_url").as("download_url"),
        col("source_type").as("ptype"),
        col("source_namespace").as("namespace"),
        col("source_name").as("name"),
        col("source_version").as("version"))
      .dropDuplicates("download_url")
    val created = sources
      .join(catalog.select("download_url"), Seq("download_url"), "left_anti")
      .withColumn("package_content", lit(3))
    val catalogCols = catalog.columns
    val createdRows = catalogCols.foldLeft(created) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(catalog.schema(c).dataType))
    }.select(catalogCols.map(col): _*)
      .withColumn("mining_level", coalesce(col("mining_level"), lit(0)))
      .withColumn("keywords", coalesce(col("keywords"),
        array().cast(catalog.schema("keywords").dataType)))
      .withColumn("history", coalesce(col("history"),
        array().cast(catalog.schema("history").dataType)))

    val catalog2 = catalog.unionByName(createdRows)
    val scannables2 =
      graft.streaming.Queues.makeScannableUris(scannables, createdRows)

    // the intersection guard: a (package, source) pair already sharing
    // a set is dropped before assignment
    val pairs = matched.select(col("package_url"),
      col("source_download_url").as("source_url")).distinct()
    val shared = pairs
      .join(membership.select(col("set_id").as("s1"),
        col("download_url").as("package_url")), Seq("package_url"))
      .join(membership.select(col("set_id").as("s2"),
        col("download_url").as("source_url")), Seq("source_url"))
      .filter(col("s1") === col("s2"))
      .select("package_url", "source_url").distinct()
    val toAssign = pairs.join(shared, Seq("package_url", "source_url"),
      "left_anti")
    val members2 = assignSourcePackages(membership, toAssign)
    (catalog2, scannables2, members2, skipped)
  }
}
