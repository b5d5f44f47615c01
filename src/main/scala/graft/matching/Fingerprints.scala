package graft.matching

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Codec for the reference's halohash fingerprint format (observed in
  * `matchcode/models.py:382-386` and test fixtures, e.g.
  * "000001efb4c8d6e34fb56809a7695fa73822e675"):
  * first 8 hex chars = %08x element count, remaining 32 hex = 128-bit
  * bah128, split into four 4-byte chunks for LSH banding
  * (`matchcode/models.py:149-188`).
  */
object Fingerprints {

  /** Number of elements hashed into the fingerprint (first 8 hex). */
  def elementsCount(fp: Column): Column =
    conv(substring(fp, 1, 8), 16, 10).cast("int")

  /** The 128-bit bah128 as 16 binary bytes (last 32 hex). */
  def bah128(fp: Column): Column = unhex(substring(fp, 9, 32))

  /** Chunk i (0-3): 4 bytes of the bah128, the LSH band key. */
  def chunk(fp: Column, i: Int): Column =
    unhex(substring(fp, 9 + i * 8, 8))

  /** All four chunks as an array for explode-based banding. */
  def chunks(fp: Column): Column =
    array((0 until 4).map(i => chunk(fp, i)): _*)

  /** ±ratio candidate band on element count
    * (`matchcode/models.py:129-141`; python int() truncates, counts
    * are positive, so floor). */
  def bandLow(count: Column, ratio: Double = 0.05): Column =
    floor(count * (1 - ratio)).cast("int")
  def bandHigh(count: Column, ratio: Double = 0.05): Column =
    floor(count * (1 + ratio)).cast("int")

  /** Build a fingerprint string from (count, bah128hex) — for tests
    * and index construction. */
  def format(count: Column, bahHex: Column): Column =
    concat(lpad(lower(conv(count.cast("string"), 10, 16)), 8, "0"),
      lower(bahHex))

  /** Directory fingerprint PRODUCER — the matchcode-toolkit
    * `compute_codebase_directory_fingerprints` step consumed by
    * `index_package_directories` (`matchcode/utils.py:247-265`) as a
    * distributed plan, reverse-validated bit-for-bit against the
    * fingerprints recorded in the reference's own scan fixtures
    * (every directory of `scancodeio_abbot-0.12.3.json` and
    * `scancodeio_wagon-api-20040705.181715.json`; see
    * [[HaloHash.bah128md5]]). For each directory with at least two
    * descendant files:
    *
    *  - `directory_content`  = bah128 over each descendant file's
    *    sha1 hex string
    *  - `directory_structure` = bah128 over
    *    `"{size floored to 10}{subpath}"` per descendant file, where
    *    subpath is the file's path below the directory
    *
    * Directories with fewer than two files are skipped (their
    * fingerprints would be as discriminating as a single file hash —
    * observed as empty `extra_data` fingerprints in the fixtures).
    *
    * Spark shape: one ancestor-explode (a file at depth d emits d
    * rows) feeding one partial-mergeable aggregation — linear in
    * total path depth with map-side partials, no per-package tree
    * walk, so a 100 TB resource table fingerprints in one shuffle.
    *
    * `resources` columns: download_url, path, is_file, name, size,
    * sha1 (the [[graft.matching.Indexing.resources]] shape).
    */
  def directoryFingerprints(resources: DataFrame): DataFrame = {
    val ancestors = expr(
      "transform(slice(split(path, '/'), 1, size(split(path, '/')) - 1), " +
        "(x, i) -> array_join(slice(split(path, '/'), 1, i + 1), '/'))")
    val exploded = resources.filter(col("is_file"))
      .select(col("download_url"), col("size"), col("sha1"), col("path"),
        explode(ancestors).as("dir"))
      .withColumn("subpath", expr("substring(path, length(dir) + 2)"))
    val size0 = coalesce(col("size"), lit(0L))
    val structureFeat =
      concat((size0 - size0 % 10).cast("string"), col("subpath"))
    val agg = exploded.groupBy(col("download_url"), col("dir"))
      .agg(
        HaloHash.bah128md5(when(col("sha1").isNotNull && col("sha1") =!= "",
          col("sha1"))).as("directory_content"),
        HaloHash.bah128md5(structureFeat).as("directory_structure"),
        count(lit(1)).as("n_files"))
      .filter(col("n_files") >= 2)
    // fingerprints attach only to directories the scan actually lists
    agg.join(resources.filter(!col("is_file"))
        .select(col("download_url"), col("path").as("dir"), col("name"),
          col("size")),
      Seq("download_url", "dir"))
      .select(col("download_url"), col("dir").as("path"), col("name"),
        col("size"), lit(false).as("is_file"),
        col("directory_content"), col("directory_structure"))
  }
}
