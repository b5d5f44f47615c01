package graft.matching

import org.apache.spark.sql.Column
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
}
