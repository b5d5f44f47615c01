package graft.matching

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The matchcode fingerprint-lookup API surface
  * (`matchcode/api.py:160-260`): batch filters over the match-index
  * frames — multiple sha1s against the exact file / package-archive
  * indexes, and multiple `count+bah128` fingerprints against the
  * approximate directory indexes. The reference splits each
  * fingerprint into the stored count + four chunk columns and ORs
  * the conjunctions; chunk-wise equality is full-fingerprint
  * equality, so here both collapse to one `isin` semi-filter — a
  * broadcast hash semi-join at scale, mirroring the reference's
  * 1000-per-query batch contract (`BASELINE.md`).
  */
object MatchApi {

  /** `MultipleSHA1Filter` over an exact index frame carrying `sha1`.
    * Hex case-insensitive, like the reference's bytearray compare. */
  def filterBySha1s(index: DataFrame, sha1s: Seq[String]): DataFrame =
    if (sha1s.isEmpty) index
    else index.filter(
      lower(col("sha1")).isin(sha1s.map(_.toLowerCase): _*))

  /** `MultipleFingerprintFilter` over an approximate directory index
    * frame carrying `fingerprint` (8 hex count chars + 32 hex bah128
    * chars, the `split_fingerprint` layout). */
  def filterByFingerprints(index: DataFrame,
      fingerprints: Seq[String]): DataFrame =
    if (fingerprints.isEmpty) index
    else index.filter(
      lower(col("fingerprint")).isin(fingerprints.map(_.toLowerCase): _*))
}
