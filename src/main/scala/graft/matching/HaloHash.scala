package graft.matching

import graft.functions.Fnv
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X5 — halohash (bah128) index-side fingerprint computation: the
  * bit-average hash consumed by the approximate matcher
  * (`matchcode/models.py:193-226`, `minecode/indexing.py:57-106`; the
  * producing toolkit is out-of-tree, so this reimplements the
  * published bit-average-hash construction from the observed format:
  * each element hashes to 128 bits; per bit position keep the count of
  * set bits; final bit i = 1 iff more than half the elements set it).
  *
  * Output is the reference's fingerprint string format: 8-hex %08x
  * element count + 32-hex bah128 (`matchcode/models.py:382-386`) —
  * directly consumable by [[Fingerprints]] and [[Matching]].
  *
  * Implemented as a typed [[Aggregator]] so directory fingerprints
  * build with map-side partial aggregation: the 132-byte buffer
  * merges associatively, so a 100 TB resource table reduces to one
  * row per directory with one shuffle.
  */
object HaloHash {

  final case class Buf(count: Long, sums: Array[Int])

  private def emptyBuf = Buf(0L, new Array[Int](128))

  private def hash128(element: String): (Long, Long) = {
    val bytes = element.getBytes("UTF-8")
    (Fnv.hash64(bytes, 1), Fnv.hash64(bytes, 2))
  }

  val aggregator: Aggregator[String, Buf, String] =
    new Aggregator[String, Buf, String] {
      def zero: Buf = emptyBuf
      def reduce(b: Buf, element: String): Buf = {
        val (h1, h2) = hash128(element)
        var i = 0
        while (i < 64) {
          if (((h1 >>> i) & 1L) == 1L) b.sums(i) += 1
          if (((h2 >>> i) & 1L) == 1L) b.sums(64 + i) += 1
          i += 1
        }
        Buf(b.count + 1, b.sums)
      }
      def merge(a: Buf, b: Buf): Buf = {
        var i = 0
        while (i < 128) { a.sums(i) += b.sums(i); i += 1 }
        Buf(a.count + b.count, a.sums)
      }
      def finish(b: Buf): String = {
        val bits = new Array[Byte](16)
        var i = 0
        while (i < 128) {
          if (b.sums(i) * 2L > b.count)
            bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte
          i += 1
        }
        f"${b.count}%08x" + bits.map(x => f"${x & 0xff}%02x").mkString
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Column form for groupBy().agg(...). */
  def halohash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(aggregator).apply(c)

  /** Direct computation for tests / small inputs. */
  def of(elements: Seq[String]): String = {
    var b = emptyBuf
    elements.foreach(e => b = aggregator.reduce(b, e))
    aggregator.finish(b)
  }
}
