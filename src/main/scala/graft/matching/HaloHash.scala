package graft.matching

import java.nio.ByteBuffer

import graft.functions.Fnv
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  * Implemented as a [[TypedImperativeAggregate]] over a primitive
  * `Array[Int]` buffer (128 bit-counters + element count): updates and
  * merges are allocation-free, partial aggregation happens map-side,
  * and the shuffled partial state is a flat 516-byte blob — so a
  * 100 TB resource table reduces to one row per directory with one
  * shuffle and no per-row encoder round-trips (the round-1
  * `Aggregator[String, Buf, String]` serialized a 128-int case class
  * through `Encoders.product` on every partial merge, which dominated
  * the x5 bench).
  */
case class HaloHashAgg(
    child: Expression,
    algo: String = "fnv",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def prettyName: String = "halohash"
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  /** 129 ints: [0,128) per-bit set counts, [128] element count. */
  override def createAggregationBuffer(): Array[Int] = new Array[Int](129)

  private val useMd5 = algo == "md5"

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      if (useMd5) HaloHash.updateMd5(buf, bytes)
      else {
        val h1 = Fnv.hash64(bytes, 1)
        val h2 = Fnv.hash64(bytes, 2)
        var i = 0
        while (i < 64) {
          buf(i) += ((h1 >>> i) & 1L).toInt
          buf(64 + i) += ((h2 >>> i) & 1L).toInt
          i += 1
        }
        buf(128) += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 129) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any =
    UTF8String.fromString(
      if (useMd5) HaloHash.formatMd5(buf) else HaloHash.format(buf))

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(129 * 4)
    var i = 0
    while (i < 129) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](129)
    var i = 0
    while (i < 129) { buf(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HaloHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HaloHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HaloHashAgg =
    copy(child = c)
}

object HaloHash {

  /** Render a 129-int buffer as the reference fingerprint string:
    * %08x count + 32-hex bah128 (bit i set iff count_i*2 > n). */
  private[matching] def format(buf: Array[Int]): String = {
    val n = buf(128)
    val bits = new Array[Byte](16)
    var i = 0
    while (i < 128) {
      if (buf(i) * 2L > n)
        bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte
      i += 1
    }
    val sb = new StringBuilder(40)
    sb.append(f"$n%08x")
    i = 0
    while (i < 16) { sb.append(f"${bits(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** Column form for groupBy().agg(...). Null elements are skipped, so
    * `halohash(when(cond, col))` aggregates the conditional subset in
    * the same pass as the unconditional aggregate. */
  def halohash(c: Column): Column =
    GraftBridge.column(
      HaloHashAgg(GraftBridge.expression(c)).toAggregateExpression())

  /** Toolkit-parity bah128 (reverse-validated bit-for-bit against the
    * directory fingerprints recorded in the reference's own scan
    * fixtures `scancodeio_abbot-0.12.3.json` and
    * `scancodeio_wagon-api-20040705.181715.json`): each element hashes
    * with MD5, bits counted MSB-first, and the final bit is 1 iff
    * FEWER than half the elements set it (ties → 0). */
  def bah128md5(c: Column): Column =
    GraftBridge.column(
      HaloHashAgg(GraftBridge.expression(c), algo = "md5")
        .toAggregateExpression())

  /** MSB-first md5 bit-count update for the toolkit-parity mode. */
  private[matching] def updateMd5(buf: Array[Int], bytes: Array[Byte])
      : Unit = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var i = 0
    while (i < 128) {
      buf(i) += (d(i / 8) >>> (7 - (i % 8))) & 1
      i += 1
    }
    buf(128) += 1
  }

  /** Toolkit-parity rendering: %08x count + 32 hex, bit i (MSB-first)
    * set iff 2*count_i < n. */
  private[matching] def formatMd5(buf: Array[Int]): String = {
    val n = buf(128)
    val bits = new Array[Byte](16)
    var i = 0
    while (i < 128) {
      if (buf(i) * 2L < n)
        bits(i / 8) = (bits(i / 8) | (0x80 >>> (i % 8))).toByte
      i += 1
    }
    val sb = new StringBuilder(40)
    sb.append(f"$n%08x")
    i = 0
    while (i < 16) { sb.append(f"${bits(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** Direct toolkit-parity computation for tests / small inputs. */
  def ofMd5(elements: Seq[String]): String = {
    val buf = new Array[Int](129)
    elements.foreach(e => updateMd5(buf, e.getBytes("UTF-8")))
    formatMd5(buf)
  }

  /** halo1 — the FILE-content approximate fingerprint: bah128 over the
    * md5s of 8-word shingles (lowercased alphanumeric tokens, joined
    * with no separator). Reverse-validated against the fingerprint the
    * reference indexes for its inflate.c fixture
    * (`matchcode/tests/test_match.py:95-112`,
    * "000018fba23a49e4cd40718d1297be719e6564a4"). Null for content
    * with fewer than 8 tokens — too short to be distinctive. */
  def halo1(content: String): String = {
    val words = content.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    if (words.length < 8) return null
    val buf = new Array[Int](129)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - 8) {
      sb.setLength(0)
      var j = 0
      while (j < 8) { sb.append(words(i + j)); j += 1 }
      updateMd5(buf, sb.toString.getBytes("UTF-8"))
      i += 1
    }
    formatMd5(buf)
  }

  /** Column form of [[halo1]]. */
  def halo1(c: Column): Column =
    GraftBridge.column(Halo1(GraftBridge.expression(c)))

  /** Direct computation for tests / small inputs. */
  def of(elements: Seq[String]): String = {
    val buf = new Array[Int](129)
    elements.foreach { e =>
      val bytes = e.getBytes("UTF-8")
      val h1 = Fnv.hash64(bytes, 1)
      val h2 = Fnv.hash64(bytes, 2)
      var i = 0
      while (i < 64) {
        buf(i) += ((h1 >>> i) & 1L).toInt
        buf(64 + i) += ((h2 >>> i) & 1L).toInt
        i += 1
      }
      buf(128) += 1
    }
    format(buf)
  }
}

/** halo1(content) -> the reference's file-content approximate
  * fingerprint string (see [[HaloHash.halo1]]). */
case class Halo1(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "halo1"
  override protected def nullSafeEval(input: Any): Any = {
    val out = HaloHash.halo1(input.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildInternal(c: Expression): Halo1 =
    copy(child = c)
}
