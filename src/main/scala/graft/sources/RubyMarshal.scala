package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal Ruby Marshal 4.8 reader — just enough of the format to
  * stream the RubyGems `specs.4.8` index (an array of
  * `[name, Gem::Version, platform]` triples), matching what the
  * reference's vendored rubymarshal reader consumes
  * (`minecode/miners/rubygems.py:56-86`). Supports the tags that
  * format uses: arrays, raw and ivar-wrapped strings, symbols +
  * symbol links, user-marshal objects (`U`, e.g. Gem::Version),
  * object links (`@`), booleans, nil and longs.
  *
  * Object-table registration follows CRuby `r_object0` order (arrays
  * and user objects register BEFORE their contents, strings when
  * read, ivar wrappers add nothing) so `@` links resolve exactly as
  * CRuby wrote them.
  */
object RubyMarshal {

  sealed trait RVal
  final case class RString(s: String) extends RVal
  final case class RSymbol(name: String) extends RVal
  final case class RInt(v: Long) extends RVal
  final case class RBool(b: Boolean) extends RVal
  case object RNil extends RVal
  /** Mutable so the object table can hold it before contents load. */
  final class RArray(val items: ArrayBuffer[RVal]) extends RVal
  final class RUser(val className: String) extends RVal {
    var payload: RVal = RNil
  }

  final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    private val objects = ArrayBuffer.empty[RVal]
    private val symbols = ArrayBuffer.empty[String]

    private def byte(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }

    /** Marshal long: 0, ±1..±4 little-endian bytes, or self-inline. */
    def long(): Long = {
      val c = bytes(pos).toInt; pos += 1
      if (c == 0) 0L
      else if (c >= 1 && c <= 4) {
        var v = 0L
        var i = 0
        while (i < c) { v |= (byte().toLong << (8 * i)); i += 1 }
        v
      } else if (c >= -4 && c <= -1) {
        var v = -1L
        var i = 0
        while (i < -c) {
          v &= ~(0xffL << (8 * i)); v |= (byte().toLong << (8 * i)); i += 1
        }
        v
      } else if (c > 4) (c - 5).toLong
      else (c + 5).toLong
    }

    private def rawString(): String = {
      val n = long().toInt
      val s = new String(bytes, pos, n, "UTF-8")
      pos += n
      s
    }

    private def symbol(): String = byte() match {
      case ':' => val s = rawString(); symbols += s; s
      case ';' => symbols(long().toInt)
      case t   => sys.error(s"rubymarshal: expected symbol, got '${t.toChar}'")
    }

    def obj(): RVal = (byte(): @unchecked) match {
      case '0' => RNil
      case 'T' => RBool(true)
      case 'F' => RBool(false)
      case 'i' => RInt(long())
      case ':' => pos -= 1; RSymbol(symbol())
      case ';' => pos -= 1; RSymbol(symbol())
      case '@' => objects(long().toInt)
      case '"' =>
        val s = RString(rawString()); objects += s; s
      case 'I' =>
        // ivar wrapper: inner object first (registers itself), then
        // count × (symbol, value) ivar pairs, discarded
        val inner = obj()
        val n = long().toInt
        var i = 0
        while (i < n) { symbol(); obj(); i += 1 }
        inner
      case '[' =>
        val arr = new RArray(ArrayBuffer.empty)
        objects += arr
        val n = long().toInt
        var i = 0
        while (i < n) { arr.items += obj(); i += 1 }
        arr
      case 'U' =>
        val u = new RUser(symbol())
        objects += u
        u.payload = obj()
        u
      case t => sys.error(
        s"rubymarshal: unsupported tag '${t.toChar}' at ${pos - 1}")
    }
  }

  /** Parse a Marshal 4.8 payload (after optional gzip decompression
    * by the caller). */
  def load(bytes: Array[Byte]): RVal = {
    require(bytes.length > 2 && bytes(0) == 4 && bytes(1) == 8,
      "not Marshal 4.8 data")
    new Reader(java.util.Arrays.copyOfRange(bytes, 2, bytes.length)).obj()
  }

  /** The specs.4.8 triples: (name, version, platform). */
  def gemSpecs(marshalBytes: Array[Byte]): Iterator[(String, String, String)] =
    (load(marshalBytes): @unchecked) match {
      case top: RArray => top.items.iterator.collect {
        case entry: RArray if entry.items.size >= 3 =>
          val name = entry.items(0) match {
            case RString(s) => s; case other => other.toString
          }
          val version = entry.items(1) match {
            case u: RUser => u.payload match {
              case a: RArray => a.items.headOption match {
                case Some(RString(s)) => s; case _ => ""
              }
              case _ => ""
            }
            case RString(s) => s
            case _          => ""
          }
          val platform = entry.items(2) match {
            case RString(s) => s; case _ => ""
          }
          (name, version, platform)
      }
    }
}
