package graft

import graft.matching.{Fingerprints, Matching}
import org.apache.spark.sql.functions._

/** Parity checks against the reference's own checked-in scan fixture
  * (read in place from the read-only reference tree; not copied).
  * Validates that our fingerprint codec and banded matcher work on
  * REAL bah128 fingerprints produced by the reference toolchain, not
  * just on synthetic ones.
  */
class ReferenceFixtureSpec extends SparkTestBase {
  import spark.implicits._

  private val fixturePath =
    "/root/reference/matchcode/tests/testfiles/match/scancodeio_abbot-0.12.3.json"

  private def available = new java.io.File(fixturePath).exists()

  /** (path, isDir, fingerprint) rows from the fixture's extra_data. */
  private lazy val fixtureFps: Seq[(String, Boolean, String)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(new java.io.File(fixturePath))
    (root \ "files") match {
      case JArray(files) => files.flatMap { f =>
        val path = (f \ "path") match {
          case JString(p) => p; case _ => ""
        }
        val isDir = (f \ "type") == JString("directory")
        val fp = (f \ "extra_data" \
          (if (isDir) "directory_content" else "halo1")) match {
          case JString(s) => Some(s); case _ => None
        }
        // the reference skips empty fingerprints (`if not fingerprint:`)
        fp.filter(_.nonEmpty).map(s => (path, isDir, s))
      }
      case _ => Seq.empty
    }
  }

  test("fingerprint codec parses real reference fingerprints") {
    assume(available)
    val fps = fixtureFps
    assert(fps.nonEmpty)
    // observed in SURVEY: first dir fp has element count 0x1ef
    val root = fps.find(_._1 == "abbot-0.12.3.jar-extract").get._3
    assert(root == "000001efb4c8d6e34fb56809a7695fa73822e675")
    val parsed = Seq(root).toDF("fingerprint").select(
      Fingerprints.elementsCount(col("fingerprint")).as("cnt"),
      hex(Fingerprints.bah128(col("fingerprint"))).as("bah")).collect().head
    assert(parsed.getInt(0) == 0x1ef)
    assert(parsed.getString(1).equalsIgnoreCase(
      "b4c8d6e34fb56809a7695fa73822e675"))
    // every fingerprint in the fixture is 8+32 hex
    val bad = fps.filterNot(_._3.matches("[0-9a-f]{40}"))
    assert(bad.isEmpty, s"nonconforming fingerprints: ${bad.take(5)}")
  }

  test("banded matcher self-matches every real directory fingerprint") {
    assume(available)
    val dirs = fixtureFps.filter(_._2)
    val index = dirs.map { case (p, _, fp) =>
      (s"pkg://abbot", p, p.split('/').last, 0L, false, fp)
    }.toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val queries = dirs.map { case (p, _, fp) =>
      (s"q/$p", p.split('/').last, 0L, false, fp)
    }.toDF("q_path", "q_name", "q_size", "q_is_file", "fingerprint")
    val out = Matching.approximateMatch(queries, index)
    val selfHits = out
      .filter(col("hamming") === 0 &&
        expr("substring(q_path, 3) = path")).count()
    assert(selfHits == dirs.size.toLong,
      s"expected ${dirs.size} self matches, got $selfHits")
  }

  test("perturbed fingerprints: near survives banding, far is pruned") {
    assume(available)
    val (p0, _, fp0) = fixtureFps.filter(_._2).head
    def flipLastChunkBits(fp: String, nibbles: Int): String = {
      // flip bits only inside chunk 4 → chunks 1-3 still band-match
      val keep = fp.substring(0, 40 - nibbles)
      val tail = fp.substring(40 - nibbles).map(c =>
        (Integer.parseInt(c.toString, 16) ^ 0x1).toHexString.head)
      keep + tail
    }
    def flipAllChunks(fp: String): String =
      fp.take(8) + fp.drop(8).map(c =>
        (Integer.parseInt(c.toString, 16) ^ 0xf).toHexString.head)

    val index = Seq(("pkg://abbot", p0, "d", 0L, false, fp0))
      .toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val near = Seq(("near", "d", 0L, false, flipLastChunkBits(fp0, 6)))
      .toDF("q_path", "q_name", "q_size", "q_is_file", "fingerprint")
    val far = Seq(("far", "d", 0L, false, flipAllChunks(fp0)))
      .toDF("q_path", "q_name", "q_size", "q_is_file", "fingerprint")
    // 6 flipped bits spread over the last 6 nibbles: hamming 6 < 10 and
    // chunks 1-3 intact → must match
    assert(Matching.approximateMatch(near, index).count() == 1)
    // every nibble inverted: no chunk can band-match → pruned before
    // any hamming computation
    assert(Matching.approximateMatch(far, index).count() == 0)
  }
}
