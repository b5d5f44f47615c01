package graft

import graft.functions.GraftFunctions.hamming_bin
import org.apache.spark.sql.functions._

class ApproxHammingJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDf(rows: Seq[(String, String)], idCol: String, fpCol: String) =
    rows.toDF(idCol, "hex").select(col(idCol), unhex(col("hex")).as(fpCol))

  test("banded expansion equals cross join + filter (bands >= k → exact)") {
    // random-ish 16-byte fingerprints with planted near pairs
    val rnd = new scala.util.Random(7)
    def randHex() = Array.fill(16)(f"${rnd.nextInt(256)}%02x").mkString
    def flipBits(hex: String, n: Int): String = {
      val bytes = hex.grouped(2).map(Integer.parseInt(_, 16)).toArray
      (0 until n).foreach { i => bytes(i % 16) ^= (1 << (i % 8)) }
      bytes.map(b => f"$b%02x").mkString
    }
    val base = (0 until 40).map(i => s"L$i" -> randHex())
    val rights = base.take(10).map { case (id, h) =>
      s"R$id" -> flipBits(h, 1 + rnd.nextInt(6)) // hamming 1-6 → under 8
    } ++ (0 until 30).map(i => s"RX$i" -> randHex())
    val l = mkDf(base, "lid", "lfp")
    val r = mkDf(rights, "rid", "rfp")

    val banded = GraftExtensions
      .approxHammingJoin(l, r, "lfp", "rfp", threshold = 8)
      .select("lid", "rid").as[(String, String)].collect().toSet
    val naive = l.crossJoin(r)
      .filter(hamming_bin(col("lfp"), col("rfp")) < 8)
      .select("lid", "rid").as[(String, String)].collect().toSet
    assert(banded == naive)
    assert(banded.size >= 10) // all planted pairs found
    // no duplicates from the union (disjoint probes)
    val bandedList = GraftExtensions
      .approxHammingJoin(l, r, "lfp", "rfp", threshold = 8)
      .select("lid", "rid").as[(String, String)].collect()
    assert(bandedList.length == bandedList.toSet.size)
  }

  test("non-dividing bands (10 over 16 bytes) stay exact with no " +
      "constant-key probe") {
    val rnd = new scala.util.Random(13)
    def randHex() = Array.fill(16)(f"${rnd.nextInt(256)}%02x").mkString
    def flipBits(hex: String, n: Int): String = {
      val bytes = hex.grouped(2).map(Integer.parseInt(_, 16)).toArray
      (0 until n).foreach { i => bytes(i % 16) ^= (1 << (i % 8)) }
      bytes.map(b => f"$b%02x").mkString
    }
    val base = (0 until 30).map(i => s"L$i" -> randHex())
    val rights = base.take(8).map { case (id, h) =>
      s"R$id" -> flipBits(h, 1 + rnd.nextInt(8)) // hamming 1-8 → under 10
    } ++ (0 until 20).map(i => s"RX$i" -> randHex())
    val l = mkDf(base, "lid", "lfp")
    val r = mkDf(rights, "rid", "rfp")

    // threshold 10 → default bands 10, which does NOT divide 16: the
    // old ceil-width chunking made trailing chunks empty substrings
    // that equi-joined on a constant empty key
    val df = GraftExtensions.approxHammingJoin(l, r, "lfp", "rfp", 10)
    val banded = df.select("lid", "rid").as[(String, String)].collect()
    val naive = l.crossJoin(r)
      .filter(hamming_bin(col("lfp"), col("rfp")) < 10)
      .select("lid", "rid").as[(String, String)].collect().toSet
    assert(banded.toSet == naive)       // still exact (pigeonhole)
    assert(banded.length == banded.toSet.size) // probes disjoint
    assert(banded.toSet.size >= 8)      // planted pairs found
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("bands above the byte length degrade to byte-count bands, " +
      "still exact for small thresholds") {
    // 4-byte fingerprints, bands=10 > len=4: probes 4..9 are degenerate
    // and must emit nothing (guarded), probes 0..3 cover all bytes
    val l = mkDf(Seq("a" -> "deadbeef", "b" -> "00000000"), "lid", "lfp")
    val r = mkDf(Seq("x" -> "deadbeee", "y" -> "ffffffff"), "rid", "rfp")
    val df = GraftExtensions
      .approxHammingJoin(l, r, "lfp", "rfp", threshold = 3, bands = 10)
    val got = df.select("lid", "rid").as[(String, String)].collect().toSet
    assert(got == Set("a" -> "x")) // hamming(deadbeef, deadbeee)=1
  }

  test("empty fingerprints still match each other (hamming 0), once") {
    // empty-vs-empty has Hamming 0 < k under cross-join semantics;
    // probe 0 must emit it exactly once despite every chunk being
    // degenerate, and empty-vs-nonempty must NOT match
    val l = mkDf(Seq("e1" -> "", "a" -> "deadbeef"), "lid", "lfp")
    val r = mkDf(Seq("e2" -> "", "x" -> "deadbeee"), "rid", "rfp")
    val got = GraftExtensions
      .approxHammingJoin(l, r, "lfp", "rfp", threshold = 3, bands = 4)
      .select("lid", "rid").as[(String, String)].collect()
    val naive = l.crossJoin(r)
      .filter(hamming_bin(col("lfp"), col("rfp")) < 3)
      .select("lid", "rid").as[(String, String)].collect().toSet
    assert(got.toSet == naive)
    assert(got.toSet == Set("e1" -> "e2", "a" -> "x"))
    assert(got.length == got.toSet.size) // no duplicates
  }

  test("expanded plan is equi-join probes, not a nested-loop cross join") {
    val l = mkDf(Seq("a" -> ("ab" * 16)), "lid", "lfp")
    val r = mkDf(Seq("b" -> ("ab" * 16)), "rid", "rfp")
    val df = GraftExtensions.approxHammingJoin(l, r, "lfp", "rfp", 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan.take(1500))
  }

  test("extension injects without error; SQL functions resolve") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // registers functions + optimizer rule
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    assert(s2.sql("SELECT hamming_bin(unhex('ff'), unhex('0f')) AS hd")
      .collect().head.getInt(0) == 4)
  }
}
