package graft

import graft.functions.MisraGries

import org.scalatest.funsuite.AnyFunSuite

/** Algorithmic properties of the mergeable Misra-Gries summary,
  * checked directly on the Aggregator (no Spark session): the
  * frequency guarantee under an adversarial long tail, the
  * lower-bound property of stored counts, capacity, and that
  * arbitrary merge trees preserve the guarantee (what map-side
  * combine does at scale). The distributed gate is `t_heavy_hitters`.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def summarize(mg: MisraGries, items: Seq[String]) =
    items.foldLeft(mg.zero)(mg.reduce)

  test("every item above N/(k+1) survives an adversarial tail") {
    val k = 16
    val mg = new MisraGries(k)
    // 3 heavy items (1000 each) drowned in 5000 distinct singletons
    val heavy = Seq("a", "b", "c").flatMap(t => Seq.fill(1000)(t))
    val tail = (1 to 5000).map(i => s"t$i")
    // deterministic interleave — worst case for counter eviction
    val stream = (heavy ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 8009 }
      .map(_._1)
    val s = mg.finish(summarize(mg, stream))
    val n = stream.size
    for (t <- Seq("a", "b", "c")) {
      assert(s.contains(t), s"heavy item $t evicted")
      assert(s(t) <= 1000, "stored count must lower-bound the true count")
      assert(s(t) >= 1000 - n / (k + 1), "undershoot beyond the bound")
    }
    assert(s.size <= k)
  }

  test("merge trees preserve the guarantee and the capacity") {
    val k = 16
    val mg = new MisraGries(k)
    val heavy = Seq.fill(600)("hot")
    val tail = (1 to 3000).map(i => s"t$i")
    val stream = new scala.util.Random(42).shuffle(heavy ++ tail)
    // split into 8 partitions, summarize each, merge as a skewed tree
    val parts = stream.grouped((stream.size + 7) / 8)
      .map(p => mg.finish(summarize(mg, p))).toSeq
    val merged = mg.finish(parts.reduceLeft(mg.merge))
    assert(merged.size <= k)
    assert(merged.contains("hot"),
      "heavy item lost across merges — mergeability broken")
    assert(merged("hot") <= 600)
    assert(merged("hot") >= 600 - stream.size / (k + 1))
  }
}
