package graft

import scala.collection.mutable

import graft.ops.GraphOps

/** The iterative dependency-graph family against a brute-force
  * in-memory recomputation of the same arithmetic DAG (package k →
  * k/2, k/3) on sf0.001 (keys 0..199). The driver's DuckDB
  * `WITH RECURSIVE` oracle covers the same queries at sf0.01; this
  * spec proves the BFS/path iteration logic independently of any SQL
  * engine and pins the structural properties (DAG depth, the
  * zero-dependents branch, multiplicative path counts).
  */
class GraphSpec extends SparkTestBase {

  private val maxKey = 199
  private val adj: Map[Long, Seq[Long]] =
    (0L to maxKey).map { k =>
      // mirrors GraphOps.edges: k/2 for k>=2, plus k/3 for k>=3 when distinct
      val eff =
        if (k < 2) Seq.empty[Long]
        else if (k < 3 || k / 3 == k / 2) Seq(k / 2)
        else Seq(k / 2, k / 3)
      k -> eff
    }.toMap

  private def bruteBfs(roots: Seq[Long],
      edges: Long => Seq[Long]): Map[(Long, Long), Long] = {
    val out = mutable.Map[(Long, Long), Long]()
    for (r <- roots) {
      val dist = mutable.Map(r -> 0L)
      val q = mutable.Queue(r)
      while (q.nonEmpty) {
        val u = q.dequeue()
        for (v <- edges(u) if !dist.contains(v)) {
          dist(v) = dist(u) + 1
          q.enqueue(v)
        }
      }
      for ((n, d) <- dist if d > 0) out((r, n)) = d
    }
    out.toMap
  }

  test("g_dep_closure matches brute-force BFS on sf0.001") {
    val got = GraphOps.depClosure.run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val roots = (0L to maxKey).filter(_ % 97 == 0)
    val want = bruteBfs(roots, adj)
    assert(got == want, s"closure mismatch: got ${got.size}, want ${want.size}")
    assert(want.values.max >= 5, "DAG too shallow to exercise iteration")
  }

  test("g_rev_deps reports fan-in incl. the zero-dependents branch") {
    val rows = GraphOps.revDeps.run(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reverse adjacency
    val rev = (0L to maxKey).flatMap(k => adj(k).map(d => d -> k))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2) }
      .withDefaultValue(Seq.empty)
    val targets = (0L to maxKey).filter(_ % 89 == 0)
    val want = bruteBfs(targets, rev)
    for (t <- targets) {
      val pairs = want.collect { case ((r, n), d) if r == t => (n, d) }
      val exp = if (pairs.isEmpty) (0L, 0L)
        else (pairs.size.toLong, pairs.map(_._2).max)
      assert(rows(t) == exp, s"target $t: got ${rows(t)}, want $exp")
    }
    // node 0 has no incoming edges: the "safe to change" answer
    assert(rows(0L) == ((0L, 0L)))
  }

  test("g_dep_paths counts distinct bounded-length chains exactly") {
    val got = GraphOps.depPaths.run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force: enumerate all chains of length 1..6 by DFS
    val out = mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    def walk(root: Long, node: Long, depth: Int): Unit =
      if (depth < 6) adj(node).foreach { d =>
        out((root, d)) += 1
        walk(root, d, depth + 1)
      }
    (0L to maxKey).filter(_ % 97 == 0).foreach(r => walk(r, r, 0))
    assert(got == out.toMap,
      s"path counts mismatch: got ${got.size}, want ${out.size}")
    assert(out.values.max > 1, "no node with multiple paths — not multiplicative")
  }

  test("g_resolve_pins picks the natural-order latest satisfying version") {
    val rows = GraphOps.resolvePins.run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), Option(r.getString(3))))).toMap
    // brute force: enumerate the synthetic version pool per dst and
    // resolve [lo, hi) numerically
    var nNull = 0
    for (((src, dst), (req, pin)) <- rows) {
      val lo = src % 5
      val hi = lo + 1 + src % 2
      assert(req == s"vers:generic/>=$lo.0|<$hi.0")
      val pool = (0 until 8).map(j => (j / 2, (dst + j) % 10))
      val sat = pool.filter { case (maj, _) => maj >= lo && maj < hi }
      val want = if (sat.isEmpty) None
        else Some { val (m, n) = sat.max; s"$m.$n" }
      assert(pin == want, s"($src,$dst) req=$req: got $pin, want $want")
      if (want.isEmpty) nNull += 1
    }
    assert(nNull > 0, "no unsatisfiable requirement in the corpus")
  }

  test("g_topo_order layers equal the longest chain beneath each package") {
    val got = GraphOps.topoOrder.run(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val memo = mutable.Map[Long, Long]()
    def depth(k: Long): Long = memo.getOrElseUpdate(k,
      if (adj(k).isEmpty) 0L else adj(k).map(depth).max + 1L)
    for (k <- 0L to maxKey)
      assert(got(k) == depth(k), s"pkg $k: got ${got(k)}, want ${depth(k)}")
    // schedule validity: every dependency sits in a strictly lower layer
    for (k <- 0L to maxKey; d <- adj(k))
      assert(got(k) > got(d), s"edge $k->$d violates layering")
    assert(got.values.max >= 5, "DAG too shallow to exercise the iteration")
  }

  test("g_pagerank matches the integer-exact 3-iteration recurrence") {
    val got = GraphOps.pageRank.run(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var score = (0L to maxKey).map(_ -> 100000L).toMap
    for (_ <- 1 to 3) {
      val contrib = mutable.Map[Long, Long]().withDefaultValue(0L)
      for (k <- 0L to maxKey; d <- adj(k))
        contrib(d) += score(k) / adj(k).size
      score = (0L to maxKey)
        .map(k => k -> (15000L + 17L * contrib(k) / 20L)).toMap
    }
    assert(got == score,
      s"pagerank mismatch on ${got.count { case (k, v) => score(k) != v }} nodes")
    // the deepest foundational package (node 1: transitively under
    // almost everything) must out-rank every leaf
    assert(got(1L) == got.values.max, "node 1 is not the top-ranked package")
  }

  test("g_version_conflicts flags exactly the multi-pin closure deps") {
    val got = GraphOps.versionConflicts.run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute force: closure (incl. the root), per-edge pin arithmetic
    def pin(src: Long, dst: Long): Option[String] = {
      val lo = src % 5
      val hi = lo + 1 + src % 2
      if (lo > 3) None
      else {
        val m = math.min(hi - 1, 3L)
        val x = dst + 2 * m
        Some(s"$m.${math.max(x % 10, (x + 1) % 10)}")
      }
    }
    val roots = (0L to maxKey).filter(_ % 97 == 0)
    val want = mutable.Map[(Long, Long), (Long, Long, Long)]()
    for (r <- roots) {
      val members = mutable.Set(r)
      val q = mutable.Queue(r)
      while (q.nonEmpty) adj(q.dequeue()).foreach { d =>
        if (members.add(d)) q.enqueue(d)
      }
      val edges = members.toSeq.flatMap(m => adj(m).map(d => (m, d)))
      for ((dep, es) <- edges.groupBy(_._2)) {
        val pins = es.map { case (s0, d0) => pin(s0, d0) }
        val distinctPins = pins.flatten.distinct.size.toLong
        if (distinctPins > 1)
          want((r, dep)) =
            ((es.size.toLong, distinctPins, pins.count(_.isEmpty).toLong))
      }
    }
    assert(got == want.toMap,
      s"conflicts mismatch: got ${got.size}, want ${want.size}")
    assert(want.nonEmpty, "corpus has no diamond conflicts — vacuous")
  }
}
