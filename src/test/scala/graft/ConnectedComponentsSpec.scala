package graft

import org.apache.spark.sql.functions._
import graft.ops.ConnectedComponents

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force union-find for expected labels. */
  private def expected(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long](
      (0L until n).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def run(n: Long, edges: Seq[(Long, Long)],
      localThreshold: Long = ConnectedComponents.defaultLocalEdgeThreshold)
      : Map[Long, Long] = {
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val e = edges.toDF("u", "v")
    ConnectedComponents.labels(nodes, e,
        localEdgeThreshold = localThreshold)
      .as[(Long, Long)].collect().toMap
  }

  test("matches union-find on a deterministic pseudo-random graph") {
    val n = 500L
    // LCG-driven edge set: multiple components of varied shapes
    val edges = (0 until 400).map { i =>
      val a = (i * 1103515245L + 12345L) % n
      val b = (i * 69069L + 1L) % n
      (math.abs(a), math.abs(b))
    }.filter { case (a, b) => a != b }
    // both execution paths — the size-gated local union-find AND the
    // distributed star rounds — must agree with brute force exactly
    assert(run(n, edges) == expected(n, edges))
    assert(run(n, edges, localThreshold = 0L) == expected(n, edges))
  }

  test("chain of length 200 converges (O(log n), not O(diameter))") {
    // a 30-round min-label loop would return WRONG labels here; the
    // star algorithm contracts the chain geometrically
    val n = 201L
    val edges = (0L until 200L).map(i => (i, i + 1))
    val got = run(n, edges, localThreshold = 0L) // exercise star rounds
    assert(got.values.toSet == Set(0L))
  }

  test("singletons label themselves; duplicate/reversed edges fold") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (5L, 6L))
    val got = run(8L, edges)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("already-star input converges with the exact confirm pass") {
    // the input is its own large/small-star fixpoint, so round 1 takes
    // the signature-equal branch and must pass the exact set compare
    // (the guard against a premature hash-collision stop) first try
    val edges = Seq((3L, 0L), (2L, 0L), (1L, 0L), (6L, 5L))
    val got = run(7L, edges, localThreshold = 0L) // star-path confirm
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L,
      5L -> 5L, 6L -> 5L))
  }

  test("non-convergence within maxRounds fails loudly") {
    val nodes = spark.range(10L).select(col("id").as("doc_id"))
    val e = (0L until 9L).map(i => (i, i + 1)).toDF("u", "v")
    intercept[IllegalStateException] {
      // force the distributed path: the local union-find has no
      // round budget to exhaust
      ConnectedComponents.labels(nodes, e, maxRounds = 1,
        localEdgeThreshold = 0L)
    }
  }

  test("labels memo: entries of both sessions evicted on context end") {
    // two sessions on the shared test context each memoize a label
    // frame; the application-end listener path (exercised directly —
    // stopping the real context would kill the suite) must drop BOTH:
    // sessions share their context's lifecycle
    val s2 = spark.newSession()
    Registry.byName("d_dedup_clusters").run(spark, sf001).count()
    Registry.byName("d_dedup_clusters").run(s2, sf001).count()
    assert(graft.ops.DedupOps.labelsMemoSize >= 2)
    graft.ops.DedupOps.evictForContext(spark.sparkContext)
    assert(graft.ops.DedupOps.labelsMemoSize == 0)
  }
}
