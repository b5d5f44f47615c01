package graft

import org.apache.spark.sql.functions._

/** Runs every registered query end-to-end on sf0.001 and spot-checks
  * known-good values. (Value-level parity with DuckDB is covered by the
  * driver's oracle gate and tools/check_oracle.py.)
  */
class QueriesSpec extends SparkTestBase {

  test("registry names are unique and survey-tagged") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.all.forall(_.survey.nonEmpty))
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs on sf0.001 with stable schema") {
      val df = q.run(spark, sf001)
      val n = df.count()
      assert(df.columns.nonEmpty)
      // deterministic under re-execution
      assert(q.run(spark, sf001).count() == n)
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("d_pipeline_e2e funnel counts only ever shrink stage to stage") {
    val rows = Registry.byName("d_pipeline_e2e").run(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c, d) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_kept"))
      assert(a >= b && b >= c && c >= d && d >= 0,
        s"${r.getAs[String]("source")}: funnel $a -> $b -> $c -> $d")
      if (d > 0) {
        val q = r.getAs[Double]("mean_kept_quality")
        assert(q >= 0.24, s"kept mean quality $q below the gate")
      }
    }
  }

  test("every oracle query's SQL mentions only known tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (q <- Registry.all; sql <- q.oracle) {
      val lower = sql.toLowerCase
      assert(tables.exists(lower.contains), s"${q.name} oracle references no table")
    }
  }

  test("q1 aggregates match independently computed values") {
    val row = CoreQueriesCheck.q1Row(spark, sf001)
    val got = Registry.byName("q1_pricing_summary").run(spark, sf001)
      .filter(col("l_returnflag") === row._1 && col("l_linestatus") === row._2)
      .collect().head
    assert(got.getAs[Long]("sum_qty") == row._3)
    assert(got.getAs[Long]("count_order") == row._4)
  }

  test("w5 keeper is the minimum doc_id of each duplicate group") {
    val df = Registry.byName("w5_duplicate_preference").run(spark, sf001)
    val bad = df.filter(col("keeper_id") > col("doc_id")).count()
    assert(bad == 0)
  }

  test("s_cosine_topk returns exactly 5 ranked neighbors per query") {
    val df = Registry.byName("s_cosine_topk").run(spark, sf001)
    val counts = df.groupBy("qid").count().collect()
    assert(counts.length == 10 && counts.forall(_.getLong(1) == 5))
    // cosine within [-1, 1]
    assert(df.filter(abs(col("cosine")) > 1.0).count() == 0)
  }

  test("cluster label memo rebuilds after an external unpersist") {
    val before = Registry.byName("d_dedup_clusters").run(spark, sf001)
      .collect().toSet
    // simulate Bench.release(): kill every persisted block, including
    // the memoized label checkpoint (lineage-truncated, can't recompute)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val after = Registry.byName("d_dedup_clusters").run(spark, sf001)
      .collect().toSet
    assert(before == after)
  }

  test("j5 banded match: all surviving pairs respect the hamming gate") {
    val df = Registry.byName("j5_simhash_banded_match").run(spark, sf001)
    assert(df.filter(col("hamming") >= 8).count() == 0)
  }

  test("a_mix_sample flattens the language distribution (T=2)") {
    val docs = core.t(spark, sf001, "documents")
    val corpus = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = corpus.values.sum.toDouble
    val sample = Registry.byName("a_mix_sample").run(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = sample.values.sum.toDouble
    // target is 20% of the corpus, minus per-group floor rounding
    assert(n >= total / 5 - corpus.size && n <= total / 5)
    // temperature flattening: the largest group's sample share drops
    // below its corpus share, the smallest group's share rises
    val (big, small) = (corpus.maxBy(_._2)._1, corpus.minBy(_._2)._1)
    assert(sample(big) / n < corpus(big) / total)
    assert(sample(small) / n > corpus(small) / total)
  }

  test("d_semdedup always keeps the lowest vec_id of every cell") {
    val df = Registry.byName("d_semdedup").run(spark, sf001).cache()
    val dropped = df.filter(col("keep") === 0).count()
    assert(dropped > 0) // the corpus has semantic dups — discriminating
    val firstPerCell = df.groupBy("cell")
      .agg(min("vec_id").as("vec_id"))
    val firstDropped = df.filter(col("keep") === 0)
      .join(firstPerCell, Seq("cell", "vec_id")).count()
    assert(firstDropped == 0,
      "a cell's lowest vec_id has no lower-id neighbor, must be kept")
  }

  test("s_cosine_ann_pq: shortlist re-rank recovers most exact-L2 " +
      "top-3 neighbors") {
    val pq = Registry.byName("s_cosine_ann_pq").run(spark, sf001)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == 30) // 3 per query, 10 queries
    // exact integer-L2 top-3 computed independently (brute force over
    // the quantized vectors) — PQ's own metric, so the gap measured
    // here is pure shortlist recall, not metric mismatch
    val qv = expr(
      "transform(embedding, x -> CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT))")
    val emb = core.t(spark, sf001, "embeddings")
      .select(col("vec_id"), qv.as("v"))
    val d2 = expr(
      "aggregate(zip_with(qv, v, (a, b) -> (a-b)*(a-b)), 0L, (s, t) -> s + t)")
    val exact = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .crossJoin(emb).filter(col("vec_id") =!= col("qid"))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 3)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (pq intersect exact).size
    // measured 27/30 on this corpus (random-ish embeddings are PQ's
    // WORST case); the floor asserts the trained quantizer + re-rank
    // pipeline works, with margin for corpus regeneration
    assert(overlap >= 21, s"PQ re-rank recovered only $overlap/30")
  }

  test("d_stream_dedup: witnesses precede their duplicates") {
    val df = Registry.byName("d_stream_dedup").run(spark, sf001).cache()
    assert(df.filter(col("is_dup") === 1).count() > 0)
    assert(df.filter(col("is_dup") === 1 &&
      col("witness") >= col("doc_id")).count() == 0)
    // the first arrival can have no earlier witness
    assert(df.orderBy("doc_id").first().getAs[Int]("is_dup") == 0)
  }

  test("t_chunk_windows covers every token with the declared overlap") {
    val (w, s) = (32, 24)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val chunks = Registry.byName("t_chunk_windows").run(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    for ((doc, toks) <- docs) {
      val n = toks.size
      val nChunks = 1 + (math.max(n - w, 0) + s - 1) / s
      val mine = chunks.filter(_._1._1 == doc)
      assert(mine.size == nChunks, s"doc $doc: ${mine.size} != $nChunks")
      for (i <- 0 until nChunks) {
        val want = toks.slice(i * s, i * s + w)
        val (nTok, text) = chunks((doc, i.toLong))
        assert(nTok == want.size && text == want.mkString(" "),
          s"doc $doc chunk $i boundary mismatch")
      }
      // ceil-covering: the last chunk reaches the final token
      assert((nChunks - 1) * s + w >= n)
    }
  }

  test("s_knn_clusters matches a brute-force union-find clustering") {
    val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val n2 = vecs.map { case (id, v) =>
      id -> v.map(x => x * x).sum }.toMap
    def cosine(a: Array[Long], b: Array[Long], na: Long, nb: Long) =
      a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    val knn = vecs.map { case (id, v) =>
      id -> vecs.filter(_._1 != id)
        .map { case (j, u) => (j, cosine(v, u, n2(id), n2(j))) }
        .sortBy { case (j, c) => (-c, j) }.take(3)
    }.toMap
    val edges = for {
      (a, ns) <- knn.toSeq
      (b, c) <- ns
      if a < b && c >= 0.4 && knn(b).exists(_._1 == a)
    } yield (a, b)
    // union-find
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val wantLabel = vecs.map(v => v._1 -> find(v._1)).toMap
    val wantSize = wantLabel.values.groupBy(identity).view.mapValues(_.size)
    val got = Registry.byName("s_knn_clusters").run(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((id, root) <- wantLabel)
      assert(got(id) == ((root, wantSize(root).toLong)),
        s"vec $id: got ${got(id)}, want ($root, ${wantSize(root)})")
    assert(edges.nonEmpty, "corpus produced no mutual edges — test is vacuous")
  }
}

object CoreQueriesCheck {
  /** Independent (RDD-side) recomputation of one q1 group. */
  def q1Row(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (String, String, Long, Long) = {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_returnflag", "l_linestatus", "l_quantity",
        // l_shipdate arrives as TIMESTAMP_NTZ; session tz is UTC so the
        // NTZ→LTZ cast is identity, then seconds since epoch
        "CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT) AS ship_s")
      .collect()
    val cut = java.time.Instant.parse("1998-09-02T00:00:00Z").getEpochSecond
    val grp = rows.filter { r =>
      r.getLong(3) <= cut && r.getString(0) == "R" && r.getString(1) == "F"
    }
    ("R", "F", grp.map(_.getDouble(2).toLong).sum, grp.length.toLong)
  }
}
