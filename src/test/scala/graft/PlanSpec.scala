package graft

/** Physical-plan audits — the 100 TB design assertions. Each checks a
  * property of the compiled plan, not the result: filters reach the
  * parquet scan, projections prune columns, dimension joins broadcast,
  * aggregations don't over-shuffle, hot paths stay in whole-stage
  * codegen.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf001)
      .queryExecution.executedPlan.toString

  test("p1 filter is pushed down to the parquet scan") {
    val p = plan("p1_lookup_filter")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("EqualTo(p_brand,Brand#13)"),
      s"brand filter not pushed:\n$p")
  }

  test("p10 projection prunes the scan schema") {
    val p = plan("p10_projection")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("s_acctbal"), "unused column read from parquet")
    assert(!p.contains("s_nationkey"), "unused column read from parquet")
  }

  test("q3/q5/j3 dimension joins broadcast") {
    for (q <- Seq("q3_top_revenue_orders", "q5_region_revenue",
        "j3_bridge_join")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$q has no broadcast join:\n${p.take(2000)}")
    }
  }

  test("j15 salted join shuffles on (key, salt) — not broadcast") {
    val p = plan("j15_salted_skew_join")
    // the SHUFFLE_HASH hint must hold: a broadcast would bypass the
    // very skew-spreading the salt exists for
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"salted join planned without a shuffle join:\n${p.take(2000)}")
    assert(!p.contains("BroadcastHashJoin"),
      "dim side broadcast — the salt is dead weight")
    assert(p.contains("salt"), "salt column absent from the physical plan")
  }

  test("q1 aggregation is a single shuffle with partial aggregation") {
    val p = plan("q1_pricing_summary")
    // partial (map-side) + final aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "no partial aggregation")
    // exactly one exchange for the groupBy plus one for the final sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"too many shuffles ($exchanges):\n${p.take(2000)}")
  }

  test("q1 stays inside whole-stage codegen") {
    // AQE prints codegen stages only in the final plan → execute first
    val df = Registry.byName("q1_pricing_summary").run(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // compact plan marks codegen stages as "*(n) Operator"
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r
      .findFirstIn(p).isDefined, p.take(1500))
  }

  test("j12 anti-join does not broadcast the big side") {
    val p = plan("j12_anti_join")
    assert(p.contains("LeftAnti"), s"anti join missing:\n${p.take(1500)}")
  }

  test("j4 semi-join broadcasts the query-key side") {
    val p = plan("j4_exact_hash_semijoin")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast left-semi:\n${p.take(1500)}")
  }

  test("near-dup band joins are equi-joins, never cartesian products") {
    for (q <- Seq("j5_simhash_banded_match", "d_minhash_lsh",
        "d_embed_neardup", "s_cosine_ann_lsh", "d_dedup_clusters")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q degenerated to a cartesian product:\n${p.take(1500)}")
    }
  }

  test("no registered query degenerates to a cartesian product") {
    // sweep the WHOLE registry: plans only (no execution beyond what
    // eager queries do themselves at sf0.001)
    val offenders = Registry.all.flatMap { q =>
      val p = try q.run(spark, sf001).queryExecution.executedPlan.toString
        catch { case e: Exception => s"PLAN FAILURE: $e" }
      if (p.contains("CartesianProduct") || p.startsWith("PLAN FAILURE"))
        Some(q.name -> p.take(200))
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("stratified sample is a filter-only plan: no shuffle at all") {
    val p = plan("a_stratified_sample")
    // an ordered display Sort is fine; no aggregation/join Exchange
    // before it means the sample is a pure scan+filter at 100 TB
    assert(!p.contains("HashAggregate"), p.take(1200))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("par() skips the shuffle when input already carries parallelism") {
    import graft.core.par
    // single-row-group parquet scan → one partition → par() shuffles
    val narrow = core.t(spark, sf001, "documents")
    assert(narrow.rdd.getNumPartitions <
      spark.sessionState.conf.numShufflePartitions)
    assert(par(narrow).queryExecution.executedPlan.toString
      .contains("Exchange"))
    // pre-split input at session parallelism → par() is the identity:
    // no gratuitous round-trip on inputs that arrive already split
    val wide = narrow.repartition(
      spark.sessionState.conf.numShufflePartitions)
    assert(par(wide) eq wide)
  }

  test("former UDF fallbacks are Catalyst expressions now (no ScalaUDF)") {
    // canonical_url / vers_contains / vers_cmp / langid carry
    // static-forwarder doGenCode: the plan must show the named
    // expression, never a UDF eval barrier
    for (q <- Seq("f2_canonical_url", "f15_vers_range", "f15_vers_pep440",
        "f15_vers_debian", "f15_vers_maven", "f15_vers_semver",
        "t_langid_ngram")) {
      val p = plan(q)
      assert(!p.contains("UDF"), s"$q still plans a UDF:\n${p.take(1200)}")
    }
  }

  test("text extraction ops stay inside whole-stage codegen") {
    for (q <- Seq("t_html_to_text", "t_pii_scrub")) {
      // AQE prints codegen stages only in the final plan → execute first
      val df = Registry.byName(q).run(spark, sf001)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r
        .findFirstIn(p).isDefined, s"$q fell out of codegen:\n${p.take(1200)}")
      assert(!p.contains("BatchEvalPython") && !p.contains("SerializeFromObject"),
        s"$q has a non-codegen hot path:\n${p.take(1200)}")
    }
  }

  test("s_cosine_topk broadcasts the query vectors") {
    val p = plan("s_cosine_topk")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n${p.take(1500)}")
  }

  test("IVF ANN: cells scale with n, candidate set is far below all-pairs") {
    import org.apache.spark.sql.functions._
    val emb = ops.SimilarityOps.quantized(spark, "/root/testdata/sf0.01")
    val n = emb.count()
    val cents = ops.SimilarityOps.ivfCentroids(emb, 32)
    val cells = ops.SimilarityOps.ivfCells(emb, cents)
    val nCells = cells.select("cell").distinct().count()
    assert(nCells >= 16, s"IVF collapsed to $nCells cells")
    val maxCell = cells.groupBy("cell").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell <= n / 2,
      s"one cell holds $maxCell of $n vectors — partition is degenerate")
    // nprobe=4 of k=32 cells ⇒ candidates ≈ (4/32)·q·n on balanced
    // cells; assert the hard bound that matters at scale: well under
    // the brute-force q·(n−1) pair count
    val q = emb.filter(col("vec_id") < 10)
    val cand = ops.SimilarityOps.ivfCandidates(q, cells, cents, 4).count()
    assert(cand < 10 * (n - 1) / 2,
      s"candidate set $cand not far below all-pairs ${10 * (n - 1)}")
    assert(cand > 0, "IVF probing returned no candidates at all")
  }

  test("incremental ANN ingest: centroids broadcast, candidates track " +
      "the increment — never corpus x corpus") {
    import org.apache.spark.sql.functions._
    val p = plan("s_ann_increment")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"persisted centroids not broadcast:\n${p.take(1500)}")
    // the ingest's candidate set is increment-side bounded: each
    // increment vector probes nprobe=4 of the ~64-vector target
    // cells, so candidates stay well under increment × corpus
    val emb = ops.SimilarityOps.quantized(spark, sf001)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val inc = emb.filter(col("vec_id") % 5 === 0)
    val (nC, nI) = (corpus.count(), inc.count())
    val cents = ops.SimilarityOps.ivfCentroids(corpus, 32)
    val cells = ops.SimilarityOps.ivfCells(corpus, cents)
    val cand = ops.SimilarityOps.ivfCandidates(inc, cells, cents, 4)
      .count()
    assert(cand > 0, "increment probing returned no candidates")
    assert(cand < nI * nC / 2,
      s"candidate set $cand not far below increment×corpus ${nI * nC}")
  }

  test("16-bit LSH: bucket population scales as n/2^bits, probes bounded") {
    import org.apache.spark.sql.functions._
    val emb = core.t(spark, "/root/testdata/sf0.01", "embeddings")
      .withColumn("bucket", expr(
        """aggregate(sequence(1, 16),
             0, (acc, i) -> acc * 2 +
               CASE WHEN element_at(embedding, i) >= 0.0 THEN 1 ELSE 0 END)"""))
    val n = emb.count()
    val byBucket = emb.groupBy("bucket").count()
    val maxBucket = byBucket.agg(max("count")).head().getLong(0)
    // balanced sign bits ⇒ buckets hold only near-identical vectors
    // (planted near-dups); no bucket may aggregate a constant fraction
    assert(maxBucket <= math.max(4L, n / 50),
      s"one LSH bucket holds $maxBucket of $n vectors")
    assert(byBucket.count() >= n / 4,
      "bucket count does not grow with n — hash is degenerate")
  }

  test("bucketed tables co-locate the fact-fact join: zero shuffles") {
    import org.apache.spark.sql.functions._
    // the SURVEY §4 layout row: catalog tables bucketed on their join
    // keys replace the reference's multicolumn indexes — at 100 TB a
    // recurring orders⋈lineitem-shaped join pre-bucketed on the key
    // runs shuffle-free (only the one-time bucketed write shuffles)
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed")
      .toString
    val orders = core.t(spark, sf001, "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = core.t(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/orders").mode("overwrite")
      .saveAsTable("bucketed_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/lineitem").mode("overwrite")
      .saveAsTable("bucketed_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_orders")
        .join(spark.table("bucketed_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      // co-located buckets: the join needs no Exchange at all, and the
      // groupBy on the same key rides the existing distribution
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_orders")
      spark.sql("DROP TABLE IF EXISTS bucketed_lineitem")
    }
  }

  test("m_scan_index decodes scans once with no cartesian product") {
    val df = Registry.byName("m_scan_index").run(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("directory fingerprints aggregate with map-side partials") {
    import graft.matching.{Fingerprints, Indexing}
    import spark.implicits._
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/minecode/tests/testfiles/" +
        "indexing/scancodeio_wagon-api-20040705.181715.json")), "UTF-8")
    val sr = Indexing.resources(Indexing.scanResources(
      Seq(("http://wagon", json)).toDF("download_url", "scan_json")))
    val fps = Fingerprints.directoryFingerprints(sr)
    fps.collect()
    val p = fps.queryExecution.executedPlan.toString
    // the bah128 typed aggregate must run partial (map-side) + final:
    // two ObjectHashAggregate stages around one shuffle of 516-byte
    // partial states — never a row-per-file shuffle to a single reduce
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("a_package_sets stays join-shaped with no cartesian product") {
    val df = Registry.byName("a_package_sets").run(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("s_partition_prune prunes directories, not rows") {
    val p = plan("s_partition_prune")
    assert(p.contains("PartitionFilters"), s"no partition filter:\n${p.take(1500)}")
    assert("PartitionFilters: \\[[^\\]]*l_returnflag[^\\]]*R".r
      .findFirstIn(p).isDefined,
      s"flag predicate not in PartitionFilters:\n${p.take(2000)}")
  }

  test("j16 injects a dynamic partition-pruning subquery on the fact scan") {
    val p = plan("j16_dynamic_partition_prune")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no runtime partition prune on the fact scan:\n${p.take(2500)}")
  }

  test("w_topk_agg is a partial-aggregated UDAF, not a rank window") {
    val p = plan("w_topk_agg")
    assert(!p.contains("Window"),
      s"top-k fell back to a rank window:\n${p.take(1500)}")
    // mergeable state ⇒ partial + final aggregate pair over the udaf
    val aggs = "ObjectHashAggregate|SortAggregate|HashAggregate"
      .r.findAllIn(p).size
    assert(aggs >= 2, s"no map-side partial for the top-k state:\n${p.take(2000)}")
    assert(p.toLowerCase.contains("topkagg"), "TopKAgg missing from plan")
  }

  test("sketch gates aggregate with map-side partials") {
    // the whole point of the HLL/GK branch: the sketch is mergeable,
    // so the plan must show partial + final HashAggregate/ObjectHash
    // pairs, never a single global aggregate pulling raw rows
    for (q <- Seq("a_sketch_distinct", "a_sketch_quantile")) {
      val p = plan(q)
      val aggs = "HashAggregate|ObjectHashAggregate|SortAggregate"
        .r.findAllIn(p).size
      assert(aggs >= 2, s"$q has no partial aggregation:\n${p.take(2000)}")
    }
  }

  test("runtime bloom-filter injection prunes the big side of a " +
      "selective shuffle join") {
    import org.apache.spark.sql.functions._
    // the cluster-scale complement to bucketing: when a shuffle join's
    // small side is selective, Spark (3.3+) injects a bloom filter
    // from the small side into the big side's scan
    // (InjectRuntimeFilter). Default-on; the size thresholds are
    // lowered here because sf0.001 is below them. At 100 TB this is
    // what keeps a filtered-dimension ⋈ fact join from shuffling the
    // whole fact table.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "0")
      val orders = core.t(spark, sf001, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey")
      val lineitem = core.t(spark, sf001, "lineitem")
        .select("l_orderkey", "l_quantity")
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("might_contain"),
        s"no runtime bloom filter injected:\n${p.take(2000)}")
      assert(joined.count() > 0)
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("t_shard_manifest is one shuffle to 64 rows, partials map-side") {
    val p = plan("t_shard_manifest")
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation:\n${p.take(2000)}")
    // one exchange for the groupBy(shard) + one for the final sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"too many shuffles ($exchanges):\n${p.take(2000)}")
  }

  test("s_knn_clusters_ann is equi-join shaped: no cartesian, no " +
      "nested-loop candidate generation") {
    // the whole point of the ANN variant: candidates come from cell /
    // neighbor EQUI-joins — an all-pairs plan here would silently
    // reintroduce the n² the exact variant is bounded by. Checkpoint
    // truncation OFF so the executed plan exposes the FULL pipeline
    // (with it on, the assignment subtrees run eagerly at build time
    // and the final plan only shows the tail — the pin would be
    // vacuous)
    val ckptKey = "spark.graft.ann.checkpoint"
    spark.conf.set(ckptKey, "false")
    val p =
      try {
        val df = Registry.byName("s_knn_clusters_ann").run(spark, sf001)
        df.collect()
        df.queryExecution.executedPlan.toString
      } finally {
        spark.conf.unset(ckptKey)
        graft.ops.SimilarityOps.releaseCaches()
      }
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the sanctioned nested-loops are the two-level assignment's
    // coarse scans — per pass, vectors × the Θ(√n) super-centroid
    // frame and centroids × the same — twice (training + probe), so
    // ≤ 4; every broadcast in them is bounded by that √(cprobe·k)
    // super frame, while the k = n/64 centroid frame moves only
    // through hash equi-joins (r9's flat pass broadcast the Θ(n)
    // centroid frame — the round-9 perf-weak finding). Anything
    // nested-looping two corpus-sized sides is a defect
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 4, s"unexpected nested-loop joins ($bnl):\n${p.take(2000)}")
  }

  test("d_jaccard_prefix_capped keeps the prefix join's shape and caps " +
      "output with one window") {
    val df = Registry.byName("d_jaccard_prefix_capped").run(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("Window"), s"keeper cap not a window:\n${p.take(1500)}")
  }
}
