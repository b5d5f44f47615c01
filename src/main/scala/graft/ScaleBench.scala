package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-scaling measurement: run the heaviest queries at the base SF
  * and at synthetic 10×/100× corpora, and report wall-clock ratios AND
  * per-query shuffle telemetry (rows/bytes shuffled, stage count, CC
  * round/edge counts) — the "would it survive 100×?" question answered
  * with data. Results are recorded in BASELINE.md.
  *
  * The scaled corpus is `factor` copies of the base documents with ids
  * offset and every token suffixed `_k` in copy k>0: WITHIN-copy
  * near-dup structure is preserved exactly (token-relative shingles
  * are unchanged), while CROSS-copy similarity is zero — so pair
  * counts, cluster sizes, and bucket populations scale linearly, which
  * is the honest scaling model (naive duplication would make every
  * document `factor-1` mutual near-dups and measure an artificial
  * quadratic blowup). Embeddings get id offsets (bucket populations
  * scale linearly).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<base> [SPARK_GRAFT_SCALE_FACTORS=10,100]
  * [SPARK_GRAFT_SCALE_ONLY=q1,q2] [SPARK_GRAFT_SCALE_MODE=docs|rel]
  * runMain graft.ScaleBench (writes/reuses the scaled corpora under
  * /tmp/graft_scale<f>x, rel mode /tmp/graft_scale_rel<f>x — rel
  * scales the fact tables only, see [[RelQueries]]).
  */
object ScaleBench {

  val Queries = Seq("d_ngram_jaccard", "m_snippet_match",
    "x5_halohash_match", "d_dedup_clusters", "s_cosine_ann_ivf",
    "d_minhash_lsh", "d_cluster_keeper", "mm_feature_extract",
    "t_bpe_encode", "d_decontaminate",
    // round-7 additions: the recall gate's exact side (quadratic in
    // per-shingle collision groups BY DESIGN — watch it), sequence
    // packing's two-phase prefix sum, and the AVI demux path
    "d_lsh_recall", "t_seq_pack", "mm_video_frames",
    // round-8 additions: streaming first-seen-wins (linear, rides the
    // minhash band join), temperature mixture sampling (one shuffle),
    // SemDeDup (k scales with n — a FIXED k=32 measured 501 s at 100×
    // from quadratic cells; the dynamic k keeps the pair join linear),
    // PQ ANN (broadcast ADC scan + bounded re-rank), and the two
    // per-user-key temporal plans over the user-offset-scaled events
    "d_stream_dedup", "a_mix_sample", "d_semdedup", "s_cosine_ann_pq",
    "st_session_window", "j14_asof_join",
    // and the single-shuffle report family: sliding windows (4-window
    // expand), two-phase decile rank, rollup grouping sets, pivot
    "st_sliding_window", "w6_ntile_buckets", "a_rollup",
    "a_pivot_events",
    // cross-doc substring dedup: gram explode + corpus count + hit
    // join + per-doc span merge — shuffle should track gram count
    // (linear in tokens), hits track duplicated-gram occurrences;
    // the cut half adds the token/span anti-join + in-order rebuild
    "d_substring_dedup", "d_substring_cut", "d_substring_dedup_hashed",
    // product-analytics report pair over the user-offset-scaled
    // events: funnel = cascaded filtered-MIN aggs on user_id,
    // retention = (user, week)-distinct frame joined to cohorts
    "a_window_funnel", "a_retention_cohorts",
    // the end-to-end curation funnel: rides the shared CC fixpoint +
    // two small windows; watch that the md5 window and keeper re-rank
    // stay hash-partitioned as the corpus grows
    "d_pipeline_e2e",
    // round-8 late additions: the sketch gates (shuffle volume must
    // stay groups×tasks×sketch-size — NOT row count — as events
    // grow), the shard manifest (one map-side-combined groupBy to 64
    // rows), and the NFC pass (pure per-row map; isNormalized fast
    // path keeps the ASCII bulk allocation-free)
    "a_sketch_distinct", "a_sketch_quantile", "t_shard_manifest",
    "t_normalize",
    // one-pass expectation profile (the COUNT(DISTINCT) expand is the
    // only super-constant state) and the cluster histogram riding the
    // shared CC label frame
    "a_data_quality", "d_cluster_stats",
    // exact set-similarity join: the prefix filter must keep the hot
    // grams OUT of the candidate join — compare its shuffle against
    // d_lsh_recall's exact side (same answer, no pruning). Ran 10×
    // ONLY until round 9: the old gram-explode verify materialized a
    // pairs×grams intermediate (~1B shuffle rows at 100×) that was
    // misattributed to answer cardinality — the copy-suffix harness
    // multiplies cohort COUNT, so the answer is linear (25.6k rows at
    // 100×); the array-intersect verify runs the full 100× point
    "d_jaccard_prefix_join",
    // heavy-hitters sketch gate: the Misra-Gries pass must stay O(k)
    // state per partition; the linear branch is the exact verify
    "t_heavy_hitters",
    // corpus-bigram LM scoring: two vocabulary-sized count frames +
    // one corpus equi-join — transitions shuffle linearly, counts don't
    "t_lm_score",
    // windowed cardinality: the streaming shape of the distinct gate —
    // the exact branch shuffles (window, type, user) triples, the HLL
    // partials stay windows×types×tasks×sketch
    "st_window_distinct",
    // round-8 additions: stride chunking (pure explode — shuffle only
    // the display sort), the integer-score retrieval pair (explode +
    // two hash aggs; the query side of t_search_rank is 3 terms at
    // every scale), and the per-source token-budget window (one
    // hash-partitioned cumsum; kept rows FIXED per source as the
    // corpus grows — the budget, not the data, bounds the output)
    "t_chunk_windows", "t_keyword_extract", "t_search_rank",
    "a_token_budget",
    // round-9 additions: the ANN-candidate mutual-kNN clusters — the
    // 100 TB path of s_knn_clusters. Candidates must stay bounded by
    // nprobe·n·cell_size (cells scale linearly under the id-offset
    // corpus), never the n² of the exact variant; watch the candidate
    // join's shuffle rows track n linearly. And the keeper-capped
    // exact similarity join: linear OUTPUT (one witness edge per
    // duplicate doc) where the uncapped d_jaccard_prefix_join is
    // FactorCap'd to 10× by its answer cardinality — this one must
    // hold a 100× point
    "s_knn_clusters_ann", "d_jaccard_prefix_capped",
    // round-11: incremental shard ingest — the candidate join is
    // restricted to increment-side bands, so its shuffle must track
    // the INCREMENT (20% of docs, linear per copy), never
    // corpus×corpus; within-copy cohorts keep verdicts linear under
    // the copy-suffix harness
    "d_incremental_dedup",
    // round-12: the embedding-side incremental ingest — assignment is
    // increment × k map-side dots against broadcast centroids, and
    // k ∝ corpus keeps probed cells ~64 vectors, so scoring tracks
    // the increment (20% of vectors, id-offset corpus) linearly;
    // watch the candidate join's shuffle rows, never corpus×corpus
    "s_ann_increment")

  /** Per-query scale-factor caps: queries whose OUTPUT is inherently
    * super-linear on the copy-suffix corpus (not an implementation
    * artifact) stop at the documented boundary instead of dying in
    * spill — see each QueryDef's scaladoc. */
  // r9: the cap was lifted after the array-intersect verify replaced
  // the gram-explode verify join — the 100× blocker was that join's
  // pairs×grams intermediate (measured ~1B shuffle rows), NOT the
  // answer set (25.6k rows at 100×, linear per-copy). Kept as the
  // mechanism for genuinely output-bound queries.
  val FactorCap: Map[String, Int] = Map.empty

  /** Relational-core scale set (SPARK_GRAFT_SCALE_MODE=rel): the
    * TPC-ish aggregation/join family, run against a corpus whose FACT
    * tables (lineitem, orders) are replicated `factor`× with order
    * keys offset into disjoint ranges while DIMENSIONS stay unscaled —
    * the realistic growth model (facts grow, dims don't), under which
    * dimension joins must stay broadcast at every factor. */
  val RelQueries = Seq("q1_pricing_summary", "q3_top_revenue_orders",
    "q5_region_revenue", "j1_fk_join", "j2_prefetch_agg",
    "j9_earliest_per_key",
    // two-phase exact quantiles: the rank shuffle must stay
    // range-partitioned (never one task per group) as facts grow
    "a_percentiles",
    // the salted skew join: the hot key's rows spread over 8 salted
    // partitions; max single-stage shuffle write must track total/8
    // for the hot key, not total, as facts grow
    "j15_salted_skew_join")

  /** Shuffle totals accumulated across the stages of one query run.
    * Listener events arrive asynchronously; callers drain with a short
    * sleep after the action (measurement harness, not product code). */
  final class ShuffleListener extends SparkListener {
    private val lock = new Object
    private var readRecs, readBytes, writeRecs, writeBytes, maxWrite = 0L
    private var nStages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      lock.synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics
          val w = m.shuffleWriteMetrics
          readRecs += r.recordsRead
          readBytes += r.remoteBytesRead + r.localBytesRead
          writeRecs += w.recordsWritten
          writeBytes += w.bytesWritten
          maxWrite = math.max(maxWrite, w.recordsWritten)
          nStages += 1
        }
      }
    def reset(): Unit = lock.synchronized {
      readRecs = 0; readBytes = 0; writeRecs = 0; writeBytes = 0
      maxWrite = 0; nStages = 0
    }
    /** (readRecs, readBytes, writeRecs, writeBytes, maxStageWriteRecs,
      * stages) */
    def snapshot: (Long, Long, Long, Long, Long, Int) = lock.synchronized {
      (readRecs, readBytes, writeRecs, writeBytes, maxWrite, nStages)
    }
  }

  def buildScaled(spark: SparkSession, base: String, out: String,
      factor: Int): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + k * nDoc).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$k"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select((col("vec_id") + k * nVec).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    buildScaledEvents(spark, base, out, factor)
  }

  /** events scale by USER-ID offset: per-user timelines (and so the
    * session/as-of structure) replicate exactly — sessions and as-of
    * matches scale linearly, the honest model for per-key temporal
    * operators. */
  def buildScaledEvents(spark: SparkSession, base: String, out: String,
      factor: Int): Unit = {
    val ev = graft.core.t(spark, base, "events")
    val nUser = ev.agg(max("user_id")).head().getLong(0) + 1
    val nEv = ev.agg(max("event_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) ev
      else ev.select((col("event_id") + k * nEv).as("event_id"),
        col("ts"), (col("user_id") + k * nUser).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** Fact tables replicated with offset order keys; dims copied. */
  def buildScaledRel(spark: SparkSession, base: String, out: String,
      factor: Int): Unit = {
    val orders = spark.read.parquet(s"$base/orders.parquet")
    val maxOk = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) orders
      else orders.withColumn("o_orderkey", col("o_orderkey") + k * maxOk)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    (0 until factor).map { k =>
      if (k == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + k * maxOk)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { d =>
      spark.read.parquet(s"$base/$d.parquet")
        .write.mode("overwrite").parquet(s"$out/$d.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALE_MODE", "docs")
    require(mode == "docs" || mode == "rel",
      s"SPARK_GRAFT_SCALE_MODE must be docs or rel, got $mode")
    val defaultFactors = if (mode == "rel") "10" else "10,100"
    val factors = sys.env
      .getOrElse("SPARK_GRAFT_SCALE_FACTORS", defaultFactors)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val allQueries = if (mode == "rel") RelQueries else Queries
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- allQueries.toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_SCALE_ONLY names not in the $mode query set: " +
          s"${unknown.mkString(", ")}")
    }
    val queries = only match {
      case Some(names) => allQueries.filter(names.contains)
      case None        => allQueries
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partitions sized to the DATA, not the cores: a 10^9-row shuffle
    // over 32 partitions is ~37M rows per task sort — execution-memory
    // page acquisition fails under 32 concurrent coarse sorts long
    // before heap runs out. The override is the knob a cluster job
    // sets per target SF (the brief's "spill-aware" rule).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalebench")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_KNN_LEVELS=3 engages the depth-L ANN hierarchy for
    // the scale points (same knob as KnnProbe; the auto default picks
    // depth from the centroid count — k=3,125 at 100x stays L=2, and
    // the forced-L=3 100x point measured x3.8 WORSE, see BASELINE.md)
    sys.env.get("SPARK_GRAFT_KNN_LEVELS")
      .foreach(v => spark.conf.set("spark.graft.ann.levels", v))
    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    val dirs: Seq[(String, String)] =
      ("base" -> base) +: factors.map { f =>
        val out =
          if (mode == "rel") s"/tmp/graft_scale_rel${f}x"
          else s"/tmp/graft_scale${f}x"
        val probe = if (mode == "rel") "lineitem" else "documents"
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$out/$probe.parquet")))
          (if (mode == "rel") buildScaledRel _ else buildScaled _)(
            spark, base, out, f)
        // events joined the docs-mode corpus in round 8; top up dirs
        // cached by earlier rounds without rebuilding docs/embeddings
        if (mode == "docs" && !java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$out/events.parquet")))
          buildScaledEvents(spark, base, out, f)
        s"x$f" -> out
      }

    def release(): Unit = {
      graft.ops.SimilarityOps.releaseCaches() // ANN-family scoped caches
      graft.ops.DedupOps.releaseCaches() // dedup-family scoped caches
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // JIT/codegen warmup on the smallest SF
    queries.foreach { q =>
      Registry.byName(q).run(spark, "/root/testdata/sf0.001").count()
      release()
    }

    /** (minSec, rows, shuffle snapshot, cc edge counts) — snapshot
      * and CC telemetry are captured PER SAMPLE and the reported ones
      * come from the min-time sample, so the telemetry always
      * corresponds to the reported seconds (the two samples can
      * differ when the first pays a memo/cache build the second
      * reuses). */
    def time(q: String, dir: String)
        : (Double, Long, (Long, Long, Long, Long, Long, Int), Seq[Long]) = {
      // min of two runs: scaling ratios want the contention-free floor
      val samples = (1 to 2).map { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        // noop write, NOT count(): a count() lets Catalyst prune all
        // columns and eliminate unique-keyed outer joins, so plans
        // ending in a witness/keeper left join would bench (and
        // report telemetry for) a fraction of their real work — see
        // graft.PlanAudit
        Registry.byName(q).run(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus DETERMINISTICALLY: poll until
        // the snapshot is stable across two reads (a fixed sleep
        // undercounts telemetry exactly on the big runs it exists to
        // measure); cap at 10 s as a hang backstop
        var prev = listener.snapshot
        var stable = false
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (!stable && System.nanoTime() < deadline) {
          Thread.sleep(200)
          val cur = listener.snapshot
          stable = cur == prev
          prev = cur
        }
        val snap = listener.snapshot
        val cc =
          if (q == "d_dedup_clusters" || q == "d_cluster_keeper")
            graft.ops.ConnectedComponents.lastRunEdgeCounts
          else Seq.empty[Long]
        release()
        (dt, snap, cc)
      }
      // rows are informational, counted ONCE outside the timed
      // samples via the count-pruned plan (correct cardinality — the
      // pruning is a semantics-preserving optimization), so telemetry
      // reflects only the full-plan noop executions
      val rows = Registry.byName(q).run(spark, dir).count()
      release()
      val best = samples.minBy(_._1)
      (best._1, rows, best._2, best._3)
    }

    val entries = queries.map { q =>
      val qDirs = FactorCap.get(q) match {
        case Some(cap) => dirs.filter { case (tag, _) =>
          tag == "base" || tag.stripPrefix("x").toInt <= cap
        }
        case None => dirs
      }
      val scales = qDirs.map { case (tag, dir) =>
        val (sec, rows, (rr, rb, wr, wb, mw, st), cc) = time(q, dir)
        val ccPart =
          if (cc.nonEmpty)
            s""","cc_rounds":${cc.length - 1},"cc_edges":[${cc.mkString(",")}]"""
          else ""
        f""""$tag":{"sec":$sec%.3f,"rows":$rows,""" +
          f""""sh_write_rows":$wr,"sh_write_mb":${wb / 1048576.0}%.1f,""" +
          f""""sh_read_rows":$rr,"sh_read_mb":${rb / 1048576.0}%.1f,""" +
          f""""max_stage_write_rows":$mw,"stages":$st$ccPart}"""
      }
      val line = s""""$q":{${scales.mkString(",")}}"""
      System.err.println(s"[scale] $line")
      line
    }
    println(entries.mkString(
      s"""{"metric":"scale","factors":"${factors.mkString(",")}","base":"$base","queries":{""",
      ",", "}}"))
    spark.stop()
  }
}
