package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ST1 as an actual Structured Streaming job — the reference's
  * always-on visit loop (`run_visit.py:143-227`: poll queue → claim →
  * visit → insert children → mark visited, forever) expressed as
  * `readStream` over a seed/tick inbox driving [[Frontier.visitCycle]]
  * through `foreachBatch`, with the frontier state table versioned in
  * parquet behind an atomically-swapped commit pointer.
  *
  * Exactly-once across crash/restart WITHOUT a transactional table
  * format, from three ingredients:
  *
  *  1. **Versioned state + commit pointer.** Each micro-batch writes
  *     the next frontier to `state/v=<batchId>` and only then
  *     atomically moves `COMMIT.tmp` → `COMMIT` (the pointer). A crash
  *     after the state write but before the pointer swap leaves the
  *     previous version live; the replayed batch overwrites
  *     `v=<batchId>` and swaps again. Readers only ever see a
  *     committed version.
  *  2. **Replay skip.** Structured Streaming re-delivers the failed
  *     batch from its WAL on restart; a batchId at or below the commit
  *     pointer has already been fully applied, so the batch is a
  *     no-op (the foreachBatch idempotence contract).
  *  3. **Batch-deterministic time.** `last_visit_date` is derived from
  *     the batchId, never the wall clock, so a replayed batch marks
  *     the SAME (canonical, last_visit_date) rows — the revisit-dedup
  *     identity the reference keys on (`minecode/models.py:182-191`)
  *     holds bit-for-bit across a mid-batch kill (proven in
  *     FrontierStreamSpec against an uninterrupted twin run).
  *
  * At 100 TB the state table is a partitioned parquet (or Delta)
  * table and the pointer swap is the table-format commit; the
  * micro-batch body is unchanged — claim/visit/insert are the same
  * distributed plans audited in st_frontier_sim.
  */
object FrontierStream {

  /** Where a streaming run lands its mapped packages: a TxLog delta
    * catalog root plus the projection from the map loop's raw
    * (uri, package_data) rows to mergePackages-shaped package rows.
    * With a sink configured, visit → map → MERGE ride one micro-batch
    * (the reference runs run_visit + run_map + the priority upsert
    * worker as a trio, `run_map.py:106-182` feeding
    * `model_utils.py:231-449`; here the merge is an O(delta)
    * partitioned TxLog commit tagged with the batchId, so a crash
    * between the merge and the frontier pointer swap replays WITHOUT
    * double-merging — proven batch-for-batch in FrontierStreamSpec). */
  final case class CatalogSink(
      root: String,
      toPackages: DataFrame => DataFrame,
      empty: () => DataFrame,
      partitions: Int = graft.catalog.TxLog.DefaultPartitions,
      // Retention cadence for an ALWAYS-ON stream: every N batches,
      // vacuum the sink (superseded data dirs AND old commit records
      // — one lands per micro-batch, so an unvacuumed stream's
      // maxTag/readDelta scans grow with its lifetime). 0 = off
      // (operator-scheduled vacuum). The stream owns its sink root,
      // so the single-vacuumer contract holds by construction;
      // vacuumGraceMs > 0 still protects interleaved ad-hoc writers.
      vacuumEvery: Int = 0,
      vacuumGraceMs: Long = 20L * 60 * 1000)

  /** Frontier schema (UriRow, flags derived not stored). */
  val stateDdl: String =
    "uri STRING, canonical STRING, host STRING, priority INT, " +
      "last_visit_date TIMESTAMP, last_map_date TIMESTAMP, " +
      "wip_date TIMESTAMP, visit_error STRING"

  private def commitFile(stateRoot: String): Path =
    Paths.get(stateRoot, "COMMIT")

  /** Latest committed batch id, or -1 before the first commit. */
  def committedBatch(stateRoot: String): Long = {
    val f = commitFile(stateRoot)
    if (Files.exists(f)) Files.readString(f).trim.toLong else -1L
  }

  /** The committed frontier state (empty frame before first commit). */
  def currentFrontier(spark: SparkSession, stateRoot: String): DataFrame = {
    val v = committedBatch(stateRoot)
    if (v < 0)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(stateDdl))
    else spark.read.parquet(s"$stateRoot/v=$v")
  }

  /** Deterministic micro-batch timestamp: a fixed epoch plus one hour
    * per batch. Wall-clock `now` would break replay idempotence (a
    * re-run batch would stamp different visit dates); production picks
    * the batch's WAL timestamp, which is equally replay-stable. */
  def batchTime(batchId: Long): Timestamp =
    new Timestamp(1767225600000L + batchId * 3600L * 1000L) // 2026-01-01 UTC

  /** Committed mapped-package rows (uri, package_data, b): the map
    * loop's output, one hive partition per micro-batch, filtered to
    * batches at or below the commit pointer so a crashed batch's
    * half-written partition is invisible until its replay commits. */
  def packages(spark: SparkSession, stateRoot: String): DataFrame = {
    val p = Paths.get(stateRoot, "packages")
    if (!Files.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "uri STRING, package_data STRING, b BIGINT"))
    else spark.read.parquet(p.toString)
      .filter(org.apache.spark.sql.functions.col("b") <=
        committedBatch(stateRoot))
  }

  /** Apply one micro-batch: seeds in, one visit cycle — and, when a
    * `mapper` is supplied, one map cycle over the post-visit frontier
    * (the reference runs run_visit and run_map as a worker PAIR;
    * riding both on one micro-batch keeps a single commit point) —
    * state committed. `preCommitHook` runs between the state write
    * and the pointer swap (test seam for the crash-mid-batch proof). */
  def processBatch(spark: SparkSession, seedBatch: DataFrame, batchId: Long,
      stateRoot: String, visitor: Frontier.Visitor, batchSize: Int,
      preCommitHook: Long => Unit = _ => (),
      mapper: Option[String => Seq[String]] = None,
      catalog: Option[CatalogSink] = None): Unit = {
    val last = committedBatch(stateRoot)
    if (batchId <= last) return // replayed, already applied — skip
    val now = batchTime(batchId)

    // the seed inbox is control-plane, not data-plane: a micro-batch
    // carries the handful of operator-entered roots (the reference's
    // `seed` command reads them from a file into memory the same way,
    // seed.py:42-89) — collecting them is bounded by the seed file,
    // never by corpus size
    val seeds = seedBatch.select(col("value")).collect()
      .map(_.getString(0).trim).filter(u => u.nonEmpty && u != "tick")
      .toSeq.distinct

    val frontier = currentFrontier(spark, stateRoot)
    val seeded =
      if (seeds.isEmpty) frontier
      else Frontier
        .insertSeedUris(Frontier.withRoutability(frontier), seeds, now)
        .drop("is_visitable", "is_mappable")
    // visitCycle caches its claimed batch; an always-on job must
    // release that per-batch cache once the state write materializes
    // it, or block-manager state grows without bound over thousands of
    // cycles. The before/after diff releases only THIS batch's blocks.
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val afterVisit =
      Frontier.visitCycle(spark, seeded, visitor, now, batchSize)
    val next = mapper match {
      case Some(m) =>
        val (mapped, pkgs) =
          Frontier.mapCycle(spark, afterVisit, m, now, batchSize)
        // batch-keyed overwrite = replay-idempotent; invisible to
        // readers until the commit pointer covers this batch
        pkgs.write.mode("overwrite")
          .parquet(s"$stateRoot/packages/b=$batchId")
        // the merge leg: feed this batch's mapped packages through the
        // O(delta) catalog commit, tagged with the batchId. Replay
        // idempotence needs the tag, not the frontier pointer: a crash
        // BETWEEN this merge and the pointer swap re-runs the whole
        // batch, and the watermark check is what keeps the catalog at
        // exactly one application (the uninterrupted twin's result,
        // FrontierStreamSpec). Reading the just-written parquet (not
        // re-running the pkgs plan) keeps the merged rows bit-
        // identical to the committed map output.
        catalog.foreach { sink =>
          if (graft.catalog.TxLog.maxTag(sink.root) < batchId) {
            val incoming = sink.toPackages(
              spark.read.parquet(s"$stateRoot/packages/b=$batchId"))
            graft.catalog.TxLog.mergeCommitDelta(spark, sink.root,
              incoming, now.toInstant.toString, sink.empty(),
              sink.partitions, tag = Some(batchId))
          }
          if (sink.vacuumEvery > 0 && batchId % sink.vacuumEvery == 0)
            graft.catalog.TxLog.vacuum(sink.root, keep = 2,
              graceMs = sink.vacuumGraceMs)
        }
        mapped
      case None => afterVisit
    }

    next.write.mode("overwrite").parquet(s"$stateRoot/v=$batchId")
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !cachedBefore.contains(id) }
      .values.foreach(_.unpersist(false))
    preCommitHook(batchId)
    val tmp = Paths.get(stateRoot, "COMMIT.tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, commitFile(stateRoot),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // retention: the newly-superseded version is no longer readable
    // through the pointer; keep only the committed one plus its
    // predecessor (crash-window safety margin)
    val stale = Files.list(Paths.get(stateRoot))
    try {
      val it = stale.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("v=") && n.drop(2).toLong < last) {
          // best-effort recursive delete
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
        }
      }
    } finally stale.close()
  }

  /** Start the always-on frontier job: text files dropped into
    * `seedDir` are seed URIs (one per line; the literal line "tick"
    * triggers a visit cycle without seeding — production replaces the
    * tick file with a rate-source union for continuous cycling). The
    * checkpoint carries the source WAL; the state commit pointer
    * carries the applied-batch high-water mark. */
  def start(spark: SparkSession, seedDir: String, stateRoot: String,
      checkpointDir: String, visitor: Frontier.Visitor,
      batchSize: Int = 10,
      preCommitHook: Long => Unit = _ => (),
      mapper: Option[String => Seq[String]] = None,
      catalog: Option[CatalogSink] = None): StreamingQuery = {
    Files.createDirectories(Paths.get(stateRoot))
    spark.readStream
      .option("maxFilesPerTrigger", 1) // one inbox file = one cycle
      .text(seedDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, stateRoot, visitor,
          batchSize, preCommitHook, mapper, catalog)
      }
      .start()
  }

  /** The ALWAYS-ON variant (round-9 "what's missing" #2): the seed
    * inbox unioned with a rate source, so visit cycles run
    * continuously WITHOUT an operator dropping tick files — the
    * reference's forever-loop (`run_visit.py:143-227` re-polls the
    * queue after every batch). Every rate row collapses to the same
    * control-plane "tick" line and [[processBatch]] deduplicates the
    * seed list, so a micro-batch carrying 40 rate rows still runs
    * exactly one claim-visit-insert cycle; seeds dropped into the
    * inbox ride whichever batch picks them up. State, commit pointer,
    * replay skip, and the catalog merge leg are identical to
    * [[start]] — the trigger is the only difference, which is the
    * point: cadence is config, not architecture. */
  def startContinuous(spark: SparkSession, seedDir: String,
      stateRoot: String, checkpointDir: String,
      visitor: Frontier.Visitor, batchSize: Int = 10,
      ticksPerSecond: Int = 2,
      mapper: Option[String => Seq[String]] = None,
      catalog: Option[CatalogSink] = None): StreamingQuery = {
    Files.createDirectories(Paths.get(stateRoot))
    val seeds = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(seedDir)
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", ticksPerSecond).load()
      .select(org.apache.spark.sql.functions.lit("tick").as("value"))
    seeds.unionByName(ticks)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, stateRoot, visitor,
          batchSize, mapper = mapper, catalog = catalog)
      }
      .start()
  }
}
