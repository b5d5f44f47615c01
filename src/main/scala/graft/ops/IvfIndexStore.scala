package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.catalog.{CommitStore, LinkCommitStore, TxLog}

/** The persisted IVF index as a first-class, versioned on-disk
  * artifact — the piece the `s_ann_increment` query could only
  * SIMULATE (a bench query owns no cross-run artifacts, so it
  * retrains the corpus index inline every run and its 100× point
  * carries the rebuild's k ∝ corpus shuffle). A deployment keeps the
  * index on disk and pays only the increment: this store makes that
  * amortization code instead of a comment.
  *
  * Layout (FAISS IVF-Flat shape: centroids + inverted lists carrying
  * the member vectors):
  *
  * {{{
  *   root/_commits/v<20-digit>      one record per committed version
  *   root/data/<uuid>/centroids/    (cid, cv: array<bigint>, cn2)
  *   root/data/<uuid>/cells/        (vec_id, v, n2, cell, pb)
  * }}}
  *
  * Every record is a SELF-CONTAINED manifest (header `#ivf k=.. p=..`
  * plus one `C` line and one `D` line per cells shard) — an index
  * accretes a handful of shard dirs per day, not a partition map per
  * micro-batch, so full-manifest records stay small and every version
  * is its own checkpoint (no overlay chain, no partial-table read in
  * vacuum's grace band by construction). [[compact]] folds the shard
  * list back to one dir when it grows. Commits go through the same
  * [[graft.catalog.CommitStore]] CAS primitive as the catalog
  * ([[TxLog.commit]]), so link(2) and conditional-PUT deployments use
  * the identical protocol, and concurrent appenders serialize through
  * the version counter with stage → CAS → rebase-on-conflict.
  *
  * Inverted lists are hash-bucketed on disk: `pb = cell % P` is a
  * Hive partition column with P ∝ k/16 (so ~16 cells per bucket and
  * the dir count stays object-store-sane at any k — 10⁹ vectors →
  * k ≈ 1.6e7 cells → ~10⁶ dirs would be too many at P=k, but P=k/16
  * with multi-cell buckets stays at ~10⁵ while keeping each bucket a
  * constant ~16 × 64 = 1k vectors). [[shortlist]] collects the ≤ P
  * DISTINCT probed buckets (never the probed cells — the collect is
  * bounded by P, not by increment × nprobe) and pushes `pb IN (…)`
  * into the scan, so a small increment's candidate read prunes to the
  * touched buckets instead of scanning the corpus
  * (graft.IvfProbe measures the pruned read bytes flat-vs-corpus).
  *
  * Exactness: vectors are already exact integers
  * ([[SimilarityOps.quantized]]), centroids/cells persist as bigint
  * arrays, and parquet roundtrips integers bit-for-bit — so the
  * loaded index's shortlist is row-identical to the in-memory
  * `s_ann_increment` plan, and the DuckDB oracle that replays the
  * arithmetic end-to-end gates the whole save → load → probe path
  * (`s_ann_index_lifecycle`, `s_ann_index_append`).
  */
object IvfIndexStore {

  /** A loaded index version. `centroids` is broadcast-hinted (the
    * k × dim frame is the small side of every assignment join);
    * `cells` carries the member vectors (IVF-Flat) plus the `pb`
    * bucket column. */
  final case class IvfIndex(version: Long, k: Int, buckets: Int,
      centroids: DataFrame, cells: DataFrame)

  private def commitsDir(root: String): Path = Paths.get(root, "_commits")
  private def vname(v: Long): String = f"v$v%020d"

  /** ~16 cells per on-disk bucket; floor of 8 keeps tiny test
    * indexes multi-bucket so the pruning path is always ENGAGED. */
  def defaultBuckets(k: Int): Int = math.max(8, k / 16)

  private def dot(a: String, b: String) =
    graft.functions.GraftFunctions.dot_long(col(a), col(b))

  /** All commit records, newest first. (The store's records carry an
    * `#ivf` header, which [[TxLog.snapshot]] would reject as a
    * manifest root — the formats are deliberately disjoint so a
    * catalog reader pointed at an index root fails loudly.) */
  private def listRecords(root: String): Seq[(Long, Path)] = {
    val dir = commitsDir(root)
    if (!Files.exists(dir)) return Seq.empty
    val l = Files.list(dir)
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Path)]
      val it = l.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("v")) buf += ((n.drop(1).toLong, p))
      }
      buf.sortBy(-_._1).toSeq
    } finally l.close()
  }

  private final case class Record(k: Int, buckets: Int,
      centroidDir: String, cellDirs: Seq[String])

  private def render(r: Record): String =
    (Seq(s"#ivf k=${r.k} p=${r.buckets}", s"C\t${r.centroidDir}") ++
      r.cellDirs.map(d => s"D\t$d")).mkString("\n")

  private def parse(content: String): Record = {
    val lines = content.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val header = lines.headOption.getOrElse("")
    require(header.startsWith("#ivf "),
      s"not an IVF index record: '$header'")
    val kv = header.drop(5).split("\\s+")
      .map(_.split("=", 2)).collect { case Array(a, b) => a -> b }.toMap
    val cents = lines.collect { case l if l.startsWith("C\t") => l.drop(2) }
    require(cents.size == 1, s"record has ${cents.size} centroid dirs")
    Record(kv("k").toInt, kv("p").toInt, cents.head,
      lines.collect { case l if l.startsWith("D\t") => l.drop(2) })
  }

  private def recordAt(root: String, version: Long): Record = {
    val recs = listRecords(root)
    val p = recs.collectFirst { case (v, path) if v == version => path }
    require(p.isDefined,
      s"version $version is not in $root's retained window " +
        s"(have ${recs.map(_._1).sorted.mkString(",")}); vacuum(keep) " +
        "bounds how far back index reads reach")
    parse(Files.readString(p.get).trim)
  }

  /** Shard dirs are each a partitioned (pb=N) table root; Spark's
    * partition discovery refuses a multi-root scan without a common
    * basePath, so each dir reads under its own basePath and the
    * shards union — the unions are FEW (one per un-compacted shard,
    * bounded by [[compact]]'s cadence) and unionByName keeps the
    * partition column positional drift out. */
  private def readCellDirs(spark: SparkSession, root: String,
      dirs: Seq[String]): DataFrame =
    dirs.sorted
      .map(d => spark.read.option("basePath", s"$root/data/$d")
        .parquet(s"$root/data/$d"))
      .reduce(_ unionByName _)

  private def writeCells(cells: DataFrame, buckets: Int, dir: String): Unit =
    cells
      .select(col("vec_id"), col("v"), col("n2"), col("cell"),
        pmod(col("cell"), lit(buckets.toLong)).cast("int").as("pb"))
      .write.partitionBy("pb").parquet(dir)

  /** Train on `corpus` (a [[SimilarityOps.quantized]]-shaped frame:
    * vec_id, v, n2) and commit version 1: centroids via the
    * integer-exact Lloyd pass, cells = corpus assignment on the
    * trained centroids. Returns the committed version. */
  def save(root: String, corpus: DataFrame, k: Int,
      store: CommitStore = LinkCommitStore): Long = {
    TxLog.init(root)
    val cents = SimilarityOps.ivfCentroids(corpus, k)
    val cells = SimilarityOps.ivfCells(corpus, cents)
    val dirName = UUID.randomUUID().toString
    cents.write.parquet(s"$root/data/$dirName/centroids")
    writeCells(cells, defaultBuckets(k), s"$root/data/$dirName/cells")
    val rec = Record(k, defaultBuckets(k), s"$dirName/centroids",
      Seq(s"$dirName/cells"))
    val v = listRecords(root).headOption.map(_._1).getOrElse(0L)
    TxLog.commit(root, v, render(rec), store)
  }

  def load(spark: SparkSession, root: String): IvfIndex = {
    val recs = listRecords(root)
    require(recs.nonEmpty, s"$root has no committed index")
    loadAt(spark, root, recs.head._1)
  }

  /** Time travel: the index as of `version` — every record is a full
    * manifest, so any retained version reads directly. */
  def loadAt(spark: SparkSession, root: String, version: Long): IvfIndex = {
    val r = recordAt(root, version)
    val cents = broadcast(
      spark.read.parquet(s"$root/data/${r.centroidDir}"))
    IvfIndex(version, r.k, r.buckets, cents,
      readCellDirs(spark, root, r.cellDirs))
  }

  /** O(increment) shard ingest: assign `inc` (quantized frame) on the
    * FROZEN persisted centroids, stage only the increment's inverted-
    * list rows as a new shard dir, and CAS a record appending that
    * dir — corpus rows are never read, rewritten, or reassigned, and
    * a conflict rebases by re-listing (the staged shard dir stays
    * valid; only the record re-renders). Returns the new version. */
  def append(spark: SparkSession, root: String, inc: DataFrame,
      store: CommitStore = LinkCommitStore, maxRetries: Int = 10): Long = {
    val recs = listRecords(root)
    require(recs.nonEmpty, s"$root has no committed index to append to")
    val head = parse(Files.readString(recs.head._2).trim)
    val cents = broadcast(
      spark.read.parquet(s"$root/data/${head.centroidDir}"))
    val assigned = SimilarityOps.ivfCells(inc, cents)
    val dirName = UUID.randomUUID().toString
    writeCells(assigned, head.buckets, s"$root/data/$dirName/cells")
    var attempt = 0
    while (true) {
      val (v, latest) = {
        val rs = listRecords(root)
        (rs.head._1, parse(Files.readString(rs.head._2).trim))
      }
      require(latest.k == head.k && latest.buckets == head.buckets &&
        latest.centroidDir == head.centroidDir,
        "concurrent commit replaced the index structure (compact/save " +
          "raced this append); re-run against the new index")
      val rec = latest.copy(cellDirs = latest.cellDirs :+ s"$dirName/cells")
      try return TxLog.commit(root, v, render(rec), store)
      catch {
        case e: TxLog.CommitConflict =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fold the accreted shard dirs into one (same content, one `D`
    * line) — run when the shard list outgrows a comfortable manifest,
    * exactly like the catalog's checkpoint records. */
  def compact(spark: SparkSession, root: String,
      store: CommitStore = LinkCommitStore): Long = {
    val recs = listRecords(root)
    require(recs.nonEmpty, s"$root has no committed index")
    val (v, r) = (recs.head._1, parse(Files.readString(recs.head._2).trim))
    val cells = readCellDirs(spark, root, r.cellDirs)
    val dirName = UUID.randomUUID().toString
    // already carries pb; keep the layout by re-partitioning on it
    cells.select(col("vec_id"), col("v"), col("n2"), col("cell"),
        col("pb"))
      .write.partitionBy("pb").parquet(s"$root/data/$dirName/cells")
    TxLog.commit(root, v,
      render(r.copy(cellDirs = Seq(s"$dirName/cells"))), store)
  }

  /** Candidate shortlist for `queries` (quantized frame) against a
    * loaded index: probe the `nprobe` nearest cells per query vector,
    * score only those cells' members, keep the `topK` best by exact
    * cosine. The cells scan is PRUNED to the probed buckets — the
    * bucket set is collected as a ≤ `index.buckets`-element distinct
    * (bounded by P, never by |queries|) and pushed as a partition
    * filter, so a point-lookup ingest reads O(touched buckets), not
    * O(corpus) (PlanSpec pins the partition-filter shape;
    * graft.IvfProbe measures it). */
  def shortlist(index: IvfIndex, queries: DataFrame, nprobe: Int,
      topK: Int): DataFrame = {
    val qp = SimilarityOps.scopedCache(
      SimilarityOps.probeCells(queries, index.centroids, nprobe)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("n2").as("qn2"), col("cell").as("pcell")))
    val probedBuckets = qp
      .select(pmod(col("pcell"), lit(index.buckets.toLong)).cast("int")
        .as("pb"))
      .distinct().collect().map(_.getInt(0)) // ≤ P values by pigeonhole
    val cand = qp.join(
      index.cells.filter(col("pb").isin(probedBuckets.toSeq: _*)),
      col("pcell") === col("cell") && col("vec_id") =!= col("qid"))
    val pairs = cand
      .withColumn("dp", dot("qv", "v"))
      .withColumn("cosine",
        graft.core.asDouble(col("dp")) /
          (sqrt(graft.core.asDouble(col("qn2"))) *
            sqrt(graft.core.asDouble(col("n2")))))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("cosine"), col("vec_id"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("vec_id").as("nid"), col("cosine"),
        col("rn"))
  }

  /** Prune history: keep the newest `keep` records, delete older
    * ones, then delete data dirs no kept record references (mtime
    * older than `graceMs`, protecting an in-flight appender's staged
    * shard) and sweep crash-orphaned dot-files in `_commits`. */
  def vacuum(root: String, keep: Int = 2,
      graceMs: Long = 15 * 60 * 1000L): Unit = {
    val recs = listRecords(root)
    if (recs.isEmpty) return
    val (kept, pruned) = recs.splitAt(math.max(1, keep))
    pruned.foreach { case (_, p) => Files.deleteIfExists(p) }
    val live: Set[String] = kept
      .flatMap { case (_, p) =>
        val r = parse(Files.readString(p).trim)
        (r.centroidDir +: r.cellDirs).map(_.split("/", 2).head)
      }.toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val dataDir = Paths.get(root, "data")
    if (Files.exists(dataDir)) {
      val l = Files.list(dataDir)
      try {
        val it = l.iterator()
        while (it.hasNext) {
          val d = it.next()
          val n = d.getFileName.toString
          if (!live.contains(n) && !n.startsWith(".") &&
              Files.isDirectory(d) && treeMtime(d) <= cutoff)
            Files.walk(d).sorted(java.util.Comparator.reverseOrder())
              .forEach(f => Files.deleteIfExists(f))
        }
      } finally l.close()
    }
    TxLog.sweepDotOrphans(commitsDir(root), cutoff)
    TxLog.sweepDotOrphans(dataDir, cutoff)
  }

  private def treeMtime(p: Path): Long = {
    val s = Files.walk(p)
    try s.mapToLong(f => Files.getLastModifiedTime(f).toMillis)
      .max.orElse(0L)
    finally s.close()
  }
}
