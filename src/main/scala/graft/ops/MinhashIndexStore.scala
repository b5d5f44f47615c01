package graft.ops

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.catalog.{CommitStore, LinkCommitStore, TxLog}
import graft.ops.ArtifactLog.Rec

/** The persisted MinHash/LSH dedup index — the dedup-side mirror of
  * [[IvfIndexStore]] and the artifact `d_incremental_dedup` could
  * only simulate in-plan (its scaladoc calls the corpus band frame
  * "exactly the persisted index a deployment maintains between
  * ingests"; this store maintains it). Two tables per version:
  *
  * {{{
  *   root/_commits/v<20-digit>       #mh bands=8 rows=4 p=.. q=..
  *   root/data/<uuid>/bands/         (doc_id, band_idx, band_hash, pb)
  *   root/data/<uuid>/shingles/      (doc_id, sh, qb)
  * }}}
  *
  * `bands` is the LSH bucket structure the candidate join probes;
  * `shingles` keeps each corpus doc's distinct 3-token shingle set so
  * the exact-Jaccard verify can re-attach WITNESS content without the
  * raw corpus (the signature-store shape of production dedup
  * services). Both are hash-bucketed Hive partitions —
  * `pb = band_hash % P`, `qb = doc_id % Q` — and [[verdicts]]
  * collects the ≤P / ≤Q DISTINCT touched buckets (bounded by the
  * bucket counts, never by shard size) and pushes them as partition
  * filters: a small shard's ingest reads the buckets its band hashes
  * land in plus the shingle buckets of its COLLIDING corpus docs, not
  * the corpus (graft.DedupIndexProbe measures both reads
  * flat-vs-corpus). Records, CAS commits, append/compact/vacuum and
  * time travel are the shared [[ArtifactLog]] machinery — identical
  * protocol to the catalog and the IVF store.
  *
  * Exactness: [[verdicts]] on a LOADED index is row-identical to
  * [[DedupOps.incrementalVerdicts]] on the same corpus∪shard frame
  * (MinhashIndexSpec), and `d_dedup_index_lifecycle` gates the whole
  * save → load → probe → verify path against `d_incremental_dedup`'s
  * DuckDB oracle — a band hash that drifted through the parquet
  * roundtrip surfaces as a missed witness and hash-fails.
  */
object MinhashIndexStore {

  /** A loaded index version. Both frames carry their bucket column. */
  final case class MinhashIndex(version: Long, bandBuckets: Int,
      shingleBuckets: Int, bands: DataFrame, shingles: DataFrame)

  private val Kind = "mh"

  /** ~256 docs per bucket: pruning selectivity is
    * min(1, shard_hashes / P), so buckets must OUTNUMBER a shard's
    * ~8×|shard| band hashes for the pruned scan to skip anything —
    * the first probe run used ~2048 docs/bucket and a 50-doc shard
    * touched every bucket (graft.DedupIndexProbe's A/B caught it).
    * The 65536 cap bounds the dir count at object-store scale
    * (10⁹ docs → 65536 buckets of ~15k docs; a 400-hash shard still
    * prunes to 0.6%); floor of 8 keeps tiny test indexes
    * multi-bucket so the pruned path is always ENGAGED. */
  def defaultBuckets(nDocs: Long): Int =
    math.min(65536L, math.max(8L, nDocs / 256L)).toInt

  private def mkRec(p: Int, q: Int, dirs: Seq[(String, String)]): Rec =
    Rec(Seq("bands" -> "8", "rows" -> "4", "p" -> p.toString,
      "q" -> q.toString), dirs)

  private def readDirs(spark: SparkSession, root: String,
      dirs: Seq[String]): DataFrame =
    dirs.sorted
      .map(d => spark.read.option("basePath", s"$root/data/$d")
        .parquet(s"$root/data/$d"))
      .reduce(_ unionByName _)

  private def writeShard(shingled: DataFrame, p: Int, q: Int,
      dir: String): Unit = {
    DedupOps.bandFrame(shingled)
      .withColumn("pb",
        pmod(col("band_hash").cast("long"), lit(p.toLong)).cast("int"))
      .write.partitionBy("pb").parquet(s"$dir/bands")
    shingled.select(col("doc_id"), col("sh"),
        pmod(col("doc_id"), lit(q.toLong)).cast("int").as("qb"))
      .write.partitionBy("qb").parquet(s"$dir/shingles")
  }

  /** Index `corpus` (a [[DedupOps.shingleDocs]]-shaped frame:
    * doc_id, sh) and commit version 1. */
  def save(root: String, corpus: DataFrame,
      store: CommitStore = LinkCommitStore): Long = {
    TxLog.init(root)
    val n = corpus.count()
    val (p, q) = (defaultBuckets(n), defaultBuckets(n))
    val dirName = UUID.randomUUID().toString
    writeShard(corpus, p, q, s"$root/data/$dirName")
    val rec = mkRec(p, q,
      Seq("B" -> s"$dirName/bands", "S" -> s"$dirName/shingles"))
    val v = ArtifactLog.list(root).headOption.map(_._1).getOrElse(0L)
    ArtifactLog.commit(root, Kind, v, rec, store)
  }

  def load(spark: SparkSession, root: String): MinhashIndex = {
    val recs = ArtifactLog.list(root)
    require(recs.nonEmpty, s"$root has no committed index")
    loadAt(spark, root, recs.head._1)
  }

  /** Time travel: the index as of `version` (full-manifest records —
    * any retained version reads directly). */
  def loadAt(spark: SparkSession, root: String, version: Long)
      : MinhashIndex = {
    val r = ArtifactLog.recordAt(root, Kind, version)
    MinhashIndex(version, r.kvMap("p").toInt, r.kvMap("q").toInt,
      readDirs(spark, root, r.dirsOf("B")),
      readDirs(spark, root, r.dirsOf("S")))
  }

  /** O(shard) ingest commit: band + shingle rows for the ADMITTED
    * shard docs only (a deployment appends what [[verdicts]] admits;
    * appending the full shard is the caller's choice), staged as one
    * new dir pair and CAS-appended with rebase-on-conflict. The
    * corpus dirs are never read or rewritten. */
  def append(spark: SparkSession, root: String, shard: DataFrame,
      store: CommitStore = LinkCommitStore, maxRetries: Int = 10): Long = {
    val (_, head) = ArtifactLog.latest(root, Kind)
    val (p, q) = (head.kvMap("p").toInt, head.kvMap("q").toInt)
    val dirName = UUID.randomUUID().toString
    writeShard(shard, p, q, s"$root/data/$dirName")
    var attempt = 0
    while (true) {
      val (v, latest) = ArtifactLog.latest(root, Kind)
      require(latest.kv == head.kv,
        "concurrent commit replaced the index structure (a save raced " +
          "this append); re-run against the new index")
      val rec = Rec(latest.kv, latest.dirs ++
        Seq("B" -> s"$dirName/bands", "S" -> s"$dirName/shingles"))
      try return ArtifactLog.commit(root, Kind, v, rec, store)
      catch {
        case e: TxLog.CommitConflict =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fold the accreted shard dirs into one pair (same content). */
  def compact(spark: SparkSession, root: String,
      store: CommitStore = LinkCommitStore): Long = {
    val (v, r) = ArtifactLog.latest(root, Kind)
    val dirName = UUID.randomUUID().toString
    readDirs(spark, root, r.dirsOf("B"))
      .write.partitionBy("pb").parquet(s"$root/data/$dirName/bands")
    readDirs(spark, root, r.dirsOf("S"))
      .write.partitionBy("qb").parquet(s"$root/data/$dirName/shingles")
    ArtifactLog.commit(root, Kind, v, Rec(r.kv,
      Seq("B" -> s"$dirName/bands", "S" -> s"$dirName/shingles")), store)
  }

  /** Incremental dedup verdicts for a shingled `shard` against a
    * loaded index — [[DedupOps.incrementalVerdicts]] with the corpus
    * side served by the artifact:
    *
    *   1. shard bands probe the index's band table PRUNED to the ≤P
    *      buckets the shard's band hashes land in (corpus candidates),
    *      plus the within-shard first-seen-wins self-join;
    *   2. the exact-Jaccard verify re-attaches witness shingles from
    *      the index PRUNED to the ≤Q buckets of colliding corpus docs
    *      (non-colliding corpus docs — the overwhelming majority —
    *      are never read);
    *   3. verdicts: `dup_corpus` (witness in the index) /
    *      `dup_increment` (witness earlier in the shard) / `admitted`,
    *      max-Jaccard witness with ties to the smallest witness id —
    *      the provenance TAG replaces `incrementalVerdicts`' doc_id%5
    *      convention, so the store works for any id scheme.
    */
  def verdicts(index: MinhashIndex, shard: DataFrame,
      prune: Boolean = true): DataFrame = {
    val incB = DedupOps.scopedCache(DedupOps.bandFrame(shard))
    val probed =
      if (!prune) Array.empty[Int] // A/B leg for graft.DedupIndexProbe
      else incB
        .select(pmod(col("band_hash").cast("long"),
          lit(index.bandBuckets.toLong)).cast("int").as("pb"))
        .distinct().collect().map(_.getInt(0)) // ≤ P by pigeonhole
    val corpusCand = incB.alias("b")
      .join((if (prune) index.bands.filter(
          col("pb").isin(probed.toSeq: _*))
        else index.bands).alias("a"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        lit("corpus").as("src"))
    val withinShard = incB.alias("a").join(incB.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        lit("increment").as("src"))
    // d1 provenance is disjoint (index docs vs shard docs), so the
    // tag survives the pair-level dedup
    val cand = DedupOps.scopedCache(
      corpusCand.unionByName(withinShard).dropDuplicates("d1", "d2"))
    val candBuckets =
      if (!prune) Array.empty[Int]
      else cand
        .select(pmod(col("d1"), lit(index.shingleBuckets.toLong))
          .cast("int").as("qb"))
        .distinct().collect().map(_.getInt(0)) // ≤ Q by pigeonhole
    val witnessSh = (if (prune) index.shingles
        .filter(col("qb").isin(candBuckets.toSeq: _*))
      else index.shingles)
      .select(col("doc_id"), col("sh"))
    val allSh = witnessSh.unionByName(shard.select("doc_id", "sh"))
    val wBest = Window.partitionBy("d2")
      .orderBy(desc("jaccard"), col("d1"))
    val best = DedupOps.verifyPairs(allSh, cand.select("d1", "d2"))
      .join(cand, Seq("d1", "d2"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("d2").as("doc_id"), col("d1").as("dup_of"),
        col("jaccard"), col("src"))
    shard.select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNull, lit("admitted"))
          .when(col("src") === "increment", lit("dup_increment"))
          .otherwise(lit("dup_corpus")).as("verdict"),
        col("dup_of"), col("jaccard"))
      .orderBy("doc_id")
  }

  /** Prune history (shared [[ArtifactLog]] sweep: kept records pin
    * their dirs, the grace window protects in-flight staging, aged
    * dot-orphans go). */
  def vacuum(root: String, keep: Int = 2,
      graceMs: Long = 15 * 60 * 1000L): Unit =
    ArtifactLog.vacuum(root, Kind, keep, graceMs)
}
