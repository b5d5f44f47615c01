package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, MinhashIndexStore}

/** The persisted MinHash/LSH dedup index
  * ([[graft.ops.MinhashIndexStore]]): loaded-verdict equivalence with
  * the in-memory incremental plan, provenance-tagged classification
  * (no doc_id%5 reliance), O(shard) append, time travel + retention,
  * pruned-scan plan pins for BOTH tables, and compact equivalence.
  * CAS serialization and the orphan sweep are the shared
  * [[graft.ops.ArtifactLog]] machinery, proven in IvfIndexSpec. */
class MinhashIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"mhspec_$tag").toString

  private val tA = "alpha beta gamma delta epsilon zeta eta theta"
  private val tB = "one two three four five six seven eight"
  private val tC = "red orange yellow green blue indigo violet ultra"

  private def shingled(rows: Seq[(Long, String)]): DataFrame =
    DedupOps.shingleDocs(rows.toDF("doc_id", "text"))

  test("verdicts on the LOADED index equal incrementalVerdicts on " +
      "the same corpus∪shard frame (seeded cohorts, all 3 verdicts)") {
    // corpus: 1=tA, 2=tB; shard: 5=tA (dup of corpus 1), 10=tC
    // (admitted), 15=tC (dup of earlier shard 10), 20=tA (jaccard tie
    // corpus 1 vs shard 5 → min witness id wins → corpus 1)
    val all = Seq((1L, tA), (2L, tB),
      (5L, tA), (10L, tC), (15L, tC), (20L, tA))
    val docs = shingled(all)
    val root = freshRoot("verdicts")
    MinhashIndexStore.save(root, docs.filter(col("doc_id") % 5 =!= 0))
    val idx = MinhashIndexStore.load(spark, root)
    val got = MinhashIndexStore
      .verdicts(idx, docs.filter(col("doc_id") % 5 === 0))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    val mem = DedupOps.incrementalVerdicts(docs)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == mem, s"store $got vs in-memory $mem")
    assert(got == Seq(
      (5L, "dup_corpus", 1L),
      (10L, "admitted", -1L),
      (15L, "dup_increment", 10L),
      (20L, "dup_corpus", 1L)))
    DedupOps.releaseCaches()
  }

  test("verdicts on the sf0.001 documents equal the registered " +
      "d_incremental_dedup output row-for-row") {
    val got = Registry.byName("d_dedup_index_lifecycle")
      .run(spark, sf001).collect().map(_.toString).toSeq
    val mem = Registry.byName("d_incremental_dedup")
      .run(spark, sf001).collect().map(_.toString).toSeq
    assert(got == mem)
    DedupOps.releaseCaches()
  }

  test("classification uses candidate provenance, not doc_id % 5: " +
      "an id scheme where %5 lies still classifies correctly") {
    // corpus ids 100, 105 (105 % 5 == 0 — would look like an
    // 'increment' doc to the %5 convention); shard ids 7, 13
    val docs = shingled(Seq((100L, tA), (105L, tB), (7L, tA), (13L, tB)))
    val root = freshRoot("prov")
    MinhashIndexStore.save(root,
      docs.filter(col("doc_id") >= 100L))
    val idx = MinhashIndexStore.load(spark, root)
    val got = MinhashIndexStore
      .verdicts(idx, docs.filter(col("doc_id") < 100L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((7L, "dup_corpus", 100L),
      (13L, "dup_corpus", 105L)), s"got $got")
    DedupOps.releaseCaches()
  }

  test("append stages O(shard) — one new dir pair holding only the " +
      "shard's rows — and the loaded index sees the union") {
    val corpus = shingled(Seq((1L, tA), (2L, tB)))
    val shard = shingled(Seq((7L, tC)))
    val root = freshRoot("append")
    MinhashIndexStore.save(root, corpus)
    val v2 = MinhashIndexStore.append(spark, root, shard)
    assert(v2 == 2L)
    val dirs = Files.list(Paths.get(root, "data")).iterator()
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    while (dirs.hasNext) names += dirs.next().getFileName.toString
    assert(names.size == 2, s"data dirs: $names")
    val idx = MinhashIndexStore.load(spark, root)
    assert(idx.bands.select("doc_id").distinct().count() == 3)
    assert(idx.shingles.count() == 3)
    // a second shard now collides with the FIRST shard's appended
    // bands — the index accretes
    val got = MinhashIndexStore.verdicts(idx, shingled(Seq((9L, tC))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((9L, "dup_corpus", 7L)), s"got $got")
    DedupOps.releaseCaches()
  }

  test("time travel + retention: v1 lacks the shard; vacuum(keep=1) " +
      "makes it unreadable; compact preserves content") {
    val corpus = shingled(Seq((1L, tA), (2L, tB)))
    val root = freshRoot("travel")
    MinhashIndexStore.save(root, corpus)
    MinhashIndexStore.append(spark, root, shingled(Seq((7L, tC))))
    assert(MinhashIndexStore.loadAt(spark, root, 1L)
      .shingles.count() == 2)
    val v3 = MinhashIndexStore.compact(spark, root)
    val rec = Files.readString(
      Paths.get(root, "_commits", f"v$v3%020d")).trim
    assert(rec.linesIterator.count(_.startsWith("B\t")) == 1)
    assert(rec.linesIterator.count(_.startsWith("S\t")) == 1)
    assert(MinhashIndexStore.load(spark, root).shingles.count() == 3)
    MinhashIndexStore.vacuum(root, keep = 1, graceMs = 0L)
    val e = intercept[IllegalArgumentException](
      MinhashIndexStore.loadAt(spark, root, 1L))
    assert(e.getMessage.contains("retained window"))
    assert(MinhashIndexStore.load(spark, root).shingles.count() == 3)
  }

  // Sliding windows over v0t1..v0t36 (24 shingles each): A=1-26,
  // B=11-36 share 14 shingles (J=0.41 — below threshold, separate
  // clusters); bridge C=6-31 shares 19 with EACH (J≈0.66 ≥ 0.5 —
  // verified edge to both). Jaccard is a metric, so a bridge can't
  // sit much closer to two <0.5-apart docs — J≈0.66 is inside the
  // borderline band-hit regime (~80%/pair), and the first test PINS
  // that the fixed minhash collides both bridge pairs and not A-B
  // for exactly these tokens (empirically selected; deterministic —
  // if it passes once, it passes forever).
  private val w = (1 to 36).map(i => s"v0t$i")
  private val dA = w.slice(0, 26).mkString(" ")
  private val dB = w.slice(10, 36).mkString(" ")
  private val dC = w.slice(5, 31).mkString(" ")

  test("labeled ingest: a bridge shard doc merges two corpus " +
      "clusters through the forwarding map, never a corpus rewrite") {
    val fixture = shingled(Seq((2L, dA), (3L, dB), (5L, dC)))
    // the construction only works if the banded LSH surfaces both
    // bridge pairs and not the A-B pair — pin it before relying on it
    val pairs = DedupOps.lshVerifiedPairs(fixture)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs == Set((2L, 5L), (3L, 5L)),
      s"LSH pair set drifted: $pairs — adjust the w-token construction")

    val corpus = fixture.filter(col("doc_id") < 5L)
    val corpusLabels = graft.ops.ConnectedComponents.labels(
      corpus.select("doc_id"),
      DedupOps.lshVerifiedPairs(corpus)
        .select(col("d1").as("u"), col("d2").as("v")))
    val root = freshRoot("bridge")
    MinhashIndexStore.save(root, corpus, Some(corpusLabels))
    MinhashIndexStore.ingestLabeled(spark, root,
      fixture.filter(col("doc_id") === 5L))
    val idx = MinhashIndexStore.load(spark, root)
    val got = MinhashIndexStore.resolvedLabels(idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 2L), (3L, 2L), (5L, 2L)), s"got $got")
    // the merge is a forwarding entry, not a relabel: cluster 3's
    // label-at-write row still says 3
    assert(idx.labels0.get.filter(col("doc_id") === 3L)
      .head().getAs[Long]("cid0") == 3L)
    assert(idx.forward.get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((3L, 2L)))
    DedupOps.releaseCaches()
  }

  test("chained merges keep the forwarding map single-hop (path " +
      "compression), and compact flushes it into the labels") {
    val fixture = shingled(Seq((2L, dA), (3L, dB), (5L, dC), (1L, dA)))
    val corpus = fixture.filter(col("doc_id").isin(2L, 3L))
    val corpusLabels = graft.ops.ConnectedComponents.labels(
      corpus.select("doc_id"),
      DedupOps.lshVerifiedPairs(corpus)
        .select(col("d1").as("u"), col("d2").as("v")))
    val root = freshRoot("chain")
    MinhashIndexStore.save(root, corpus, Some(corpusLabels))
    // ingest 1: bridge 5 merges {2} and {3} → forward 3→2
    MinhashIndexStore.ingestLabeled(spark, root,
      fixture.filter(col("doc_id") === 5L))
    // ingest 2: doc 1 (= A, smaller id) lowers the merged cluster's
    // minimum → 2→1, and the OLD entry must re-point 3→1 directly
    MinhashIndexStore.ingestLabeled(spark, root,
      fixture.filter(col("doc_id") === 1L))
    val idx = MinhashIndexStore.load(spark, root)
    val fwd = idx.forward.get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fwd == Set((3L, 1L), (2L, 1L)), s"forward not single-hop: $fwd")
    val got = MinhashIndexStore.resolvedLabels(idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 1L)))
    // compact = path-compression flush: labels carry the resolved
    // ids, forward resets to empty, resolution unchanged
    MinhashIndexStore.compact(spark, root)
    val cIdx = MinhashIndexStore.load(spark, root)
    assert(cIdx.forward.get.count() == 0)
    assert(MinhashIndexStore.resolvedLabels(cIdx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == got)
    // a bare append on a labeled index is refused
    val e = intercept[IllegalArgumentException](
      MinhashIndexStore.append(spark, root, shingled(Seq((9L, tC)))))
    assert(e.getMessage.contains("ingestLabeled"))
    DedupOps.releaseCaches()
  }

  test("a labeled ingest losing the CAS throws CommitConflict with " +
      "the index unchanged, and vacuum sweeps its staged dirs") {
    val fixture = shingled(Seq((2L, dA), (3L, dB), (5L, dC)))
    val corpus = fixture.filter(col("doc_id").isin(2L, 3L))
    val corpusLabels = graft.ops.ConnectedComponents.labels(
      corpus.select("doc_id"),
      DedupOps.lshVerifiedPairs(corpus)
        .select(col("d1").as("u"), col("d2").as("v")))
    val root = freshRoot("conflict")
    MinhashIndexStore.save(root, corpus, Some(corpusLabels))
    val before = MinhashIndexStore
      .resolvedLabels(MinhashIndexStore.load(spark, root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // interleave a competing commit between this ingest's staging
    // and its CAS — the labeled path must FAIL, not rebase (it
    // resolved witnesses against a now-stale version)
    intercept[graft.catalog.TxLog.CommitConflict] {
      MinhashIndexStore.ingestLabeled(spark, root,
        fixture.filter(col("doc_id") === 5L),
        preCommitHook = v => graft.catalog.TxLog.commit(root, v,
          "#mh interloper — any content claims the slot"))
    }
    // the index still reads at the interloper-free content: version
    // advanced by the interloper only, labels unchanged via v2-1
    val after = MinhashIndexStore
      .resolvedLabels(MinhashIndexStore.loadAt(spark, root, 1L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
    // the loser's staged dir family (bands/shingles/labels/forward
    // under one uuid) is unreferenced — an aged vacuum sweeps it.
    // Drop the interloper's record first (the operator's recovery
    // step for a poisoned slot), then vacuum against v1.
    val dataDir = Paths.get(root, "data")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600 * 1000L)
    Files.list(dataDir).forEach(d =>
      Files.walk(d).forEach(p => Files.setLastModifiedTime(p, old)))
    Files.delete(Paths.get(root, "_commits", f"v${2L}%020d"))
    MinhashIndexStore.vacuum(root, keep = 1, graceMs = 60 * 1000L)
    val left = {
      val l = Files.list(dataDir).iterator()
      val b = scala.collection.mutable.Set.empty[String]
      while (l.hasNext) b += l.next().getFileName.toString
      b.toSet
    }
    // v1 references TWO top-level dirs (the corpus family + the
    // forwarding map's own uuid); the loser's two staged dirs are gone
    assert(left.size == 2, s"loser's staged dirs must be swept: $left")
    assert(MinhashIndexStore
      .resolvedLabels(MinhashIndexStore.load(spark, root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == before)
    DedupOps.releaseCaches()
  }

  test("an untagged labeled ingest PRESERVES the streaming replay " +
      "tag, and a shard doc already in the index never witnesses " +
      "itself (the at-least-once replay pair)") {
    val fixture = shingled(Seq((2L, dA), (3L, dB), (5L, dC)))
    val corpus = fixture.filter(col("doc_id").isin(2L, 3L))
    val corpusLabels = graft.ops.ConnectedComponents.labels(
      corpus.select("doc_id"),
      DedupOps.lshVerifiedPairs(corpus)
        .select(col("d1").as("u"), col("d2").as("v")))
    val root = freshRoot("replaytag")
    MinhashIndexStore.save(root, corpus, Some(corpusLabels))
    val shard = fixture.filter(col("doc_id") === 5L)
    // a streaming batch commits tag=7
    MinhashIndexStore.ingestLabeled(spark, root, shard,
      tag = Some(7L))
    // an interleaved AD-HOC ingest (no tag) must not erase tag=7 —
    // otherwise the stream's crash-replay of batch 7 re-ingests
    MinhashIndexStore.ingestLabeled(spark, root,
      shingled(Seq((9L, tC))))
    val v = MinhashIndexStore.latestVersion(root)._1
    val replay = MinhashIndexStore.ingestLabeled(spark, root, shard,
      tag = Some(7L))
    assert(replay == v, "replayed batch 7 must still no-op")
    // the verdict path after an append-then-replay: doc 5 is IN the
    // index now, and a re-run of its verdicts must not report it as
    // a jaccard-1.0 duplicate of itself
    val idx = MinhashIndexStore.load(spark, root)
    val again = MinhashIndexStore.verdicts(idx, shard)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(again.forall { case (d, _, w) => w != d },
      s"self-witness leaked: $again")
    DedupOps.releaseCaches()
  }

  test("compact on an EMPTY labeled index (from-scratch stream, " +
      "compacted before its first batch) keeps the root readable") {
    val root = freshRoot("emptycompact")
    val empty = shingled(Seq.empty)
    MinhashIndexStore.save(root, empty,
      Some(empty.select(col("doc_id"), col("doc_id").as("cluster_id"))))
    MinhashIndexStore.compact(spark, root)
    val idx = MinhashIndexStore.load(spark, root)
    assert(idx.shingles.count() == 0 && idx.bands.count() == 0)
    // and the index still bootstraps after the premature compact
    MinhashIndexStore.ingestLabeled(spark, root,
      shingled(Seq((2L, dA))))
    assert(MinhashIndexStore
      .resolvedLabels(MinhashIndexStore.load(spark, root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 2L)))
    DedupOps.releaseCaches()
  }

  test("incremental labels equal the registered full-CC query on " +
      "the sf0.001 documents row-for-row") {
    val got = Registry.byName("d_cluster_index_incremental")
      .run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = Registry.byName("d_dedup_clusters")
      .run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == full)
    DedupOps.releaseCaches()
  }

  private def labeledRoot(tag: String, docs: DataFrame): String = {
    val labels = graft.ops.ConnectedComponents.labels(
      docs.select("doc_id"),
      DedupOps.lshVerifiedPairs(docs)
        .select(col("d1").as("u"), col("d2").as("v")))
    val root = freshRoot(tag)
    MinhashIndexStore.save(root, docs, Some(labels))
    root
  }

  private def resolved(root: String): Set[(Long, Long)] =
    MinhashIndexStore
      .resolvedLabels(MinhashIndexStore.load(spark, root))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("deleting a BRIDGE doc splits its cluster: touched survivors " +
      "re-label via subgraph CC, O(touched) staged, splits exact") {
    // {2=dA, 3=dB, 5=dC}: 5 bridges 2 and 3 (pinned fixture above) →
    // one cluster with min id 2. Deleting 5 must split it into the
    // singletons {2} and {3} — the case no forwarding entry can
    // express.
    val fixture = shingled(Seq((2L, dA), (3L, dB), (5L, dC)))
    val root = labeledRoot("split", fixture)
    assert(resolved(root) == Set((2L, 2L), (3L, 2L), (5L, 2L)))
    val v2 = MinhashIndexStore.delete(spark, root,
      Seq(5L).toDF("doc_id"))
    assert(v2 == 2L)
    assert(resolved(root) == Set((2L, 2L), (3L, 3L)),
      "bridge delete must SPLIT the component")
    val idx = MinhashIndexStore.load(spark, root)
    // band/shingle rows of the deleted doc are invisible
    assert(idx.bands.filter(col("doc_id") === 5L).count() == 0)
    assert(idx.shingles.filter(col("doc_id") === 5L).count() == 0)
    // a re-submission of the deleted CONTENT is admitted against the
    // post-delete index only where content still matches: dC is a
    // near-dup of BOTH surviving docs, so it witnesses the smaller id
    // — but never the deleted doc 5
    val got = MinhashIndexStore.verdicts(idx, shingled(Seq((9L, dC))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((9L, "dup_corpus", 2L)), s"got $got")
    // O(touched) on the files: the delete staged tombs + fresh
    // labels/members + replaced forward — never a bands/shingles
    // rewrite (the save dir plus one delete dir family)
    val dirs = Files.list(Paths.get(root, "data")).iterator()
    var nBands = 0
    while (dirs.hasNext) {
      val d = dirs.next()
      if (Files.exists(d.resolve("bands"))) nBands += 1
    }
    assert(nBands == 1, "delete must not stage band/shingle dirs")
    // pre-delete version still time-travels complete
    assert(MinhashIndexStore.loadAt(spark, root, 1L)
      .shingles.count() == 3)
    DedupOps.releaseCaches()
  }

  test("delete after a forwarded merge drops the stale forwarding " +
      "entry; deleting a NON-bridge member keeps the rest together") {
    // merge first: corpus {2,3}, bridge 5 ingested → fwd 3→2
    val fixture = shingled(Seq((2L, dA), (3L, dB), (5L, dC)))
    val root = labeledRoot("fwdclean",
      fixture.filter(col("doc_id").isin(2L, 3L)))
    MinhashIndexStore.ingestLabeled(spark, root,
      fixture.filter(col("doc_id") === 5L))
    assert(resolved(root) == Set((2L, 2L), (3L, 2L), (5L, 2L)))
    // deleting the bridge again splits — and the 3→2 forwarding entry
    // must die with the recompute (a surviving hop would resolve 3
    // back into the dead merge)
    MinhashIndexStore.delete(spark, root, Seq(5L).toDF("doc_id"))
    assert(resolved(root) == Set((2L, 2L), (3L, 3L)))
    assert(MinhashIndexStore.load(spark, root).forward.get.count() == 0)

    // inverse case: delete an ORDINARY member (3 — connected only to
    // the bridge); 2 and 5 stay connected (J(dA,dC)≈0.66)
    val root2 = labeledRoot("member", fixture)
    MinhashIndexStore.delete(spark, root2, Seq(3L).toDF("doc_id"))
    assert(resolved(root2) == Set((2L, 2L), (5L, 2L)),
      "non-bridge delete must keep the remaining cluster intact")

    // deleting the cluster MINIMUM re-mints the cluster id
    val root3 = labeledRoot("minup", fixture)
    MinhashIndexStore.delete(spark, root3, Seq(2L).toDF("doc_id"))
    assert(resolved(root3) == Set((3L, 3L), (5L, 3L)),
      "deleting the min doc must re-mint the cluster id")
    DedupOps.releaseCaches()
  }

  test("delete: replay tag no-ops, empty id set is a no-op, compact " +
      "folds tombstones physically, and unlabeled indexes just " +
      "tombstone") {
    val fixture = shingled(Seq((2L, dA), (3L, dB), (5L, dC)))
    val root = labeledRoot("dreplay", fixture)
    val v2 = MinhashIndexStore.delete(spark, root,
      Seq(5L).toDF("doc_id"), tag = Some(3L))
    // crash-replay of the takedown batch no-ops
    assert(MinhashIndexStore.delete(spark, root,
      Seq(5L).toDF("doc_id"), tag = Some(3L)) == v2)
    // an empty id set burns no version
    assert(MinhashIndexStore.delete(spark, root,
      Seq.empty[Long].toDF("doc_id")) == v2)
    // compact: T lines dropped, deleted rows physically gone, labels
    // fold to the resolved post-split state, resolution unchanged
    val before = resolved(root)
    val v3 = MinhashIndexStore.compact(spark, root)
    val rec = Files.readString(
      Paths.get(root, "_commits", f"v$v3%020d")).trim
    assert(!rec.linesIterator.exists(_.startsWith("T\t")))
    assert(resolved(root) == before)
    val idx = MinhashIndexStore.load(spark, root)
    assert(idx.shingles.count() == 2)
    val bandsDir = rec.linesIterator
      .find(_.startsWith("B\t")).get.drop(2)
    assert(spark.read.parquet(s"$root/data/$bandsDir")
      .filter(col("doc_id") === 5L).count() == 0,
      "folded band files must physically exclude the deleted doc")

    // unlabeled index: delete is just the tombstone (filters verdicts)
    val root2 = freshRoot("unlab")
    MinhashIndexStore.save(root2, fixture)
    MinhashIndexStore.delete(spark, root2, Seq(2L).toDF("doc_id"))
    val got = MinhashIndexStore.verdicts(
      MinhashIndexStore.load(spark, root2), shingled(Seq((9L, dA))))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // dA's only surviving near-dup is the bridge 5 (dC, J≈0.66)
    assert(got == Seq((9L, "dup_corpus", 5L)), s"got $got")
    DedupOps.releaseCaches()
  }

  test("resolved labels after delete equal the registered " +
      "from-scratch CC over the surviving sf0.001 documents") {
    val got = Registry.byName("d_dedup_index_delete")
      .run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // from-scratch twin on the surviving docs only — recompute, not
    // the memoized full-corpus frame
    val docs = DedupOps.shingleDocs(
      graft.core.t(spark, sf001, "documents")
        .filter(col("doc_id") % 7 =!= 0)
        .select("doc_id", "text"))
    val full = graft.ops.ConnectedComponents.labels(
      docs.select("doc_id"),
      DedupOps.lshVerifiedPairs(docs)
        .select(col("d1").as("u"), col("d2").as("v")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == full)
    DedupOps.releaseCaches()
  }

  test("both artifact scans are PARTITION-PRUNED in the verdict " +
      "plan: pb on bands, qb on shingles") {
    val docs = shingled(Seq((1L, tA), (2L, tB), (5L, tA)))
    val root = freshRoot("prune")
    MinhashIndexStore.save(root, docs.filter(col("doc_id") % 5 =!= 0))
    val idx = MinhashIndexStore.load(spark, root)
    val out = MinhashIndexStore
      .verdicts(idx, docs.filter(col("doc_id") % 5 === 0))
    val plan = out.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pb[^\\]]*\\]".r
        .findFirstIn(plan).isDefined,
      s"bands scan must carry a pb partition filter:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*qb[^\\]]*\\]".r
        .findFirstIn(plan).isDefined,
      s"shingles scan must carry a qb partition filter:\n$plan")
    assert(out.count() == 1)
    DedupOps.releaseCaches()
  }
}
