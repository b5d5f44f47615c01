package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{PackageRow, Takedown, TakedownSaga}
import graft.ops.{ArtifactLog, DedupOps, IvfIndexStore,
  MinhashIndexStore, SimilarityOps}

/** The cross-store takedown saga ([[graft.catalog.TakedownSaga]]):
  * durable intent before any member apply, per-store exactly-once via
  * the dedicated `tdtag` replay channel, crash recovery from every
  * interleaving point, and channel independence from the ingest
  * streams' `tag` watermark. */
class TakedownSagaSpec extends SparkTestBase {
  import spark.implicits._

  private val UrlA = "http://x/a.jar"
  private val UrlB = "http://x/b.jar"
  private val tA = "alpha beta gamma delta epsilon zeta eta theta"
  private val tB = "one two three four five six seven eight"

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"sagaspec_$tag").toString

  /** One catalog + one mh index + one ivf index; the takedown
    * subject is (UrlA, doc 1, vec 7) — present in all three. */
  private def builds(tag: String): (String, String, String, String) = {
    val catRoot = freshRoot(s"cat_$tag")
    val pkgs = Seq(
      PackageRow.minimal(UrlA, "maven", "a", Some("1.0"), miningLevel = 50),
      PackageRow.minimal(UrlB, "maven", "b", Some("2.0"), miningLevel = 50))
      .toDF()
    val res = Seq((UrlA, "a/Main.java", "sha-a1"),
      (UrlB, "b/Main.java", "sha-b1"))
      .toDF("download_url", "path", "sha1")
    val idxT = Seq(("sha-a1", UrlA, "a/Main.java"),
      ("sha-b1", UrlB, "b/Main.java"))
      .toDF("sha1", "download_url", "path")
    Takedown.save(catRoot, pkgs, res, idxT,
      idxT.select(col("download_url"), col("path")),
      idxT.select(col("download_url"), col("path")))

    val mhRoot = freshRoot(s"mh_$tag")
    MinhashIndexStore.save(mhRoot, DedupOps.shingleDocs(
      Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")))

    val ivfRoot = freshRoot(s"ivf_$tag")
    val emb = SimilarityOps.quantized(spark, sf001)
    IvfIndexStore.save(ivfRoot, emb, 32)

    val sagaRoot = freshRoot(s"log_$tag")
    (sagaRoot, catRoot, mhRoot, ivfRoot)
  }

  private def subject: DataFrame =
    Seq((UrlA, 1L, 7L)).toDF("download_url", "doc_id", "vec_id")

  private def liveState(catRoot: String, mhRoot: String,
      ivfRoot: String): (Set[String], Set[Long], Set[Long]) = (
    Takedown.load(spark, catRoot).packages
      .select("download_url").collect().map(_.getString(0)).toSet,
    MinhashIndexStore.load(spark, mhRoot).shingles
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet,
    IvfIndexStore.load(spark, ivfRoot).cells
      .filter(col("vec_id") < 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet)

  test("takedownAll: durable intent, all three stores converge, " +
      "completion recorded") {
    val (sagaRoot, catRoot, mhRoot, ivfRoot) = builds("happy")
    val stores = TakedownSaga.Stores(
      Some(catRoot), Some(mhRoot), Some(ivfRoot))
    val id = TakedownSaga.takedownAll(spark, sagaRoot, subject, stores)
    assert(id == 1L)
    val (urls, docs, vecs) = liveState(catRoot, mhRoot, ivfRoot)
    assert(!urls.contains(UrlA) && urls.contains(UrlB))
    assert(!docs.contains(1L) && docs.contains(2L))
    assert(!vecs.contains(7L) && vecs.contains(6L))
    // completion recorded: nothing pending, and a re-run no-ops on
    // every member store (versions unchanged)
    val vCat = ArtifactLog.latest(catRoot, "cat")._1
    val vMh = ArtifactLog.latest(mhRoot, "mh")._1
    val vIvf = ArtifactLog.latest(ivfRoot, "ivf")._1
    assert(TakedownSaga.runPending(spark, sagaRoot).isEmpty)
    assert(ArtifactLog.latest(catRoot, "cat")._1 == vCat)
    assert(ArtifactLog.latest(mhRoot, "mh")._1 == vMh)
    assert(ArtifactLog.latest(ivfRoot, "ivf")._1 == vIvf)
  }

  test("coordinator crash between member applies: recovery finishes " +
      "the remaining stores exactly once") {
    val (sagaRoot, catRoot, mhRoot, ivfRoot) = builds("crash")
    val stores = TakedownSaga.Stores(
      Some(catRoot), Some(mhRoot), Some(ivfRoot))
    TakedownSaga.begin(spark, sagaRoot, subject, stores)
    // crash after the FIRST member (catalog applied, mh/ivf not)
    intercept[IllegalStateException] {
      TakedownSaga.runPending(spark, sagaRoot, crashAfter = 1)
    }
    val (urls1, docs1, vecs1) = liveState(catRoot, mhRoot, ivfRoot)
    assert(!urls1.contains(UrlA), "first member applied before crash")
    assert(docs1.contains(1L) && vecs1.contains(7L),
      "later members untouched by the crash")
    // the catalog's delete committed once; recovery must not double it
    val vCat = ArtifactLog.latest(catRoot, "cat")._1
    assert(TakedownSaga.runPending(spark, sagaRoot) == Seq(1L))
    val (urls2, docs2, vecs2) = liveState(catRoot, mhRoot, ivfRoot)
    assert(!urls2.contains(UrlA) && !docs2.contains(1L) &&
      !vecs2.contains(7L))
    assert(ArtifactLog.latest(catRoot, "cat")._1 == vCat,
      "tdtag watermark must no-op the replayed catalog delete")
    // idempotent again from a clean state
    assert(TakedownSaga.runPending(spark, sagaRoot).isEmpty)
  }

  test("tdtag channel is independent of the ingest streams' tag " +
      "watermark (a high batchId cannot swallow a saga delete)") {
    val (sagaRoot, _, mhRoot, ivfRoot) = builds("channels")
    // a stream batch already committed tag=1000 on the ivf store
    val emb = SimilarityOps.quantized(spark, sf001)
    IvfIndexStore.append(spark, ivfRoot,
      emb.filter(col("vec_id") >= 400), tag = Some(1000L))
    val stores = TakedownSaga.Stores(ann = Some(ivfRoot))
    // saga id 1 ≤ 1000 — on a SHARED channel this delete would no-op
    TakedownSaga.takedownAll(spark, sagaRoot,
      Seq(7L).toDF("vec_id"), stores)
    val vecs = IvfIndexStore.load(spark, ivfRoot).cells
      .filter(col("vec_id") < 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!vecs.contains(7L),
      "saga delete swallowed by the stream tag watermark")
    // and the stream watermark survives the saga commit
    val (_, rec) = ArtifactLog.latest(ivfRoot, "ivf")
    assert(rec.kvMap.get("tag").contains("1000"))
    assert(rec.kvMap.get("tdtag").contains("1"))
    // the ONE-LOG-PER-STORE-SET contract, shown as the hazard it
    // prevents: a SECOND saga log restarts ids at 1, whose delete
    // the store's tdtag watermark (already 1) rightly swallows —
    // watermark idempotence only works when all sagas for a store
    // flow through one monotone log
    val sagaRoot2 = freshRoot("log_channels2")
    TakedownSaga.takedownAll(spark, sagaRoot2,
      Seq(8L).toDF("vec_id"), stores)
    val vecs2 = IvfIndexStore.load(spark, ivfRoot).cells
      .filter(col("vec_id") < 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(vecs2.contains(8L),
      "a foreign saga log's replayed id MUST be swallowed — if this " +
        "fails, watermark idempotence is broken, not fixed")
    // the same takedown through the ORIGINAL log applies fine
    TakedownSaga.takedownAll(spark, sagaRoot,
      Seq(8L).toDF("vec_id"), stores)
    val vecs3 = IvfIndexStore.load(spark, ivfRoot).cells
      .filter(col("vec_id") < 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!vecs3.contains(8L))
  }

  test("streaming takedown feed: each batch is one intent + " +
      "completion; a replayed batch opens no duplicate intent and " +
      "burns no member-store version") {
    val (sagaRoot, catRoot, mhRoot, ivfRoot) = builds("stream")
    val stores = TakedownSaga.Stores(
      Some(catRoot), Some(mhRoot), Some(ivfRoot))

    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TdReq]
    val q = graft.streaming.TakedownStream.run(input.toDF(), sagaRoot,
      stores, Files.createTempDirectory("td_chk").toString)
    try {
      input.addData(TdReq(UrlA, 1L, 7L))
      q.processAllAvailable()
      val (urls, docs, vecs) = liveState(catRoot, mhRoot, ivfRoot)
      assert(!urls.contains(UrlA) && !docs.contains(1L) &&
        !vecs.contains(7L))
      input.addData(TdReq(UrlB, 2L, 8L))
      q.processAllAvailable()
      val (urls2, docs2, vecs2) = liveState(catRoot, mhRoot, ivfRoot)
      assert(!urls2.contains(UrlB) && !docs2.contains(2L) &&
        !vecs2.contains(8L))
    } finally q.stop()

    // the foreachBatch replay contract, driven directly: re-running
    // batch 1 finds its tagged intent committed — no duplicate
    // intent, no member-store version burned
    val sagaRecs = ArtifactLog.list(sagaRoot).size
    val vCat = ArtifactLog.latest(catRoot, "cat")._1
    val vMh = ArtifactLog.latest(mhRoot, "mh")._1
    val vIvf = ArtifactLog.latest(ivfRoot, "ivf")._1
    import spark.implicits._
    graft.streaming.TakedownStream.processBatch(sagaRoot, stores,
      Seq(TdReq(UrlB, 2L, 8L)).toDF(), batchId = 1L)
    assert(ArtifactLog.list(sagaRoot).size == sagaRecs)
    assert(ArtifactLog.latest(catRoot, "cat")._1 == vCat)
    assert(ArtifactLog.latest(mhRoot, "mh")._1 == vMh)
    assert(ArtifactLog.latest(ivfRoot, "ivf")._1 == vIvf)
  }

  test("begin validates the id columns against the roster") {
    val (sagaRoot, catRoot, _, _) = builds("cols")
    intercept[IllegalArgumentException] {
      TakedownSaga.begin(spark, sagaRoot, Seq(1L).toDF("doc_id"),
        TakedownSaga.Stores(catalog = Some(catRoot)))
    }
  }
}

/** One takedown request for the streaming feed. */
case class TdReq(download_url: String, doc_id: Long, vec_id: Long)
