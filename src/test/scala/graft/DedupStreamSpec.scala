package graft

import graft.ops.DedupOps
import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incremental half of `d_stream_dedup`: the bucket-keyed
  * streaming candidate machine must emit exactly the batch band-join's
  * candidate set across micro-batch boundaries, and the downstream
  * verify + first-seen-wins decision must reproduce the registered
  * batch query row-for-row.
  */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs =
    DedupOps.shingleDocs(
      core.t(spark, sf001, "documents").select("doc_id", "text")).cache()

  private lazy val bands = DedupOps.bandFrame(docs)
    .as[StreamDedup.BandRow].collect().toSeq

  test("streamed LSH candidates equal the batch band join, " +
      "split across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDedup.BandRow]
    val q = StreamDedup.candidates(input.toDS())
      .writeStream.format("memory").queryName("stream_cands")
      .outputMode("append").start()
    try {
      // three arrival waves — candidate pairs MUST span wave
      // boundaries through the bucket state, not only within a batch
      val waves = Seq(
        bands.filter(_.doc_id < 166),
        bands.filter(r => r.doc_id >= 166 && r.doc_id < 333),
        bands.filter(_.doc_id >= 333))
      waves.foreach { w =>
        input.addData(w)
        q.processAllAvailable()
      }
      val streamed = spark.table("stream_cands")
        .select("d1", "d2").distinct()
        .as[(Long, Long)].collect().toSet

      val b = DedupOps.bandFrame(docs)
      val batch = b.alias("a").join(b.alias("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct().as[(Long, Long)].collect().toSet

      assert(streamed.nonEmpty)
      assert(streamed === batch)

      // cross-wave pairs exist — the state carried between batches
      assert(streamed.exists { case (d1, d2) => d1 < 166 && d2 >= 166 })
    } finally q.stop()
  }

  test("incremental verify + first-seen-wins equals d_stream_dedup") {
    // exact-Jaccard verify of the streamed candidates, computed
    // independently in plain Scala over the collected shingle sets (an
    // oracle-style cross-check, not the query's own join code)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDedup.BandRow]
    val q = StreamDedup.candidates(input.toDS())
      .writeStream.format("memory").queryName("stream_cands2")
      .outputMode("append").start()
    val pairs =
      try {
        input.addData(bands)
        q.processAllAvailable()
        spark.table("stream_cands2").select("d1", "d2").distinct()
          .as[(Long, Long)].collect().toSeq
      } finally q.stop()

    val shingles: Map[Long, Set[String]] = docs
      .as[(Long, Seq[String])].collect()
      .map { case (id, sh) => id -> sh.toSet }.toMap
    def jaccard(a: Long, b: Long): Double = {
      val (sa, sb) = (shingles(a), shingles(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    }
    val witness: Map[Long, Long] = pairs
      .filter { case (d1, d2) => jaccard(d1, d2) >= 0.5 }
      .groupBy(_._2).map { case (d2, ps) => d2 -> ps.map(_._1).min }

    val batch = Registry.byName("d_stream_dedup").run(spark, sf001)
      .select(col("doc_id"), col("is_dup"),
        coalesce(col("witness"), lit(-1L)).as("witness"))
      .as[(Long, Int, Long)].collect().toSeq

    assert(batch.nonEmpty)
    batch.foreach { case (docId, isDup, w) =>
      witness.get(docId) match {
        case Some(expected) =>
          assert(isDup == 1 && w == expected,
            s"doc $docId: streamed witness $expected, batch ($isDup, $w)")
        case None =>
          assert(isDup == 0 && w == -1L,
            s"doc $docId: streamed says kept, batch says ($isDup, $w)")
      }
    }
    // the corpus actually contains duplicates — the test discriminates
    assert(witness.nonEmpty)
  }
}
