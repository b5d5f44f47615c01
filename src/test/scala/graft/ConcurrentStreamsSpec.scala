package graft

import java.sql.Timestamp

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import graft.ops.DedupOps
import graft.streaming.{EventStream, StreamDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Two-concurrent-streams soak: the stateful dedup candidate machine
  * and the stream-stream attribution join run SIMULTANEOUSLY on the
  * one shared SparkSession for many interleaved micro-batches, each
  * driven from its own thread. This is the production shape — a
  * 100 TB pipeline runs many streaming queries per application — and
  * it shakes out session-global hazards (registered UDF names, shared
  * memo/cache state, catalog temp views) of the kind the round-7
  * bloom-udf fix closed: any cross-query interference shows up as a
  * divergence from the batch twins computed after the soak.
  */
class ConcurrentStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dedup state machine and attribution join soak concurrently " +
      "without cross-query interference") {
    implicit val sqlCtx = spark.sqlContext

    val docs = DedupOps.shingleDocs(
      core.t(spark, sf001, "documents").select("doc_id", "text")).cache()
    val bands = DedupOps.bandFrame(docs)
      .as[StreamDedup.BandRow].collect().toSeq

    val bandIn = MemoryStream[StreamDedup.BandRow]
    val dedupQ = StreamDedup.candidates(bandIn.toDS())
      .writeStream.format("memory").queryName("soak_cands")
      .outputMode("append").start()

    val imps = MemoryStream[StreamingSpec.Imp]
    val clicks = MemoryStream[StreamingSpec.Click]
    val attribQ = EventStream.attributeClicks(
        imps.toDS().toDF(), clicks.toDS().toDF())
      .writeStream.format("memory").queryName("soak_attrib")
      .outputMode("append").start()

    val rounds = 12
    try {
      // each query is driven from its own thread, micro-batches
      // genuinely overlapping on the shared session
      val fDedup = Future {
        val waveSize = (bands.size + rounds - 1) / rounds
        bands.grouped(waveSize).foreach { wave =>
          bandIn.addData(wave)
          dedupQ.processAllAvailable()
        }
      }
      val fAttrib = Future {
        (0 until rounds).foreach { r =>
          // user r: one impression, one in-window click (+5 min), one
          // out-of-window click (+45 min)
          val base = ts(f"2026-01-01 ${8 + (r % 12)}%02d:00:00").getTime
          imps.addData(StreamingSpec.Imp(r.toLong, 100L + r,
            new Timestamp(base)))
          clicks.addData(
            StreamingSpec.Click(r.toLong, 1000L + r,
              new Timestamp(base + 5 * 60 * 1000L)),
            StreamingSpec.Click(r.toLong, 2000L + r,
              new Timestamp(base + 45 * 60 * 1000L)))
          attribQ.processAllAvailable()
        }
      }
      Await.result(fDedup, 180.seconds)
      Await.result(fAttrib, 180.seconds)
      dedupQ.processAllAvailable()
      attribQ.processAllAvailable()

      // dedup twin: the batch band self-join over the same corpus
      val streamedPairs = spark.table("soak_cands")
        .select("d1", "d2").distinct().as[(Long, Long)].collect().toSet
      val b = DedupOps.bandFrame(docs)
      val batchPairs = b.alias("a").join(b.alias("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct().as[(Long, Long)].collect().toSet
      assert(streamedPairs.nonEmpty && streamedPairs == batchPairs,
        s"dedup diverged under concurrency: ${
          (streamedPairs -- batchPairs).take(5)} extra, ${
          (batchPairs -- streamedPairs).take(5)} missing")

      // attribution twin: exactly the in-window click per round
      val attributed = spark.table("soak_attrib")
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      val expected = (0 until rounds)
        .map(r => (100L + r, 1000L + r)).toSet
      assert(attributed == expected,
        s"attribution diverged under concurrency: $attributed")
    } finally {
      dedupQ.stop()
      attribQ.stop()
    }
  }
}
