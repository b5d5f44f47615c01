package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming ingestion over the events table: watermarked
  * tumbling-window aggregation (the streaming twin of the batch
  * `st_tumbling_window` query, so batch and stream results can be
  * cross-checked). The reference has no event-time streaming — its
  * queues are wall-clock polled (SURVEY §2.9) — so this is the
  * engine's forward-looking stream surface for the 100 TB pipeline.
  */
object EventStream {

  /** events.parquet schema as read by the streaming file source.
    * `tsType` is the on-disk encoding of `ts`: LongType for the
    * TIMESTAMP(NANOS) generation (arrives as long via nanosAsLong),
    * TimestampNTZType for the TIMESTAMP(MICROS) one — a stream source
    * needs a declared schema, so the caller probes the footer with a
    * metadata-only batch read and passes the type in. */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Start a streaming hourly-count query into an in-memory sink named
    * `sinkName`; caller drives it with processAllAvailable(). */
  def hourlyCounts(spark: SparkSession, dir: String,
      sinkName: String): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // footer-only probe: which ts encoding does this corpus use?
    val tsOnDisk = spark.read.parquet(dir).schema("ts").dataType
    val raw = spark.readStream
      .schema(rawSchema(tsOnDisk))
      .parquet(s"$dir")
    val stream = (tsOnDisk match {
      case LongType => // nanos-as-long generation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // TIMESTAMP(MICROS): NTZ → session-zone (UTC) timestamp
        raw.withColumn("ts", col("ts").cast(TimestampType))
    })
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .start()
  }

  /** Batch equivalent for cross-checking the stream results. */
  def hourlyCountsBatch(spark: SparkSession, file: String): DataFrame = {
    graft.core.t(spark, file.stripSuffix("/events.parquet"), "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
  }

  /** Streaming sliding windows — the `st_sliding_window` expression
    * under readStream (each event contributes to 4 overlapping
    * 1h/15min windows in state). */
  def slidingCounts(spark: SparkSession, dir: String,
      sinkName: String): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsOnDisk = spark.read.parquet(dir).schema("ts").dataType
    val raw = spark.readStream
      .schema(rawSchema(tsOnDisk))
      .parquet(s"$dir")
    val stream = (tsOnDisk match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    })
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
    stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .start()
  }

  /** Streaming session windows — the SAME session_window expression
    * the `st_session_window` batch query runs, under readStream with
    * a watermark: Spark keeps per-user session state and merges
    * sessions across micro-batches. StreamingSpec proves equality
    * against the batch plan. */
  def sessionSpend(spark: SparkSession, dir: String,
      sinkName: String): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsOnDisk = spark.read.parquet(dir).schema("ts").dataType
    val raw = spark.readStream
      .schema(rawSchema(tsOnDisk))
      .parquet(s"$dir")
    val stream = (tsOnDisk match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    })
      .withWatermark("ts", "12 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.core.cents(col("value"))).as("spend_cents"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("spend_cents"))
    stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .start()
  }

  /** Stream-stream interval join — click attribution: every click is
    * joined to the same user's impressions at most 30 minutes before
    * it. Both sides are watermarked, so Spark bounds the join state:
    * an impression can be dropped from state once the CLICK
    * watermark passes its end of the interval, and a click older
    * than the impression watermark minus the interval can never
    * match — the state-cleanup contract that makes a stream-stream
    * join runnable indefinitely at 100 TB/day. Inputs are any two
    * STREAMING frames with (user, its) / (user, cts) columns;
    * StreamingSpec drives it with MemoryStreams and checks the
    * interval bounds both ways. */
  def attributeClicks(imps: DataFrame, clicks: DataFrame): DataFrame = {
    val i = imps.withWatermark("its", "1 hour")
    val c = clicks.withWatermark("cts", "1 hour")
    i.join(c,
      expr("""iuser = cuser AND
              cts >= its AND
              cts <= its + interval 30 minutes"""))
      .select(col("iuser").as("user"), col("imp_id"), col("click_id"),
        col("its"), col("cts"))
  }
}
