package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-streaming ingest — the streaming analog of the reference's
  * incremental write path (`insert` with `use_hnsw=True`,
  * vervectordb/__init__.py:264-265): new rows stream in, derived state
  * (aggregates / index partitions) updates incrementally.
  *
  * Two shapes:
  *  - [[hourlyCounts]]: watermarked event-time windowed aggregation over the
  *    events schema (batch twin: AnalyticsQueries.eventsHourlyAgg — same
  *    buckets, verified equal in ScalaTest).
  *  - [[ingestAppend]]: foreachBatch append into a Parquet vector table, the
  *    micro-batch upsert path; index rebuild (IVF/HNSW) runs per batch or
  *    periodically, replacing the reference's per-row incremental insert.
  */
object StreamingIngest {

  /** events schema as stored (ts read as nanos LONG via nanosAsLong). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of a directory of events parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(EventsSchema)
      .parquet(dir)

  /** Watermarked hourly windowed aggregation per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100.0).cast("long")).as("sum_value_cents"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("sum_value_cents"))

  /** Run a streaming aggregation to completion over static input via an
    * in-memory sink (test/dev harness). */
  def runToMemorySink(agg: DataFrame, name: String): StreamingQuery = {
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** Micro-batch append ingest into a Parquet table (the W1/W2 streaming
    * analog). Returns the query; caller stops it. */
  def ingestAppend(stream: DataFrame, targetPath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(targetPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
