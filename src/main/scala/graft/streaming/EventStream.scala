package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/**
 * Structured-Streaming surface. The reference has no continuous streaming —
 * its incremental story is batch-delta (SURVEY §2.9) — so this module is a
 * Spark-native extension: the same chain operators applied to unbounded
 * input, with watermarked event-time windows.
 *
 * `Trigger.AvailableNow` makes every pipeline here double as an incremental
 * batch job: each run processes exactly the files that arrived since the
 * last checkpoint, which is the streaming restatement of the reference's
 * `delta=True` file-listing path.
 */
object EventStream {

  /** ns-as-long timestamps (parquet TIMESTAMP(NANOS) read via
    * `nanosAsLong`) converted exactly to micros; no-op otherwise. */
  private def normTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df

  /** Windowed aggregate over a parquet-file stream of events. */
  def windowedCounts(spark: SparkSession, dir: String, schema: StructType,
                     windowDur: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    normTs(spark.readStream.schema(schema).parquet(dir))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  /**
   * Run a streaming DataFrame to completion over the currently-available
   * input (AvailableNow), collecting results via an in-memory sink table.
   * Returns the batch DataFrame of results.
   */
  def runAvailableNow(stream: DataFrame, queryName: String,
                      checkpointDir: String): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /**
   * Sessionization-style stateful aggregation over user activity:
   * per-user event counts with flatMapGroupsWithState shape is showcased in
   * tests; for the library surface we expose the declarative watermarked
   * dedup — drop duplicate event_ids within the watermark horizon.
   */
  def dedupEvents(spark: SparkSession, dir: String, schema: StructType,
                  watermark: String = "2 hours"): DataFrame =
    normTs(spark.readStream.schema(schema).parquet(dir))
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id")
}
