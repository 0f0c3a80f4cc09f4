package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  /** The streaming file source needs a directory — stage a symlink. */
  private def stageDir(file: String): String = {
    val d = Files.createTempDirectory("stream_stage")
    Files.createSymbolicLink(d.resolve("part.parquet"),
      java.nio.file.Paths.get(file))
    d.toString
  }

  test("windowed streaming aggregation matches the batch equivalent") {
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val ckpt = Files.createTempDirectory("ckpt").toString

    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = stream.writeStream.outputMode("complete").format("memory")
      .queryName("ev_test").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ev_test")

    val want = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.count() === want.count())
    assert(got.collect().toSet === want.collect().toSet)
  }

  test("streaming dedup drops duplicate event ids") {
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val deduped = EventStream.dedupEvents(spark, dir, schema)
    val ckpt = Files.createTempDirectory("ckpt2").toString
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("ev_dedup").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("ev_dedup").count()
    assert(n === spark.read.parquet(dir).select("event_id").distinct().count())
  }
}
