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

  /** events.ts normalized to TimestampType whether the fixture carries
    * ns-as-long or native timestamp[us] (TIMESTAMP_NTZ). */
  private def normTs(df: org.apache.spark.sql.DataFrame) =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  test("windowed streaming aggregation matches the batch equivalent") {
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val ckpt = Files.createTempDirectory("ckpt").toString

    val stream = normTs(spark.readStream.schema(schema).parquet(dir))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = stream.writeStream.outputMode("complete").format("memory")
      .queryName("ev_test").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ev_test")

    val want = normTs(spark.read.parquet(dir))
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.count() === want.count())
    assert(got.collect().toSet === want.collect().toSet)
  }

  test("late rows filter against the previous batch's watermark (two-watermark model)") {
    // Three mtime-ordered single-file batches; watermark delay 1h, 10-min
    // windows. Batch 3's data filter uses the watermark in effect during
    // batch 2 = max(batch-1 ts) - 1h = 09:59:05, so its 10:05 row (window
    // end 10:10 > 09:59:05) is KEPT and merges into the 10:00 window,
    // while its 08:00 row (window end 08:10 <= 09:59:05) is DROPPED.
    // Final watermark = max kept ts (11:30:05) - 1h = 10:30:05 emits only
    // windows ending at or before it: (10:00, n=2) and (10:10, n=1); the
    // 10:59/11:30 rows stay withheld in state.
    import spark.implicits._
    val day = "2024-03-01 "
    def frame(ts: String*) = ts.map(t => day + t).toDF("raw")
      .select(to_timestamp(col("raw")).as("ts"))
    val stage = Files.createTempDirectory("late_stage")
    def stageBatch(df: org.apache.spark.sql.DataFrame, name: String,
                   mtimeMs: Long): Unit = {
      val tmp = Files.createTempDirectory("late_w").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = stage.resolve(name)
      Files.copy(part.toPath, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    stageBatch(frame("10:00:05", "10:11:05", "10:59:05"), "01.parquet", 1000L)
    stageBatch(frame("11:30:05"), "02.parquet", 2000L)
    stageBatch(frame("10:05:00", "08:00:00"), "03.parquet", 3000L)
    val schema = spark.read.parquet(stage.toString).schema
    val ckpt = Files.createTempDirectory("late_ckpt").toString
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("ws"), col("n"))
    val got = EventStream.runAvailableNow(stream, "late_test", ckpt)
      .as[(String, Long)].collect().toSet
    assert(got === Set((day + "10:00:00", 2L), (day + "10:10:00", 1L)))
  }

  test("streamingFunnel: in-batch time order; later batches cannot rewrite the chain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStream.FunnelEventIn]
    def ev(id: Long, sec: Long, u: Long, t: String) =
      EventStream.FunnelEventIn(id, new java.sql.Timestamp(sec * 1000L), u, t)
    val ckpt = Files.createTempDirectory("ckpt_sfn").toString
    val q = EventStream.streamingFunnel(ms.toDS(),
        Seq("signup", "view", "purchase")).toDF
      .writeStream.outputMode("append").format("memory")
      .queryName("sfn_test").option("checkpointLocation", ckpt).start()
    try {
      // batch 1 arrives out of order WITHIN the batch: sorted application
      // anchors signup@10 then view@30 (the view@5 precedes the signup —
      // ignored, same as the batch op)
      ms.addData(ev(2, 30, 1, "view"), ev(1, 10, 1, "signup"),
        ev(0, 5, 1, "view"))
      q.processAllAvailable()
      // batch 2: the LATE view@20 cannot retroactively replace t2=30
      // (arrival-order semantics); purchase@40 advances off t2=30
      ms.addData(ev(3, 20, 1, "view"), ev(4, 40, 1, "purchase"))
      q.processAllAvailable()
      val got = spark.table("sfn_test")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 1L, 10000000L), (1L, 2L, 30000000L),
        (1L, 3L, 40000000L)))
    } finally q.stop()
    // gap variant: purchase 10s after t2 violates maxGapSec=5 and the
    // chain can never recover (every later event is further away) —
    // same rule as the batch op
    val ckpt2 = Files.createTempDirectory("ckpt_sfn2").toString
    val ms2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStream.FunnelEventIn]
    val q2 = EventStream.streamingFunnel(ms2.toDS(),
        Seq("signup", "view", "purchase"), maxGapSec = Some(5L)).toDF
      .writeStream.outputMode("append").format("memory")
      .queryName("sfn_gap").option("checkpointLocation", ckpt2).start()
    try {
      ms2.addData(ev(1, 10, 1, "signup"), ev(2, 13, 1, "view"),
        ev(3, 23, 1, "purchase"))
      q2.processAllAvailable()
      val gapGot = spark.table("sfn_gap")
        .as[(Long, Long, Long)].collect().toSet
      assert(gapGot === Set((1L, 1L, 10000000L), (1L, 2L, 13000000L)))
    } finally q2.stop()
  }

  test("stateful sessionization assigns gap-based session ids with custom state") {
    import spark.implicits._
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val ckpt = Files.createTempDirectory("ckpt3").toString
    val stream = normTs(spark.readStream.schema(schema).parquet(dir))
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[EventStream.EventIn]
    val sessions = EventStream.statefulSessionize(stream, gapSec = 1800)
    val q = sessions.toDF.writeStream.outputMode("append").format("memory")
      .queryName("ev_sessions").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ev_sessions")
    val batch = normTs(spark.read.parquet(dir))
    assert(got.count() === batch.count())
    // session ids are contiguous and start at 1 per user
    val perUser = got.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"),
        countDistinct("session_id").as("n"))
      .as[(Long, Long, Long, Long)].collect()
    perUser.foreach { case (_, mn, mx, n) =>
      assert(mn === 1L)
      assert(mx === n) // contiguous 1..n
    }
    // spot-check one user against the batch window-function equivalent
    val u = perUser.head._1
    val expected = batch.filter(col("user_id") === u)
      .select(col("event_id"), col("ts")).as[(Long, java.sql.Timestamp)]
      .collect().sortBy(e => ((e._2.getTime / 1000L) * 1000000L +
        e._2.getNanos / 1000L, e._1))
      .foldLeft((List.empty[(Long, Long)], 0L, Long.MinValue)) {
        case ((acc, sid, last), (eid, ts)) =>
          val t = (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
          val nsid = if (last == Long.MinValue || t - last > 1800000000L)
            sid + 1 else sid
          ((eid, nsid) :: acc, nsid, t)
      }._1.toMap
    val gotU = got.filter(col("user_id") === u)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(gotU === expected)
  }

  test("stream-static enrichment joins a broadcast dimension per batch") {
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val dim = spark.range(0, 2000).select(col("id").as("user_id"),
      concat(lit("seg_"), pmod(col("id"), lit(4))).as("segment"))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select("event_id", "user_id")
    val enriched = EventStream.enrich(stream, dim, Seq("user_id"))
    val ckpt = Files.createTempDirectory("ckpt4").toString
    val q = enriched.writeStream.outputMode("append").format("memory")
      .queryName("ev_enrich").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ev_enrich")
    assert(got.count() === spark.read.parquet(dir).count())
    assert(got.filter(col("segment").isNull).count() === 0)
    assert(got.filter(col("user_id") === 7 && col("segment") =!= "seg_3")
      .count() === 0)
  }

  test("toCatalog replay guard survives a user save interleaved before " +
    "the checkpoint commit (no duplicate batch)") {
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val root = Files.createTempDirectory("cat_stream_rg").toString
    val cat = new graft.catalog.Catalog(root, spark)
    val ckpt = Files.createTempDirectory("ckpt_rg").toString
    def stream() = spark.readStream.schema(schema).parquet(dir)
      .select("event_id", "event_type")
    EventStream.toCatalog(stream(), cat, "ev_rg", ckpt).awaitTermination()
    val srcRows = spark.read.parquet(dir).count()
    assert(cat.readDataset("ev_rg").count() === srcRows)
    // a user save lands AFTER the sink committed batch 0 but (from the
    // stream's point of view) BEFORE the checkpoint commit: the LATEST
    // version now carries no stream@ marker. A latest-version-only
    // replay check would re-append the batch on restart.
    cat.save(graft.core.Chain(
      spark.read.parquet(dir).select("event_id", "event_type").limit(5)),
      "ev_rg")
    val vsBefore = cat.versions("ev_rg")
    // re-deliver batch 0: a fresh checkpoint over the same source files
    // produces the identical batch id 0 — the same shape a crash between
    // sink commit and checkpoint commit re-delivers on restart (batch
    // ids restart at 0). The guard must skip it via the RECORDED
    // stream@batch0 marker even though the latest version (the user
    // save) carries none; the r16 latest-version-only check re-appended
    // here.
    val ckpt2 = Files.createTempDirectory("ckpt_rg2").toString
    EventStream.toCatalog(stream(), cat, "ev_rg", ckpt2).awaitTermination()
    // the replayed batch must be SKIPPED: no new version (each batch
    // saves as its OWN version, so a re-append would add one carrying
    // the batch's rows again), latest still the user save
    assert(cat.versions("ev_rg") === vsBefore,
      "replayed batch re-appended as a new version")
    assert(cat.readDataset("ev_rg").count() === 5L,
      "latest version must still be the interleaved user save")
  }

  test("toCatalog materializes each micro-batch as a dataset version") {
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val root = Files.createTempDirectory("cat_stream").toString
    val cat = new graft.catalog.Catalog(root, spark)
    val ckpt = Files.createTempDirectory("ckpt5").toString
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select("event_id", "event_type")
    EventStream.toCatalog(stream, cat, "ev_versions", ckpt).awaitTermination()
    val vs = cat.versions("ev_versions")
    assert(vs.nonEmpty) // AvailableNow over one file → one batch/version
    assert(cat.readDataset("ev_versions").count() ===
      spark.read.parquet(dir).count())
    assert(cat.readMeta("ev_versions", vs.head).contains("stream@batch"))
  }

  test("applyChanges: CDC feed maintains a table; seqCol is LWW in-batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("cat_cdc").toString
    val cat = new graft.catalog.Catalog(root, spark)
    cat.save(graft.core.Chain(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")), "t")
    // one batch with duplicate keys (seq decides), a delete, and an insert
    val feed = Seq(
      (1L, "a1", 1L, false), (1L, "a2", 2L, false), // LWW: a2 wins
      (2L, "x", 1L, true),                          // delete k=2
      (4L, "d", 1L, false))                         // insert
      .toDF("k", "s", "seq", "del")
    val stage = Files.createTempDirectory("cdc_feed")
    feed.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(stage.toString).schema)
      .parquet(stage.toString)
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    EventStream.applyChanges(stream, cat, "t", Seq("k"), ckpt,
      seqCol = Some("seq"), deleteCol = Some("del")).awaitTermination()
    val got = cat.readDataset("t").toDF.select("k", "s")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a2", 3L -> "c", 4L -> "d"))
    // without seqCol, duplicate keys in a batch fail LOUDLY — before any
    // version commits (the feed has a dup upsert AND a delete, so a
    // post-split check would only fire after the deletes merge landed)
    val vsAfterFirst = cat.versions("t").size
    val stage2 = Files.createTempDirectory("cdc_feed2")
    feed.drop("seq").coalesce(1).write.mode("overwrite")
      .parquet(stage2.toString)
    val ckpt2 = Files.createTempDirectory("cdc_ckpt2").toString
    val stream2 = spark.readStream
      .schema(spark.read.parquet(stage2.toString).schema)
      .parquet(stage2.toString)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      EventStream.applyChanges(stream2, cat, "t", Seq("k"), ckpt2,
        deleteCol = Some("del")).awaitTermination())
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("not unique")), chain.mkString(" | "))
    // the pre-flight must fire BEFORE any merge commits — a half-applied
    // batch (deletes landed, upserts rejected) would be permanent
    assert(cat.versions("t").size === vsAfterFirst,
      "rejected batch must not commit any version")
  }

  test("applyChanges: a delete+upsert TIE on the seq value resolves to the tombstone, deterministically") {
    import spark.implicits._
    val root = Files.createTempDirectory("cat_cdc_tie").toString
    val cat = new graft.catalog.Catalog(root, spark)
    cat.save(graft.core.Chain(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s")), "t")
    val feed = Seq(
      (1L, "zz", 5L, false), (1L, "yy", 5L, true), // TIE: delete wins
      (2L, "b2", 1L, false))
      .toDF("k", "s", "seq", "del")
    val stage = Files.createTempDirectory("cdc_tie_feed")
    feed.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(stage.toString).schema)
      .parquet(stage.toString)
    val ckpt = Files.createTempDirectory("cdc_tie_ckpt").toString
    EventStream.applyChanges(stream, cat, "t", Seq("k"), ckpt,
      seqCol = Some("seq"), deleteCol = Some("del")).awaitTermination()
    val got = cat.readDataset("t").toDF.select("k", "s")
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "b2"),
      s"the tombstone must win a sequence tie: $got")
  }

  test("toCatalog skips a replayed batch id (no double version)") {
    import spark.implicits._
    val root = Files.createTempDirectory("cat_tocat").toString
    val cat = new graft.catalog.Catalog(root, spark)
    val stage = Files.createTempDirectory("tocat_feed")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    def run(ck: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(stage.toString).schema)
        .parquet(stage.toString)
      EventStream.toCatalog(stream, cat, "out", ck).awaitTermination()
    }
    run(Files.createTempDirectory("tocat_ck1").toString)
    assert(cat.versions("out").size === 1)
    // a FRESH checkpoint re-delivers batch 0 with the same id — the
    // foreachBatch replay shape; the recorded marker must skip it
    // instead of committing a second identical version
    run(Files.createTempDirectory("tocat_ck2").toString)
    assert(cat.versions("out").size === 1,
      s"replayed batch id must not double-commit: ${cat.versions("out")}")
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

  test("streaming dedup vs history reproduces the batch subtractSeen exactly") {
    val dir = stageDir(s"$sf/events.parquet")
    val schema = spark.read.parquet(dir).schema
    val batchEvents = spark.read.parquet(dir)
    val content = concat_ws("|", col("user_id"), col("event_type"),
      col("props"))
    val history = batchEvents.filter(col("event_id") % 3 === 0)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = EventStream.subtractSeenStream(stream, history, content,
        expectedItems = 20000L)
      .select("event_id")
    val ckpt = Files.createTempDirectory("ckpt3").toString
    val got = EventStream.runAvailableNow(out, "ev_sdh", ckpt)
      .collect().map(_.getLong(0)).toSet
    // oracle: the batch op on identical inputs
    val want = graft.ops.Dedup.subtractSeen(
        batchEvents.withColumn("__c", content), history.withColumn("__c", content),
        "__c", "event_id", expectedItems = 20000L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < batchEvents.count())
    // empty history: pure passthrough, no bloom, no join
    val all = EventStream.subtractSeenStream(
        spark.readStream.schema(schema).parquet(dir),
        batchEvents.filter(lit(false)), content)
      .select("event_id")
    val ckpt2 = Files.createTempDirectory("ckpt4").toString
    val n2 = EventStream.runAvailableNow(all, "ev_sdh_all", ckpt2).count()
    assert(n2 === batchEvents.count())
  }
}
