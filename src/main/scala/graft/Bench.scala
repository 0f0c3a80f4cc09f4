package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // static conf, default 100 entries: a 150-query suite generates far
      // more codegen'd classes than that, so every interleaved pass
      // recompiled every stage from scratch (janino time, not execution,
      // dominated the multi-stage iterative queries — q_pagerank measured
      // 7.9s first-compile vs 2.9s warm). Size the cache for the suite.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session init, codegen compiler, parquet footer caches,
    // encoder derivation — touch each table family + the expression kernels
    // once so timed queries measure steady-state execution, not JIT warmup
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir).count()
      SparkEntry.queries("q_fingerprint")(spark, sfDir).count()   // documents+md5
      SparkEntry.queries("q_window_lag")(spark, sfDir).count()    // events+window
      SparkEntry.queries("q_embed_pairs")(spark, sfDir).count()   // embeddings+cosine
      SparkEntry.queries("q_batch_map")(spark, sfDir).count()     // typed encoders
    } catch { case _: Throwable => () }
    // the first streaming query in a JVM pays several seconds of engine
    // bring-up (microbatch executor, state-store providers, offset/commit
    // logs) — run a one-row stream so timed streaming queries measure the
    // query, not classloading
    try {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      ms.addData(1 to 8: _*)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_warm_ckpt").toString
      val q = ms.toDF().groupBy(org.apache.spark.sql.functions.expr("value % 2"))
        .count()
        .writeStream.outputMode("complete").format("memory")
        .queryName("__warm_stream").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.catalog.dropTempView("__warm_stream")
    } catch { case _: Throwable => () }
    // local-iteration knobs (driver leaves them unset → 3 interleaved
    // passes): SPARK_GRAFT_QUERIES=a,b,c runs a subset; SPARK_GRAFT_REPEAT=n
    // overrides the pass count (n=1 → single timing pass).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val passes = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt.max(1)
    val qlist = SparkEntry.queries.toVector
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // None = the query threw; a crash's wall time must never enter the
    // min-of-passes, or a broken query reads as a very fast one
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // untimed isolation: queries that persist() intermediates (LSH
      // frontiers, CC edge lists) would otherwise leave cached blocks
      // behind, and later queries would pay their eviction/GC bill.
      // clearCache only drops catalog-tracked persists — localCheckpoint
      // blocks live at the RDD layer until the ContextCleaner's GC-driven
      // sweep, so drop them explicitly for deterministic memory state
      // between measurements
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
      if (ok) Some(dt) else None
    }
    // This guest is a microVM; the host occasionally steals the CPU for
    // seconds-to-minutes at a time (observed: the same query 0.6s..131s
    // across runs with the guest idle, zero GC). Back-to-back retries of a
    // stalled query all land inside the same stall window; instead run the
    // WHOLE list in round-robin passes and take each query's min across
    // passes — one stall then poisons at most one pass's worth of entries,
    // and every query keeps (passes-1) clean measurements.
    // load forensics: host CPU steal has repeatedly masqueraded as
    // regression (see BASELINE.md r11/r12 A/Bs) — stamp every bench
    // JSON with the /proc/stat steal delta across the timed window and
    // the 1-min load, so each BENCH_rN.json is self-certifying
    def stealJiffies(): Long =
      try {
        val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
        l.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(-1L)
      } catch { case _: Throwable => -1L }
    def loadavg1(): String =
      try scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0)
      catch { case _: Throwable => "-1" }
    val steal0 = stealJiffies()
    val best = collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to passes; (name, fn) <- qlist) {
      timeOnce(fn).foreach { dt =>
        best(name) = best.get(name).fold(dt)(math.min(_, dt))
      }
    }
    val stealD =
      if (steal0 < 0) -1L else math.max(-1L, stealJiffies() - steal0)
    val forensics = s""""steal_jiffies":$stealD,"load1":${loadavg1()},""" +
      s""""ts":${System.currentTimeMillis() / 1000}"""
    // a query that failed EVERY pass reports -1 — visibly wrong in the
    // JSON rather than silently fast or silently absent
    val results = qlist.map { case (name, _) =>
      name -> best.getOrElse(name, -1.0)
    }.toMap
    // The driver captures only the LAST 2000 chars of stdout and parses the
    // JSON line out of that tail. 100+ full-precision entries overflow the
    // window and the line never parses (r1-r3 all came back parsed:null).
    // Keep stdout compact: millisecond precision and a bounded headline
    // subset covering every operator family; the complete map goes to a
    // sidecar file and stderr for the record.
    def fmt(v: Double): String = f"$v%.3f"
    val headline = Vector(
      "q1_agg", "q_scalar_agg", "q_group_collect",
      "q_merge_inner", "q_merge_left", "q_asof_join", "q_range_join",
      "q_intersect", "q_diff",
      "q_window", "q_window_frames", "q_window_lag",
      "q_filter", "q_mutate", "q_distinct", "q_chunk",
      "q_read_parquet", "q_read_csv", "q_read_json", "q_save_roundtrip",
      "q_map_udf", "q_gen_udf", "q_agg_udf", "q_batch_map",
      "q_string_funcs", "q_int_hash",
      "q_dedup_exact", "q_minhash_dedup", "q_simhash_dedup", "q_embed_dedup",
      "q_dedup_clusters", "q_line_dedup",
      "q_ann_topk", "q_ann_ivf",
      "q_lang_id", "q_text_quality", "q_pii_scrub", "q_repetition",
      "q_fingerprint", "q_tfidf",
      "q_pipeline_clean", "q_contamination", "q_seq_pack",
      "q_train_test_split", "q_domain_mix",
      "q_multimodal", "q_multimodal_frames", "q_audio_decode",
      "q_delta_inc", "q_delta_retry", "q_streaming", "q_sessionize",
      "q_streaming_late", "q_stream_join", "q_dup_fraction", "q_profile",
      "q_dsir", "q_temperature_mix", "q_semdedup", "q_quality_classifier",
      "q_exact_substr", "q_subtract_seen", "q_pagerank", "q_gopher_rules",
      "q_weighted_sample", "q_c4_rules", "q_kmeans", "q_bm25", "q_blocklist",
      "q_triangles", "q_subtract_seen_near", "q_zorder", "q_ann_sq8",
      "q_ann_sq8_rerank", "q_label_prop", "q_compact", "q_image_dhash",
      "q_kcore", "q_heavy_hitters", "q_url_dedup", "q_covariance", "q_rrf",
      "q_inverted_index", "q_asof_forward", "q_asof_nearest",
      "q_interval_join", "q_stats_skipping", "q_zorder_skip",
      "q_bloom_skipping", "q_stream_session_window", "q_optimize",
      "q_webm_header",
      "q_delta_storage", "q_jmespath_fns", "q_video_header",
      "q_audio_frame_meta", "q_stream_join_outer", "q_pipeline_e2e")
    val shown =
      if (only.isDefined) results.keys.toVector.sorted // local subset run: show all
      else headline.filter(results.contains)
    // Hard budget: the whole stdout line must fit the driver's 2000-char
    // tail window or it never parses (r8 came back parsed:null after the
    // headline grew past it). Wrapper + sf path ≈ 120 chars; cap the
    // queries map at 1700 and drop trailing headline entries to fit.
    def render(keys: Vector[String]): String =
      keys.map(k => "\"" + k + "\":" + fmt(results(k))).mkString("{", ",", "}")
    val budget = 1640 // leaves room for the forensics fields
    // The stdout line must ALWAYS fit the driver's 2000-char tail window
    // — an oversized `only` subset would re-create the r8 parsed:null
    // failure just as surely as the headline would. Subset runs differ
    // only in WHICH queries are shown (all of them, alphabetical), not
    // in whether the budget applies; the untruncated map always lands on
    // stderr + bench_full_local.json. Fit by cumulative entry lengths,
    // one pass, not re-rendering per drop.
    val fitted = {
      val entryLens = shown.map(k => ("\"" + k + "\":" + fmt(results(k))).length)
      var sum = 2 // braces
      var n = 0
      while (n < shown.size && {
        val next = sum + entryLens(n) + (if (n > 0) 1 else 0) // comma
        if (next <= budget) { sum = next; true } else false
      }) n += 1
      shown.take(n)
    }
    val qs = render(fitted)
    val allQs = results.toVector.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalS = fmt(total)
    val full =
      s"""{"metric":"total","value":$totalS,"unit":"sec","nq":${results.size},$forensics,"queries":$allQs,"sf":"$sfDir"}"""
    // full line first on stderr, flushed, THEN the compact line on stdout —
    // so even a merged-stream capture ends with the compact parseable line
    System.err.println(full)
    System.err.flush()
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full_local.json"), full + "\n")
    catch { case _: Throwable => () }
    println(s"""{"metric":"total","value":$totalS,"unit":"sec","nq":${results.size},$forensics,"queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
