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

  /** Event timestamps normalized to session-UTC TimestampType whichever
    * way the parquet shipped them: ns-as-long (TIMESTAMP(NANOS) read via
    * `nanosAsLong`) converted exactly to micros, native timestamp[us]
    * (TIMESTAMP_NTZ) cast wall-clock-identically; no-op otherwise. */
  private def normTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // FLOOR division, not `div` (truncate-toward-zero): a pre-epoch
        // nanosecond value must round DOWN to its microsecond or boundary
        // events land on the wrong side of a window/watermark cutoff —
        // and DuckDB's // (the oracle side) floors
        df.withColumn("ts", timestamp_micros(expr(
          "CASE WHEN ts % 1000 < 0 THEN ts div 1000 - 1 ELSE ts div 1000 END")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

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
                      checkpointDir: String,
                      noDataBatch: Boolean = true): DataFrame =
    runNow(stream, queryName, checkpointDir, "append", noDataBatch)

  /** Complete-mode AvailableNow run. Complete mode re-emits the whole
    * result each batch, so the trailing no-data micro-batch (which exists
    * to flush append-mode windows past the watermark) adds a full state-
    * store round for nothing — skip it. */
  def runCompleteNow(stream: DataFrame, queryName: String,
                     checkpointDir: String): DataFrame =
    runNow(stream, queryName, checkpointDir, "complete", noDataBatch = false)

  private def runNow(stream: DataFrame, queryName: String,
                     checkpointDir: String, mode: String,
                     noDataBatch: Boolean): DataFrame = {
    val spark = stream.sparkSession
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    // the cloned streaming session captures this at query start
    spark.conf.set(key, noDataBatch.toString)
    try {
      val q = stream.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
    } finally spark.conf.set(key, prev)
  }

  /** Per-user session state for [[statefulSessionize]]. */
  case class SessionState(sessionId: Long, lastTsMicros: Long)
  case class SessionOut(user_id: Long, event_id: Long, session_id: Long)
  case class EventIn(event_id: Long, ts: java.sql.Timestamp, user_id: Long)

  /**
   * Custom-state sessionization with `flatMapGroupsWithState`: events are
   * assigned per-user session ids, a new session starting after `gapSec`
   * of inactivity. This is the arbitrary-state API the reference has no
   * counterpart for — state lives in the state store, checkpointed,
   * recovered on restart. (Within a micro-batch, events are sorted by
   * exact-microsecond event time before state is applied, and the gap
   * compares in microseconds — the same long-µs discipline as the as-of
   * family, so a sub-second over-the-gap tie can't flip per engine.)
   */
  def statefulSessionize(events: org.apache.spark.sql.Dataset[EventIn],
                         gapSec: Long = 1800)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def micros(t: java.sql.Timestamp): Long =
      // floorDiv: getTime truncates toward zero, so a pre-epoch ts with
      // a sub-second part would flip sign (-0.5 s -> +500000 us) and
      // mis-order events inside the group
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[EventIn], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
            val tsMicros = micros(e.ts)
            val gapExceeded = st.lastTsMicros != Long.MinValue &&
              (tsMicros - st.lastTsMicros) > gapSec * 1000000L
            val sid = if (st.lastTsMicros == Long.MinValue || gapExceeded)
              st.sessionId + 1 else st.sessionId
            st = SessionState(sid, tsMicros)
            SessionOut(userId, e.event_id, sid)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Per-user funnel progress for [[streamingFunnel]]: 0-based next
    * expected step + the timestamp of the last advancement (µs). */
  case class FunnelState(step: Int, lastTsMicros: Long)
  case class FunnelEventIn(event_id: Long, ts: java.sql.Timestamp,
                           user_id: Long, event_type: String)
  case class FunnelAdvance(user_id: Long, step: Long, t_micros: Long)

  /**
   * Streaming ordered-funnel tracking with `flatMapGroupsWithState` —
   * the incremental twin of [[graft.ops.Sessions.funnel]]: per-user
   * greedy-earliest chain state (next expected step + last advancement
   * time) lives in the state store; one `FunnelAdvance` row is emitted
   * the moment a user advances a step. Within a micro-batch, events
   * apply in (event time, id) order, so a single AvailableNow batch
   * reproduces the batch funnel exactly (the gate pins that); across
   * batches the chain is greedy over ARRIVAL order of batches — an event
   * arriving after a later-timestamped event already advanced the chain
   * cannot retroactively rewrite it (inherent to one-pass funnel state;
   * recompute in batch when late data must win).
   */
  def streamingFunnel(events: org.apache.spark.sql.Dataset[FunnelEventIn],
                      steps: Seq[String],
                      maxGapSec: Option[Long] = None)
      : org.apache.spark.sql.Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "need at least one funnel step")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def micros(t: java.sql.Timestamp): Long =
      // floorDiv: getTime truncates toward zero, so a pre-epoch ts with
      // a sub-second part would flip sign (-0.5 s -> +500000 us) and
      // mis-order events inside the group
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[FunnelEventIn],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (st.step < steps.length && e.event_type == steps(st.step)) {
              val t = micros(e.ts)
              // step 1 anchors anywhere; later steps must be STRICTLY
              // after the previous advancement and inside the optional
              // per-transition gap (same rules as the batch op)
              val within = maxGapSec.forall(g =>
                st.step == 0 || t <= st.lastTsMicros + g * 1000000L)
              if ((st.step == 0 || t > st.lastTsMicros) && within) {
                st = FunnelState(st.step + 1, t)
                out += FunnelAdvance(userId, st.step.toLong, t)
              }
            }
          }
          state.update(st)
          out.iterator
      }
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
      // WithinWatermark, not plain dropDuplicates("event_id"): without
      // the event-time column in the subset Spark never evicts dedup
      // state, so the documented horizon contract was false and state
      // grew with every distinct id forever
      .dropDuplicatesWithinWatermark("event_id")

  /**
   * Streaming incremental dedup against an accumulated history corpus —
   * [[graft.ops.Dedup.subtractSeen]]'s bloom-prefilter shape applied to
   * an unbounded stream (the ingest filter a delta crawl actually runs):
   * rows whose normalized `content` already appears in `history` are
   * dropped; everything else passes through schema-unchanged.
   *
   * Scale shape: the bloom filter is built ONCE from the history keys
   * when the stream is composed and rides the plan as a literal inside a
   * codegen'd predicate, so the overwhelmingly-common definitely-new
   * rows pass MAP-SIDE without touching any join; only bloom hits (true
   * dups + the fpp share of false positives) anti-join the distinct
   * history keys per micro-batch (stream-static left_anti — stateless,
   * no watermark, nothing in the state store). The anti-join confirms
   * every bloom hit, so the output is the EXACT unseen set regardless of
   * fpp. The history keys persist across micro-batches (8 bytes per
   * distinct document); at 100 TB the bloom is ~1.2 GB per 10⁹ keys at
   * 1% fpp, broadcast once per executor, and the confirm join touches
   * only the ~fpp·batch + true-dup rows.
   *
   * `content` is evaluated against BOTH frames (e.g.
   * `concat_ws("|", col("user_id"), col("event_type"), col("props"))`),
   * then normalized+hashed by [[graft.ops.Dedup.contentKey]] — dedup
   * compares lowercased, whitespace-collapsed content, same as the batch
   * op. Compose with [[dedupEvents]] when the stream must also dedup
   * against ITSELF within the watermark horizon.
   */
  def subtractSeenStream(stream: DataFrame, history: DataFrame,
                         content: org.apache.spark.sql.Column,
                         expectedItems: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    val key = graft.ops.Dedup.contentKey(content)
    val histKeys = history.select(key.as("__k")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // empty history: everything is new (Spark's bloom aggregate returns
    // null for zero rows, which readFrom would NPE on)
    if (histKeys.isEmpty) { histKeys.unpersist(); return stream }
    val bloomBytes = {
      val bf = histKeys.stat.bloomFilter("__k",
        math.max(expectedItems, 1L), fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val keyed = stream.withColumn("__k", key)
    val might = graft.functions.GraftFunctions
      .bloom_might_contain(col("__k"), bloomBytes)
    // null content hashes to a null key and bloom_might_contain(null)
    // is null — without the isNull arm the row fails BOTH branch
    // filters and is silently deleted (the batch twin guards this too)
    keyed.filter(might.isNull || !might)
      .unionByName(keyed.filter(might).join(histKeys, Seq("__k"), "left_anti"))
      .drop("__k")
  }

  /**
   * Stream-static enrichment: join the unbounded stream with a bounded
   * dimension on `keys` — no stream-side state, the streaming counterpart
   * of a dimension `merge`. `broadcastDim = true` (default) hints the
   * static side for per-batch broadcast; pass `false` for dimensions too
   * large to broadcast, where each micro-batch runs a shuffle join.
   */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             how: String = "left_outer",
             broadcastDim: Boolean = true): DataFrame =
    stream.join(if (broadcastDim) broadcast(dim) else dim, keys, how)

  /**
   * Versioned streaming sink: every micro-batch materializes as a NEW
   * dataset version in the catalog (foreachBatch → Catalog.save), so a
   * continuously-running pipeline produces the same immutable, lineage-
   * tracked versions a batch `save` does — time travel over stream output.
   * EXACTLY-ONCE under checkpoint replay: the batch id rides the saved
   * version's deps, and a batch whose marker is already recorded is
   * skipped (same idempotent-writer contract — and the same boundary —
   * as [[appendToDataset]]: batch ids restart at 0 with a FRESH
   * checkpoint, so never point a new checkpoint generation at an
   * existing output dataset).
   * Returns the started query; call `.awaitTermination()` (AvailableNow
   * runs drain what's available, then stop).
   */
  def toCatalog(stream: DataFrame, catalog: graft.catalog.Catalog,
                name: String, checkpointDir: String,
                trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay guard: foreachBatch re-delivers the last batch when the
        // driver dies between the sink commit and the checkpoint commit —
        // the batch-id marker already rides the version's deps, so a
        // version carrying this id means the batch landed; saving again
        // would double-count every one of its rows for version-iterating
        // consumers (the appendToDataset idempotent-writer contract,
        // checked against the recorded marker instead of extraAttrs).
        // Batch ids are monotonic and replay only re-delivers the LAST
        // committed batch, so the batch landed iff the most RECENT
        // stream-marked version carries EXACTLY this id. Scan versions
        // newest-first to the first stream@ marker — amortized O(1)
        // metadata reads per batch (the marked version is at or near
        // the tail), and, unlike the latest-version-only check this
        // replaces, correct when a user save or cowRewrite version
        // (marker-less deps) lands between the sink commit and the
        // checkpoint commit: that interleaving left the latest version
        // unmarked and the replayed batch re-appended (duplicate rows).
        // Equality, not >=: a >= would also "skip" every batch of a
        // FRESH checkpoint generation pointed at this dataset (ids
        // restart at 0 below the old generation's newest marker) —
        // silently dropping new rows, where equality degrades that
        // documented misuse to visible duplicates. Parsed deps +
        // numeric suffix compare — a user-recorded dep merely
        // CONTAINING "stream@batchN" still never skips a live batch
        // (non-numeric suffixes are ignored).
        val prefix = "stream@batch"
        val already = catalog.versions(name).reverseIterator
          .flatMap(v => catalog.rawDepsOf(name, v).iterator.flatMap { d =>
            if (d.startsWith(prefix)) d.drop(prefix.length).toLongOption
            else None
          })
          .nextOption().contains(batchId)
        if (!already && !batch.isEmpty)
          catalog.save(graft.core.Chain(batch), name,
            deps = Seq(s"stream@batch$batchId"))
        ()
      }
      .start()

  /**
   * EXACTLY-ONCE streaming append into the catalog — the plain-ingest
   * sibling of [[applyChanges]] (Delta's `writeStream.toTable` in append
   * mode): every micro-batch lands as a new version via
   * [[graft.catalog.Catalog.append]], which hard-links all prior files
   * and writes only the batch (O(batch) per trigger at any table size).
   * Exactly-once holds under checkpoint REPLAY — the normal failure
   * mode: a replayed batch id is skipped because the id rides the SAME
   * meta.json commit as its data (the `extraAttrs` hook — no window
   * where data exists without its marker). This is Delta's
   * txnAppId/txnVersion idempotent-writer contract, including its known
   * boundary: after a LOST checkpoint, batch ids restart at 0, so a
   * restart that bundles already-committed files with NEW ones into one
   * low-id batch would skip the new rows too. If a checkpoint is truly
   * unrecoverable, restart under a FRESH `sinkId` (at-least-once for the
   * overlap; dedup downstream) — never reuse a sinkId across checkpoint
   * generations. One writer per dataset (see [[graft.catalog.Catalog]]
   * `append` concurrency note); `sinkId` distinguishes logical
   * pipelines, not concurrent writers. The file-level CDF diff reports
   * each batch's files as inserts, so a downstream
   * [[graft.delta.MatView]] refreshes incrementally off live ingest.
   */
  def appendToDataset(stream: DataFrame, catalog: graft.catalog.Catalog,
                      name: String, checkpointDir: String,
                      sinkId: String = "sink",
                      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val prefix = s"stream:batch=$sinkId:"
    def lastApplied(): Option[Long] =
      catalog.versions(name).reverseIterator.flatMap(v =>
        catalog.annotationsOf(name, v)._2.collectFirst {
          case a if a.startsWith(prefix) => a.drop(prefix.length).toLong
        }).nextOption()
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty && lastApplied().forall(_ < id)) {
          // a user write racing this batch aborts with a
          // ConcurrentMutationException — retry re-resolves and
          // re-applies (the batch-id attr keeps it exactly-once either
          // way). The CREATE half guards too (ExpectNoVersions): an
          // unguarded first save racing a user's save of the same name
          // would silently overwrite their table as the new latest
          graft.catalog.Catalog.retryOnConflict(3) {
            if (catalog.versions(name).isEmpty)
              catalog.save(graft.core.Chain(batch), name,
                attrs = Seq(s"$prefix$id"),
                guardLatest =
                  Some(graft.catalog.Catalog.ExpectNoVersions))
            else
              catalog.append(name, batch, extraAttrs = Seq(s"$prefix$id"))
          }
          // live table-followers (datasetStream) see the batch too
          graft.delta.Delta.healDatasetStream(catalog, name)
        }
        ()
      }
      .start()
  }

  /**
   * Streaming CDC apply — Delta's `APPLY CHANGES INTO` shape on this
   * catalog: every micro-batch of change rows MERGEs into `name` as a
   * new copy-on-write version (foreachBatch → `Catalog.mergeInto`), so a
   * CDC feed continuously maintains a queryable, time-travelable table
   * while each merge still rewrites only key-overlapping files.
   *
   *  - `seqCol`: last-write-wins WITHIN a micro-batch — only the highest
   *    sequence per key is applied (cross-batch, later batches win by
   *    version order). Without it, a batch-wide pre-flight rejects
   *    duplicate keys loudly BEFORE any version commits — including a
   *    delete+upsert pair of one key, which has no order authority.
   *  - `deleteCol`: rows with this boolean column TRUE delete their key
   *    (matchedAction="delete", inserts off — deleting an absent key is
   *    a no-op); the rest upsert. Both marker columns are stripped
   *    before the merge so the source matches the target schema.
   *
   * Batches that carry only one kind of change produce one version; a
   * mixed batch produces two (deletes, then upserts — disjoint keys
   * after the LWW dedup, so the order is immaterial). Empty frames
   * short-circuit inside mergeInto without bumping a version.
   */
  def applyChanges(stream: DataFrame, catalog: graft.catalog.Catalog,
                   name: String, on: Seq[String], checkpointDir: String,
                   seqCol: Option[String] = None,
                   deleteCol: Option[String] = None,
                   evolveSchema: Boolean = false,
                   trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        if (!batch0.isEmpty) {
          val batch = seqCol match {
            case Some(sc) =>
              // ties on the sequence value must break DETERMINISTICALLY:
              // a delete+upsert pair sharing one seq would otherwise be
              // applied by partition-order luck, and a checkpoint replay
              // could pick the other row. Contract: the tombstone wins a
              // tie (conservative), then a content hash totalizes the
              // order for identical (seq, flag) rows.
              val tieBreak: Seq[org.apache.spark.sql.Column] =
                deleteCol.map(dc => col(dc).desc).toSeq :+
                  xxhash64(struct(batch0.columns.map(col): _*)).asc
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(on.map(col): _*)
                .orderBy(col(sc).desc +: tieBreak: _*)
              batch0.withColumn("__rn", row_number().over(w))
                .filter(col("__rn") === 1).drop("__rn")
            case None => batch0
          }
          // Pre-flight the WHOLE batch before ANY merge commits: the
          // deletes and upserts land as separate versions, so a
          // cardinality/null-key failure discovered only by the second
          // merge would leave a half-applied batch permanently visible
          // (and checkpoint replay would hit it forever). One agg pass:
          // without a seqCol, a key appearing twice — even once as a
          // delete and once as an upsert — has no order authority and
          // must fail loudly here; with a seqCol the LWW dedup above
          // already made keys unique and this validates null keys only.
          // After this gate, the only mid-batch failure left is an infra
          // error, and replaying the batch converges (re-deleting absent
          // keys is a no-op).
          val pre = batch.agg(
            count(lit(1)).as("n"),
            count_distinct(struct(on.map(col): _*)).as("nd"),
            sum(when(on.map(col(_).isNull).reduce(_ || _), 1L)
              .otherwise(0L)).as("nulls")).head()
          require(pre.getAs[Long]("nulls") == 0L,
            "applyChanges: batch has NULL keys")
          require(pre.getAs[Long]("nd") == pre.getAs[Long]("n"),
            "applyChanges: batch keys are not unique and no seqCol " +
              "orders them (a delete+upsert pair of one key is ambiguous)")
          val markers = seqCol.toSeq ++ deleteCol.toSeq
          // each merge retries through a concurrent-mutation abort
          // individually (mergeInto re-resolves latest per call, and
          // replaying a committed half converges: re-deleting absent
          // keys is a no-op, re-upserting is idempotent by key)
          deleteCol match {
            case Some(dc) =>
              val dels = batch.filter(coalesce(col(dc), lit(false)))
                .drop(markers: _*)
              val ups = batch.filter(!coalesce(col(dc), lit(false)))
                .drop(markers: _*)
              graft.catalog.Catalog.retryOnConflict(3) {
                catalog.mergeInto(name, dels, on,
                  matchedAction = "delete", insertNotMatched = false,
                  evolveSchema = evolveSchema)
              }
              graft.catalog.Catalog.retryOnConflict(3) {
                catalog.mergeInto(name, ups, on,
                  evolveSchema = evolveSchema)
              }
            case None =>
              graft.catalog.Catalog.retryOnConflict(3) {
                catalog.mergeInto(name, batch.drop(markers: _*), on,
                  evolveSchema = evolveSchema)
              }
          }
        }
        ()
      }
      .start()
}
