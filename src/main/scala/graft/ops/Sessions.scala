package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch sessionization — gap-based session ids over event streams, the
 * declarative (window-function) twin of the stateful streaming version
 * ([[graft.streaming.EventStream.statefulSessionize]]).
 *
 * One shuffle on the entity key; both window passes share the same
 * partitioning, so Catalyst plans a single exchange.
 */
object Sessions {

  /**
   * Adds `sessionCol`: 1-based session id per `keyCol`, a new session
   * starting whenever the gap since the previous event exceeds `gapSec`.
   * `tieBreak` makes ordering total when timestamps collide.
   */
  /**
   * Ordered-funnel completion per entity: for `steps = Seq(s1, s2, …)`,
   * computes the earliest strictly-increasing timestamp chain t1 < t2 < …
   * (greedy-earliest per step, the standard funnel semantics: t_{i+1} is
   * the first s_{i+1} event after t_i; optionally within `maxGapSec` of
   * t_i). Returns one row per entity that completed at least step 1:
   * (key, t_1 … t_S as epoch-microsecond longs, null where unreached,
   * step_reached).
   *
   * Scale shape: NO per-entity event collection (whale-user safe) and NO
   * window sort — each step is one min-aggregate plus one join; every
   * aggregate and join keys on the entity, so after the first exchange
   * all S-1 joins reuse the same hash partitioning. Greedy-earliest is
   * what makes single-pass mins correct: t_i is a per-entity constant
   * when step i+1 scans for its minimum.
   */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
             steps: Seq[String], maxGapSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val base = df.select(col(keyCol), col(tsCol).as("__ts"),
      col(typeCol).as("__tp"))
    // frames(i): entities reaching step i+1, with column t{i+1} (epoch µs)
    val frames = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val evs = base.filter(col("__tp") === step)
        Some(prev match {
          case None =>
            evs.groupBy(keyCol).agg(unix_micros(min(col("__ts"))).as("t1"))
          case Some(p) =>
            val tPrev = col(s"t$i")
            val within = maxGapSec
              .map(g => unix_micros(col("__ts")) <= tPrev + g * 1000000L)
              .getOrElse(lit(true))
            evs.join(p.select(col(keyCol).as("__k"), tPrev),
                col(keyCol) === col("__k"))
              .filter(unix_micros(col("__ts")) > tPrev && within)
              .groupBy(keyCol)
              .agg(unix_micros(min(col("__ts"))).as(s"t${i + 1}"))
        })
    }.flatten
    val out = frames.zipWithIndex.drop(1).foldLeft(frames.head) {
      case (acc, (f, i)) =>
        acc.join(f.select(col(keyCol).as(s"__k$i"), col(s"t${i + 1}")),
          col(keyCol) === col(s"__k$i"), "left_outer").drop(s"__k$i")
    }
    out.withColumn("step_reached",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  /**
   * Rolling N-day distinct entities from mergeable daily HLL sketches —
   * the DAU/WAU/MAU primitive: one pass builds a ~16 KB sketch per day,
   * and every rolling window is a SKETCH MERGE over the frame, not a
   * rescan of N days of raw events (exact rolling distinct cannot reuse
   * yesterday's work at all — distinct doesn't subtract). Daily sketches
   * partial-aggregate map-side; the window then slides over one tiny row
   * per day. Estimates carry the lgK error envelope (0.41% at the
   * default 14; exact while a window's cardinality stays in the sketch's
   * sparse regime — the gate's oracle-able regime).
   *
   * Returns (day, active, rolling_active): per-day distinct estimate and
   * the trailing `days`-day distinct estimate. The frame is ROWS over
   * the days PRESENT in the data (a day with zero events does not
   * occupy a frame slot) — densify the day spine first if calendar
   * frames matter. The slide itself is a single-partition window over
   * one row per day — trivially small at any horizon.
   */
  def rollingDistinct(df: DataFrame, keyCol: String, tsCol: String,
                      days: Int = 7, lgK: Int = 14): DataFrame = {
    require(days >= 1, "need a positive window")
    val daily = df.groupBy(date_trunc("day", col(tsCol)).as("__day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("__sk"))
    val w = Window.orderBy(col("__day"))
      .rowsBetween(-(days - 1), Window.currentRow)
    daily.select(
      col("__day").cast("date").cast("string").as("day"),
      hll_sketch_estimate(col("__sk")).as("active"),
      hll_sketch_estimate(hll_union_agg(col("__sk"), lit(true)).over(w))
        .as("rolling_active"))
  }

  /**
   * Weekly retention cohorts: entities cohorted by the ISO week of their
   * first event; one row per (cohort_week, week_offset) with the distinct
   * entities active in that week — the curve every engagement dashboard
   * draws. Activity is pre-`distinct`ed to (entity, week) before the
   * cohort join, so the join input is bounded by entities×weeks, not raw
   * events; both the distinct and the join key on the entity and share
   * one partitioning.
   */
  def retentionCohorts(df: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val firsts = df.groupBy(keyCol)
      .agg(date_trunc("week", min(col(tsCol))).as("__cohort"))
    val act = df.select(col(keyCol).as("__k"),
      date_trunc("week", col(tsCol)).as("__week")).distinct()
    // week_offset in the DATE domain: a seconds-diff / 604800 would be
    // off by ±3600·n across a DST transition in non-UTC session zones
    // (6.99 truncating to 6), and datediff-of-dates is immune to that
    act.join(firsts, col(keyCol) === col("__k"))
      .groupBy(col("__cohort").cast("date").cast("string").as("cohort_week"),
        floor(datediff(col("__week").cast("date"),
          col("__cohort").cast("date")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col(keyCol)).as("active_users"))
  }

  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSec: Long = 1800, tieBreak: Option[String] = None,
                 sessionCol: String = "session_id"): DataFrame = {
    require(!df.columns.contains(sessionCol),
      s"input already has a '$sessionCol' column")
    val order: Seq[Column] =
      col(tsCol).asc +: tieBreak.map(c => col(c).asc).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    // MICROSECOND-precision gap: unix_timestamp truncates to whole
    // seconds, so sub-second event data misclassified gaps up to ~1 s
    // past the threshold as within-session (1800.8 s read as 1800) —
    // and the streaming sessionizer compares exact micros
    val newSession = when(prev.isNull, 1)
      .when(unix_micros(col(tsCol)) - unix_micros(prev) >
        gapSec * 1000000L, 1)
      .otherwise(0)
    df.withColumn(sessionCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast("long"))
  }
}
