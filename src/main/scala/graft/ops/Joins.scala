package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal / interval join operators the reference lacks (its merge is
 * equi-or-theta only, reference: src/datachain/lib/dc/datachain.py:1601) but
 * large-scale event pipelines need. Both avoid the naive broadcast-nested-
 * loop plan Spark would pick for an inequality condition:
 *
 *  - [[asofBackward]]: ONE shuffle (union + window), never a cross product.
 *    For each left row (key, t) it attaches the right row with the greatest
 *    right-time <= t for the same key — the standard "merge two sorted
 *    streams" formulation, so 100 TB of events against 100 TB of quotes
 *    costs the same as one sort-merge join on the key.
 *  - [[rangeJoinBinned]]: maps the interval containment `lo <= p < hi` onto
 *    an equi-join over fixed-width bins (interval exploded to the bins it
 *    covers), then re-filters exactly. Shuffle-hash-joinable, AQE-skew-
 *    splittable; bin width trades duplication factor vs selectivity.
 */
object Joins {

  /**
   * Backward as-of join. `right`'s non-key, non-time columns are attached to
   * each left row from the latest right row whose time <= the left row's
   * time (per key). Rows with no preceding right row keep nulls (left
   * semantics). `tolerance` (same units as the time column; epoch seconds
   * for timestamps) drops matches further back than the given distance.
   *
   * Right rows should be unique per (key, time) — pre-aggregate otherwise
   * (ties would be resolved arbitrarily, same as any engine).
   *
   * `allowExactMatches = false` (pandas parity flag) requires right-time
   * STRICTLY before the left time: implemented by flipping the side sort
   * so coincident right rows land after the left row, outside its frame —
   * same single shuffle, no extra pass.
   */
  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
                   leftTime: String, rightTime: String,
                   tolerance: Option[Double] = None,
                   allowExactMatches: Boolean = true): DataFrame = {
    val (merged, valueCols, scale) = asofSetup(left, right, on, leftTime, rightTime)
    // Right rows sort before left rows at equal times (side 0 < 1), so an
    // exactly-coincident right row is visible to the left row; strict mode
    // reverses the side order to hide it.
    val sideOrd = if (allowExactMatches) col("__side").asc else col("__side").desc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, sideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = merged
      .withColumn("__m", last(asofPayload(valueCols), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withinTol = tolerance match {
      case Some(tol) => col("__m").isNotNull && (col("__t") - col("__m.__rt") <= tol * scale)
      case None      => col("__m").isNotNull
    }
    // a null-time LEFT row has no defined as-of position — null payload
    val outVals = valueCols.map(v =>
      when(col("__t").isNotNull && withinTol, col(s"__m.$v")).as(v))
    matched.select(left.columns.map(col).toSeq ++ outVals: _*)
  }

  /**
   * Forward as-of join: the EARLIEST right row whose time >= the left
   * row's time (per key) — pandas `merge_asof(direction='forward')`.
   * Same single-shuffle union+window shape as [[asofBackward]], with the
   * frame reversed.
   */
  def asofForward(left: DataFrame, right: DataFrame, on: Seq[String],
                  leftTime: String, rightTime: String,
                  tolerance: Option[Double] = None,
                  allowExactMatches: Boolean = true): DataFrame = {
    val (merged, valueCols, scale) = asofSetup(left, right, on, leftTime, rightTime)
    // side DESC puts left rows before right at equal times, and the
    // [current, following] frame then sees the coincident right row; strict
    // mode reverses the side order so the coincident row falls before the
    // left row, outside its frame.
    val sideOrd = if (allowExactMatches) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, sideOrd)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = merged
      .withColumn("__m", first(asofPayload(valueCols), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withinTol = tolerance match {
      case Some(tol) => col("__m").isNotNull && (col("__m.__rt") - col("__t") <= tol * scale)
      case None      => col("__m").isNotNull
    }
    // a null-time left row sorts to the frame head under asc nulls-first
    // and would otherwise match the earliest right row
    val outVals = valueCols.map(v =>
      when(col("__t").isNotNull && withinTol, col(s"__m.$v")).as(v))
    matched.select(left.columns.map(col).toSeq ++ outVals: _*)
  }

  /**
   * Nearest as-of join: whichever of the backward / forward candidates is
   * closer in time, ties to backward — pandas
   * `merge_asof(direction='nearest')`. One exchange; the two directional
   * windows share the hash partitioning and differ only in sort order.
   * `tolerance` bounds the distance in EITHER direction (a candidate past
   * it is ignored, not merely nulled).
   */
  def asofNearest(left: DataFrame, right: DataFrame, on: Seq[String],
                  leftTime: String, rightTime: String,
                  tolerance: Option[Double] = None,
                  allowExactMatches: Boolean = true): DataFrame = {
    val (merged, valueCols, scale) = asofSetup(left, right, on, leftTime, rightTime)
    val bSideOrd = if (allowExactMatches) col("__side").asc else col("__side").desc
    val fSideOrd = if (allowExactMatches) col("__side").desc else col("__side").asc
    val wb = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, bSideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, fSideOrd)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val payload = asofPayload(valueCols)
    val matched = merged
      .withColumn("__mb", last(payload, ignoreNulls = true).over(wb))
      .withColumn("__mf", first(payload, ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    // __t is long micros for timestamp inputs, so these distances — and the
    // bdiff <= fdiff tie comparison — are integer-exact (a double-seconds
    // key could flip an exact-µs tie to forward).
    val bdiff = col("__t") - col("__mb.__rt")
    val fdiff = col("__mf.__rt") - col("__t")
    val (bOk, fOk) = tolerance match {
      case Some(tol) =>
        (col("__mb").isNotNull && bdiff <= tol * scale,
          col("__mf").isNotNull && fdiff <= tol * scale)
      case None => (col("__mb").isNotNull, col("__mf").isNotNull)
    }
    val useB = bOk && (!fOk || bdiff <= fdiff)
    val outVals = valueCols.map(v =>
      when(useB, col(s"__mb.$v")).otherwise(when(fOk, col(s"__mf.$v"))).as(v))
    matched.select(left.columns.map(col).toSeq ++ outVals: _*)
  }

  /** Shared union-frame setup for the as-of family: left/right stacked
    * with a side marker and a time key — ONE shuffle serves any
    * directional window over it. When both time columns are timestamps the
    * key is LONG MICROSECONDS (`unix_micros`) so sort order, tie detection,
    * and the nearest-side distance comparison are exact at Spark's native
    * timestamp resolution — a double-seconds key has ~0.24 µs granularity
    * at epoch magnitudes, enough to flip an exact-µs tie. The returned
    * scale converts a caller tolerance (epoch SECONDS for timestamps, raw
    * units otherwise) into key units. */
  private def asofSetup(left: DataFrame, right: DataFrame, on: Seq[String],
                        leftTime: String, rightTime: String)
      : (DataFrame, Seq[String], Double) = {
    require(on.nonEmpty, "as-of join needs at least one key column")
    val valueCols = right.columns.toSeq.filterNot(c => on.contains(c) || c == rightTime)
    require(valueCols.nonEmpty, "right side has no value columns to attach")
    val collide = valueCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"right value columns collide with left: $collide")
    val reserved = Set("__t", "__side", "__m", "__mb", "__mf")
    val reservedHit = (left.columns ++ right.columns).filter(reserved.contains).toSet
    require(reservedHit.isEmpty, s"input columns use reserved internal names: $reservedHit")
    import org.apache.spark.sql.types.TimestampType
    val bothTs = left.schema(leftTime).dataType == TimestampType &&
      right.schema(rightTime).dataType == TimestampType
    val tkey = (c: String) =>
      if (bothTs) unix_micros(col(c)) else col(c).cast("double")
    val scale = if (bothTs) 1e6 else 1.0
    val l2 = left.withColumn("__t", tkey(leftTime))
      .withColumn("__side", lit(1))
    val r2 = right.withColumn("__t", tkey(rightTime))
      .withColumn("__side", lit(0))
      .drop(rightTime)
      // a right row with a NULL key or NULL time is never a valid as-of
      // candidate: null times sort to the frame head (asc nulls-first)
      // and would attach their payload to every left row, and null keys
      // would pair with null-key left rows — both diverging from
      // equi-join / pandas merge_asof semantics (empirically confirmed)
      .filter(col("__t").isNotNull &&
        on.map(col(_).isNotNull).reduce(_ && _))
    (l2.unionByName(r2, allowMissingColumns = true), valueCols, scale)
  }

  /** The whole right payload rides in one struct so genuinely-null value
    * columns survive (last/first(ignoreNulls) over bare columns would
    * skip them). */
  private def asofPayload(valueCols: Seq[String]): Column =
    when(col("__side") === 0,
      struct((valueCols.map(col) :+ col("__t").as("__rt")): _*))

  /**
   * Salted equi-join for skewed keys: the `big` side gets a deterministic
   * whole-row-hash salt in [0, buckets); the `small` side replicates
   * ×buckets; the join keys on (key, salt), so a hot key's rows spread
   * across `buckets` reducers instead of melting one task. This is the
   * skew weapon for the regime the other two don't cover: the small side
   * too large to broadcast, and a non-sort-merge join (or a downstream
   * pipeline) where AQE's skew splitting can't fire. Cost model: big side
   * moves once either way; the small side pays ×buckets replication —
   * worth it when buckets × |small| ≪ the straggler time of the hot key.
   *
   * Only `inner` and `left_outer` (big side preserved) are sound: a
   * right/full join would surface each unmatched replicated small row
   * `buckets` times.
   */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, buckets: Int,
                 how: String = "inner"): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    require(Seq("inner", "left", "left_outer").contains(how),
      s"saltedJoin supports inner/left_outer, not $how")
    require((big.columns ++ small.columns).forall(c =>
      c != "__salt" && c != "__rep"),
      "input columns use reserved internal names __salt/__rep")
    // salt from the whole row's hash: deterministic (re-runs and retries
    // agree), and a hot KEY's rows still spread because the non-key
    // columns vary row to row
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets.toLong)))
    val replicated = small.withColumn("__rep",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          col("__salt") === col("__rep"), how)
      .drop("__salt", "__rep")
  }

  /**
   * Inner range join: each point row joins interval rows containing it
   * (`lo <= point < hi`). Intervals explode to the fixed-width bins they
   * cover; the join runs as a hash equi-join on the bin plus the exact
   * containment filter. Pick `binWidth` near the typical interval length:
   * duplication factor = interval_len / binWidth + 1.
   */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double, maxBinsPerInterval: Int = 100000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require((points.columns ++ intervals.columns).forall(_ != "__bin"),
      "input columns use reserved internal name __bin")
    val bin = (c: Column) => floor(c / binWidth).cast("long")
    val pts = points.withColumn("__bin", bin(col(pointCol)))
    // Guard against intervals vastly wider than binWidth (or corrupt lo > hi,
    // where sequence() would silently descend): fail fast per row rather than
    // exceeding Spark's sequence-length cap mid-job.
    val lo = bin(col(loCol))
    val hi = bin(col(hiCol))
    val guarded = when(hi < lo, raise_error(concat(
        lit(s"rangeJoinBinned: $loCol > $hiCol on row with lo="), col(loCol).cast("string"))))
      .when(hi - lo >= maxBinsPerInterval, raise_error(concat(
        lit(s"rangeJoinBinned: interval spans >= $maxBinsPerInterval bins; raise binWidth (lo="),
        col(loCol).cast("string"), lit(")"))))
      .otherwise(sequence(lo, hi))
    val ivs = intervals.withColumn("__bin", explode(guarded))
    pts.join(ivs, Seq("__bin"), "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /**
   * Interval×interval OVERLAP join: pairs where `[aLo,aHi)` and
   * `[bLo,bHi)` intersect. Both sides explode to fixed-width bins and
   * hash-join on the bin — never a cross join — with the exact overlap
   * predicate on the survivors. A pair that overlaps across several bins
   * would duplicate, so each pair is emitted ONLY from its canonical bin
   * (the bin of the overlap's left edge, `max(aLo,bLo)`): exact dedup
   * with no `distinct` shuffle at all.
   *
   * Scale shape: one exchange per side on the bin key; duplication factor
   * = interval_len/binWidth + 1 per side. Pick `binWidth` near the
   * typical interval length. An optional equi-key (`keyCols`) co-joins on
   * (key, bin) — the usual "overlaps within the same user/session" form,
   * which also bounds per-bin fanout to the key's own rows.
   */
  def intervalOverlapJoin(a: DataFrame, aLo: String, aHi: String,
                          b: DataFrame, bLo: String, bHi: String,
                          binWidth: Double, keyCols: Seq[(String, String)] = Nil,
                          maxBinsPerInterval: Int = 100000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require((a.columns ++ b.columns).forall(_ != "__bin"),
      "input columns use reserved internal name __bin")
    def bins(lo: String, hi: String): Column = {
      val l = floor(col(lo) / binWidth).cast("long")
      val h = floor(col(hi) / binWidth).cast("long")
      // compare the VALUES, not the bins: an inverted interval whose
      // ends share a bin (lo=5.6, hi=5.2, width 1) slipped the bin-level
      // guard and emitted spurious pairs (empty set "overlapping").
      // lo == hi passes: the overlap predicate then degenerates to the
      // half-open point-containment test, the conventional reading of a
      // degenerate interval.
      when(col(hi) < col(lo), raise_error(concat(
          lit(s"intervalOverlapJoin: $lo > $hi on row with lo="),
          col(lo).cast("string"))))
        .when(h - l >= maxBinsPerInterval, raise_error(concat(
          lit(s"intervalOverlapJoin: interval spans >= $maxBinsPerInterval " +
            s"bins; raise binWidth (lo="), col(lo).cast("string"), lit(")"))))
        .otherwise(sequence(l, h))
    }
    val ea = a.withColumn("__bin", explode(bins(aLo, aHi)))
    val eb = b.withColumn("__bin", explode(bins(bLo, bHi)))
    val keyPred = keyCols.map { case (ka, kb) => ea(ka) === eb(kb) }
      .foldLeft(ea("__bin") === eb("__bin"))(_ && _)
    ea.join(eb, keyPred)
      // exact overlap of half-open intervals
      .filter(ea(aLo) < eb(bHi) && eb(bLo) < ea(aHi))
      // canonical-bin emission: exactly one surviving bin per pair
      .filter(ea("__bin") ===
        floor(greatest(ea(aLo), eb(bLo)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
