package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{Catalog, SemVer}
import graft.core.{Chain, Sys}

/** One aggregate of a materialized view: `fn` over source column `in`
  * exposed as result column `out`. `fn` ∈
  * count|sum|avg|min|max|approx_distinct; count takes `in = "*"` for
  * count(*). approx_distinct maintains an HLL sketch per group (reads
  * back as the estimate; insert-only refreshes UNION sketches, removals
  * recompute the dirty groups — sketches are mergeable, not
  * subtractive). */
final case class MvAgg(out: String, fn: String, in: String)

/** What one [[MatView.refresh]] call did. `mode` ∈ noop (source
  * unchanged), additive (pure delta arithmetic, source never scanned),
  * recompute (dirty groups re-aggregated from the source), rebuild (the
  * sync cursor's source version was vacuumed — full recompute). */
final case class MvRefresh(mode: String, from: String, to: String,
                           dirtyGroups: Long, upserted: Long,
                           deleted: Long, versions: Seq[SemVer])

/**
 * Incrementally-maintained materialized aggregation views over catalog
 * datasets — the Spark/lake restatement of a streaming materialized view
 * (Databricks MV refresh / Materialize), built on this catalog's own
 * change-data-feed: a refresh costs O(changes since last refresh), never
 * O(table).
 *
 * Mechanics: [[create]] computes `source.groupBy(groupBy).agg(aggs)` and
 * saves it as a normal catalog dataset whose first version carries the
 * view definition in its attrs; each [[refresh]] diffs the source
 * versions committed since the last sync ([[Delta.readChangesRange]],
 * cursor = the `mv:synced` attr on the view's latest version), reduces
 * the change rows to per-group deltas, and applies them through
 * [[graft.catalog.Catalog.mergeInto]] — so only the view files whose
 * key envelopes overlap the dirty groups are rewritten, everything else
 * hard-links.
 *
 * Two maintenance paths, chosen by the aggregate set:
 *  - additive (count/sum/avg only): new state = old state + signed
 *    deltas. The SOURCE IS NEVER SCANNED — refresh reads only the change
 *    feed and the dirty slice of the view itself. Sums over float/double
 *    accumulate in DECIMAL(28,10) state: order-independent and exact
 *    for inputs with at most 10 fractional digits — each input is
 *    QUANTIZED to 10 dp on entry (a value below 5e-11 contributes 0
 *    while still counting toward the non-null count), which is what
 *    keeps the delta arithmetic reproducible where a float-additive
 *    view would drift from a full recompute; they read back as double.
 *  - recompute (min/max present AND the batch REMOVES rows): a deleted
 *    or updated-away row can strip a group's current min/max, which no
 *    bounded per-group state can repair, so the dirty groups
 *    re-aggregate from the source AT THE REFRESH'S PINNED VERSION — pruned to the
 *    files whose stats overlap the dirty keys. An insert-only batch
 *    (the streaming-append shape) keeps min/max ADDITIVE via
 *    least/greatest — zero source scans even for extreme-tracking
 *    views on an append-only table.
 *
 * At 100 TB: the change feed is O(mutated rows), per-group deltas are
 * one map-side-combined aggregation over it, the view join is
 * semi-pruned to dirty keys, and the merge rewrites only touched files.
 * A daily refresh over a 100 TB source with 0.1% churn moves ~100 GB,
 * not 100 TB.
 *
 * Null group keys are unsupported (the merge key contract); derive a
 * coalesced grouping column in the source instead. Reference analogue:
 * datachain re-runs the whole chain on refresh (delta=True re-computes
 * only new SOURCE rows but whole-table aggregations restate fully,
 * src/datachain/lib/dc/datachain.py `delta` docs); this engine maintains
 * the aggregate itself incrementally.
 */
object MatView {
  private val Fns = Set("count", "sum", "avg", "min", "max",
    "approx_distinct")

  /** lgConfigK of the HLL sketches backing approx_distinct state —
    * ~2.5 KB per group, <2% relative error, exact at low cardinality. */
  private val HllLgK = 12

  // attr-encoding separators; kept out of identifiers by [[validate]]
  private val Seps = Seq(":", ";", ",", "=")

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isFractional(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Exact accumulation types for fractional sums. The state is
    * (37,10), NOT (38,10): Spark sizes `(p1,s)+(p2,s)` at
    * `max(p1,p2)+1` and past 38 it SHRINKS THE SCALE to fit
    * (allowPrecisionLoss) — a (38,10) state would round every additive
    * refresh at 9 dp. At (37,10) the add lands exactly on (38,10) and
    * casts back losslessly; overflow needs a partial beyond 1e27. The
    * delta product likewise multiplies by sign cast to (1,0) — a
    * (28,10) sign would size the product at (38,6), silently rounding
    * each changed row at the 6th decimal. */
  private val DecIn = DecimalType(28, 10)
  private val DecState = DecimalType(37, 10)
  private val DecSign = DecimalType(1, 0)

  /** sum-state kind per agg, fixed at create and recorded in the attrs:
    * long (integral input), dec (fractional input, decimal state, double
    * read-back), native (min/max/count — stored as-is). */
  private def sumKind(dt: DataType): String =
    if (isIntegral(dt)) "long"
    else if (isFractional(dt)) "dec"
    else throw new IllegalArgumentException(
      s"mat view sum/avg needs a numeric column, got $dt")

  private def validate(source: String, rowKey: Seq[String],
                       groupBy: Seq[String], aggs: Seq[MvAgg]): Unit = {
    require(rowKey.nonEmpty, "mat view: empty rowKey")
    require(groupBy.nonEmpty, "mat view: empty groupBy")
    require(aggs.nonEmpty, "mat view: no aggregates")
    val outs = aggs.map(_.out)
    require(outs.distinct.size == outs.size,
      s"mat view: duplicate output columns in ${outs.mkString(",")}")
    outs.foreach(o => require(!groupBy.contains(o),
      s"mat view: output '$o' collides with a group key"))
    aggs.foreach { a =>
      require(Fns(a.fn), s"mat view: unknown aggregate '${a.fn}'")
      require(a.in != "*" || a.fn == "count",
        s"mat view: '*' input is count-only (got ${a.fn})")
    }
    (Seq(source) ++ rowKey ++ groupBy ++ outs ++ aggs.map(_.in))
      .foreach(n => Seps.foreach(sep => require(!n.contains(sep),
        s"mat view: identifier '$n' may not contain '$sep'")))
    (groupBy ++ outs).foreach(n => require(!n.startsWith("__"),
      s"mat view: '$n' — the __ prefix is reserved for view state"))
  }

  /** Per-agg STATE column kinds, resolved against the source schema. */
  private def kindsOf(aggs: Seq[MvAgg], src: StructType): Seq[String] =
    aggs.map {
      case MvAgg(_, "count", _) => "native"
      case MvAgg(_, "min", in) => { src(in); "native" }
      case MvAgg(_, "max", in) => { src(in); "native" }
      case MvAgg(_, "approx_distinct", in) => { src(in); "native" }
      case MvAgg(_, _, in) => sumKind(src(in).dataType) // sum | avg
    }

  /** Full-state aggregate columns (create + recompute paths). */
  private def stateAggs(aggs: Seq[MvAgg], kinds: Seq[String]): Seq[Column] =
    aggs.zip(kinds).flatMap {
      case (MvAgg(out, "count", "*"), _) => Seq(count(lit(1)).as(out))
      case (MvAgg(out, "count", in), _) => Seq(count(col(in)).as(out))
      case (MvAgg(out, "min", in), _) => Seq(min(col(in)).as(out))
      case (MvAgg(out, "max", in), _) => Seq(max(col(in)).as(out))
      case (MvAgg(out, "approx_distinct", in), _) =>
        Seq(hll_sketch_agg(col(in), lit(HllLgK)).as(out))
      case (MvAgg(out, "sum", in), "long") => Seq(
        coalesce(sum(col(in).cast(LongType)), lit(0L)).as(out),
        count(col(in)).as(s"__nn_$out"))
      case (MvAgg(out, "sum", in), _) => Seq(
        coalesce(sum(col(in).cast(DecIn)), lit(0).cast(DecIn))
          .cast(DecState).as(out),
        count(col(in)).as(s"__nn_$out"))
      case (MvAgg(out, "avg", in), "long") => Seq(
        coalesce(sum(col(in).cast(LongType)), lit(0L)).as(s"__s_$out"),
        count(col(in)).as(s"__c_$out"))
      case (MvAgg(out, "avg", in), _) => Seq(
        coalesce(sum(col(in).cast(DecIn)), lit(0).cast(DecIn))
          .cast(DecState).as(s"__s_$out"),
        count(col(in)).as(s"__c_$out"))
      case (MvAgg(_, fn, _), _) =>
        throw new IllegalStateException(s"state agg got unknown fn $fn")
    } :+ count(lit(1)).as("__mv_n")

  /** Signed-delta aggregate columns over a change feed (additive path).
    * `sign` is +1 for insert/update_postimage, -1 for
    * delete/update_preimage; sums of `sign * x` subtract removed rows. */
  private def deltaAggs(aggs: Seq[MvAgg], kinds: Seq[String],
                        sign: Column): Seq[Column] = {
    def nn(in: String) = // signed count of NON-NULL inputs
      coalesce(sum(when(col(in).isNotNull, sign).otherwise(0L)), lit(0L))
    def sLong(in: String) =
      coalesce(sum(sign * col(in).cast(LongType)), lit(0L))
    def sDec(in: String) = // (1,0)×(28,10) → (30,10): exact, see DecSign
      coalesce(sum((sign.cast(DecSign) * col(in).cast(DecIn)).cast(DecIn)),
        lit(0).cast(DecIn)).cast(DecState)
    aggs.zip(kinds).flatMap {
      case (MvAgg(out, "count", "*"), _) =>
        Seq(coalesce(sum(sign), lit(0L)).as(s"__d_$out"))
      case (MvAgg(out, "count", in), _) => Seq(nn(in).as(s"__d_$out"))
      case (MvAgg(out, "sum", in), "long") => Seq(
        sLong(in).as(s"__d_$out"), nn(in).as(s"__d___nn_$out"))
      case (MvAgg(out, "sum", in), _) => Seq(
        sDec(in).as(s"__d_$out"), nn(in).as(s"__d___nn_$out"))
      case (MvAgg(out, "avg", in), "long") => Seq(
        sLong(in).as(s"__d___s_$out"), nn(in).as(s"__d___c_$out"))
      case (MvAgg(out, "avg", in), _) => Seq(
        sDec(in).as(s"__d___s_$out"), nn(in).as(s"__d___c_$out"))
      // reached only for INSERT-ONLY batches (refresh routes any removal
      // to the recompute path); the sign guard keeps it provably safe
      case (MvAgg(out, "min", in), _) => Seq(
        min(when(sign === 1L, col(in))).as(s"__d_$out"))
      case (MvAgg(out, "max", in), _) => Seq(
        max(when(sign === 1L, col(in))).as(s"__d_$out"))
      case (MvAgg(out, "approx_distinct", in), _) => Seq(
        hll_sketch_agg(when(sign === 1L, col(in)), lit(HllLgK))
          .as(s"__d_$out"))
      case (MvAgg(_, fn, _), _) =>
        throw new IllegalStateException(s"additive path got $fn")
    } :+ coalesce(sum(sign), lit(0L)).as("__d___mv_n")
  }

  /** State column names in storage order (minus the group keys). */
  private def stateCols(aggs: Seq[MvAgg]): Seq[String] =
    aggs.flatMap {
      case MvAgg(out, "sum", _) => Seq(out, s"__nn_$out")
      case MvAgg(out, "avg", _) => Seq(s"__s_$out", s"__c_$out")
      case MvAgg(out, _, _) => Seq(out)
    } :+ "__mv_n"

  private def defAttrs(source: String, rowKey: Seq[String],
                       groupBy: Seq[String], aggs: Seq[MvAgg],
                       kinds: Seq[String]): Seq[String] = Seq(
    s"mv:src=$source",
    s"mv:rowkey=${rowKey.mkString(",")}",
    s"mv:groupby=${groupBy.mkString(",")}",
    s"mv:aggs=${aggs.zip(kinds).map { case (a, k) =>
      s"${a.out}:${a.fn}:${a.in}:$k" }.mkString(";")}")

  /** Materialize `source.groupBy(groupBy).agg(aggs)` as catalog dataset
    * `name`. `rowKey` is the SOURCE's row identity — the key the change
    * feed diffs on at refresh time. */
  def create(catalog: Catalog, name: String, source: String,
             rowKey: Seq[String], groupBy: Seq[String],
             aggs: Seq[MvAgg]): SemVer = {
    validate(source, rowKey, groupBy, aggs)
    require(catalog.versions(name).isEmpty,
      s"mat view: dataset '$name' already exists")
    val srcV = catalog.latestVersion(source).getOrElse(
      throw new NoSuchElementException(s"dataset $source not found"))
    val src = Sys.drop(catalog.readDataset(source, Some(srcV)).toDF)
    (rowKey ++ groupBy ++ aggs.map(_.in).filter(_ != "*")).foreach(c =>
      require(src.columns.contains(c),
        s"mat view: column '$c' not in $source (${src.columns.mkString(",")})"))
    val kinds = kindsOf(aggs, src.schema)
    val sa = stateAggs(aggs, kinds)
    val state = src.groupBy(groupBy.map(col): _*).agg(sa.head, sa.tail: _*)
    // null group keys are unsupported (merge key contract at refresh);
    // the check rides the save's own Observation — zero extra jobs
    catalog.save(Chain(state), name, deps = Seq(s"$source@v$srcV"),
      attrs = defAttrs(source, rowKey, groupBy, aggs, kinds) :+
        s"mv:synced=$srcV",
      expect = groupBy.map(k =>
        graft.catalog.Expect(s"mv-nonnull-key-$k", col(k).isNotNull)))
  }

  /** The recorded definition: (source, rowKey, groupBy, aggs, kinds). */
  def definitionOf(catalog: Catalog, name: String)
      : (String, Seq[String], Seq[String], Seq[MvAgg], Seq[String]) = {
    val vs = catalog.versions(name)
    require(vs.nonEmpty, s"mat view: dataset '$name' not found")
    val attrs = vs.iterator
      .map(v => catalog.annotationsOf(name, v)._2)
      .find(_.exists(_.startsWith("mv:src=")))
      .getOrElse(throw new IllegalArgumentException(
        s"'$name' is not a materialized view (no mv:src attr)"))
    def field(p: String): String = attrs.find(_.startsWith(p))
      .map(_.drop(p.length)).getOrElse(
        throw new IllegalStateException(s"mat view '$name': missing $p"))
    val parsed = field("mv:aggs=").split(';').toSeq.map { s =>
      s.split(':') match {
        case Array(out, fn, in, kind) => (MvAgg(out, fn, in), kind)
        case _ => throw new IllegalStateException(
          s"mat view '$name': bad agg encoding '$s'")
      }
    }
    (field("mv:src="), field("mv:rowkey=").split(',').toSeq,
      field("mv:groupby=").split(',').toSeq,
      parsed.map(_._1), parsed.map(_._2))
  }

  /** The view's user-facing face: group keys + aggregate results.
    * Decimal sum/avg state reads back as double; a sum whose group has
    * no non-null inputs reads NULL (SQL semantics), which the raw
    * additive state (0) cannot express on its own. */
  def read(catalog: Catalog, name: String): Chain = {
    val (_, _, groupBy, aggs, kinds) = definitionOf(catalog, name)
    val st = Sys.drop(catalog.readDataset(name).toDF)
    val outCols = groupBy.map(col) ++ aggs.zip(kinds).map {
      case (MvAgg(out, "sum", _), "long") =>
        when(col(s"__nn_$out") > 0L, col(out))
          .otherwise(lit(null).cast(LongType)).as(out)
      case (MvAgg(out, "sum", _), _) =>
        when(col(s"__nn_$out") > 0L, col(out).cast(DoubleType))
          .otherwise(lit(null).cast(DoubleType)).as(out)
      case (MvAgg(out, "avg", _), _) =>
        when(col(s"__c_$out") > 0L,
          col(s"__s_$out").cast(DoubleType) / col(s"__c_$out"))
          .otherwise(lit(null).cast(DoubleType)).as(out)
      case (MvAgg(out, "approx_distinct", _), _) =>
        coalesce(hll_sketch_estimate(col(out)), lit(0L)).as(out)
      case (MvAgg(out, _, _), _) => col(out)
    }
    Chain(st.select(outCols: _*),
      graft.core.OpTree.empty.append("mat_view_read", name))
  }

  /** Advance the view to the source's latest version. Returns what ran;
    * a no-op refresh writes nothing. `keyCollectMax` bounds the dirty
    * key list that rides IN-predicates into stats/bloom-pruned reads —
    * beyond it, reads stay full scans semi-joined to the dirty keys. */
  def refresh(catalog: Catalog, name: String,
              keyCollectMax: Int = 10000): MvRefresh = {
    val (source, rowKey, groupBy, aggs, kinds) = definitionOf(catalog, name)
    val srcLatest = catalog.latestVersion(source).getOrElse(
      throw new NoSuchElementException(s"dataset $source not found"))
    // crash recovery FIRST: a refresh is [mark pending → merge commits →
    // cursor patch → clear pending]. A dangling mark on an OLDER version
    // means merges committed but the cursor never landed — the deltas
    // may be half-applied, so only a full rebuild is exact. A mark on
    // the LATEST version means the crash hit before any merge: clear
    // and proceed normally.
    val preLatest = catalog.latestVersion(name).get
    pendingOf(catalog, name) match {
      case Some(p) if p != preLatest =>
        val r = rebuild(catalog, name, source, rowKey, groupBy, aggs,
          kinds, cursorOf(catalog, name), srcLatest, mode = "recover")
        clearPending(catalog, name, p)
        return r
      case Some(p) => clearPending(catalog, name, p)
      case None => ()
    }
    val cursor = cursorOf(catalog, name)
    if (cursor == srcLatest)
      return MvRefresh("noop", cursor.toString, cursor.toString, 0, 0, 0, Nil)
    if (!catalog.versions(source).contains(cursor))
      return rebuild(catalog, name, source, rowKey, groupBy, aggs, kinds,
        cursor, srcLatest)

    // the change feed, compared only on the columns the view reads —
    // updates to irrelevant columns never become dirty groups. When
    // every view input sits inside the row key, compare a key column to
    // itself: matched rows can never differ on it, so updates vanish
    // from the feed entirely (an empty compare would mean "compare
    // everything" downstream — the opposite).
    val relevant = (groupBy ++ aggs.map(_.in).filter(_ != "*"))
      .distinct.filterNot(rowKey.contains)
    val cmpCols = if (relevant.nonEmpty) relevant else Seq(rowKey.head)
    val changes = Delta.readChangesRange(catalog, source, cursor, srcLatest,
        rowKey, compare = cmpCols).toDF
      .select((rowKey ++ relevant).map(col) :+ col("_change_type"): _*)
      .persist()
    try {
      val dirty = changes.select(groupBy.map(col): _*).distinct()
      // ONE job answers three probes (was up to three): the dirty-group
      // collect carries a per-group removal flag, so the
      // needsRecompute probe below and (in the collected case) the
      // null-key check read the same collected rows instead of running
      // their own jobs. When the cap trims the collect, the per-group
      // flags are incomplete and both probes fall back to their own
      // (cheap, cache-served) queries — the rare >keyCollectMax path.
      val dirtyFlagged = changes.groupBy(groupBy.map(col): _*)
        .agg(max(when(col("_change_type")
          .isin("delete", "update_preimage"), 1L).otherwise(0L))
          .as("__mv_rm"))
        .limit(keyCollectMax + 1).collect()
      if (dirtyFlagged.isEmpty) { // versions advanced, view-relevant data didn't
        patchCursor(catalog, name, source, srcLatest,
          defAttrs(source, rowKey, groupBy, aggs, kinds))
        return MvRefresh("additive", cursor.toString, srcLatest.toString,
          0, 0, 0, Nil)
      }
      val capped = dirtyFlagged.length > keyCollectMax
      // the group-key prefix of each collected row (drops __mv_rm), the
      // same shape the old distinct-collect produced for readPruned
      val collected =
        if (capped) None
        else Some(dirtyFlagged.map(r =>
          org.apache.spark.sql.Row.fromSeq(groupBy.indices.map(r.get))))
      // null group keys break the merge contract — fail with the view's
      // own message (driver-side on the collected keys, one agg otherwise)
      val nullKeyed =
        if (!capped) dirtyFlagged.exists(r => groupBy.indices.exists(r.isNullAt))
        else {
          val nulls = groupBy.map(c =>
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
          val r = dirty.agg(nulls.head, nulls.tail: _*).head()
          groupBy.exists(k => r.getAs[Long](k) > 0L)
        }
      require(!nullKeyed, s"mat view '$name': changed rows carry NULL " +
        "group keys — null group keys are unsupported; group by a " +
        "coalesced derived column instead")
      val sign = when(col("_change_type").isin("insert", "update_postimage"),
        1L).otherwise(-1L)
      // min/max only force a source recompute when a change REMOVES a
      // row (delete / update pre-image) — a removal can strip a group's
      // current extreme, which no bounded state repairs. An INSERT-ONLY
      // batch (the streaming-append shape) extends extremes with
      // least/greatest and stays on the zero-source-scan additive path.
      // min/max and HLL sketches are mergeable but not SUBTRACTIVE —
      // only they care whether the batch removes rows (and the probe
      // rides the dirty collect above — no extra job when uncapped)
      val nonSubtractive = aggs.exists(a =>
        a.fn == "min" || a.fn == "max" || a.fn == "approx_distinct")
      val needsRecompute = nonSubtractive && {
        if (!capped) dirtyFlagged.exists(_.getAs[Long]("__mv_rm") == 1L)
        else changes
          .filter(col("_change_type").isin("delete", "update_preimage"))
          .limit(1).collect().nonEmpty
      }

      val combined: DataFrame = if (needsRecompute) {
        // dirty groups re-aggregate from the source (min/max repair);
        // groups whose rows all vanished surface as null __mv_n
        // PINNED at srcLatest: an unpinned read resolves latest at call
        // time, so a source commit landing mid-refresh would bake into
        // the dirty groups while the cursor only advances to srcLatest —
        // the next refresh would re-apply those rows (rebuild() pins the
        // same way)
        val srcRows = readPruned(catalog, source, groupBy, dirty,
          collected, Some(srcLatest))
        val fresh = srcRows.groupBy(groupBy.map(col): _*)
          .agg(stateAggs(aggs, kinds).head, stateAggs(aggs, kinds).tail: _*)
        dirty.join(fresh, groupBy, "left")
      } else {
        // pure delta arithmetic: old state (dirty slice of the view) +
        // signed change sums; the source is never scanned
        val deltas = changes.groupBy(groupBy.map(col): _*)
          .agg(deltaAggs(aggs, kinds, sign).head,
            deltaAggs(aggs, kinds, sign).tail: _*)
        val old = readPruned(catalog, name, groupBy, dirty, collected)
        val joined = deltas.join(old, groupBy, "left")
        def add(c: String): Column = {
          val dt = old.schema.find(_.name == c).map(_.dataType)
            .getOrElse(LongType)
          dt match {
            case LongType => (coalesce(col(c), lit(0L)) +
              col(s"__d_$c")).as(c)
            case d: DecimalType => (coalesce(col(c), lit(0).cast(d)) +
              col(s"__d_$c")).cast(d).as(c)
            case other => throw new IllegalStateException(
              s"additive state col $c: unexpected type $other")
          }
        }
        val stCols = aggs.zip(kinds).flatMap {
          case (MvAgg(out, "count", _), _) => Seq(add(out))
          case (MvAgg(out, "sum", _), _) => Seq(add(out), add(s"__nn_$out"))
          case (MvAgg(out, "avg", _), _) =>
            Seq(add(s"__s_$out"), add(s"__c_$out"))
          // least/greatest skip nulls: a new group takes the delta, an
          // all-null delta keeps the old extreme — exactly min/max over
          // the union when nothing was removed
          case (MvAgg(out, "min", _), _) =>
            Seq(least(col(out), col(s"__d_$out")).as(out))
          case (MvAgg(out, "max", _), _) =>
            Seq(greatest(col(out), col(s"__d_$out")).as(out))
          // sketches UNION for insert-only batches (HLL is mergeable,
          // never subtractive — removals route to recompute above)
          case (MvAgg(out, "approx_distinct", _), _) =>
            Seq(when(col(out).isNull, col(s"__d_$out"))
              .when(col(s"__d_$out").isNull, col(out))
              .otherwise(hll_union(col(out), col(s"__d_$out"))).as(out))
          case (MvAgg(_, fn, _), _) =>
            throw new IllegalStateException(s"additive combine got $fn")
        } :+ add("__mv_n")
        joined.select(groupBy.map(col) ++ stCols: _*)
      }

      val comb = combined.persist()
      try {
        val neg = comb.filter(col("__mv_n") < 0L).limit(1).collect()
        require(neg.isEmpty, s"mat view '$name': negative group count " +
          s"after delta apply — change feed inconsistent at ${neg.toSeq}")
        val stored = groupBy ++ stateCols(aggs)
        val ups = comb.filter(col("__mv_n") > 0L).select(stored.map(col): _*)
        val mvSchema = Sys.drop(catalog.readDataset(name).toDF).schema
        val dels = comb.filter(col("__mv_n").isNull || col("__mv_n") === 0L)
          .select(mvSchema.map(f =>
            if (groupBy.contains(f.name)) col(f.name)
            else lit(null).cast(f.dataType).as(f.name)): _*)
        var versions = Vector.empty[SemVer]
        val before = catalog.latestVersion(name)
        setPending(catalog, name, preLatest, srcLatest)
        val r1 = catalog.mergeInto(name, ups, groupBy,
          keyCollectMax = keyCollectMax)
        if (!before.contains(r1.version)) versions :+= r1.version
        // an empty delete set early-exits inside mergeInto with no write
        val r2 = catalog.mergeInto(name, dels, groupBy,
          insertNotMatched = false, matchedAction = "delete",
          keyCollectMax = keyCollectMax)
        if (!versions.lastOption.contains(r2.version) &&
          !before.contains(r2.version)) versions :+= r2.version
        patchCursor(catalog, name, source, srcLatest,
          defAttrs(source, rowKey, groupBy, aggs, kinds))
        if (!catalog.latestVersion(name).contains(preLatest))
          clearPending(catalog, name, preLatest)
        MvRefresh(if (needsRecompute) "recompute" else "additive",
          cursor.toString, srcLatest.toString,
          collected.map(_.length.toLong).getOrElse(dirty.count()),
          r1.rowsMatched + r1.rowsInserted, r2.rowsMatched, versions)
      } finally comb.unpersist()
    } finally changes.unpersist()
  }

  /** Cursor-lost fallback (the synced-from source version was vacuumed
    * and the hop chain is gone): recompute the whole view as a NEW
    * version — still a single save, and the view's history stays
    * time-travelable. */
  private def rebuild(catalog: Catalog, name: String, source: String,
                      rowKey: Seq[String], groupBy: Seq[String],
                      aggs: Seq[MvAgg], kinds: Seq[String],
                      cursor: SemVer, srcLatest: SemVer,
                      mode: String = "rebuild"): MvRefresh = {
    val src = Sys.drop(catalog.readDataset(source, Some(srcLatest)).toDF)
    val sa = stateAggs(aggs, kinds)
    val state = src.groupBy(groupBy.map(col): _*).agg(sa.head, sa.tail: _*)
    // the rebuild version re-records the FULL definition (the create
    // version carrying it may be vacuumed later) and dep-links the
    // prior view version so the retained history stays protected
    val prev = catalog.latestVersion(name)
    val v = catalog.save(Chain(state), name,
      deps = Seq(s"$source@v$srcLatest") ++ prev.map(p => s"$name@v$p"),
      attrs = defAttrs(source, rowKey, groupBy, aggs, kinds) :+
        s"mv:synced=$srcLatest",
      expect = groupBy.map(k =>
        graft.catalog.Expect(s"mv-nonnull-key-$k", col(k).isNotNull)))
    val n = catalog.rowsOf(name, v)
    MvRefresh(mode, cursor.toString, srcLatest.toString, n, n, 0, Seq(v))
  }

  /** Read `name` restricted to the dirty groups: IN-list pruned
    * (stats + bloom file skipping) when the keys collected, full-scan
    * otherwise; either way an exact semi-join against the dirty frame. */
  private def readPruned(catalog: Catalog, name: String, keys: Seq[String],
                         dirty: DataFrame,
                         collected: Option[Array[org.apache.spark.sql.Row]],
                         at: Option[graft.catalog.SemVer] = None)
      : DataFrame = {
    val base = collected match {
      case Some(rows) =>
        val preds = keys.zipWithIndex.map { case (k, i) =>
          col(k).isin(rows.map(_.get(i)).distinct.toSeq: _*)
        }
        Sys.drop(catalog.readDatasetWhere(name, preds.reduce(_ && _),
          version = at).toDF)
      case None => Sys.drop(catalog.readDataset(name, at).toDF)
    }
    base.join(broadcastIfSmall(dirty, collected), keys, "left_semi")
  }

  private def broadcastIfSmall(dirty: DataFrame,
                               collected: Option[Array[org.apache.spark.sql.Row]])
      : DataFrame =
    if (collected.isDefined) broadcast(dirty) else dirty

  private def cursorOf(catalog: Catalog, name: String): SemVer =
    catalog.versions(name).reverseIterator
      .flatMap(v => catalog.annotationsOf(name, v)._2
        .find(_.startsWith("mv:synced="))
        .map(a => SemVer.parse(a.drop("mv:synced=".length))))
      .nextOption()
      .getOrElse(throw new IllegalStateException(
        s"mat view '$name': no mv:synced cursor on any version — was the " +
          "view mutated outside refresh()?"))

  /** Land the cursor on the view's latest version: the `mv:synced` attr
    * (where [[cursorOf]] reads it) plus a lineage dep on the synced
    * source version, so routine vacuums can't delete the version the
    * next refresh diffs from (the syncChanges rule). The definition
    * attrs ride along too when absent — merge-committed refresh versions
    * are cow saves that carry none, and vacuum reclaims same-dataset
    * history, so the definition must live on EVERY synced version, not
    * just the create-time one. */
  private def patchCursor(catalog: Catalog, name: String, source: String,
                          to: SemVer, defA: Seq[String]): Unit = {
    val v = catalog.latestVersion(name).get
    val (_, attrs) = catalog.annotationsOf(name, v)
    val base = attrs.filterNot(a => a.startsWith("mv:synced=") ||
      a.startsWith("mv:pending="))
    val withDef =
      if (base.exists(_.startsWith("mv:src="))) base else base ++ defA
    catalog.updateDataset(name, Some(v), attrs = Some(
      withDef :+ s"mv:synced=$to"))
    catalog.addDep(name, v, s"$source@v$to")
  }

  /** Newest version carrying a dangling `mv:pending` refresh mark. */
  private def pendingOf(catalog: Catalog, name: String): Option[SemVer] =
    catalog.versions(name).reverseIterator.find(v =>
      catalog.annotationsOf(name, v)._2.exists(_.startsWith("mv:pending=")))

  private def setPending(catalog: Catalog, name: String, v: SemVer,
                         to: SemVer): Unit = {
    val (_, attrs) = catalog.annotationsOf(name, v)
    catalog.updateDataset(name, Some(v), attrs = Some(
      attrs.filterNot(_.startsWith("mv:pending=")) :+ s"mv:pending=$to"))
  }

  private def clearPending(catalog: Catalog, name: String,
                           v: SemVer): Unit = {
    val (_, attrs) = catalog.annotationsOf(name, v)
    catalog.updateDataset(name, Some(v), attrs = Some(
      attrs.filterNot(_.startsWith("mv:pending="))))
  }
}
