package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * Dataset profiling for pipeline QA: one pass over the data computes
 * per-column null counts, distinct estimates, and numeric/string summary
 * stats. All sketch-based (`approx_count_distinct`, `approx_percentile`)
 * so the single aggregation scales to arbitrary row counts — no exact
 * distinct, no sort.
 */
object Profile {

  /** One row per column: nulls, approx distinct, min/max/mean/p50/p95
    * (numeric), min/max length (string). `sketches = false` drops the
    * HLL-distinct and t-digest percentile columns from the aggregation
    * (they become null) — the sketches dominate the profiling cost, so
    * callers wanting only the exact metrics should not pay for them. */
  def summarize(df: DataFrame, sketches: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nullL = lit(null).cast("long")
    val nullD = lit(null).cast("double")
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        // coalesce: sum over ZERO rows is null, and the typed collect
        // below unboxes this as a primitive Long (empty-snapshot drift)
        coalesce(sum(when(c.isNull, 1).otherwise(0)), lit(0)).cast("long")
          .as(s"__nulls_${f.name}"),
        (if (sketches) approx_count_distinct(c) else nullL)
          .as(s"__dist_${f.name}"))
      val typed = f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"__min_${f.name}"),
          max(c).cast("double").as(s"__max_${f.name}"),
          avg(c.cast("double")).as(s"__mean_${f.name}"),
          (if (sketches) percentile_approx(c.cast("double"), lit(0.5), lit(1000))
           else nullD).as(s"__p50_${f.name}"),
          (if (sketches) percentile_approx(c.cast("double"), lit(0.95), lit(1000))
           else nullD).as(s"__p95_${f.name}"))
        case StringType => Seq(
          min(length(c)).cast("double").as(s"__min_${f.name}"),
          max(length(c)).cast("double").as(s"__max_${f.name}"),
          avg(length(c).cast("double")).as(s"__mean_${f.name}"),
          lit(null).cast("double").as(s"__p50_${f.name}"),
          lit(null).cast("double").as(s"__p95_${f.name}"))
        case _ => Seq(
          lit(null).cast("double").as(s"__min_${f.name}"),
          lit(null).cast("double").as(s"__max_${f.name}"),
          lit(null).cast("double").as(s"__mean_${f.name}"),
          lit(null).cast("double").as(s"__p50_${f.name}"),
          lit(null).cast("double").as(s"__p95_${f.name}"))
      }
      base ++ typed
    }.toSeq
    val wide = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = df.schema.fields.toSeq.map { f =>
      (f.name, f.dataType.simpleString,
        wide.getAs[Long](s"__n_${f.name}"),
        wide.getAs[Long](s"__nulls_${f.name}"),
        Option(wide.getAs[java.lang.Long](s"__dist_${f.name}"))
          .map(Long2long).getOrElse(-1L),
        Option(wide.getAs[java.lang.Double](s"__min_${f.name}")).map(_.toDouble),
        Option(wide.getAs[java.lang.Double](s"__max_${f.name}")).map(_.toDouble),
        Option(wide.getAs[java.lang.Double](s"__mean_${f.name}")).map(_.toDouble),
        Option(wide.getAs[java.lang.Double](s"__p50_${f.name}")).map(_.toDouble),
        Option(wide.getAs[java.lang.Double](s"__p95_${f.name}")).map(_.toDouble))
    }
    rows.toDF("column", "dtype", "n", "nulls", "approx_distinct",
      "min", "max", "mean", "p50", "p95")
  }

  /**
   * Structural schema diff between two snapshots — the companion to
   * [[drift]]'s statistical one: one row per column that was added,
   * removed, or changed type (dotted paths for nested fields). Pure
   * metadata; the r5 testdata-drift incident (orders silently losing
   * three columns between rounds) is exactly the event this reports.
   */
  def schemaDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    def leaves(s: org.apache.spark.sql.types.StructType,
               prefix: String): Seq[(String, String)] =
      s.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case st: org.apache.spark.sql.types.StructType => leaves(st, p)
          case dt => Seq(p -> dt.simpleString)
        }
      }
    val b = leaves(before.schema, "").toMap
    val a = leaves(after.schema, "").toMap
    val rows =
      (b.keySet -- a.keySet).toSeq.sorted.map(c =>
        (c, "removed", b(c), null: String)) ++
      (a.keySet -- b.keySet).toSeq.sorted.map(c =>
        (c, "added", null: String, a(c))) ++
      (b.keySet & a.keySet).toSeq.sorted.collect {
        case c if b(c) != a(c) => (c, "retyped", b(c), a(c))
      }
    rows.toDF("column", "change", "type_before", "type_after")
  }

  /**
   * Winsorize: clamp a numeric column to its [loP, hiP] quantile bounds
   * (KLL one-pass bounds, exact while rows ≤ k) — the trim-don't-drop
   * outlier treatment for heavy-tailed pipeline signals (losses stay
   * bounded, row count unchanged). Returns df plus `<col>_w`.
   */
  def winsorize(df: DataFrame, colName: String, loP: Double = 0.01,
                hiP: Double = 0.99, k: Int = 16384): DataFrame = {
    import graft.functions.GraftFunctions.kll_quantiles
    require(loP >= 0 && hiP <= 1 && loP < hiP, "need 0 <= loP < hiP <= 1")
    val x = col(colName).cast("double")
    val row = df.agg(kll_quantiles(x, Seq(loP, hiP), k)).head()
    // all-null/empty column → the sketch is null: nothing to clamp to,
    // pass values through unchanged (schema contract still adds the col)
    if (row.isNullAt(0)) df.withColumn(s"${colName}_w", x)
    else {
      val bounds = row.getSeq[Double](0)
      df.withColumn(s"${colName}_w",
        least(greatest(x, lit(bounds.head)), lit(bounds.last)))
    }
  }

  /**
   * Robust outlier flagging via median absolute deviation: flags rows
   * with |x − median| > c·MAD — the heavy-tail-safe alternative to
   * z-scores (mean/stddev are themselves dragged by the outliers they
   * should catch). Both statistics come from the mergeable KLL sketch in
   * one pass each (two passes total, two scalar driver reads) — EXACT
   * while the row count stays ≤ k (the oracle-able regime; beyond it the
   * rank error is the sketch's documented bound), using the discrete
   * lower-quantile convention throughout. c = 3 ≈ the classic
   * "3 scaled-MAD" rule without the normal-consistency constant — pick c
   * for your tail, the flag compares raw MAD units.
   *
   * Returns df plus (`<col>_dev`, `is_outlier`).
   */
  def madOutliers(df: DataFrame, colName: String, c: Double = 3.0,
                  k: Int = 16384): DataFrame = {
    import graft.functions.GraftFunctions.kll_quantiles
    val x = col(colName).cast("double")
    val medRow = df.agg(kll_quantiles(x, Seq(0.5), k)).head()
    // all-null/empty column → no median exists: every row gets a null
    // deviation and is_outlier=false (schema contract preserved)
    if (medRow.isNullAt(0))
      return df.withColumn(s"${colName}_dev", lit(null).cast("double"))
        .withColumn("is_outlier", lit(false))
    val med = medRow.getSeq[Double](0).head
    val withDev = df.withColumn(s"${colName}_dev", abs(x - lit(med)))
    val mad = withDev.agg(kll_quantiles(col(s"${colName}_dev"), Seq(0.5), k))
      .head().getSeq[Double](0).head
    withDev.withColumn("is_outlier",
      coalesce(col(s"${colName}_dev") > lit(c * mad), lit(false)))
  }

  /**
   * Column-level drift between two dataset snapshots — the QA pass
   * before a new version is promoted (and after [[graft.delta.Delta]]
   * incremental saves): exact per-column stats from both sides
   * ([[summarize]] without sketches) joined per column, with relative
   * changes and a drift flag on row count, null rate, or mean moving
   * more than `relTol`. Two single-pass aggregations, metadata-size
   * result — runs at any corpus size.
   */
  def drift(before: DataFrame, after: DataFrame,
            relTol: Double = 0.1): DataFrame = {
    val b = summarize(before, sketches = false)
      .select(col("column"), col("dtype"), col("n").as("n_before"),
        col("nulls").as("nulls_before"), col("mean").as("mean_before"))
    val a = summarize(after, sketches = false)
      .select(col("column"), col("n").as("n_after"),
        col("nulls").as("nulls_after"), col("mean").as("mean_after"))
    b.join(a, Seq("column"))
      .withColumn("row_change",
        // try_divide: n_before = 0 (empty snapshot) must yield null,
        // not an ANSI DIVIDE_BY_ZERO at runtime
        try_divide((col("n_after") - col("n_before")).cast("double"),
          col("n_before")))
      .withColumn("null_rate_change",
        col("nulls_after").cast("double") / greatest(col("n_after"), lit(1L))
          - col("nulls_before").cast("double") /
            greatest(col("n_before"), lit(1L)))
      .withColumn("mean_rel_change",
        when(col("mean_before").isNull || col("mean_after").isNull,
          lit(null).cast("double"))
          .otherwise(abs(col("mean_after") - col("mean_before")) /
            greatest(abs(col("mean_before")), lit(1e-12))))
      .withColumn("drift_flag",
        // coalesce the WHOLE disjunction: row_change is null when
        // n_before = 0 (div by zero) and a null || false escapes a
        // term-level coalesce as null, not false
        coalesce(col("mean_rel_change") > relTol ||
          abs(col("row_change")) > relTol ||
          abs(col("null_rate_change")) > relTol, lit(false)))
  }

  /**
   * Per-group mergeable cardinality sketches (Apache DataSketches HLL via
   * Spark's native `hll_sketch_agg`): one O(2^lgK)-byte binary sketch per
   * group, partial-aggregated map-side, plus its point estimate. Unlike
   * `approx_count_distinct`'s scalar result, the SKETCH column is the
   * durable artifact — persist it with the dataset version and later
   * cardinalities over any group/version combination come from
   * [[unionEstimate]] without rescanning the data (the incremental-ingest
   * shape: sketch each delta batch, union across the history).
   *
   * Default lgK = 14 → 0.41% relative standard error, ~16 KB dense.
   */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], itemCol: String,
                     lgK: Int = 14): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(itemCol), lit(lgK)).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /** Merge previously-built HLL sketches (e.g. across versions or groups)
    * into one combined estimate — no data rescan, associative, so any
    * merge tree gives the same cardinality. */
  def unionEstimate(sketches: DataFrame, sketchCol: String = "sketch"): DataFrame =
    sketches.agg(hll_sketch_estimate(
      hll_union_agg(col(sketchCol), lit(true))).as("estimate"))

  /**
   * Per-column quantiles via the mergeable KLL sketch
   * ([[org.apache.spark.sql.graft.KllQuantiles]]): ONE pass, O(k·log n)
   * state per column, exact while a column's non-null count stays ≤ k —
   * the 100 TB replacement for a per-column sort. Returns long-format
   * (column, prob, value); value is null for an all-null column.
   */
  def quantiles(df: DataFrame, columns: Seq[String], probs: Seq[Double],
                k: Int = 2048): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(columns.nonEmpty && probs.nonEmpty, "need columns and probs")
    val aggs = columns.map(c => graft.functions.GraftFunctions
      .kll_quantiles(col(c).cast("double"), probs, k).as(s"__q_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    columns.zipWithIndex.flatMap { case (c, i) =>
      Option(row.getSeq[Double](i)) match {
        case Some(vals) => probs.zip(vals).map { case (p, v) =>
          (c, p, Option(v)) }
        case None => probs.map(p => (c, p, Option.empty[Double]))
      }
    }.toDF("column", "prob", "value")
  }
}
