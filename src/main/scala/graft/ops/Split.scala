package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Chain, Sys}

/**
 * Deterministic splits over persisted `sys.rand`
 * (reference: src/datachain/toolkit/split.py:9-80).
 */
object Split {

  val Resolution = 2L << 31

  /**
   * Weighted train/test split: bucket = sys.rand % RESOLUTION; chain i gets
   * buckets in its cumulative-weight range. Deterministic per saved version
   * (sys.rand is persisted), pushdown-able (pure filter).
   */
  def trainTestSplit(chain: Chain, weights: Seq[Double]): Seq[Chain] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val df0 = chain.toDF
    val df = if (df0.columns.contains(Sys.ColName)) df0 else Sys.stamp(df0)
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _)
    val bucket = pmod(col("sys.rand"), lit(Resolution))
    weights.indices.map { i =>
      val lo = (cum(i) / total * Resolution).toLong
      val hi = (cum(i + 1) / total * Resolution).toLong
      Chain(df.filter(bucket >= lo && bucket < hi))
    }
  }

  /** Deterministic modulo split on an existing integer key (no sys needed). */
  def byKeyMod(df: DataFrame, keyCol: String, total: Int, index: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(total)) === index)

  /**
   * Deterministic k-fold assignment for cross-validation: every row gets
   * a stable `fold` in [0, k) from the same md5-content-hash uniform as
   * [[weightedSample]] — reproducible across runs, engines, and cluster
   * sizes (no shuffle, no RNG state; the oracle replays the identical
   * arithmetic), and any subset of the data keeps its folds. Train/test
   * for fold i = `fold =!= i` / `fold === i`.
   */
  def kFold(df: DataFrame, idCol: String, k: Int,
            seed: String = ""): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    val u = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 13), 16, 10).cast("long")
    df.withColumn("fold", pmod(u, lit(k.toLong)))
  }

  /**
   * PER-GROUP weighted sample without replacement: the same
   * content-hash-deterministic A-ES keys as [[weightedSample]], selected
   * through the bounded-heap aggregate
   * ([[org.apache.spark.sql.graft.TopKRows]]) — O(n) state per group
   * crosses the shuffle, no per-group sort, one pass for every stratum
   * at once (the "n docs per domain, weighted by quality" curation
   * draw). `idCol` must be a non-negative integer id (it rides
   * zero-padded so the heap's lexical tie-break equals numeric order).
   * Returns (groupCol, rank, idCol, wkey).
   */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                             weightCol: String, n: Int,
                             seed: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    val u = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 2^52
    val key = round(pow(u, lit(1.0) / col(weightCol).cast("double")), 12)
    df.filter(col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(graft.functions.GraftFunctions.topk_rows(key,
        lpad(col(idCol).cast("string"), 20, "0"), n).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")).as(Seq("__p", "__e")))
      .select(col(groupCol), (col("__p") + 1).cast("long").as("rank"),
        col("__e.item").cast("long").as(idCol),
        col("__e.score").as("wkey"))
  }

  /**
   * Weighted sample without replacement of `n` rows (Efraimidis–Spirakis
   * A-ES, 2006): each row gets key u^(1/w) where u is a 52-bit uniform
   * derived from `md5(id:seed)`, and the n largest keys win — inclusion
   * probability is proportional to weight, exactly as the classic
   * algorithm, but the "random" draw is a content hash, so the sample is
   * reproducible across runs, engines, and cluster sizes (the
   * q_weighted_sample oracle replays the identical formula in SQL; keys
   * round to 12 dp with an id tiebreak so libm pow ulp differences can't
   * flip the order). Rows with non-positive weight are excluded (the
   * algorithm is defined for w > 0).
   *
   * Scale shape: orderBy+limit plans as TakeOrderedAndProject — each
   * partition keeps its local top-n and only n rows per partition reach
   * the single reducer; nothing global is sorted. This is the
   * "downsample 100 TB to a weighted 1 B-row corpus" primitive.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, n: Int,
                     seed: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    val u = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed))), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 2^52
    val key = round(pow(u, lit(1.0) / col(weightCol).cast("double")), 12)
    df.filter(col(weightCol) > 0)
      .withColumn("__wk", key)
      .orderBy(col("__wk").desc, col(idCol).asc)
      .limit(n)
      .drop("__wk")
  }

  /**
   * Stratified deterministic sample: at most `perGroup` rows per stratum,
   * chosen by md5-hash order of the key — reproducible across engines and
   * runs (training-data class balancing). One shuffle (window per stratum);
   * the rank prunes map-side via WindowGroupLimit, so only ~perGroup rows
   * per stratum per partition ever reach the exchange.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       perGroup: Int): DataFrame = {
    require(perGroup > 0, "perGroup must be positive")
    require(!df.columns.contains("__rk"),
      "input columns use reserved internal name __rk")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= perGroup)
      .drop("__rk")
  }
}

/**
 * Skew-handling helpers for hot keys. AQE's skew-join handling covers
 * joins automatically; [[Skew.groupBySalted]] covers aggregations whose
 * key distribution is too skewed for a single reducer per key.
 */
object Skew {

  /** Deterministic salt bucket derived from the whole row's hash. */
  def saltCol(buckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(buckets))

  /**
   * Two-phase salted aggregation for algebraic aggregates (sum/count/min/
   * max): phase 1 aggregates per (key, salt) — spreading a hot key over
   * `buckets` reducers — phase 2 combines the partials per key. Results
   * are identical to a direct groupBy; only the shuffle shape changes.
   */
  def groupBySalted(df: DataFrame, keys: Seq[String], buckets: Int,
                    sums: Seq[String] = Seq.empty,
                    counts: Boolean = true): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(buckets))
    val phase1Aggs =
      sums.map(c => sum(col(c)).as(s"__sum_$c")) ++
        (if (counts) Seq(count(lit(1)).as("__cnt")) else Seq.empty)
    val p1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
        (if (counts) Seq(sum(col("__cnt")).cast("long").as("n")) else Seq.empty)
    p1.groupBy(keys.map(col): _*).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }
}
