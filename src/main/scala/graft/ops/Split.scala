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
}
