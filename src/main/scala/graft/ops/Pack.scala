package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training: assign documents to fixed-token-budget
 * packs (training examples are built by concatenating a pack's docs).
 *
 * Scale design: a single global ordering would serialize on one partition,
 * so packing is sharded — rows hash into `shards` independent streams, each
 * stream packs by cumulative token count with one window. Shuffle key is
 * the shard id; each shard's window is independent, so packing 100 TB is
 * `shards`-way parallel (pick shards ~ cluster cores). Pack boundaries are
 * deterministic: (shard, orderCol) fixes the stream order.
 */
object Pack {

  /**
   * Adds `shard` and `pack_id`: documents stream through shard
   * `orderCol % shards` in `orderCol` order; `pack_id = floor(tokens-before
   * / budget)` — each pack carries ~`budget` tokens, with a boundary doc
   * assigned to the pack where it starts. (Contiguous binning: single-pass,
   * deterministic, no carry-over state between rows beyond the running sum.)
   */
  def byTokenBudget(df: DataFrame, tokenCol: String, orderCol: String,
                    budget: Int, shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val reserved = df.columns.toSet.intersect(Set("shard", "pack_id"))
    require(reserved.isEmpty,
      s"input columns collide with pack output columns: $reserved")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(col(orderCol), lit(shards)))
      .withColumn("pack_id",
        floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)).cast("double")
          / budget).cast("long"))
  }
}
