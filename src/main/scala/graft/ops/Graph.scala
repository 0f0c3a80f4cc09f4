package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Graph operators over plain (src, dst) edge DataFrames. The motivating
 * workload is web-corpus curation: link-graph authority scores (PageRank,
 * harmonic-centrality-style signals) are a standard document-quality input
 * for CommonCrawl-scale pretraining pipelines, ranking domains before the
 * text filters run. No reference counterpart (its graph surface is zero) —
 * a graft extension alongside [[Corpus]]/[[Dedup]].
 *
 * Scale notes:
 *  - Edges are the big side (trillions at web scale) and are never
 *    collected or re-derived: the out-degree table is joined into the
 *    edge list ONCE before the loop and the combined frame persisted, so
 *    each iteration shuffles only the (node, rank) table — 16 bytes/row —
 *    into the pre-partitioned edge frame. On a real cluster, bucket the
 *    edge table by `src` so the per-iteration join is co-located.
 *  - Contributions partial-aggregate map-side (sum by dst) before the
 *    exchange; the rank vector, nodes, and degree tables are all O(nodes),
 *    orders of magnitude smaller than the edge list.
 *  - Dangling mass is a 1-row aggregate cross-joined back (broadcast), not
 *    a driver action; the only driver actions are the one-time node count
 *    and the per-iteration localCheckpoint that truncates lineage so the
 *    plan stays constant-size at any iteration count.
 */
object Graph {

  /**
   * PageRank with damping `d` over the DISTINCT edge set, run for a fixed
   * `iterations` count. Returns (node, rank) with ranks summing to 1.
   *
   * Dangling nodes (no out-edges) redistribute their mass uniformly each
   * iteration — the standard power-iteration correction, without which
   * rank mass leaks and the vector no longer sums to 1.
   *
   * Cross-engine determinism (this is what the DuckDB oracle relies on):
   * per-edge contributions are rounded to 12 dp and summed as
   * DECIMAL(38,18) — exact, order-independent — then each new rank is
   * rounded back to 12 dp. Every arithmetic step is therefore bit-equal
   * in any engine that implements decimal rounding, so the oracle can
   * unroll the same iterations in SQL and hash-match exactly.
   */
  def pageRank(edgesRaw: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be at least 1")
    val spark = edgesRaw.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // ONE exchange covers the whole static setup: hash-partitioning by
    // __src colocates duplicate edges (distinct), degree groups, and the
    // join — Catalyst reuses the partitioning for all three (subset rule:
    // HashPartitioning(src) satisfies ClusteredDistribution(src, dst)) —
    // and the persisted frame is the in-memory equivalent of bucketing by
    // src, so each iteration's edges⋈ranks join moves only the O(nodes)
    // rank table
    val edges = edgesRaw
      .select(col(srcCol).cast("string").as("__src"),
        col(dstCol).cast("string").as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
      .repartition(col("__src"))
      .distinct()
    val deg = edges.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val edgesDeg = edges.join(deg, "__src").persist(MEMORY_AND_DISK)
    // derive nodes from the persisted frame so the source scan +
    // distinct pipeline runs once, not once per consumer
    val nodes = edgesDeg.select(col("__src").as("node"))
      .union(edgesDeg.select(col("__dst")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    val n = nodes.count()
    val dec = DecimalType(38, 18)

    // lazy checkpoints: the Catalyst plan stays constant-size per
    // iteration (LogicalRDD boundary) but nothing materializes until the
    // caller's action, so the whole power iteration runs as ONE job
    // instead of one blocking job per iteration — at gate scale that
    // halves wall time (job-scheduling overhead dominates), at cluster
    // scale it lets the scheduler pipeline the independent aggregates
    var ranks = nodes
      .withColumn("rank", round(lit(1.0) / lit(n.toDouble), 12))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      // shuffle-hash (not sort-merge): the persisted edge side is already
      // partitioned on __src, and hashing the O(nodes) rank table per
      // partition beats re-sorting the edge list every iteration; a rank
      // partition is nodes/P rows — executor-memory-safe at any graph
      // size that fits the cluster at all
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "__src").hint("shuffle_hash"),
          "__src")
        .groupBy(col("__dst").as("node"))
        .agg(sum(round(col("rank") / col("__deg"), 12).cast(dec))
          .cast("double").as("__c"))
      // mass parked on dangling nodes (no out-edges), as a broadcastable
      // 1-row frame — no driver action
      val dangling = ranks.join(deg,
          ranks("node") === deg("__src"), "left_anti")
        .agg(coalesce(sum(col("rank").cast(dec)).cast("double"), lit(0.0))
          .as("__dm"))
      ranks = nodes
        .join(contribs, Seq("node"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          round(lit((1.0 - damping) / n.toDouble) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / lit(n.toDouble)), 12).as("rank"))
        .localCheckpoint(eager = false)
    }
    edgesDeg.unpersist(); nodes.unpersist()
    ranks
  }
}
