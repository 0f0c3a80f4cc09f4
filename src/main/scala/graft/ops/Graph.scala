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
               iterations: Int = 3, damping: Double = 0.85): DataFrame =
    pageRankImpl(edgesRaw, srcCol, dstCol, iterations, damping, None, "")

  /**
   * Personalized (topic-sensitive) PageRank: the teleport vector is
   * concentrated on `seeds` instead of uniform — rank flows out from the
   * seed set, scoring every node by its link proximity to the seeds. The
   * web-curation variant for targeted crawl scoring: seed with known-good
   * domains, crawl in descending personalized rank (Haveliwala, WWW'02).
   *
   * Mechanics relative to [[pageRank]]: identical edge setup, degree
   * join, decimal-exact contribution sums, and dangling handling — the
   * only changes are the teleport term `p(v) = 1/|S∩V|` for seed nodes
   * (0 otherwise; seeds absent from the graph are ignored) replacing
   * `1/n`, the init vector starting AT the seeds, and dangling mass
   * redistributing BY p (back to the seeds — the standard PPR
   * correction, keeping the vector summing to 1). Seeds broadcast (one
   * extra hash-join on the O(nodes) table before the loop); the
   * per-iteration cost is exactly [[pageRank]]'s.
   */
  def personalizedPageRank(edgesRaw: DataFrame, srcCol: String,
                           dstCol: String, seeds: DataFrame, seedCol: String,
                           iterations: Int = 3, damping: Double = 0.85)
      : DataFrame =
    pageRankImpl(edgesRaw, srcCol, dstCol, iterations, damping, Some(seeds),
      seedCol)

  private def pageRankImpl(edgesRaw: DataFrame, srcCol: String,
                           dstCol: String, iterations: Int, damping: Double,
                           seedsOpt: Option[DataFrame], seedCol: String)
      : DataFrame = {
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
    // iterate on 8-byte xxhash64 node ids, not strings: every
    // per-iteration shuffle/join/aggregate then moves and hashes fixed-
    // width longs (string names are stored ONCE in the bucketed edge
    // frame — the columnar cache prunes them from every iteration scan —
    // and mapped back in one final join). A 64-bit id collision would
    // corrupt ranks, so the same pass that counts nodes proves
    // injectivity over this graph (min name == max name per id) —
    // ~n²/2⁶⁵ odds; widen to a 128-bit fingerprint beyond ~10⁸ nodes
    val edgesS = edgesRaw
      .select(col(srcCol).cast("string").as("__srcS"),
        col(dstCol).cast("string").as("__dstS"))
      .filter(col("__srcS").isNotNull && col("__dstS").isNotNull)
    val edges = edgesS
      .select(xxhash64(col("__srcS")).as("__src"), col("__srcS"),
        xxhash64(col("__dstS")).as("__dst"), col("__dstS"))
      .repartition(col("__src"))
      .distinct()
    val deg = edges.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val edgesDeg = edges.join(deg, "__src").persist(MEMORY_AND_DISK)
    // node dictionary + static dangling flag off the persisted frame (one
    // derivation, not one per consumer): a node is dangling iff it never
    // appears as __src (min(false) wins), so the per-iteration dangling-
    // mass step is a filter+agg over the rank vector, no anti-join
    val nodesBase = edgesDeg.select(col("__src").as("__nid"),
        col("__srcS").as("__name"), lit(false).as("__dang"))
      .union(edgesDeg.select(col("__dst"), col("__dstS"), lit(true)))
      .groupBy("__nid").agg(min(col("__dang")).as("__dang"),
        min(col("__name")).as("__name"), max(col("__name")).as("__mx"))
    // personalized teleport: stamp seed membership onto the node table
    // (broadcast — the seed set is tiny next to the graph); seeds not in
    // the graph simply never match and are ignored
    val nodes = (seedsOpt match {
      case Some(seeds) =>
        // null seeds drop BEFORE hashing: xxhash64 is non-nullable (a
        // null input hashes to the seed constant 42), so a post-hash
        // isNotNull filter was dead code and a null seed row silently
        // became node-id 42
        val sd = broadcast(seeds
          .select(col(seedCol).cast("string").as("__sdS"))
          .filter(col("__sdS").isNotNull)
          .select(xxhash64(col("__sdS")).as("__nid")).distinct()
          .withColumn("__sd", lit(true)))
        nodesBase.join(sd, Seq("__nid"), "left_outer")
          .withColumn("__seed", coalesce(col("__sd"), lit(false)))
          .drop("__sd")
      case None => nodesBase.withColumn("__seed", lit(false))
    }).persist(MEMORY_AND_DISK)
    val head = nodes.agg(count(lit(1)),
      coalesce(sum(when(col("__name") =!= col("__mx"), 1).otherwise(0)),
        lit(0L)),
      coalesce(sum(when(col("__seed"), 1L).otherwise(0L)), lit(0L))).head()
    val n = head.getLong(0)
    require(head.getLong(1) == 0L,
      "xxhash64 node-id collision — switch to 128-bit fingerprints")
    val seedN = head.getLong(2)
    if (n == 0L) { // empty edge set: no nodes, no iteration, no 1/n
      edgesDeg.unpersist(); nodes.unpersist()
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.DoubleType))))
    }
    seedsOpt.foreach { _ =>
      require(seedN > 0L, "personalizedPageRank: no seed appears in the graph")
    }
    val dec = DecimalType(38, 18)
    // teleport term: uniform 1/n, or 1/|seeds-in-graph| on the seed set.
    // The uniform path keeps pageRank's exact historical arithmetic
    // ((1-d)/n as ONE double constant) so existing oracles hash-match.
    val teleport: org.apache.spark.sql.Column = seedsOpt match {
      case Some(_) => when(col("__seed"), lit(1.0 / seedN)).otherwise(lit(0.0))
      case None    => lit(1.0 / n.toDouble)
    }

    // lazy checkpoints: the Catalyst plan stays constant-size per
    // iteration (LogicalRDD boundary) but nothing materializes until the
    // caller's action, so the whole power iteration runs as ONE job
    // instead of one blocking job per iteration — at gate scale that
    // halves wall time (job-scheduling overhead dominates), at cluster
    // scale it lets the scheduler pipeline the independent aggregates
    val init = seedsOpt match {
      case Some(_) => round(teleport, 12)
      case None    => round(lit(1.0) / lit(n.toDouble), 12)
    }
    var ranks = nodes.select(col("__nid"), col("__dang"), col("__seed"))
      .withColumn("rank", init)
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      // shuffle-hash (not sort-merge): the persisted edge side is already
      // partitioned on __src, and hashing the O(nodes) rank table per
      // partition beats re-sorting the edge list every iteration; a rank
      // partition is nodes/P rows — executor-memory-safe at any graph
      // size that fits the cluster at all
      // zero ranks skip the sum as NULLs: Spark's double round() and
      // Decimal accumulation both take a value-dependent slow path on
      // exact 0.0 (measured 4-6x the per-row cost of a nonzero — 102 s
      // vs 23 s CPU per iteration on the 6M-edge fixture), and the
      // personalized vector is zero almost everywhere by construction.
      // sum ignores NULLs and adding exact zeros never changes a
      // fixed-scale decimal sum, so the value is bit-identical; an
      // all-zero group yields NULL, which the coalesce(__c, 0.0) in the
      // rank update already maps to 0.0 — same as a sum of zeros.
      val contribs = edgesDeg
        .join(ranks.select(col("__nid").as("__src"), col("rank"))
          .hint("shuffle_hash"), "__src")
        .filter(col("rank") =!= 0.0)
        .groupBy(col("__dst").as("__nid"))
        .agg(sum(round(col("rank") / col("__deg"), 12).cast(dec))
          .cast("double").as("__c"))
      // mass parked on dangling nodes, as a broadcastable 1-row frame —
      // the static __dang flag makes this a scan of the O(nodes) rank
      // vector, no join and no driver action
      val dangling = ranks.filter(col("__dang") && col("rank") =!= 0.0)
        .agg(coalesce(sum(col("rank").cast(dec)).cast("double"), lit(0.0))
          .as("__dm"))
      // standard: (1-d)/n + d*(c + dm/n); personalized: the same update
      // with p replacing 1/n in both the teleport and the dangling
      // redistribution — mass returns to the seeds, vector still sums to 1
      val newRank = seedsOpt match {
        case None =>
          round(lit((1.0 - damping) / n.toDouble) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / lit(n.toDouble)), 12)
        case Some(_) =>
          round(teleport * lit(1.0 - damping) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") * teleport), 12)
      }
      val next = nodes.select(col("__nid"), col("__dang"), col("__seed"))
        .join(contribs, Seq("__nid"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("__nid"), col("__dang"), col("__seed"),
          newRank.as("rank"))
      if (sys.env.contains("GRAFT_DEBUG_PR_PLANS")) {
        println("==== ITERATION RANKS PLAN ====")
        println(next.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      ranks = next.localCheckpoint(eager = false)
    }
    // materialize the O(nodes) result EAGERLY while the edge/node caches
    // are hot, then release them: a lazy return would recompute the whole
    // setup at the caller's first action against unpersisted inputs
    val out = ranks.join(nodes.select(col("__nid"), col("__name")), "__nid")
      .select(col("__name").as("node"), col("rank"))
      .localCheckpoint(eager = true)
    edgesDeg.unpersist(); nodes.unpersist()
    out
  }

  /**
   * Synchronous label propagation (Raghavan et al. 2007) for community
   * detection over the undirected distinct edge set: every node starts
   * with its own id as label; each iteration every node adopts the most
   * frequent label among its neighbors, ties broken by the SMALLEST
   * label — making the whole run deterministic and engine-exact (the
   * usual LPA nondeterminism comes from random tie-breaks and
   * asynchronous sweeps; fixed `iterations` + min-tie-break + synchronous
   * updates remove both). Communities complement [[graft.ops.Dedup]]'s
   * connected components: CC merges through ANY chain of near-dup edges
   * (one bridge fuses two clusters), LPA keeps densely-linked groups
   * separate across weak bridges — the better grouping signal for domain
   * clustering and link-farm detection in web curation.
   *
   * Returns (node: string, label: string).
   *
   * Scale shape: per iteration, the O(nodes) label table joins into the
   * once-built, once-persisted neighbor list (pre-partitioned on the
   * neighbor key the join uses — the same bucketed-join discipline as
   * [[pageRank]]); the (node, label)
   * frequency count partial-aggregates map-side, and the arg-max is a
   * `min(struct(-count, label))` aggregate — no window sort. Lazy
   * checkpoints keep the plan constant-size per iteration.
   */
  def labelPropagation(edgesRaw: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "iterations must be at least 1")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // undirected neighbor list, both directions, self-loops dropped
    val und = edgesRaw
      .select(col(srcCol).cast("string").as("__s"),
        col(dstCol).cast("string").as("__t"))
      .filter(col("__s").isNotNull && col("__t").isNotNull &&
        col("__s") =!= col("__t"))
      .select(explode(array(
        struct(col("__s").as("node"), col("__t").as("nbr")),
        struct(col("__t").as("node"), col("__s").as("nbr")))).as("__e"))
      .select(col("__e.node").as("node"), col("__e.nbr").as("nbr"))
      // one exchange covers both: HashPartitioning(nbr) satisfies the
      // distinct's ClusteredDistribution(node, nbr) by the subset rule
      // (same discipline as pageRank's edge setup), and the persisted
      // frame is already partitioned on the per-iteration join key
      .repartition(col("nbr"))
      .distinct()
      .persist(MEMORY_AND_DISK)
    var labels = und.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      labels = und
        // shuffle-hash, not sort-merge: und is persisted pre-partitioned
        // on nbr, so hashing the O(nodes) label table per partition beats
        // re-sorting the edge-sized frame every iteration (same
        // discipline as pageRank's contribution join)
        .join(labels.withColumnRenamed("node", "nbr").hint("shuffle_hash"),
          "nbr")
        .groupBy("node", "label").agg(count(lit(1)).as("__n"))
        .groupBy("node")
        .agg(min(struct((lit(0L) - col("__n")).as("__neg"),
          col("label").as("__l"))).as("__b"))
        .select(col("node"), col("__b.__l").as("label"))
        .localCheckpoint(eager = false)
    }
    // materialize the O(nodes) result while the neighbor-list cache is
    // hot, then release it — a lazy return would recompute the whole
    // setup at the caller's first action against the unpersisted frame
    val out = labels.localCheckpoint(eager = true)
    und.unpersist()
    out
  }

  /**
   * k-core peeling over the undirected distinct edge set: `rounds`
   * synchronous iterations of "drop every node whose current degree is
   * below `k`, then drop edges touching a dropped node". Returns the
   * surviving subgraph as (node: string, degree: long) — degree measured
   * IN the peeled subgraph. Web-curation use: the k-core of a link/domain
   * graph isolates densely-interlinked regions (link farms, mirror
   * clusters) that survive peeling, while organically-linked pages fall
   * out — the complement of [[triangleCount]]'s local density signal.
   *
   * A fixed `rounds` (instead of iterate-to-fixpoint) keeps the run
   * deterministic and cross-engine exact — each round is pure integer
   * degree arithmetic, so an oracle can unroll the same rounds in SQL and
   * hash-match; convergence is reached when a round removes nothing, and
   * the peel sequence is monotone so extra rounds are always safe.
   *
   * Scale shape: the edge frame only ever SHRINKS; each round shuffles
   * the current edge list against the O(nodes) alive set (shuffle-hash,
   * never re-sorting edges) and the degree count partial-aggregates
   * map-side. Lazy checkpoints bound the plan per round, so the whole
   * peel runs as one job (same discipline as [[pageRank]]).
   */
  def kCore(edgesRaw: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    var edges = edgesRaw
      .select(col(srcCol).cast("string").as("__s"),
        col(dstCol).cast("string").as("__t"))
      .filter(col("__s").isNotNull && col("__t").isNotNull &&
        col("__s") =!= col("__t"))
      .select(least(col("__s"), col("__t")).as("__a"),
        greatest(col("__s"), col("__t")).as("__b"))
      // no pre-repartition: distinct's own (__a, __b) exchange determines
      // the partitioning that survives the checkpoint, and peelOnce
      // re-exchanges per semi-join key anyway — an extra shuffle here
      // would be pure waste
      .distinct()
      .localCheckpoint(eager = false)
    for (_ <- 1 to rounds) {
      edges = peelOnce(edges, k).localCheckpoint(eager = false)
    }
    kCoreDegrees(edges, "degree")
  }

  /**
   * [[kCore]] iterated to the true fixpoint: peel until a round removes
   * no edge (checked via an `Observation` riding each round's
   * materialization — one job per round, no extra count pass). This is
   * the production entry point; the fixed-`rounds` [[kCore]] exists for
   * cross-engine-exact oracling and bounded-cost sampling. `maxRounds`
   * caps pathological chains (a k-core peel converges in O(longest
   * degeneracy chain) rounds — single digits on web-ish graphs).
   */
  def kCoreConverged(edgesRaw: DataFrame, srcCol: String, dstCol: String,
                     k: Int, maxRounds: Int = 50): DataFrame = {
    require(k >= 1 && maxRounds >= 1, "k and maxRounds must be positive")
    var edges = edgesRaw
      .select(col(srcCol).cast("string").as("__s"),
        col(dstCol).cast("string").as("__t"))
      .filter(col("__s").isNotNull && col("__t").isNotNull &&
        col("__s") =!= col("__t"))
      .select(least(col("__s"), col("__t")).as("__a"),
        greatest(col("__s"), col("__t")).as("__b"))
      .distinct() // its own exchange partitions the checkpointed frame
      .localCheckpoint()
    var before = edges.count()
    var rounds = 0
    var converged = before == 0L
    while (!converged && rounds < maxRounds) {
      val obs = org.apache.spark.sql.Observation()
      edges = peelOnce(edges, k)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint() // eager: materializes the round AND fills obs
      val after = Option(obs.get("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = after == before
      before = after
      rounds += 1
    }
    lastKCoreRounds = rounds
    kCoreDegrees(edges, "degree")
  }

  /** Rounds the last [[kCoreConverged]] run took (probe telemetry). */
  @volatile var lastKCoreRounds: Int = 0

  private[graft] def kCoreDegrees(e: DataFrame, out: String): DataFrame =
    e.select(col("__a").as("node")).unionAll(e.select(col("__b")))
      .groupBy("node").agg(count(lit(1)).as(out))

  /** One k-core peel round — package-visible so PlanSpec can pin the
    * join strategy (the checkpoint boundaries hide it from the full
    * query's explain output). */
  private[graft] def peelOnce(edges: DataFrame, k: Int): DataFrame = {
    val alive = kCoreDegrees(edges, "__deg").filter(col("__deg") >= k)
      .select("node")
    edges
      .join(alive.withColumnRenamed("node", "__a").hint("shuffle_hash"),
        Seq("__a"), "left_semi")
      .join(alive.withColumnRenamed("node", "__b").hint("shuffle_hash"),
        Seq("__b"), "left_semi")
  }

  /**
   * Per-node triangle count + local clustering coefficient over the
   * undirected distinct edge set. Returns (node: string, degree: long,
   * triangles: long, lcc: double) for every non-isolated node, where
   * `lcc = 2*triangles / (degree*(degree-1))` rounded to 12 dp (0.0 for
   * degree-1 nodes). Web-curation use: LCC separates organic link
   * neighborhoods from spam farms/cliques, a standard domain-quality
   * signal next to [[pageRank]].
   *
   * Scale shape — degree orientation (the MR triangle-count standard,
   * cf. Suri & Vassilvitskii WWW'11): each undirected edge is oriented
   * from its lower-(degree, id) endpoint to the higher one, which bounds
   * every node's out-degree by O(sqrt(|E|)) regardless of how skewed the
   * raw degree distribution is — the celebrity-node wedge explosion
   * (deg^2 pairs from one hub) cannot happen. Wedges are generated by a
   * self-join of the oriented edges on the low endpoint and confirmed by
   * a join back against the oriented edge set; every join key is a
   * (node, node) pair, so nothing wider than two ids ever shuffles. The
   * canonical edge frame is persisted once and feeds degrees, orientation
   * and the closing join without re-derivation.
   *
   * Determinism: counts are exact integers and lcc is one IEEE double
   * division rounded to 12 dp (a 12-dp decimal tie is not representable
   * in binary, so round-half modes cannot diverge) — bit-equal in any
   * engine, no tolerance needed.
   */
  def triangleCount(edgesRaw: DataFrame, srcCol: String, dstCol: String)
  : DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // canonical undirected edges: (a, b) with a < b as strings — the
    // unordered pair SET (and so degrees/triangles) is independent of
    // which total order canonicalizes it
    val canon = edgesRaw
      .select(col(srcCol).cast("string").as("__s"),
        col(dstCol).cast("string").as("__t"))
      .filter(col("__s").isNotNull && col("__t").isNotNull &&
        col("__s") =!= col("__t"))
      .select(least(col("__s"), col("__t")).as("__a"),
        greatest(col("__s"), col("__t")).as("__b"))
      .distinct()
      .persist(MEMORY_AND_DISK)
    val deg = canon.select(col("__a").as("node"))
      .union(canon.select(col("__b")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient each edge low→high by (degree, id); carry the head's order
    // key so the wedge join can impose a canonical order between heads
    val keyed = canon
      .join(deg.select(col("node").as("__a"), col("degree").as("__da")), "__a")
      .join(deg.select(col("node").as("__b"), col("degree").as("__db")), "__b")
    val oriented = keyed.select(
        when(struct(col("__da"), col("__a")) < struct(col("__db"), col("__b")),
          struct(col("__a").as("u"), col("__b").as("v"),
            struct(col("__db").as("kd"), col("__b").as("kn")).as("vk")))
          .otherwise(struct(col("__b").as("u"), col("__a").as("v"),
            struct(col("__da").as("kd"), col("__a").as("kn")).as("vk")))
          .as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"), col("__e.vk").as("vk"))
      .persist(MEMORY_AND_DISK)
    // wedges u→(v1, v2) with v1 before v2 in the total order close into a
    // triangle iff oriented edge v1→v2 exists (orientation respects the
    // same order, so only that direction needs checking)
    val o1 = oriented.select(col("u"), col("v").as("v1"), col("vk").as("k1"))
    val o2 = oriented.select(col("u"), col("v").as("v2"), col("vk").as("k2"))
    val tri = o1.join(o2, Seq("u")).filter(col("k1") < col("k2"))
      .join(oriented.select(col("u").as("v1"), col("v").as("v2")),
        Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val out = deg.join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)), 12))
          .otherwise(lit(0.0)).as("lcc"))
    out
  }
}
