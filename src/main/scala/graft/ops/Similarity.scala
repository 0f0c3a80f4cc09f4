package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`Array[Float]`).
 *
 * Scale design: the brute-force path broadcasts the (small) query set and
 * computes cosine via the codegen'd `CosineDistance`
 * kernel — one scan over the corpus, no shuffle until the final per-query
 * top-k (a windowed rank over queryCount × k rows). The IVF path clusters
 * the corpus once (k-means on a sample), stores a `centroid_id` per row
 * (partition/cluster pruning), and probes only `nprobe` nearest centroids
 * per query — at 100 TB the probe scan touches centroid-pruned parquet
 * partitions only.
 */
object Similarity {

  /** Cosine similarity column (1 - distance). */
  def cosineSim(a: Column, b: Column): Column = lit(1.0) - cosine_distance(a, b)

  /**
   * Brute-force top-k: for every query row, the k most-cosine-similar corpus
   * rows. `queries` must be small (it is broadcast). Deterministic
   * tie-break on corpus id.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     vecCol: String = "embedding", idCol: String = "vec_id",
                     queryIdCol: String = "query_id"): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qv"))
    val scored = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .join(broadcast(q))
      .withColumn("__sim", cosineSim(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__sim").desc, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("__sim"), 6).as("sim"),
        col("__rank").as("rank"))
  }

  /**
   * LSH-bucketed ANN: corpus and queries hashed into random-hyperplane
   * buckets (deterministic, same planes); each query only scans its bucket.
   * Recall is traded via `planes` (fewer planes → bigger buckets → higher
   * recall, more compute). The bucket join shuffles on an 8-byte key.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
              vecCol: String = "embedding", idCol: String = "vec_id",
              queryIdCol: String = "query_id"): DataFrame = {
    val cb = corpus.select(col(idCol), col(vecCol).as("__cv"),
      Dedup.hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val qb = queries.select(col(queryIdCol), col(vecCol).as("__qv"),
      Dedup.hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val scored = cb.join(broadcast(qb), "__bucket")
      .withColumn("__sim", cosineSim(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__sim").desc, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("__sim"), 6).as("sim"),
        col("__rank").as("rank"))
  }

  /**
   * IVF index build: pick `nlist` centroids from a deterministic sample
   * (ids hashed, first nlist), then assign every corpus row to its nearest
   * centroid. Returns (corpusWithCentroid, centroids). One corpus scan per
   * Lloyd iteration; default 0 extra iterations (sampled centroids) keeps
   * build cost linear.
   */
  def ivfBuild(corpus: DataFrame, nlist: Int, iterations: Int = 2,
               vecCol: String = "embedding", idCol: String = "vec_id")
      : (DataFrame, DataFrame) = {
    var centroids = corpus
      .orderBy(graft.functions.GraftFunctions.int_hash_64(col(idCol).cast("long")))
      .limit(nlist)
      .select(monotonically_increasing_id().as("centroid_id"),
        col(vecCol).cast("array<double>").as("__centroid"))
    for (_ <- 0 until iterations) {
      val assigned = assign(corpus, centroids, vecCol, idCol)
      // Centroid recompute by dimension, not by collecting whole clusters:
      // posexplode → (centroid, dim) partial-aggregated averages → re-pack.
      // Shuffle volume is rows×dim scalars (map-side combined), never a
      // collect_list of a billion-vector cluster.
      centroids = assigned
        .select(col("centroid_id"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__v")))
        .groupBy("centroid_id", "__d")
        .agg(avg("__v").as("__m"))
        .groupBy("centroid_id")
        .agg(transform(
          array_sort(collect_list(struct(col("__d"), col("__m")))),
          x => x.getField("__m")).as("__centroid"))
    }
    // PIN the centroid table before handing it out: the init subtree
    // (hash-ordered limit + monotonically_increasing_id) is NOT
    // deterministic across separate actions, and callers consume the
    // pair with more than one (saveIndex saves centroids and the
    // assignment separately) — a recomputed init could renumber or
    // re-pick seeds, committing an assignment that disagrees with the
    // stored centroids. nlist rows; the tiny cache is intentionally
    // left pinned (the sessions that build indexes own their lifecycle).
    // no eager count(): the FIRST consuming action fills the cache and
    // every later action reads it (consumers are sequential — saveIndex
    // saves centroids, then the assignment), so the pin holds without
    // paying one extra job per build; an evicted nlist-row cache is
    // practically impossible at MEMORY_AND_DISK
    val pinned = centroids
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (assign(corpus, pinned, vecCol, idCol), pinned)
  }

  /**
   * Lloyd's k-means with engine-exact arithmetic — the oracled counterpart
   * of [[ivfBuild]]'s float-path training (same algorithm, same scale
   * shape; use this when the clustering itself is the product, e.g.
   * SemDeDup cluster assignment or an auditable IVF build).
   *
   * Determinism contract (what the q_kmeans oracle replays in SQL):
   * initial centroids are the `k` lowest-id vectors (cid by id order);
   * per-dimension squared differences round to 12 dp and sum as
   * DECIMAL(38,18) — exact, order-independent — with distances rounded to
   * 9 dp and ties broken by lower cid; centroid means use the same
   * decimal-sum trick rounded back to 12 dp. Every assignment and
   * centroid therefore reproduces bit-for-bit in any SQL engine. A
   * centroid left with no members drops out (standard Lloyd degeneracy),
   * identically on both engines.
   *
   * Scale shape mirrors [[ivfBuild]]: centroids broadcast; assignment
   * partial-aggregates via min(struct) map-side (one row per corpus row
   * crosses the shuffle); centroid recompute explodes by dimension — the
   * shuffle carries rows×dim scalars with map-side combine, never a
   * collect_list of a cluster.
   *
   * Returns (assignments (idCol, cluster, dist), centroids (cluster, __c)).
   */
  def kmeans(corpus: DataFrame, k: Int, iterations: Int,
             vecCol: String = "embedding", idCol: String = "vec_id")
      : (DataFrame, DataFrame) = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val v = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__x"))
    // codegen'd kernel; the equivalent (bit-identical) HOF formulation —
    //   aggregate(zip_with(x, c, (a,b) => round((a-b)*(a-b), 12).cast(dec)),
    //             lit(0).cast(dec), (acc,e) => (acc+e).cast(dec)).cast(double)
    // — evaluates interpreted and measured ~5× slower
    def dist(x: Column, c: Column): Column =
      round(decimal_sq_distance(x, c), 9)
    // lazy checkpoints: the plan stays constant-size per iteration but
    // nothing blocks — the caller's single action drives assignment,
    // recompute, and the final pass as one pipelined job instead of one
    // blocking job per checkpoint (same discipline as Graph.pageRank)
    var cents = v.orderBy("__id").limit(k)
      .withColumn("cid",
        row_number().over(Window.orderBy(col("__id"))).cast("int") - 1)
      .select(col("cid"), col("__x").as("__c"))
      .localCheckpoint(eager = false)
    // keepVec only where the recompute needs the coordinates — the final
    // assignment shuffles (id, best) pairs, not the vectors
    def assignAll(keepVec: Boolean): DataFrame = {
      val scored = v.crossJoin(broadcast(cents))
        .withColumn("__d", dist(col("__x"), col("__c")))
        .groupBy("__id")
      if (keepVec)
        scored.agg(min(struct(col("__d"), col("cid"))).as("__b"),
          first(col("__x")).as("__x"))
      else
        scored.agg(min(struct(col("__d"), col("cid"))).as("__b"))
    }
    for (_ <- 1 to iterations) {
      cents = assignAll(keepVec = true)
        .select(col("__b.cid").as("cid"),
          posexplode(col("__x")).as(Seq("__dim", "__val")))
        .groupBy("cid", "__dim")
        .agg(round(sum(round(col("__val"), 12).cast(dec)).cast("double") /
          count(lit(1)), 12).as("__m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("__dim"), col("__m")))),
          x => x.getField("__m")).as("__c"))
        .localCheckpoint(eager = false)
    }
    val out = assignAll(keepVec = false)
      .select(col("__id").as(idCol), col("__b.cid").as("cluster"),
        col("__b.__d").as("dist"))
    (out, cents.select(col("cid").as("cluster"), col("__c")))
  }

  /**
   * Cluster-balanced sampling — the topic-diversity curation step:
   * engine-exact k-means assignments ([[kmeans]]) capped at `perCluster`
   * rows per cluster in deterministic md5 order, so one dominant topic
   * can't flood the curated set while small topics keep everything they
   * have. The cap is `row_number ≤ k` over the cluster partition —
   * map-side bounded by Spark's WindowGroupLimit pushdown, so the
   * exchange carries at most `k` rows per cluster per map task, never
   * the full corpus ordering.
   */
  def clusterBalance(corpus: DataFrame, k: Int, iterations: Int,
                     perCluster: Int, vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val (assignments, _) = kmeans(corpus, k, iterations, vecCol, idCol)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    assignments.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perCluster).drop("__rn")
  }

  private def assign(corpus: DataFrame, centroids: DataFrame,
                     vecCol: String, idCol: String): DataFrame = {
    // nearest centroid via min_by aggregation: partial-aggregates map-side,
    // so the shuffle carries one row per corpus row — NOT the N×nlist scored
    // rows a window-sort formulation would move. Deterministic tie-break by
    // folding centroid_id into the ordering key tuple.
    val scored = corpus.join(broadcast(centroids))
      .withColumn("__d",
        euclidean_distance(col(vecCol), col("__centroid").cast("array<float>")))
    val best = scored.groupBy(col(idCol))
      .agg(min_by(col("centroid_id"), struct(col("__d"), col("centroid_id")))
        .as("centroid_id"))
    corpus.join(best, idCol)
  }

  /**
   * IVF probe: per query, find `nprobe` nearest centroids, scan only those
   * inverted lists, rank top-k. Centroids and queries broadcast; the scan
   * is a semi-join-pruned pass over the assigned corpus.
   */
  def ivfTopK(corpusAssigned: DataFrame, centroids: DataFrame,
              queries: DataFrame, k: Int, nprobe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id",
              queryIdCol: String = "query_id"): DataFrame = {
    rankProbes(corpusAssigned,
      routeProbes(centroids, queries, nprobe, vecCol, queryIdCol),
      k, vecCol, idCol, queryIdCol)
  }

  /** Rank top-k inside pre-routed probe lists: one broadcast join of the
    * (queryId, __qv, centroid_id) probes against the assigned corpus. */
  private def rankProbes(corpusAssigned: DataFrame, probes: DataFrame,
                         k: Int, vecCol: String, idCol: String,
                         queryIdCol: String): DataFrame = {
    val scored = corpusAssigned.join(broadcast(probes), "centroid_id")
      .withColumn("__sim", cosineSim(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__sim").desc, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("__sim"), 6).as("sim"),
        col("__rank").as("rank"))
  }

  /** Per-query nprobe nearest centroids: (queryIdCol, __qv, centroid_id).
    * Queries × centroids both broadcast-small; WindowGroupLimit bounds
    * the rank shuffle to nprobe rows per query. */
  private def routeProbes(centroids: DataFrame, queries: DataFrame,
                          nprobe: Int, vecCol: String,
                          queryIdCol: String): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qv"))
    val qc = q.join(broadcast(centroids))
      .withColumn("__d",
        euclidean_distance(col("__qv"), col("__centroid").cast("array<float>")))
    val wq = Window.partitionBy(col(queryIdCol)).orderBy(col("__d").asc_nulls_last,
      col("centroid_id").asc)
    qc.withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nprobe)
      .select(col(queryIdCol), col("__qv"), col("centroid_id"))
  }

  /**
   * Build an IVF index over `corpus` ONCE and persist it in the catalog —
   * the "one build, many query batches" shape every production vector
   * store uses (FAISS index files, Milvus segments). Two datasets land:
   * `idxName` = the corpus with its `centroid_id` assignment, RANGE-LAID
   * so each parquet file covers a narrow centroid band (footer min/max
   * stats then prune un-probed lists at read time), and
   * `idxName__centroids` = the nlist routing vectors. The index version
   * records a lineage dep on the centroids version, so vacuum can never
   * orphan an index from its routing table.
   *
   * At 100 TB: the build is [[ivfBuild]]'s Lloyd pass (centroids
   * broadcast, shuffle carries rows×dim map-side-combined scalars);
   * queries then touch ~nprobe/nlist of the files — see [[searchIndex]].
   */
  def saveIndex(catalog: graft.catalog.Catalog, idxName: String,
                corpus: DataFrame, nlist: Int, iterations: Int = 2,
                nFiles: Int = 16, vecCol: String = "embedding",
                idCol: String = "vec_id"): graft.catalog.SemVer = {
    require(catalog.versions(idxName).isEmpty,
      s"ann index '$idxName' already exists")
    // a build that died between its two saves leaves orphaned centroids
    // with no index — clear them so the retry can proceed
    if (catalog.versions(s"${idxName}__centroids").nonEmpty)
      catalog.deleteDataset(s"${idxName}__centroids")
    val (assigned, centroids) = ivfBuild(corpus, nlist, iterations,
      vecCol, idCol)
    val cv = catalog.save(graft.core.Chain(centroids),
      s"${idxName}__centroids", harvestStats = false)
    val laid = assigned
      .repartitionByRange(nFiles, col("centroid_id"), col(idCol))
      .sortWithinPartitions("centroid_id")
    catalog.save(graft.core.Chain(laid), idxName,
      deps = Seq(s"${idxName}__centroids@v$cv"),
      attrs = Seq(s"annidx:nlist=$nlist", s"annidx:vec=$vecCol",
        s"annidx:id=$idCol"))
  }

  /** The (vecCol, idCol) an index was built with — recorded on the build
    * version's attrs (appends via [[addToIndex]] don't re-record it). */
  private def indexDef(catalog: graft.catalog.Catalog,
                       idxName: String): (String, String) = {
    val vs = catalog.versions(idxName)
    if (vs.isEmpty)
      throw new NoSuchElementException(s"ann index '$idxName' not found")
    val attrs = vs.iterator
      .map(v => catalog.annotationsOf(idxName, v)._2)
      .find(_.exists(_.startsWith("annidx:vec=")))
      .getOrElse(throw new IllegalArgumentException(
        s"'$idxName' is not an ann index (no annidx attrs on any version)"))
    def attr(p: String): String = attrs.find(_.startsWith(p))
      .map(_.drop(p.length)).getOrElse(throw new IllegalArgumentException(
        s"'$idxName' is not an ann index (missing $p attr)"))
    (attr("annidx:vec="), attr("annidx:id="))
  }

  /**
   * Grow a persisted index with NEW vectors, no retrain: assign the
   * batch against the frozen centroids (one broadcast join) and APPEND
   * it as a new index version — O(batch) at any index size (all prior
   * files hard-link). Appended files may span wider centroid bands than
   * the original range layout until the next
   * `catalog.optimize(idxName, zorderByCols = Seq("centroid_id"))` —
   * the documented maintenance pass; searches stay CORRECT throughout
   * (stats pruning is conservative, it just reads the new small files
   * more often). Caller contract: ids not already present (append never
   * dedups); re-embedding existing ids is a mergeInto, not an add.
   */
  def addToIndex(catalog: graft.catalog.Catalog, idxName: String,
                 newVectors: DataFrame, nFiles: Int = 1)
      : graft.catalog.MutationResult = {
    val (vecCol, idCol) = indexDef(catalog, idxName)
    val centroids = graft.core.Sys.drop(
      catalog.readDataset(s"${idxName}__centroids").toDF)
    val assigned = assign(newVectors, centroids, vecCol, idCol)
      .repartitionByRange(nFiles, col("centroid_id"), col(idCol))
      .sortWithinPartitions("centroid_id")
    catalog.append(idxName, assigned)
  }

  /**
   * Probe a persisted IVF index: route each query to its `nprobe`
   * nearest centroids, then read ONLY the index files whose
   * `centroid_id` envelope intersects a probed list (the union of probed
   * cells is ≤ nlist ids — always collectable) and rank top-k inside
   * them. The scan cost is ~nprobe/nlist of the index, independent of
   * how many query batches run — the build amortizes away.
   */
  def searchIndex(catalog: graft.catalog.Catalog, idxName: String,
                  queries: DataFrame, k: Int, nprobe: Int = 4,
                  queryIdCol: String = "query_id"): DataFrame = {
    val (vecCol, idCol) = indexDef(catalog, idxName)
    val centroids = graft.core.Sys.drop(
      catalog.readDataset(s"${idxName}__centroids").toDF)
    // route ONCE: the collected probes drive both the file-pruned read
    // and the ranking join, so the queries plan evaluates a single time
    // (a second routing could disagree under a non-deterministic
    // upstream and break the pruned-superset invariant)
    val routed = routeProbes(centroids, queries, nprobe, vecCol, queryIdCol)
    val probeRows = routed.collect() // ≤ queries × nprobe rows
    val cells = probeRows.map(_.getAs[Long]("centroid_id")).distinct.toSeq
    val probes = routed.sparkSession.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), routed.schema)
    val pruned = graft.core.Sys.drop(
      catalog.readDatasetWhere(idxName,
        col("centroid_id").isin(cells: _*)).toDF)
    rankProbes(pruned, probes, k, vecCol, idCol, queryIdCol)
  }

  /**
   * Sign-bit signature: the fold packs from the high side, so dimension i
   * contributes bit (L-1 - i mod 64) of limb (i / 64), where L is that
   * limb's slice length (64 for full limbs; the trailing partial limb
   * lands in the low bits), set when the coordinate is > 0. Hamming
   * distances are layout-independent, but anyone comparing against
   * externally packed signatures needs this exact layout. A 1024-dim
   * float vector
   * compresses to 16 longs — 32× less than the raw floats — which is what
   * makes billion-vector candidate scans memory-feasible. Pure projection
   * (array `transform`/`aggregate`, no shuffle, stays in codegen).
   */
  def signSignature(vec: Column): Column =
    transform(sequence(lit(0), ((size(vec) + 63) / 64).cast("int") - 1), j =>
      aggregate(slice(vec, j * 64 + 1, lit(64)), lit(0L),
        (acc, x) => shiftleft(acc, 1)
          .bitwiseOR(when(x > lit(0.0f), 1L).otherwise(0L))))

  /**
   * Hamming-distance top-k over sign signatures — the binary-quantized ANN
   * path: signatures are computed at the scan (corpus rows enter the join
   * as id + a few longs, never the float vectors), queries broadcast, and
   * per-query top-k ranks XOR popcounts. At 100 TB this is the first-stage
   * filter before exact cosine re-ranking of the survivors.
   */
  /**
   * Per-dimension (mins, scales) for SQ8 quantization over the corpus —
   * one posexplode + min/max aggregate (partial map-side, O(dims) result
   * collected once). `scale_d = (max_d - min_d)/255`.
   */
  def sq8Train(corpus: DataFrame, vecCol: String = "embedding")
  : (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__x")))
      .groupBy("__d").agg(min("__x").as("mn"), max("__x").as("mx"))
      .orderBy("__d").collect()
    val mins = rows.map(_.getDouble(1))
    val scales = rows.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0)
    (mins, scales)
  }

  /**
   * Scalar-quantized (SQ8) ANN top-k: corpus vectors collapse to one byte
   * per dimension (4× smaller than float32 — the standard first
   * compression tier of a production vector index; the 32× sign-bit path
   * is [[hammingTopK]]), and each query scans the CODES asymmetrically —
   * dequantize-per-byte against the full-precision query, so no recall is
   * lost to quantizing the query side.
   *
   * Scale shape: identical to [[hammingTopK]] — queries broadcast, the
   * corpus side moves only (id, 64-byte code) through the scan, and
   * per-query top-k is a map-side WindowGroupLimit before the single
   * exchange. The bin tables ride the codegen'd kernel expressions
   * ([[graft.functions.GraftFunctions.sq8_encode]]/`sq8_distance`), and
   * every arithmetic step is 12-dp-decimal-exact, so the SQL oracle
   * reproduces distances bit-for-bit. In production the encode runs once
   * at ingest and persists; here it rides the same job.
   */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              vecCol: String = "embedding", idCol: String = "vec_id",
              queryIdCol: String = "query_id"): DataFrame = {
    import graft.functions.GraftFunctions.{sq8_encode, sq8_distance}
    val (mins, scales) = sq8Train(corpus, vecCol)
    val enc = corpus.select(col(idCol),
      sq8_encode(col(vecCol).cast("array<double>"), mins, scales).as("__code"))
    val q = queries.select(col(queryIdCol),
      col(vecCol).cast("array<double>").as("__qv"))
    val scored = enc.join(broadcast(q))
      .withColumn("__d",
        round(sq8_distance(col("__qv"), col("__code"), mins, scales), 9))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__d").asc_nulls_last, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("__d").as("dist"),
        col("__rank").as("rank"))
  }

  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                  vecCol: String = "embedding", idCol: String = "vec_id",
                  queryIdCol: String = "query_id"): DataFrame = {
    val c = corpus.select(col(idCol), signSignature(col(vecCol)).as("__cs"))
    val q = queries.select(col(queryIdCol), signSignature(col(vecCol)).as("__qs"))
    val scored = c.join(broadcast(q))
      .withColumn("__ham",
        aggregate(zip_with(col("__cs"), col("__qs"),
          (x, y) => bit_count(x.bitwiseXOR(y))), lit(0),
          (acc, v) => acc + v).cast("long"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__ham").asc_nulls_last, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("__ham").as("hamming"),
        col("__rank").as("rank"))
  }

  /**
   * Two-stage ANN: hamming prefilter over sign signatures keeps the
   * `prefilter` closest ids per query (the cheap pass — the corpus scan
   * moves 8-byte limbs, not vectors), then exact cosine re-ranks only the
   * survivors. This is the billion-vector production shape: stage 1 cost
   * is a popcount scan, stage 2 touches `queries × prefilter` vectors via
   * a broadcast candidate semi-join, never the corpus.
   */
  def hammingRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        prefilter: Int = 0,
                        vecCol: String = "embedding", idCol: String = "vec_id",
                        queryIdCol: String = "query_id"): DataFrame = {
    val pre = if (prefilter > 0) prefilter else 8 * k
    val cand = hammingTopK(corpus, queries, pre, vecCol, idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol))
    val scored = corpus.select(col(idCol), col(vecCol).as("__cv"))
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(queries.select(col(queryIdCol), col(vecCol).as("__qv"))),
        Seq(queryIdCol))
      .withColumn("__sim", cosineSim(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__sim").desc, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("__sim"), 6).as("sim"),
        col("__rank").as("rank"))
  }

  /**
   * Two-stage SQ8 ANN: the byte-code scan ([[sq8TopK]]) keeps the
   * `prefilter` closest ids per query, then exact euclidean distance
   * ([[graft.functions.GraftFunctions.decimal_sq_distance]], engine-
   * exact) re-ranks only the survivors. The quantized stage moves 1
   * byte/dim through the scan and its error is bounded by the bin width,
   * so a prefilter of a few × k recovers the neighbors int8 rounding
   * flips — the regime measured in ScaleProbe where clone-dense corpora
   * sit below the quantization step. Same production shape as
   * [[hammingRerankTopK]], one compression tier up (4× vs 32×, much
   * tighter stage-1 ranking).
   */
  def sq8RerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    prefilter: Int = 0,
                    vecCol: String = "embedding", idCol: String = "vec_id",
                    queryIdCol: String = "query_id"): DataFrame = {
    import graft.functions.GraftFunctions.decimal_sq_distance
    val pre = if (prefilter > 0) prefilter else 4 * k
    val cand = sq8TopK(corpus, queries, pre, vecCol, idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol))
    val scored = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(queries.select(col(queryIdCol),
        col(vecCol).cast("array<double>").as("__qv"))), Seq(queryIdCol))
      .withColumn("__d", round(decimal_sq_distance(col("__qv"), col("__cv")), 9))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__d").asc_nulls_last, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("__d").as("dist"),
        col("__rank").as("rank"))
  }

  /**
   * IVF-PQ with exact rerank — the composed billion-scale ANN recipe
   * (the FAISS IVFPQ shape, re-expressed relationally): a coarse
   * quantizer ([[ivfBuild]] cells) routes each query to its `nprobe`
   * nearest cells; ONLY those cells' PQ codes are ADC-scanned (one
   * equi-join on the cell id — pair the codes table with
   * `Layout.writePartitioned(cell)` and the probe never even lists the
   * other cells' files); the ADC shortlist (`prefilter` per query) then
   * reranks against exact float distances. Scan cost per query:
   * |corpus|·nprobe/nlist candidates × m long-adds, plus prefilter
   * float kernels — vs the brute force's |corpus| × dim.
   * Approximation comes from cell routing (recall property gated) and
   * ADC (repaired by the rerank).
   */
  def ivfPqRerankTopK(corpusAssigned: DataFrame, centroids: DataFrame,
                      queries: DataFrame, k: Int,
                      codebook: Array[Array[Array[Double]]],
                      nprobe: Int = 4, prefilter: Int = 0,
                      vecCol: String = "embedding", idCol: String = "vec_id",
                      queryIdCol: String = "query_id"): DataFrame = {
    import graft.functions.GraftFunctions.{decimal_sq_distance, pq_adc}
    val m = codebook.length
    val kc = codebook(0).length
    val sub = codebook(0)(0).length
    val pre = if (prefilter > 0) prefilter else 8 * k
    val codes = pqEncode(corpusAssigned, codebook, vecCol, idCol,
      extraCols = Seq("centroid_id"))
    // per-query probed cells + ADC table ride ONE broadcast frame
    val qv = col(vecCol).cast("array<double>")
    val tableCol = array((0 until m).flatMap { s =>
      val qs = slice(qv, s * sub + 1, sub)
      codebook(s).map(c => pqDist(qs, c))
    }: _*)
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qv"),
      tableCol.as("__tbl"))
    val qc = q.join(broadcast(centroids))
      .withColumn("__cd",
        euclidean_distance(col("__qv"), col("__centroid").cast("array<float>")))
    val wq = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__cd").asc, col("centroid_id").asc)
    val probes = qc.withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nprobe)
      .select(col(queryIdCol), col("centroid_id"), col("__tbl"))
    val adcScored = codes.join(broadcast(probes), "centroid_id")
      .withColumn("__d", round(pq_adc(col("__tbl"), col("codes"), kc), 9))
    val wa = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__d").asc_nulls_last, col(idCol).asc)
    val cand = adcScored.withColumn("__rank", row_number().over(wa))
      .filter(col("__rank") <= pre)
      .select(col(queryIdCol), col(idCol))
    val scored = corpusAssigned
      .select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(queries.select(col(queryIdCol),
        col(vecCol).cast("array<double>").as("__fqv"))), Seq(queryIdCol))
      .withColumn("__d", round(decimal_sq_distance(col("__fqv"), col("__cv")), 9))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__d").asc_nulls_last, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("__d").as("dist"),
        col("__rank").as("rank"))
  }

  /**
   * Two-stage PQ ANN: [[pqTopK]]'s ADC pass prefilters to `prefilter`
   * candidates per query (codes only — m ints per vector at the scan),
   * then ONLY those candidates' float vectors are fetched for an exact
   * decimal-distance rerank — the same prefilter→rerank discipline as
   * [[sq8RerankTopK]], one compression tier further. ADC alone trades
   * recall for 32× compression (raw recall@10 ≈ 0.4 on the test corpus
   * at m=8/k_c=16); the rerank recovers it while still scanning only
   * prefilter × queries vectors instead of the corpus.
   */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   codebook: Array[Array[Array[Double]]],
                   prefilter: Int = 0,
                   vecCol: String = "embedding", idCol: String = "vec_id",
                   queryIdCol: String = "query_id"): DataFrame = {
    import graft.functions.GraftFunctions.decimal_sq_distance
    val pre = if (prefilter > 0) prefilter else 8 * k
    val cand = pqTopK(corpus, queries, pre, codebook, vecCol, idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol))
    val scored = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(queries.select(col(queryIdCol),
        col(vecCol).cast("array<double>").as("__qv"))), Seq(queryIdCol))
      .withColumn("__d", round(decimal_sq_distance(col("__qv"), col("__cv")), 9))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__d").asc_nulls_last, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("__d").as("dist"),
        col("__rank").as("rank"))
  }

  /**
   * Upper-triangle covariance matrix of an embedding column — the input
   * to PCA/whitening/embedding-drift monitoring over a corpus. Returns
   * (i, j, cov) for 0 <= i <= j < dim with
   * `cov = (Σ xᵢxⱼ − Σxᵢ·Σxⱼ/n) / n` (population covariance).
   *
   * Scale shape: the Gramian accumulates DISTRIBUTED — per row, the
   * dim·(dim+1)/2 products derive map-side in the array domain and
   * partial-aggregate before the exchange, so the shuffle carries
   * O(dim² × partitions) partial sums, never the corpus (the DataFrame
   * restatement of RowMatrix.computeGramianMatrix's treeAggregate). The
   * result is O(dim²) rows — collectable for a driver-side eigensolve at
   * any corpus size.
   *
   * Determinism: products are IEEE doubles rounded to 12 dp and summed
   * as DECIMAL(38,18) — order-independent, so the oracle reproduces every
   * cell bit-for-bit; the final division rounds to 9 dp.
   *
   * Input hygiene: rows with a NULL vector or a vector of non-modal length
   * are dropped UP FRONT (one cheap pre-pass for the modal length), so the
   * per-cell `n` is the same well-defined row count for every (i, j) —
   * without this, a null row silently vanishes from every pair while a
   * short row vanishes asymmetrically (only from pairs past its length),
   * skewing covariances relative to any fixed-n oracle.
   */
  def covarianceMatrix(corpus: DataFrame, vecCol: String = "embedding")
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    // modal vector length: O(#distinct lengths) rows to the driver
    val dimRow = corpus.filter(col(vecCol).isNotNull)
      .groupBy(size(col(vecCol)).as("__d")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__d").asc).limit(1).collect()
    require(dimRow.nonEmpty, s"covarianceMatrix: no non-null $vecCol rows")
    val dim = dimRow.head.getInt(0)
    val clean = corpus.filter(col(vecCol).isNotNull &&
      size(col(vecCol)) === dim)
    val x = col(vecCol).cast("array<double>")
    // one row per (i, j>=i) pair per input row, derived map-side:
    // outer posexplode picks i, inner transform pairs it with the tail
    val pairs = clean
      .select(posexplode(x).as(Seq("__i", "__xi")), x.as("__x"))
      .select(col("__i"), col("__xi"),
        posexplode(slice(col("__x"), col("__i") + 1, lit(Int.MaxValue)))
          .as(Seq("__dj", "__xj")))
      .select(col("__i"), (col("__i") + col("__dj")).as("__j"),
        col("__xi"), col("__xj"))
    pairs
      .groupBy(col("__i").as("i"), col("__j").as("j"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col("__xi") * col("__xj"), 12).cast(dec)).as("__sxy"),
        sum(round(col("__xi"), 12).cast(dec)).as("__sx"),
        sum(round(col("__xj"), 12).cast(dec)).as("__sy"))
      .select(col("i"), col("j"),
        round((col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double") / col("__n")) /
          col("__n"), 9).as("cov"))
  }

  /**
   * Deterministic ±1 random projection (the database-friendly
   * Johnson–Lindenstrauss transform, Achlioptas JCSS'03):
   * `y_j = (Σ_i x_i · s(j, i)) / √outDim` with the sign matrix
   * `s(j, i) = ±1` drawn from bit 0 of `int_hash_64(j·131071 + i)` — no
   * stored matrix, no RNG state, every engine regenerates the identical
   * projection. The dimensionality-reduction front end for ANN /
   * clustering at 100 TB: pairwise distances are preserved within
   * (1 ± ε) for outDim = O(log n / ε²), and downstream LSH / k-means /
   * brute-force kernels run on `outDim ≪ dim` coordinates.
   *
   * Scale shape: pure map-side projection — a per-row fold over the
   * vector per output coordinate, NO shuffle anywhere. Engine-exact:
   * signed terms round to 12 dp and fold through a DECIMAL(38,18)
   * accumulator (order-independent), the coordinate rounds to 9 dp — so
   * an oracle reproduces every value bit-for-bit.
   */
  def randomProjection(corpus: DataFrame, vecCol: String = "embedding",
                       outDim: Int = 16,
                       outCol: String = "projected"): DataFrame = {
    require(outDim >= 1, "outDim must be positive")
    // Rounding discipline (every step engine-exact): terms round at 12 dp
    // (identity for float-origin coordinates — their shortest decimal
    // repr is ≤9 significant digits, so no tie can sit at the cut), the
    // sum is exact and order-independent (scaled longs), the 9-dp round
    // happens in the decimal domain (HALF_UP on both engines), and only
    // THEN does the 1/√outDim scale apply — one IEEE multiply of two
    // bit-identical doubles, exact by definition. Scaling or dividing
    // BEFORE a decimal-domain round puts exact .5 ties at the cut, which
    // double-domain rounds resolve differently across engines (observed
    // in 7 of 8,000 gate cells before this ordering). The whole
    // projection is ONE codegen'd kernel call per row
    // ([[org.apache.spark.sql.graft.JlProject]]) — the interpreted
    // zip_with/aggregate HOF formulation cost ~50× more.
    corpus.withColumn(outCol, graft.functions.GraftFunctions
      .jl_project(col(vecCol).cast("array<double>"), outDim))
  }

  /**
   * Top principal component by power iteration over the O(dim²)
   * covariance matrix from [[covarianceMatrix]]. The matrix (a few
   * thousand cells regardless of corpus size) is collected and iterated
   * driver-side — deliberately: after the distributed Gramian reduction
   * the eigenproblem is constant-size, and a driver loop beats `rounds`
   * Spark jobs. Returns the unit eigenvector as Seq[Double] (sign fixed:
   * first non-zero component positive).
   */
  def pcaTopComponent(corpus: DataFrame, vecCol: String = "embedding",
                      iterations: Int = 20): Seq[Double] = {
    val cells = covarianceMatrix(corpus, vecCol)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val dim = cells.map(_._2).max + 1
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach { case (i, j, c) => m(i)(j) = c; m(j)(i) = c }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    for (_ <- 1 to iterations) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => m(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = if (norm == 0.0) w else w.map(_ / norm)
    }
    val flip = v.find(_ != 0.0).exists(_ < 0)
    (if (flip) v.map(-_) else v).toSeq
  }

  /**
   * Product quantization (Jegou et al., TPAMI 2011) — the ANN compression
   * tier beyond SQ8's 4x: the vector splits into `m` subspaces, each
   * encoded as the id of its nearest subspace centroid, so a d-dim float
   * vector becomes m small ints (m bytes at k_c <= 256; 64-dim floats at
   * m=8 compress 32x) and query-to-candidate distance becomes ADC table
   * lookups — the query precomputes its distance to every subspace
   * centroid once (an m x k_c table) and each candidate costs m adds over
   * its codes. No float vector is touched at candidate-scan time.
   *
   * Determinism/exactness: centroid selection, encode argmin (ties to the
   * lowest centroid id), and ADC sums all use the decimal-exact kernel
   * arithmetic (12/9-dp rounds + decimal sums), so with the init-only
   * codebook (`iterations = 0`: the first k_c vectors' subvectors by id —
   * deterministic selection, no Lloyd update) the WHOLE pipeline is
   * bit-reproducible in ANSI SQL: the q_ann_pq gate's regime. With
   * `iterations > 0` each subspace trains through the decimal-exact
   * [[kmeans]] loop (itself gated by q_kmeans); recall-vs-brute-force of
   * the trained tier is OpsSpec-tested.
   *
   * Returns the codebook as (subspace)(centroidId)(subDim) doubles —
   * k_c * d doubles total, a driver-side constant that broadcasts into
   * the encode/ADC expressions as literals.
   */
  def pqTrain(corpus: DataFrame, m: Int, kc: Int, iterations: Int = 0,
              vecCol: String = "embedding", idCol: String = "vec_id")
      : Array[Array[Array[Double]]] = {
    require(m > 0 && kc > 1, "need m >= 1 subspaces and k_c >= 2 centroids")
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"vector dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    if (iterations == 0) {
      // ONE collect of the kc lowest full vectors, sliced into subspaces
      // on the driver — the per-subspace loop ran m identical
      // orderBy/limit jobs over the corpus (m scans for kc rows each);
      // the driver slice is value-identical to the Catalyst slice
      // (slice(cast<double>, s*sub+1, sub) over the same kc rows)
      val full = corpus.select(col(idCol).as("vec_id"),
          col(vecCol).cast("array<double>").as("embedding"))
        .orderBy("vec_id").limit(kc).collect()
        .map(_.getSeq[Double](1).toArray)
      (0 until m).toArray.map { s =>
        full.map(v => java.util.Arrays.copyOfRange(v, s * sub, s * sub + sub))
      }
    } else {
      val rows = pqTrainCents(corpus, m, kc, iterations, vecCol, idCol)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val book = (0 until m).toArray.map { s =>
        rows.filter(_._1 == s).sortBy(_._2).map(_._3)
      }
      require(book.forall(_.length == book(0).length),
        s"pqTrain produced a jagged codebook: ${book.map(_.length).toSeq}")
      book
    }
  }

  /** The trained-path centroid frame `(__s, cid, __c)` of [[pqTrain]],
    * exposed pre-collect so PlanSpec can pin its physical shape (no
    * unpartitioned Window, no full-frame sort — the init must never
    * move the training corpus into one partition). */
  private[graft] def pqTrainCents(corpus: DataFrame, m: Int, kc: Int,
                                  iterations: Int, vecCol: String,
                                  idCol: String): DataFrame = {
      // ALL m subspaces train through ONE grouped Lloyd pipeline (the
      // per-subspace loop ran m independent job chains — measured 3×
      // slower at gate scale): rows explode once to (subspace, id,
      // subvector), every assignment/recompute keys on the subspace, and
      // the arithmetic mirrors [[kmeans]] exactly (same init-by-lowest-id,
      // decimal-exact distances and means), so the centroids are
      // identical to m separate runs
      val dec = org.apache.spark.sql.types.DecimalType(38, 18)
      val parts = pqParts(corpus, m, vecCol, idCol)
      var cents = pqInitCents(parts, corpus, kc, idCol)
        .localCheckpoint(eager = false)
      for (_ <- 1 to iterations) {
        val assigned = parts
          .join(broadcast(cents), Seq("__s"))
          .withColumn("__d", round(decimal_sq_distance(col("__xs"),
            col("__c")), 9))
          .groupBy("__s", "__id")
          .agg(min(struct(col("__d"), col("cid"))).as("__b"),
            first(col("__xs")).as("__xs"))
        val recomputed = assigned
          .select(col("__s"), col("__b.cid").as("cid"),
            posexplode(col("__xs")).as(Seq("__dim", "__val")))
          .groupBy("__s", "cid", "__dim")
          .agg(round(sum(round(col("__val"), 12).cast(dec)).cast("double") /
            count(lit(1)), 12).as("__m"))
          .groupBy("__s", "cid")
          .agg(transform(array_sort(collect_list(struct(col("__dim"),
            col("__m")))), x => x.getField("__m")).as("__c"))
        // A centroid that wins no points vanishes from the recompute's
        // groupBy; left-joining onto the previous full (subspace, cid)
        // grid keeps its old position, so every subspace always carries
        // EXACTLY kc centroids — pqEncode/pqAdcTopK index the flattened
        // table as s*kc+code and a jagged codebook would silently score
        // against the wrong entries. The join is m×kc rows: free.
        cents = cents.select(col("__s"), col("cid"), col("__c").as("__c0"))
          .join(recomputed.withColumnRenamed("__c", "__c1"),
            Seq("__s", "cid"), "left")
          .select(col("__s"), col("cid"),
            coalesce(col("__c1"), col("__c0")).as("__c"))
          .localCheckpoint(eager = false)
      }
      cents
  }

  /** [[pqTrain]]'s initial centroid frame `(__s, cid, __c)`: the kc
    * lowest DISTINCT ids' subvectors, cid = the id's rank. Selection is
    * orderBy/limit (TakeOrderedAndProject: per-partition top-kc, then a
    * kc-row merge — the same init [[kmeans]] uses) and the rank is
    * assigned on the DRIVER over those ≤ kc rows (the same
    * bounded-collect class as the final centroid collect); an earlier
    * formulation dense_rank'ed an unpartitioned window over the FULL
    * N×m exploded frame — one partition sorting the whole training
    * corpus just to find kc ids. The broadcast join back onto `parts`
    * reproduces that path's rows exactly (duplicate ids among the
    * lowest kc share a cid, as dense_rank gave them) — OpsSpec pins the
    * equivalence, PlanSpec pins the no-Window/no-full-sort shape. */
  /** The exploded `(__id, __s, __xs)` training frame the grouped Lloyd
    * pipeline runs over: one row per (vector, subspace). */
  private[graft] def pqParts(corpus: DataFrame, m: Int, vecCol: String,
                             idCol: String): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val sub = dim / m
    corpus.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__x"))
      .select(col("__id"), posexplode(array((0 until m).map(s =>
        slice(col("__x"), s * sub + 1, sub)): _*)).as(Seq("__s", "__xs")))
  }

  private[graft] def pqInitCents(parts: DataFrame, corpus: DataFrame,
                                 kc: Int, idCol: String): DataFrame = {
    val spark = corpus.sparkSession
    val idField = corpus.select(col(idCol).as("__id")).schema.fields(0)
    val lowRows = corpus.select(col(idCol).as("__id")).distinct()
      .orderBy("__id").limit(kc).collect()
    val lowIds = spark.createDataFrame(
      java.util.Arrays.asList(lowRows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i): org.apache.spark.sql.Row
      }: _*),
      org.apache.spark.sql.types.StructType(Seq(idField,
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
    parts.join(broadcast(lowIds), Seq("__id"))
      .select(col("__s"), col("cid"), col("__xs").as("__c"))
  }

  /** Decimal-exact squared distance between a sliced subvector and a
    * literal centroid — the shared arithmetic of encode and ADC tables. */
  private def pqDist(x: Column, centroid: Array[Double]): Column =
    round(decimal_sq_distance(x, typedlit(centroid.toSeq)), 9)

  /** (idCol, codes array<int>) — one in-codegen argmin per subspace over
    * the literal codebook; ties break to the lowest centroid id. */
  def pqEncode(corpus: DataFrame, codebook: Array[Array[Array[Double]]],
               vecCol: String = "embedding", idCol: String = "vec_id",
               extraCols: Seq[String] = Nil): DataFrame = {
    val m = codebook.length
    val sub = codebook(0)(0).length
    val v = col(vecCol).cast("array<double>")
    val codes = (0 until m).map { s =>
      val xs = slice(v, s * sub + 1, sub)
      val dists = array(codebook(s).map(c => pqDist(xs, c)): _*)
      // array_position returns the FIRST index of the min: lowest-cid tie
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    corpus.select(col(idCol) +: extraCols.map(col) :+
      array(codes: _*).as("codes"): _*)
  }

  /**
   * PQ/ADC top-k: encode the corpus once (m ints per vector ride the
   * scan, never the floats), build each query's m x k_c distance table
   * with the same decimal arithmetic, and score candidates as the
   * decimal sum of m table entries. The scored frame shuffles one row
   * per (query, candidate) of (ids, distance) — scale shape matches
   * [[sq8TopK]]. ADC is approximate (distance to the QUANTIZED
   * candidate); for exact final ordering compose with a rerank like
   * [[sq8RerankTopK]] does.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             codebook: Array[Array[Array[Double]]],
             vecCol: String = "embedding", idCol: String = "vec_id",
             queryIdCol: String = "query_id"): DataFrame =
    pqAdcTopK(pqEncode(corpus, codebook, vecCol, idCol), queries, k,
      codebook, vecCol, idCol, queryIdCol)

  /** ADC scoring over PRE-ENCODED codes (idCol, codes) — the stored-codes
    * production shape: encode once at ingest, persist the m-int codes
    * beside the id, and every query scans codes only. */
  def pqAdcTopK(codes: DataFrame, queries: DataFrame, k: Int,
                codebook: Array[Array[Array[Double]]],
                vecCol: String = "embedding", idCol: String = "vec_id",
                queryIdCol: String = "query_id"): DataFrame = {
    val m = codebook.length
    val kc = codebook(0).length
    val sub = codebook(0)(0).length
    val enc = codes
    // per-query ADC table, flattened (s * kc + cid) — computed with the
    // identical pqDist arithmetic so oracle replay is bit-exact
    val qv = col(vecCol).cast("array<double>")
    val tableCol = array((0 until m).flatMap { s =>
      val qs = slice(qv, s * sub + 1, sub)
      codebook(s).map(c => pqDist(qs, c))
    }: _*)
    val q = queries.select(col(queryIdCol), tableCol.as("__tbl"))
    // compiled ADC kernel (same decimal-exact arithmetic as the
    // equivalent aggregate-HOF formulation, which evaluates interpreted
    // per pair and measured ~2.4x slower on the candidate scan)
    val adc = round(graft.functions.GraftFunctions
      .pq_adc(col("__tbl"), col("codes"), kc), 9)
    val scored = enc.join(broadcast(q)).withColumn("__d", adc)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__d").asc_nulls_last, col(idCol).asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(queryIdCol), col(idCol), col("__d").as("dist"),
        col("__rank").as("rank"))
  }
}
