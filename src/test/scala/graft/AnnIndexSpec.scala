package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.ops.Similarity

/** Persisted IVF index: a catalog round-trip must not change search
  * results, the range layout must let footer stats prune unprobed
  * lists, and the centroids dataset must be vacuum-protected. */
class AnnIndexSpec extends SparkSpec {

  private def emb() = spark.read.parquet(s"$sf/embeddings.parquet")

  test("searchIndex equals in-memory ivfTopK on the same build") {
    val root = Files.createTempDirectory("annidx").toString
    val cat = new Catalog(root, spark)
    val e = emb()
    Similarity.saveIndex(cat, "ix", e, nlist = 8, iterations = 1,
      nFiles = 8)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val viaIndex = Similarity.searchIndex(cat, "ix", queries, k = 3,
      nprobe = 4)
    // same deterministic build, in memory: results must match EXACTLY
    // (the pruned read is a superset of the probed lists)
    val (assigned, centroids) = Similarity.ivfBuild(e, nlist = 8,
      iterations = 1)
    val direct = Similarity.ivfTopK(assigned, centroids, queries, k = 3,
      nprobe = 4)
    assert(viaIndex.except(direct).union(direct.except(viaIndex)).isEmpty)
  }

  test("range layout prunes unprobed centroid bands") {
    val root = Files.createTempDirectory("annidx_p").toString
    val cat = new Catalog(root, spark)
    Similarity.saveIndex(cat, "ix", emb(), nlist = 16, iterations = 1,
      nFiles = 16)
    val (kept, total) = cat.pruneCount("ix", col("centroid_id") === 0L)
    assert(total >= 8, s"fixture must produce a multi-file layout: $total")
    assert(kept <= total / 2, s"single-list probe must skip most files: " +
      s"$kept/$total")
    // centroids survive vacuum while the index lives (lineage dep)
    cat.vacuum(keepLast = 1)
    assert(cat.versions("ix__centroids").nonEmpty)
    // duplicate build rejected
    intercept[IllegalArgumentException](
      Similarity.saveIndex(cat, "ix", emb(), nlist = 4))
  }

  test("addToIndex grows the index O(batch); added vectors are findable") {
    val root = Files.createTempDirectory("annidx_g").toString
    val cat = new Catalog(root, spark)
    val e = emb()
    val cut = e.agg(org.apache.spark.sql.functions.expr(
      "percentile(vec_id, 0.8)")).head().getDouble(0).toLong
    Similarity.saveIndex(cat, "ix", e.filter(col("vec_id") < cut),
      nlist = 8, iterations = 1, nFiles = 8)
    val added = e.filter(col("vec_id") >= cut)
    val r = Similarity.addToIndex(cat, "ix", added)
    assert(r.filesReused >= 8 && r.filesRewritten >= 1,
      s"append must link the whole old index: $r")
    assert(r.rowsAfter === e.count())
    // an added vector's nearest neighbor is itself (cosine sim 1.0)
    val probe = added.limit(1)
    val qid = probe.head().getLong(0)
    val res = Similarity.searchIndex(cat, "ix",
      probe.select(col("vec_id").as("query_id"), col("embedding")),
      k = 1, nprobe = 2).head()
    assert(res.getAs[Long]("vec_id") === qid)
    assert(res.getAs[Double]("sim") === 1.0)
  }

  test("a build that died between its two saves can retry") {
    val root = Files.createTempDirectory("annidx_o").toString
    val cat = new Catalog(root, spark)
    // simulate the crash debris: centroids landed, the index save didn't
    cat.save(graft.core.Chain(
      emb().limit(4).select(col("vec_id").as("centroid_id"),
        col("embedding").cast("array<double>").as("__centroid"))),
      "ix__centroids")
    Similarity.saveIndex(cat, "ix", emb(), nlist = 8, iterations = 1,
      nFiles = 4)
    val queries = emb().filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(Similarity.searchIndex(cat, "ix", queries, k = 3, nprobe = 4)
      .count() === 6L)
  }
}
