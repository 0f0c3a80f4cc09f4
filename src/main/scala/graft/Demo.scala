package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Chain
import graft.catalog.{Catalog, JobMetrics}
import graft.delta.Delta
import graft.ops.{Dedup, Pack, Similarity, Split, TextAnalysis}

/**
 * End-to-end training-data pipeline demo — the full engine surface in one
 * runnable flow over /root/testdata:
 *
 *   ingest → clean (HTML/PII/quality) → dedup (exact + MinHash-LSH +
 *   connected components) → contamination check → pack → split →
 *   versioned save → delta incremental re-run.
 *
 * Run: sbt "runMain graft.Demo [sfDir]"
 */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val warehouse = Files.createTempDirectory("graft_demo").toString
    val cat = new Catalog(warehouse, spark)
    val jm = JobMetrics(cat, "demo-job", spark)

    // 1. ingest + clean
    val docs = Chain.readParquet(spark, s"$sfDir/documents.parquet")
    val cleaned = docs.mutate(
        "text" -> TextAnalysis.scrubPii(TextAnalysis.stripHtml(col("text"))),
        "tokens" -> TextAnalysis.tokenCount(col("text")).cast("long"),
        "quality" -> TextAnalysis.qualityScore(col("text")),
        "lang_pred" -> TextAnalysis.langId(col("text")))
      .filter(col("quality") >= 0.4, col("tokens") >= 5)
    jm.set("cleaned_rows", cleaned.count().toDouble)

    // 2. exact dedup, then near-dup clusters via MinHash-LSH + CC
    val exact = Chain(Dedup.exact(cleaned.toDF, "text", "doc_id"))
    val edges = Dedup.minhashDedupEdges(exact.toDF, "text", "doc_id",
      threshold = 0.7, k = 32, bands = 8)
    val clusters = Dedup.connectedComponents(edges)
    val deduped = Chain(exact.toDF.join(clusters,
        exact.toDF("doc_id") === clusters("id"), "left_outer")
      .filter(col("cluster_id").isNull || col("doc_id") === col("cluster_id"))
      .drop("id", "cluster_id"))
    jm.set("after_dedup", deduped.count().toDouble)

    // 3. pack into ~2000-token training streams, then 90/10 split
    val packed = Chain(Pack.byTokenBudget(deduped.toDF, "tokens", "doc_id",
      budget = 2000, shards = 8))
    val Seq(train, test) = Split.trainTestSplit(packed, Seq(0.9, 0.1))

    // 4. contamination guard: no test doc shares a fingerprint with train
    val fp = (c: Chain) => c.toDF.select(col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("fp"))
    val contaminated = fp(test).join(fp(train).select("fp").distinct(),
      Seq("fp"), "left_semi").count()
    jm.set("contaminated", contaminated.toDouble)

    // 5. versioned save + delta incremental re-run (no changes → no-op)
    cat.save(train, "demo_train")
    val r1 = Delta.deltaSave(cat, deduped, "demo_out",
      deltaOn = Seq("doc_id"), compare = Seq("text"),
      transform = _.selectExpr(col("doc_id"), col("tokens"), col("quality")))
    val r2 = Delta.deltaSave(cat, deduped, "demo_out",
      deltaOn = Seq("doc_id"), compare = Seq("text"),
      transform = _.selectExpr(col("doc_id"), col("tokens"), col("quality")))
    jm.persist()

    // 6. curation + QA surface: per-source best docs (bounded-heap
    // aggregate), sketch-cheap train/test 13-gram overlap estimate,
    // snapshot drift check, deterministic CV folds, catalog GC audit
    val best = graft.ops.Corpus.topKPerGroup(deduped.toDF, "source",
      col("quality"), col("doc_id").cast("string"), k = 2).count()
    val overlap = graft.ops.Corpus.ngramOverlap(
      train.toDF.select(col("doc_id"), col("text")),
      test.toDF.select(col("doc_id"), col("text")), "text").head()
    val drifted = graft.ops.Profile.drift(
        docs.toDF.select(col("n_chars"), col("doc_id")),
        deduped.toDF.select(col("n_chars"), col("doc_id")))
      .filter(col("drift_flag")).count()
    val folds = graft.ops.Split.kFold(deduped.toDF, "doc_id", k = 5)
      .groupBy("fold").count().count()
    val wouldVacuum = cat.vacuum(keepLast = 1, dryRun = true).size

    println(s"""
       |graft demo @ $sfDir  (warehouse: $warehouse)
       |  cleaned:        ${cleaned.count()}
       |  after dedup:    ${deduped.count()}
       |  train / test:   ${train.count()} / ${test.count()}
       |  contaminated:   $contaminated
       |  delta run 1:    full=${r1.fullRecompute} rows=${r1.changedRows}
       |  delta run 2:    full=${r2.fullRecompute} changed=${r2.changedRows} (expect 0)
       |  datasets:       ${cat.datasets().mkString(", ")}
       |  metrics:        ${JobMetrics.read(cat, "demo-job").get}
       |  best-per-src:   $best rows
       |  13-gram overlap train∩test ≈ ${overlap.getAs[Long]("est_intersect")}
       |  drifted cols:   $drifted (raw → cleaned+deduped)
       |  cv folds:       $folds
       |  vacuum (dry):   $wouldVacuum victim(s)
       |""".stripMargin)
    spark.stop()
  }
}
