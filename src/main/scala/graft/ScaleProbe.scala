package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling probe: runs the MinHash-LSH dedup pipeline (signatures → banded
 * candidates → Jaccard verification) over the sf0.1 documents corpus
 * amplified K× (text perturbed per copy so signatures differ), and prints
 * sec per K — evidence that the operator scales linearly in corpus size
 * (candidate generation is bucket-local, never O(n²)).
 *
 * Run: sbt "runMain graft.ScaleProbe 1 4 8"
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()

    val results = ks.map { k =>
      val corpus = docs.crossJoin(
          spark.range(k).select(col("id").as("__copy")))
        .select((col("doc_id") * k + col("__copy")).as("doc_id"),
          // distinct suffix per copy so copies aren't trivial exact dups
          concat(col("text"), lit(" v"), col("__copy")).as("text"))
      val t0 = System.nanoTime()
      val edges = graft.ops.Dedup.minhashDedupEdges(
        corpus, "text", "doc_id", threshold = 0.5, k = 32, bands = 8)
      val n = edges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      // localEdgeThreshold=0 pins the distributed label-propagation path —
      // this probe is the evidence that the 100 TB path scales, so the
      // small-graph driver shortcut must not kick in here
      val nClusters = graft.ops.Dedup.connectedComponents(edges, localEdgeThreshold = 0L)
        .select("cluster_id").distinct().count()
      val ccSec = (System.nanoTime() - t1) / 1e9
      println(f"K=$k%-3d rows=${5000L * k}%-8d edges=$n%-10d ${sec}%.2f s   " +
        f"cc: $nClusters%-7d clusters in ${graft.ops.Dedup.lastRounds} rounds ${ccSec}%.2f s")
      (k, sec)
    }
    val (k1, s1) = results.head
    val (kN, sN) = results.last
    println(f"scale factor ${kN.toDouble / k1}%.0fx -> time factor ${sN / s1}%.2fx")

    // Cross-document line dedup at the same amplifications: multi-line docs
    // where one line is corpus-wide boilerplate. Wide stages touch only
    // 8-byte hashes, so time should track corpus size ~linearly too.
    val lineResults = ks.map { k =>
      val corpus = docs.crossJoin(
          spark.range(k).select(col("id").as("__copy")))
        .select((col("doc_id") * k + col("__copy")).as("doc_id"),
          concat(col("text"), lit(" v"), col("__copy"),
            lit("\nshared boilerplate line\nunique tail "),
            col("doc_id") * k + col("__copy")).as("text"))
      val t0 = System.nanoTime()
      val kept = graft.ops.Corpus.dedupLines(corpus, "doc_id", "text", minDocs = 3)
      val n = kept.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"lineDedup K=$k%-3d docs=${5000L * k}%-8d kept=$n%-8d ${sec}%.2f s")
      (k, sec)
    }
    val (lk1, ls1) = lineResults.head
    val (lkN, lsN) = lineResults.last
    println(f"lineDedup scale ${lkN.toDouble / lk1}%.0fx -> time ${lsN / ls1}%.2fx")

    // 13-gram decontamination at the same amplifications: benchmark stays
    // fixed-size (an eval suite doesn't grow with the corpus), so time
    // should track corpus size while the benchmark side always broadcasts.
    val bench = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val dcResults = ks.map { k =>
      val corpus = docs.crossJoin(
          spark.range(k).select(col("id").as("__copy")))
        .select((col("doc_id") * k + col("__copy")).as("doc_id"),
          concat(col("text"), lit(" v"), col("__copy")).as("text"))
      val t0 = System.nanoTime()
      val flagged = graft.ops.Corpus.ngramDecontaminate(
          corpus, bench, "doc_id", "text", n = 13)
        .filter(col("contaminated")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"decontaminate K=$k%-3d docs=${5000L * k}%-8d flagged=$flagged%-8d ${sec}%.2f s")
      (k, sec)
    }
    val (dk1, ds1) = dcResults.head
    val (dkN, dsN) = dcResults.last
    println(f"decontaminate scale ${dkN.toDouble / dk1}%.0fx -> time ${dsN / ds1}%.2fx")

    // Bigram-LM scoring: train on the base corpus, score the amplified one.
    // The count tables are vocabulary-sized (they DON'T grow with copies —
    // the suffix tokens add O(K) types), so scoring should scale linearly.
    val lmResults = ks.map { k =>
      val corpus = docs.crossJoin(
          spark.range(k).select(col("id").as("__copy")))
        .select((col("doc_id") * k + col("__copy")).as("doc_id"),
          concat(col("text"), lit(" v"), col("__copy")).as("text"))
      val t0 = System.nanoTime()
      val n = graft.ops.Corpus.lmPerplexity(docs, corpus, "doc_id", "text")
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"lmScore K=$k%-3d docs=${5000L * k}%-8d scored=$n%-8d ${sec}%.2f s")
      (k, sec)
    }
    val (mk1, ms1) = lmResults.head
    val (mkN, msN) = lmResults.last
    println(f"lmScore scale ${mkN.toDouble / mk1}%.0fx -> time ${msN / ms1}%.2fx")
    spark.stop()
  }
}
