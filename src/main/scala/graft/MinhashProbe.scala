package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Scratch profiling main for the minhash pipeline stages. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nearDups = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" tail marker token")))
    val corpus = docs.unionByName(nearDups).select("doc_id", "text").cache()
    println(s"corpus=${corpus.count()}")
    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    timeIt("signatures") {
      corpus.select(Dedup.minhashSignature(col("text"), 32).as("s"))
        .selectExpr("sum(s[0] % 100000)").collect()
    }
    val cands = Dedup.minhashCandidates(corpus, "text", "doc_id", 32, 8)
    timeIt("candidates")(println("n_cand=" + cands.count()))
    timeIt("grams") {
      corpus.select(TextAnalysis.charNgrams(col("text"), 5).as("g"))
        .selectExpr("sum(CAST(size(g) AS BIGINT))").collect()
    }
    timeIt("full_edges") {
      println("edges=" + Dedup.minhashDedupEdges(corpus, "text", "doc_id",
        0.5, 32, 8, 5).count())
    }
    spark.stop()
  }
}
