package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-level training-data operators: cross-document line deduplication,
 * domain-mix sampling, and corpus token statistics. These are the ops a
 * 100 TB pretraining pipeline runs between raw ingestion and packing;
 * none exists in the reference (its dedup surface is per-row/document),
 * so they are graft extensions in the spirit of reference
 * src/datachain/toolkit/.
 *
 * Scale notes, per op:
 *  - [[dedupLines]]: the only wide stages are (a) a distinct+count over
 *    (line-hash, doc) pairs — 16 bytes/row, never the line text — and
 *    (b) one anti join of lines against the dup-key set, which AQE
 *    broadcasts when the dup set is small. Reassembly shuffles each doc's
 *    surviving lines once.
 *  - [[mixDomains]]: pure map-side filter — zero shuffles at any scale.
 *  - [[topTokens]]: explode + partial (map-side) count + TakeOrdered;
 *    the full token set never sits on one node.
 */
object Corpus {

  /**
   * CCNet-style cross-document line deduplication: drop every line whose
   * identical text appears in at least `minDocs` distinct documents
   * (boilerplate: navigation, cookie banners, license headers), then
   * reassemble each document from its surviving lines in original order.
   * Documents left with zero lines disappear from the output.
   *
   * Dedup decisions key on `xxhash64(line)` so the count/anti-join stages
   * shuffle 8-byte keys instead of line text.
   */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    val lines = docs.select(col(idCol).as("__doc"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos", "__line")))
    val dupKeys = lines
      .select(xxhash64(col("__line")).as("__k"), col("__doc"))
      .distinct() // count each doc once per line
      .groupBy("__k").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__k")
    lines.withColumn("__k", xxhash64(col("__line")))
      .join(dupKeys, Seq("__k"), "left_anti")
      .groupBy(col("__doc"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")), "\n").as("__text"))
      .select(col("__doc").as(idCol), col("__text").as(textCol))
  }

  /** Lexicographic md5-prefix threshold for a keep-fraction: a row survives
    * when `substring(md5(id:seed), 1, 8) < thresholdHex(p)`. Hex strings
    * compare the same in every engine, so oracles reproduce the exact
    * sample with their own md5. */
  def thresholdHex(p: Double): String =
    if (p >= 1.0) "zzzzzzzz" // greater than any hex digit: keep all
    else f"${math.max(0L, (p * 4294967296.0).toLong)}%08x"

  /**
   * Deterministic domain-mix sampling: keep each row with the probability
   * configured for its domain (source/subcorpus), default `defaultFraction`
   * for unlisted domains. The coin is `md5(id:seed)` — reproducible across
   * runs, engines, and cluster sizes, and a pure map-side filter (no
   * shuffle, no state). This is how a pretraining pipeline downweights
   * crawl data against curated corpora.
   */
  def mixDomains(df: DataFrame, idCol: String, domainCol: String,
                 fractions: Map[String, Double], defaultFraction: Double = 0.0,
                 seed: String = ""): DataFrame = {
    val u = substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 8)
    val thr: Column = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdHex(defaultFraction))) { case (acc, (d, p)) =>
        when(col(domainCol) === d, lit(thresholdHex(p))).otherwise(acc)
      }
    df.filter(u < thr)
  }

  /**
   * Corpus token-frequency head: lowercase whitespace tokens with global
   * counts, deterministically ordered (count desc, token asc), top `n`.
   * The plan is explode → hash-aggregate with map-side combine →
   * TakeOrderedAndProject — no global sort of the vocabulary.
   */
  def topTokens(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(n)
}
