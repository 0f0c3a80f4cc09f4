package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow

/**
 * Content-defined chunking (Rabin-style) — the dedup primitive that
 * stays ALIGNED under insertions/edits where fixed-size blocks shift:
 * a chunk boundary falls after position `i` whenever the polynomial
 * fingerprint of the `k` characters ending at `i` is divisible by
 * `divisor`, so boundaries depend only on LOCAL content. Two documents
 * sharing a long prefix/infix produce byte-identical chunks over the
 * shared region regardless of surrounding edits — group chunks across
 * the corpus and duplicated passages surface as shared chunk keys
 * (the storage-dedup/LLM-corpus "passage reuse" signal; same family as
 * rsync's rolling blocks and FastCDC's gear splitting, re-expressed for
 * Spark).
 *
 * The fingerprint is the plain window polynomial
 * `Σ_{j=0..k-1} code(i-j)·W^j` with `W = 31` over UTF-16 char codes —
 * deliberately NOT a private hash: with the default `k = 8` the value
 * stays far below 2^63, so an oracle can recompute it exactly in any
 * SQL engine (the driver gate's DuckDB oracle spells the powers out),
 * while the kernel still evaluates it as an O(1) ROLLING update per
 * character. Expected chunk length ≈ `divisor` characters; `minLen`
 * suppresses candidate cuts too close to the previous one and `maxLen`
 * forces a cut (FastCDC's normalization levers — the production
 * defaults; the gate pins the pure rule with min=1/max=unbounded so
 * the SQL oracle needs no sequential state).
 *
 * Scale shape: the split is one codegen'd projection (no shuffle),
 * computed ONCE; the share stats shrink to one row per (chunk, doc)
 * before any further exchange. At corpus scale group on
 * `xxhash64(chunk)` first and keep texts out of the shuffle — the
 * gate-scale helper groups on exact text so its semantics match the
 * oracle verbatim.
 */
object Cdc {

  val W = 31L

  /** Chunk spans of `s`: (0-based CODEPOINT start, chunk text). The
    * kernel works in the codepoint domain — the one SQL `substr`/`ord`/
    * `length` share — so an astral character (emoji, rare CJK) is one
    * window element on both sides, never a surrogate pair split across
    * chunks. INT64-EXACTNESS BOUND: max codepoint (0x10FFFF) × Σ W^j
    * stays below 2^63 only for k <= 9 (k <= 10 for BMP-only text: 0xFFFF x (31^10-1)/30 ~ 1.8e18 < 2^63; k = 11 already overflows at 5.5e19) — in
    * that regime the polynomial is exact int64 arithmetic and any SQL
    * engine recomputes it verbatim (the driver gate's regime, k=8).
    * Larger k (up to the accepted 16) evaluates with two's-complement
    * WRAPAROUND: still deterministic and self-consistent (the
    * scalacheck pin's naive reference wraps identically), but NOT
    * SQL-oracle-replayable — a DuckDB BIGINT would overflow instead of
    * wrapping. Pure function of the text — the kernel
    * [[org.apache.spark.sql.graft.CdcChunksExpr]] codegens into. */
  def chunkSpans(s: String, k: Int, divisor: Long, minLen: Int,
                 maxLen: Int): Seq[(Int, String)] = {
    require(k >= 2 && k <= 16, s"cdc window k must be in [2,16], got $k")
    require(divisor > 0, "cdc divisor must be positive")
    require(minLen >= 1 && maxLen >= minLen, "cdc needs 1 <= minLen <= maxLen")
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    // W^(k-1), the outgoing element's weight in the rolling update
    var wk = 1L
    var j = 0
    while (j < k - 1) { wk *= W; j += 1 }
    var poly = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val c = cps(i).toLong
      poly = if (i < k) poly * W + c
             else (poly - cps(i - k).toLong * wk) * W + c
      val len = i - prev + 1
      val candidate = i >= k - 1 && poly % divisor == 0
      if ((candidate && len >= minLen) || len >= maxLen) {
        out += ((prev, new String(cps, prev, i + 1 - prev)))
        prev = i + 1
      }
      i += 1
    }
    if (prev < n) out += ((prev, new String(cps, prev, n - prev)))
    out.toSeq
  }

  /** The codegen entry point: [[chunkSpans]] packed as
    * `array<struct<start:int, chunk:string>>` (start is 1-based, the
    * SQL substr convention the oracle shares). */
  def chunkArray(text: UTF8String, k: Int, divisor: Long, minLen: Int,
                 maxLen: Int): ArrayData = {
    val spans = chunkSpans(text.toString, k, divisor, minLen, maxLen)
    new GenericArrayData(spans.map { case (st, ch) =>
      InternalRow(st + 1, UTF8String.fromString(ch))
    }.toArray[Any])
  }

  /** `array<struct<start,chunk>>` column of content-defined chunks. */
  def cdcChunksCol(text: Column, k: Int = 8, divisor: Long = 64,
                   minLen: Int = 1, maxLen: Int = Int.MaxValue): Column =
    org.apache.spark.sql.graft.bridge.column(
      org.apache.spark.sql.graft.CdcChunksExpr(
        org.apache.spark.sql.graft.bridge.expression(text),
        k, divisor, minLen, maxLen))

  /** Exploded chunk table `(id, start, chunk)` — one row per chunk. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                k: Int = 8, divisor: Long = 64, minLen: Int = 1,
                maxLen: Int = Int.MaxValue): DataFrame =
    df.select(col(idCol),
        explode(cdcChunksCol(col(textCol), k, divisor, minLen, maxLen))
          .as("c"))
      .select(col(idCol), col("c.start").as("start"),
        col("c.chunk").as("chunk"))

  /** Per-document chunk reuse: `(id, n_chunks, n_shared)` where
    * `n_shared` counts this document's chunks whose text also appears
    * in at least one OTHER document — the passage-duplication signal
    * corpus curation thresholds on. The chunking projection runs ONCE
    * (a self-join against the chunk frame's own aggregate would
    * recompute the kernel per branch): pre-aggregate to one row per
    * (chunk, doc), where a plain count window over the chunk key IS
    * the distinct-doc count, then roll up per doc. */
  def cdcShareStats(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, divisor: Long = 64): DataFrame = {
    val perDoc = cdcChunks(df, idCol, textCol, k, divisor)
      .groupBy(col("chunk"), col(idCol))
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk")
    perDoc.withColumn("__docs", count(lit(1)).over(w))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_chunks"),
        sum(when(col("__docs") > 1, col("__n")).otherwise(0L))
          .as("n_shared"))
  }
}
