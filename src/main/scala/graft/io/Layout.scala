package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout for scan pruning — the storage-side half
 * of 100 TB efficiency. A table sorted on one column prunes scans on that
 * column only; interleaving the bit-planes of two columns (a Z-order /
 * Morton curve) clusters rows so that EVERY file's min/max envelope is
 * narrow on BOTH columns, and a point/range predicate on either column
 * (or both) skips most files via footer statistics — no index structure,
 * just row order. This is the standard lakehouse layout trick (Delta
 * OPTIMIZE ZORDER BY, Iceberg sort orders); here it is a plain column
 * expression + range-partitioned write, so it works with stock parquet.
 *
 * Scale shape: the only global coordination is (a) one min/max aggregate
 * per dimension (exact, associative — a single 1-row job) and (b) the
 * range exchange on the z-value that `writeZOrdered` performs, which is
 * the same shuffle any sorted write pays. The z-value itself is a pure
 * codegen'd projection (shift/mask/or over two bucket ids) — no UDF, no
 * lookup table, nothing per-row on the driver.
 *
 * Determinism: buckets are linear bins over the exact min/max
 * ((v - min) * 65535 / (max - min), floored, clamped), one IEEE double
 * division per row — the same bits in any engine, so the DuckDB oracle
 * reproduces z-values exactly. Production note: linear binning is
 * quantile-free and deterministic but skew-sensitive; on a pathological
 * distribution swap `linearBucket` for a quantile-bucketed variant (the
 * interleave is unchanged) at the cost of engine-exactness.
 */
object Layout {

  val Bits = 16 // per-dimension bucket resolution; 2 dims => 32-bit z

  /** Linear bucket id in [0, 2^Bits) for `v` over the exact [min, max]
    * range: floor((v-min)*(2^Bits-1)/(max-min)), clamped; a degenerate
    * range (min == max) maps everything to bucket 0. Nulls map to 0 (they
    * sort first, same as a sorted write). */
  def linearBucket(v: Column, vMin: Double, vMax: Double): Column = {
    val hi = (1 << Bits) - 1
    if (vMax <= vMin) lit(0L)
    else coalesce(
      least(greatest(floor((v.cast("double") - lit(vMin)) * lit(hi.toDouble) /
        lit(vMax - vMin)), lit(0.0)), lit(hi.toDouble)).cast("long"),
      lit(0L))
  }

  /** Morton interleave of two bucket ids (each < 2^bits): bit i of `bx`
    * lands at position 2i+1, bit i of `by` at 2i. Unrolled shift/mask/or
    * terms — stays inside whole-stage codegen. */
  def interleave(bx: Column, by: Column, bits: Int = Bits): Column =
    interleaveN(Seq(bx, by), bits)

  /** Morton interleave of N bucket ids (each < 2^bits): bit i of bucket
    * j lands at position i*N + (N-1-j), so dimension 0 owns the most
    * significant bit of every group — for N=2 this is exactly the
    * classic (bx, by) layout above. Total width bits*N must fit a long.
    * Same unrolled shift/mask/or codegen shape. */
  def interleaveN(bs: Seq[Column], bits: Int = Bits): Column = {
    require(bs.size >= 2 && bits * bs.size <= 63,
      s"interleaveN: ${bs.size} dims x $bits bits must fit 63 bits")
    val n = bs.size
    bs.zipWithIndex.map { case (b, j) =>
      (0 until bits).map(i =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j)))
        .reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for two dimensions over their exact global ranges
    * (caller supplies the min/max — one agg job; see [[zorderFrame]]). */
  def zValue(x: Column, xMin: Double, xMax: Double,
             y: Column, yMin: Double, yMax: Double): Column =
    interleave(linearBucket(x, xMin, xMax), linearBucket(y, yMin, yMax))

  /** `df` plus a `zval` column over dimensions (`xCol`, `yCol`). Runs the
    * one exact min/max aggregate and stamps the pure-projection z-value. */
  def zorderFrame(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val r = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    bindAndInterleave(df,
      linearBucket(col(xCol), r.getDouble(0), r.getDouble(1)),
      linearBucket(col(yCol), r.getDouble(2), r.getDouble(3)), Bits)
  }

  /** The one let-binding mechanism every curve frame uses: bucket
    * expressions are bound to columns FIRST because a curve key
    * references each bucket many times ([[interleave]]: `bits` times
    * per dimension) and CollapseProject would inline a bucket
    * expression into every reference — for the quantile bucket kernel
    * that meant 8× the work per row per dimension (the z-order
    * skipping gate measured 7.2 s → 1.4 s). A multiply-referenced
    * non-cheap alias stays a separate projection, so each bucket
    * evaluates once per row. `mk` builds the key column from the bound
    * bucket columns; the reserved-name guard lives here and nowhere
    * else. */
  private def bindKey(df: DataFrame, bs: Seq[Column], keyName: String)
                     (mk: Seq[Column] => Column): DataFrame = {
    val names = bs.indices.map(i => s"__cb$i")
    require(!df.columns.exists(names.toSet),
      "input columns use reserved internal names __cb<i>")
    val bound = names.zip(bs).foldLeft(df) { case (d, (n, b)) =>
      d.withColumn(n, b)
    }
    bound.withColumn(keyName, mk(names.map(col))).drop(names: _*)
  }

  private def bindAndInterleave(df: DataFrame, bx: Column, by: Column,
                                bits: Int): DataFrame =
    bindAndInterleaveN(df, Seq(bx, by), bits)

  private def bindAndInterleaveN(df: DataFrame, bs: Seq[Column],
                                 bits: Int): DataFrame =
    bindKey(df, bs, "zval")(interleaveN(_, bits))

  /** Range-partition `frame` into whole curve-prefix blocks: the top
    * log2(nFiles) bits of the `vcol` curve key (clamped to its
    * `totalBits` width — an oversized nFiles would shift negative,
    * which Java masks to >> 63 and silently collapses the layout into
    * one partition), sorted by (block, key) within each output
    * partition. The one cell-alignment mechanism both write paths, the
    * catalog OPTIMIZE verb and the skipping gates share; the key and
    * cell working columns are dropped on the way out. */
  private[graft] def cellAligned(frame: DataFrame, vcol: String,
                                 totalBits: Int, nFiles: Int): DataFrame = {
    val logF = math.min(totalBits, math.max(1,
      math.ceil(math.log(nFiles.toDouble) / math.log(2.0)).toInt))
    frame
      .withColumn("__cell", shiftright(col(vcol), totalBits - logF))
      .repartitionByRange(1 << logF, col("__cell"))
      .sortWithinPartitions("__cell", vcol)
      .drop(vcol, "__cell")
  }

  /** `df` plus a `zval` column over QUANTILE buckets of (`xCol`, `yCol`):
    * 2^bits approximate quantile boundaries per dimension (one
    * driver-side array each, broadcast as a literal), bucket = rank of
    * `v` among the boundaries. Equal-mass buckets make the z-cells carry
    * ~equal row counts regardless of value skew — the layout keeps its
    * pruning power on heavy-tailed columns where [[zorderFrame]]'s linear
    * bins collapse (most rows sharing a handful of bins). This is the
    * production default for the write path; it trades away the linear
    * variant's bit-exact cross-engine reproducibility (approx quantiles
    * are sketch-dependent), which only the oracle gate needs. */
  def zorderFrameQuantile(df: DataFrame, xCol: String, yCol: String,
                          bits: Int = 8): DataFrame =
    zorderFrameQuantileN(df, Seq(xCol, yCol), bits)

  /** Per-dimension bucket resolution for an N-dim curve key that must
    * fit 63 bits — the ONE place the clamp formula lives (the quantile
    * frames and both cell-aligned write paths all derive from it). */
  def curveBits(bits: Int, dims: Int): Int = math.min(bits, 63 / dims)

  /** Quantile bucket expressions for `cols` at 2^bits resolution — ONE
    * multi-column approxQuantile job, bucket = #boundaries <= v via the
    * binary-search kernel (the filter-HOF formulation compared all
    * 2^bits-1 boundaries and allocated the filtered array per row);
    * nulls keep the bucket-0 convention of the linear variant. Shared
    * by the Z-order and Hilbert quantile frames. */
  private def quantileBuckets(df: DataFrame, cols: Seq[String],
                              b: Int): Seq[Column] = {
    val nb = 1 << b
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val bounds = df.stat.approxQuantile(cols.toArray, probs, 1.0 / (4 * nb))
    cols.zipWithIndex.map { case (c, i) =>
      coalesce(graft.functions.GraftFunctions
        .bounds_rank(col(c).cast("double"), bounds(i)), lit(0L)) }
  }

  /** N-dimensional [[zorderFrameQuantile]] — Delta's `ZORDER BY (c1, …,
    * cN)`. Still ONE multi-column quantile job; per-dimension resolution
    * is capped so the interleave fits a long (N=2 → 8 bits, N=3 → 8,
    * N=4 → 8, N=7 → 9 total... bits param is clamped to 63/N). The
    * bucket expressions are evaluated ONCE per row via
    * bindAndInterleaveN's let-binding. */
  def zorderFrameQuantileN(df: DataFrame, cols: Seq[String],
                           bits: Int = 8): DataFrame = {
    require(cols.size >= 2, "zorder needs at least 2 columns")
    val b = curveBits(bits, cols.size)
    bindAndInterleaveN(df, quantileBuckets(df, cols, b), b)
  }

  /** `df` plus an `hval` column — the Hilbert-curve twin of
    * [[zorderFrame]]: same exact linear bins over the one min/max agg,
    * but positions come from the classic 2-D Hilbert kernel
    * ([[Hilbert.index2]]) instead of the Morton interleave. Consecutive
    * curve positions are grid-ADJACENT cells (no Morton quadrant
    * jumps), so contiguous hval ranges — i.e. range-partitioned files —
    * cover compact connected regions and per-file envelopes tighten on
    * both dimensions. Engine-exact like the z twin: the oracle replays
    * the reflect+rotate loop with a recursive CTE. */
  def hilbertFrame(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val r = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    bindKey(df, Seq(
        linearBucket(col(xCol), r.getDouble(0), r.getDouble(1)),
        linearBucket(col(yCol), r.getDouble(2), r.getDouble(3))), "hval") {
      case Seq(bx, by) => graft.functions.GraftFunctions.hilbert_2(bx, by, Bits)
    }
  }

  /** N-dimensional Hilbert layout key over QUANTILE buckets — the
    * production twin of [[zorderFrameQuantileN]] (equal-mass bins keep
    * pruning power under skew) with Skilling's transpose kernel
    * ([[Hilbert.indexN]]) as the curve. Bucket expressions are
    * LET-BOUND to columns first (the CollapseProject fan-out trap —
    * see [[bindAndInterleaveN]]); the kernel itself references each
    * bucket once, as one static call inside whole-stage codegen. */
  def hilbertFrameQuantileN(df: DataFrame, cols: Seq[String],
                            bits: Int = 8): DataFrame = {
    require(cols.size >= 2, "hilbert layout needs at least 2 columns")
    val b = curveBits(bits, cols.size)
    bindKey(df, quantileBuckets(df, cols, b), "hval")(bs =>
      graft.functions.GraftFunctions.hilbert_n(array(bs: _*), b))
  }

  /** Write `df` as ~`nFiles` parquet files clustered by the Hilbert
    * curve over `cols` — the [[writeZOrdered]] twin. File boundaries
    * align to whole curve-prefix blocks (the top log2(nFiles) index
    * bits), which for a Hilbert curve are compact square sub-quadrants:
    * every file's envelope is one such region on EVERY dimension, with
    * none of the Morton cell-edge discontinuities. */
  def writeHilbertOrdered(df: DataFrame, path: String, cols: Seq[String],
                          nFiles: Int = 64): Unit = {
    val bits = 8
    cellAligned(hilbertFrameQuantileN(df, cols, bits), "hval",
        curveBits(bits, cols.size) * cols.size, nFiles)
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` as ~`nFiles` parquet files clustered by the z-curve over
    * (`xCol`, `yCol`) — quantile-bucketed ([[zorderFrameQuantile]]), so
    * skewed distributions still spread across cells. Files are aligned to
    * WHOLE Morton cells: partitioning on the raw z-value puts a sampled
    * range boundary mid-cell in almost every file, and a file straddling
    * a cell edge inherits the min/max envelope of two cells that can sit
    * far apart on one dimension (the curve's discontinuities) — measured,
    * that doubles the average envelope width. Range-partitioning on the
    * cell id (the top log2(nFiles) z-bits) keeps every file inside one
    * cell, so its envelope is one grid cell on BOTH dimensions and
    * predicate pushdown on either column skips most files/row-groups
    * from footer stats alone. `nFiles` is rounded up to a power of two;
    * quantile buckets give cells ~equal row mass, so file sizes stay
    * balanced. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    nFiles: Int = 64): Unit = {
    val bits = 8
    cellAligned(zorderFrameQuantile(df, xCol, yCol, bits), "zval",
        curveBits(bits, 2) * 2, nFiles)
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Bucketed table layout — the co-located-join half of 100 TB
   * efficiency, complementing [[writeZOrdered]]'s scan pruning. Writing
   * both sides of a hot equi-join hash-bucketed on the join key (same
   * bucket count) makes every subsequent join on that key read matching
   * buckets file-to-file: Catalyst's output-partitioning rules see
   * `HashPartitioning(key, n)` already satisfied on BOTH sides and elide
   * BOTH exchanges — at 100 TB, that deletes the dominant cost of every
   * fact⋈fact join on the pipeline's recurring keys (the in-memory
   * equivalent is what [[graft.ops.Graph]]'s persisted pre-partitioned
   * edge frames do per-session; bucketing makes it durable on disk).
   * Sorting within buckets (`sortCols`, default the bucket key) also
   * lets the sort-merge join skip its per-task sort.
   *
   * Plain parquet + the session catalog's bucket spec — no table-format
   * jar needed; `path` makes it an external table so the data outlives
   * the session while the name stays session-scoped. Thin layout-side
   * entry over [[graft.io.Writers.saveBucketed]] (drop-if-exists +
   * external path).
   */
  def bucketize(df: DataFrame, table: String, path: String, keyCol: String,
                buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    graft.io.Writers.saveBucketed(df, table, Seq(keyCol), buckets,
      path = Some(path))
  }

  /**
   * Hive-style partitioned write — the third leg of the layout trio
   * beside [[writeZOrdered]] (footer-stat pruning) and [[bucketize]]
   * (join co-location): directory partitioning on a low-cardinality
   * column makes any predicate on it a PARTITION filter, so the scan
   * never even lists the excluded directories — at 100 TB, the
   * difference between reading one day and listing three years.
   * `maxFilesPerPartition` caps the per-directory file explosion that
   * naive partitioned writes produce (every task × every partition
   * value): repartitioning on (partition value, deterministic row-hash
   * salt) gives each directory at most that many writers — still
   * parallel on a hot value, never a thousand shards of a cold one.
   */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       maxFilesPerPartition: Int = 4): Unit = {
    require(maxFilesPerPartition >= 1, "need at least one file per partition")
    df.repartition(col(partitionCol),
        pmod(xxhash64(struct(df.columns.map(col): _*)),
          lit(maxFilesPerPartition.toLong)))
      .write.partitionBy(partitionCol).mode("overwrite").parquet(path)
  }

  /** Equi-join two [[bucketize]]d tables on `keyA == keyB` — with equal
    * bucket counts on the join keys, the plan carries NO shuffle exchange
    * on either side (PlanSpec-pinned). */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   tableA: String, tableB: String,
                   keyA: String, keyB: String,
                   how: String = "inner"): DataFrame =
    spark.table(tableA).join(spark.table(tableB),
      col(keyA) === col(keyB), how)

  /**
   * Bin-pack a parquet dataset's small files into ~`targetBytes` files at
   * `outPath` — the routine maintenance pass every streamed/incremental
   * 100 TB table needs (thousands of kilobyte files from micro-batch
   * appends turn every scan into a file-open storm and starve the
   * scheduler with single-row tasks).
   *
   * Scale shape: file count is computed from the ACTUAL on-disk bytes
   * (one FileSystem listing, no data read), and the rewrite uses
   * `coalesce`, not `repartition` — merging partitions is shuffle-free
   * (each output task reads a handful of input files sequentially), so
   * compaction moves every byte exactly once: disk → task → disk. A
   * shuffle would double the network cost for zero layout benefit.
   * Returns (filesBefore, filesAfter, totalBytes).
   */
  def compactTo(spark: org.apache.spark.sql.SparkSession, inPath: String,
                outPath: String,
                targetBytes: Long = 128L * 1024 * 1024): (Int, Int, Long) = {
    val hp = new org.apache.hadoop.fs.Path(inPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hp).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    val total = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    // coalesce can only REDUCE the scan's partition count, so size the
    // scan itself to the target (maxPartitionBytes governs how many
    // source files pack into one read task) and restore the conf after
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, targetBytes.toString)
      spark.read.parquet(inPath)
        .coalesce(n)
        .write.mode("overwrite").parquet(outPath)
    } finally spark.conf.set(key, prev)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after, total)
  }
}
